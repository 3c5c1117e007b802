import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.utils import math_utils as mu


def test_normalize_angle():
    assert np.isclose(float(mu.normalize_angle(jnp.pi + 0.1)), -jnp.pi + 0.1, atol=1e-6)
    assert np.isclose(float(mu.normalize_angle(-jnp.pi - 0.1)), jnp.pi - 0.1, atol=1e-6)
    assert np.isclose(float(mu.normalize_angle(0.5)), 0.5, atol=1e-7)
    batched = mu.normalize_angle(jnp.array([0.0, 3 * jnp.pi, -3 * jnp.pi]))
    np.testing.assert_allclose(batched, [0.0, -jnp.pi, -jnp.pi], atol=1e-5)


def test_angle_diff():
    assert np.isclose(float(mu.angle_diff(jnp.pi - 0.1, -jnp.pi + 0.1)), -0.2, atol=1e-5)


def test_quat_multiply_identity():
    q = jnp.array([0.5, 0.5, 0.5, 0.5])
    ident = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(mu.quat_multiply(ident, q), q, atol=1e-7)
    np.testing.assert_allclose(
        mu.quat_multiply(q, mu.quat_inverse(q)), ident, atol=1e-6
    )


def test_quat_rotation_matches_matrix():
    rng = np.random.RandomState(0)
    q = mu.quat_normalize(jnp.asarray(rng.randn(4), jnp.float32))
    v = jnp.asarray(rng.randn(3), jnp.float32)
    R = mu.quat_to_rotation_matrix(q)
    np.testing.assert_allclose(mu.quat_rotate(q, v), R @ v, atol=1e-5)
    # rotation preserves norm
    assert np.isclose(
        float(jnp.linalg.norm(mu.quat_rotate(q, v))), float(jnp.linalg.norm(v)), atol=1e-5
    )


def test_euler_quat_roundtrip():
    roll, pitch, yaw = 0.3, -0.4, 1.2
    q = mu.euler_to_quat(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw))
    r, p, y = mu.quat_to_euler(q)
    np.testing.assert_allclose([r, p, y], [roll, pitch, yaw], atol=1e-5)


def test_quat_slerp_endpoints():
    q0 = mu.euler_to_quat(jnp.float32(0), jnp.float32(0), jnp.float32(0.0))
    q1 = mu.euler_to_quat(jnp.float32(0), jnp.float32(0), jnp.float32(1.0))
    np.testing.assert_allclose(mu.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    np.testing.assert_allclose(mu.quat_slerp(q0, q1, 1.0), q1, atol=1e-5)
    half = mu.quat_slerp(q0, q1, 0.5)
    _, _, yaw = mu.quat_to_euler(half)
    assert np.isclose(float(yaw), 0.5, atol=1e-5)


def test_savitzky_golay_preserves_linear():
    """SG filters reproduce polynomials up to their order exactly."""
    t = jnp.arange(20, dtype=jnp.float32)
    u = jnp.stack([2.0 * t + 1.0, -0.5 * t], axis=-1)  # (20, 2) linear
    history = jnp.stack(
        [jnp.array([2.0 * (-2) + 1.0, 1.0]), jnp.array([2.0 * (-1) + 1.0, 0.5])]
    )
    smoothed = mu.savitzky_golay_smooth(u, history)
    # interior points (away from the repeated-tail padding) are exact
    np.testing.assert_allclose(smoothed[:-2], u[:-2], atol=1e-4)


def test_savitzky_golay_filter_normalized():
    np.testing.assert_allclose(float(jnp.sum(mu.SG_FILTER_5)), 1.0, atol=1e-6)


def test_slide_control_sequence():
    u = jnp.arange(10, dtype=jnp.float32)[:, None]  # (10, 1)
    slid = mu.slide_control_sequence(u, 3)
    np.testing.assert_allclose(slid[:7, 0], np.arange(3, 10), atol=1e-6)
    # tail filled with final control (slide_scale defaults to 0 -> decay to 0)
    np.testing.assert_allclose(slid[7:, 0], [0.0, 0.0, 0.0], atol=1e-6)
    slid_keep = mu.slide_control_sequence(u, 3, slide_scale=jnp.ones((1,)))
    np.testing.assert_allclose(slid_keep[7:, 0], [9.0, 9.0, 9.0], atol=1e-6)


def test_rk4_exact_for_linear_system():
    # dx/dt = -x has solution exp(-t); RK4 with small dt is near-exact
    f = lambda x, u: -x
    x = jnp.array([1.0])
    for _ in range(10):
        x = mu.rk4_step(f, x, None, 0.1)
    assert np.isclose(float(x[0]), np.exp(-1.0), atol=1e-6)
