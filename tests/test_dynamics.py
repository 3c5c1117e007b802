import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.models import (
    CartpoleDynamics,
    DoubleIntegratorDynamics,
    DubinsDynamics,
)
from mppi_generic_tpu.models.base import rollout_single


def test_double_integrator_deriv():
    dyn = DoubleIntegratorDynamics.create()
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    u = jnp.array([0.5, -0.5])
    np.testing.assert_allclose(dyn.state_deriv(x, u), [3.0, 4.0, 0.5, -0.5])


def test_double_integrator_step_euler():
    dyn = DoubleIntegratorDynamics.create()
    x = jnp.array([0.0, 0.0, 1.0, 0.0])
    u = jnp.array([1.0, 2.0])
    x_next, y = dyn.step(x, u, 0.0, 0.1)
    np.testing.assert_allclose(x_next, [0.1, 0.0, 1.1, 0.2], atol=1e-6)
    np.testing.assert_allclose(y, x_next)


def test_cartpole_deriv_matches_reference_equations():
    """Hand-evaluates the reference equations (cartpole_dynamics.cu:49-71)."""
    dyn = CartpoleDynamics.create(cart_mass=1.5, pole_mass=0.5, pole_length=0.8)
    x = np.array([0.1, -0.2, 0.6, 0.3], np.float64)
    u = np.array([2.0], np.float64)
    g = 9.81
    m_c, m_p, l_p = 1.5, 0.5, 0.8
    s, c = np.sin(x[2]), np.cos(x[2])
    denom = m_c + m_p * s**2
    expected = np.array(
        [
            x[1],
            (u[0] + m_p * s * (l_p * x[3] ** 2 + g * c)) / denom,
            x[3],
            (-u[0] * c - m_p * l_p * x[3] ** 2 * c * s - (m_c + m_p) * g * s)
            / (l_p * denom),
        ]
    )
    got = dyn.state_deriv(jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cartpole_jacobian_vs_autodiff_consistency():
    dyn = CartpoleDynamics.create()
    x = jnp.array([0.1, -0.2, 0.6, 0.3])
    u = jnp.array([2.0])
    A, B = dyn.state_jacobian(x, u)
    # finite differences
    eps = 1e-3
    for i in range(4):
        dx = jnp.zeros(4).at[i].set(eps)
        fd = (dyn.state_deriv(x + dx, u) - dyn.state_deriv(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(A[:, i], fd, atol=1e-2)


def test_dubins_wraps_yaw():
    dyn = DubinsDynamics.create()
    x = jnp.array([0.0, 0.0, jnp.pi - 0.01])
    u = jnp.array([1.0, 10.0])  # strong yaw rate
    x_next, _ = dyn.step(x, u, 0.0, 0.1)
    assert -np.pi <= float(x_next[2]) < np.pi


def test_enforce_constraints_clamp_and_deadband():
    dyn = DoubleIntegratorDynamics.create(
        control_ranges=[[-1.0, 1.0], [-2.0, 2.0]],
        control_deadband=[0.1, 0.0],
    )
    u = jnp.array([0.05, 3.0])
    out = dyn.enforce_constraints(None, u)
    # |0.05| < deadband 0.1 -> snapped to zero control; 3.0 clamped to 2.0
    np.testing.assert_allclose(out, [0.0, 2.0], atol=1e-6)
    # above deadband: shrunk by deadband then clamped
    u2 = jnp.array([0.5, -3.0])
    out2 = dyn.enforce_constraints(None, u2)
    np.testing.assert_allclose(out2, [0.4, -2.0], atol=1e-6)


def test_component_convention_soA_equals_vector():
    """The same state_deriv code must work on (S,) vectors and (S, 1, K)
    structure-of-arrays blocks (the Pallas kernel layout)."""
    dyn = CartpoleDynamics.create()
    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.randn(4, 1, 16), jnp.float32)
    U = jnp.asarray(rng.randn(1, 1, 16), jnp.float32)
    batched = dyn.state_deriv(X, U)
    assert batched.shape == (4, 1, 16)
    for k in range(16):
        single = dyn.state_deriv(X[:, 0, k], U[:, 0, k])
        np.testing.assert_allclose(batched[:, 0, k], single, rtol=1e-6)


def test_rollout_single_shapes():
    dyn = DubinsDynamics.create()
    U = jnp.ones((50, 2)) * 0.1
    states, outputs = rollout_single(dyn, jnp.zeros(3), U, 0.05)
    assert states.shape == (51, 3)
    assert outputs.shape == (50, 3)
    # straight-ish line: x increases
    assert float(states[-1, 0]) > 0.2


def test_enforce_leash():
    dyn = DoubleIntegratorDynamics.create()
    true_s = jnp.zeros(4)
    nom = jnp.array([0.5, -0.5, 2.0, 0.0])
    leashed = dyn.enforce_leash(true_s, nom, jnp.array([0.1, 0.1, 0.1, 0.1]))
    np.testing.assert_allclose(leashed, [0.1, -0.1, 0.1, 0.0], atol=1e-6)
