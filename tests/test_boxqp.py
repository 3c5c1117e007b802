"""BoxQP tests — analog of the reference's boxqp usage in the DDP backward
pass (ddp/boxqp.h). Oracle: unconstrained solution when bounds are inactive,
KKT conditions when they bind."""

import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.feedback.boxqp import boxqp, boxqp_gains
from mppi_generic_tpu.models import DoubleIntegratorDynamics


def _rand_spd(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n), jnp.float32)


def test_boxqp_unconstrained_matches_solve():
    H = _rand_spd(4, 0)
    g = jnp.asarray(np.random.default_rng(1).normal(size=4), jnp.float32)
    x, free = boxqp(H, g, jnp.full(4, -1e9), jnp.full(4, 1e9))
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(-jnp.linalg.solve(H, g)), rtol=1e-4, atol=1e-5
    )
    assert bool(jnp.all(free))


def test_boxqp_kkt_at_active_bounds():
    """Tight box forcing activation: solution sits on the bound and the
    gradient pushes outward (KKT)."""
    H = _rand_spd(3, 2)
    g = jnp.array([-10.0, 0.3, -0.2])
    lb = jnp.full(3, -0.5)
    ub = jnp.full(3, 0.5)
    x, free = boxqp(H, g, lb, ub)
    assert bool(jnp.all((x >= lb - 1e-6) & (x <= ub + 1e-6)))
    grad = g + H @ x
    for i in range(3):
        if not bool(free[i]):
            at_lb = abs(float(x[i] - lb[i])) < 1e-5
            at_ub = abs(float(x[i] - ub[i])) < 1e-5
            assert at_lb or at_ub
            if at_lb:
                assert float(grad[i]) > -1e-5
            if at_ub:
                assert float(grad[i]) < 1e-5
        else:
            np.testing.assert_allclose(float(grad[i]), 0.0, atol=1e-3)


def test_boxqp_gains_zero_on_clamped_rows():
    H = _rand_spd(3, 3)
    Qux = jnp.asarray(np.random.default_rng(4).normal(size=(3, 5)), jnp.float32)
    free = jnp.array([True, False, True])
    K = boxqp_gains(H, Qux, free)
    np.testing.assert_allclose(np.asarray(K[1]), 0.0, atol=1e-6)
    assert float(jnp.max(jnp.abs(K[0]))) > 0


def test_ddp_with_boxqp_respects_bounds():
    """Gains from the constrained backward pass keep the feedforward within
    the control box; with loose bounds, results match the plain solver."""
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-0.5, 0.5], [-0.5, 0.5]])
    T = 24
    goal = jnp.zeros((T, 4)).at[:, 0].set(jnp.linspace(0, 5, T))
    ctrls = jnp.zeros((T, 2))
    x0 = jnp.array([0.0, 0.0, 0.0, 0.0])

    fb_box = DDPFeedback.create(dyn, 0.02, use_boxqp=True)
    st_box = fb_box.compute_feedback(x0, goal, ctrls)
    assert bool(jnp.all(jnp.isfinite(st_box.gains)))
    assert bool(jnp.all((st_box.u_traj >= -0.5 - 1e-5) &
                        (st_box.u_traj <= 0.5 + 1e-5)))

    dyn_loose = DoubleIntegratorDynamics.create()
    fb_a = DDPFeedback.create(dyn_loose, 0.02, use_boxqp=True)
    fb_b = DDPFeedback.create(dyn_loose, 0.02, use_boxqp=False)
    st_a = fb_a.compute_feedback(x0, goal, ctrls)
    st_b = fb_b.compute_feedback(x0, goal, ctrls)
    np.testing.assert_allclose(np.asarray(st_a.gains), np.asarray(st_b.gains),
                               rtol=1e-3, atol=1e-4)
