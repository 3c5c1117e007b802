"""iLQR/DDP feedback tests — the analog of the reference's
tests/feedback_controllers/ddp_test.cu."""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.feedback import DDPFeedback, NoFeedback, ilqr_tracking
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics


def numpy_tvlqr(A, B, Q, R, Qf, T, dt):
    """Independent time-varying LQR backward recursion with the reference's
    conventions (qxx = Q*dt + A'VA etc., ddp.h:97-127)."""
    S = A.shape[0]
    C = B.shape[1]
    Vxx = Qf.copy()
    Ks = np.zeros((T, C, S))
    for k in range(T - 2, -1, -1):
        qux = B.T @ Vxx @ A
        quu = R * dt + B.T @ Vxx @ B
        K = -np.linalg.solve(quu + 1e-6 * np.eye(C), qux)
        Ks[k] = K
        Vxx = Q * dt + A.T @ Vxx @ A + qux.T @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
    return Ks


def test_ilqr_gains_match_lqr_for_linear_system():
    """For the (linear) double integrator tracking the origin, iLQR gains
    must equal time-varying LQR gains from an independent Riccati recursion."""
    dyn = DoubleIntegratorDynamics.create()
    T, dt = 30, 0.05
    Q = jnp.eye(4)
    R = jnp.eye(2)
    Qf = jnp.eye(4)
    fb = ilqr_tracking(
        dyn,
        jnp.array([1.0, -1.0, 0.5, 0.0]),
        jnp.zeros((T, 2)),
        jnp.zeros((T, 4)),
        jnp.zeros((T, 2)),
        Q,
        R,
        Qf,
        dt,
        iterations=1,
    )
    A = np.eye(4) + np.array([[0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0]]) * dt
    B = np.array([[0, 0], [0, 0], [1, 0], [0, 1]]) * dt
    Ks = numpy_tvlqr(A, B, np.eye(4), np.eye(2), np.eye(4), T, dt)
    np.testing.assert_allclose(np.asarray(fb.gains[:-1]), Ks[:-1], atol=2e-4)


def test_ilqr_feedback_stabilizes_perturbation():
    """Closed loop x' = x + (f(x, K(x - x_nom)))dt must contract toward the
    nominal (origin) trajectory."""
    dyn = DoubleIntegratorDynamics.create()
    T, dt = 50, 0.05
    fb = DDPFeedback.create(dyn, dt, num_iterations=2)
    goal = jnp.zeros((T, 4))
    fb_state = fb.compute_feedback(jnp.zeros(4), goal, jnp.zeros((T, 2)))
    x = jnp.array([1.0, 1.0, 0.0, 0.0])
    for t in range(T - 1):
        u = fb.k(x, goal[t], t, fb_state)
        x = x + dyn.state_deriv(x, u) * dt
    assert float(jnp.linalg.norm(x)) < 0.7, np.asarray(x)


def test_ilqr_reduces_tracking_cost_on_cartpole():
    """Nonlinear system: iterations should not increase the solver cost."""
    dyn = CartpoleDynamics.create()
    T, dt = 40, 0.02
    goal = jnp.tile(jnp.array([0.0, 0.0, jnp.pi, 0.0]), (T, 1))
    Q = jnp.diag(jnp.array([1.0, 1.0, 5.0, 1.0]))
    fb1 = ilqr_tracking(
        dyn, jnp.zeros(4), jnp.zeros((T, 1)), goal, jnp.zeros((T, 1)),
        Q, jnp.eye(1), Q, dt, iterations=1,
    )
    fb3 = ilqr_tracking(
        dyn, jnp.zeros(4), jnp.zeros((T, 1)), goal, jnp.zeros((T, 1)),
        Q, jnp.eye(1), Q, dt, iterations=3,
    )
    assert float(fb3.total_cost) <= float(fb1.total_cost) * 1.001
    assert np.all(np.isfinite(np.asarray(fb3.gains)))


def test_ilqr_respects_control_bounds():
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-0.5, 0.5]] * 2)
    T, dt = 20, 0.05
    fb = ilqr_tracking(
        dyn,
        jnp.array([5.0, 5.0, 0.0, 0.0]),
        jnp.zeros((T, 2)),
        jnp.zeros((T, 4)),
        jnp.zeros((T, 2)),
        jnp.eye(4),
        jnp.eye(2) * 0.01,
        jnp.eye(4),
        dt,
        iterations=3,
    )
    assert float(jnp.max(jnp.abs(fb.u_traj))) <= 0.5 + 1e-5


def test_no_feedback_is_zero():
    fb = NoFeedback(CONTROL_DIM=2, STATE_DIM=4)
    st = fb.init_feedback_state(10)
    u = fb.k(jnp.ones(4), jnp.zeros(4), 3, st)
    np.testing.assert_allclose(u, 0.0)


def test_interpolate_feedback():
    dyn = DoubleIntegratorDynamics.create()
    fb = DDPFeedback.create(dyn, 0.05)
    goal = jnp.zeros((10, 4))
    fb_state = fb.compute_feedback(jnp.zeros(4), goal, jnp.zeros((10, 2)))
    x = jnp.array([1.0, 0.0, 0.0, 0.0])
    u_mid = fb.interpolate_feedback(x, fb_state, 0.5 * 0.05, 0.05, goal)
    u0 = fb.k(x, goal[0], 0, fb_state)
    u1 = fb.k(x, goal[1], 1, fb_state)
    np.testing.assert_allclose(u_mid, 0.5 * (u0 + u1), atol=1e-5)
