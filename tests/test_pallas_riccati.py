"""Pallas Riccati backward kernel vs the XLA scan oracle (interpret mode on
CPU; the compiled path is validated on hardware by scripts/tpu_selfcheck.py).
Parity target: the plain-Newton backward pass of ddp/ddp.h:54-170."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics
from mppi_generic_tpu.ops.pallas_riccati import riccati_backward, supported


def _oracle(As, Bs, dLx, dLu, Q, R, Qf, Vx_T, dt):
    S, C = As.shape[1], Bs.shape[2]

    def bwd(carry, inp):
        Vx, Vxx = carry
        A, B, lx, lu = inp
        qx = lx * dt + A.T @ Vx
        qu = lu * dt + B.T @ Vx
        qux = B.T @ Vxx @ A
        qxx = Q * dt + A.T @ Vxx @ A
        quu = R * dt + B.T @ Vxx @ B + 1e-6 * jnp.eye(C)
        Kk = -jnp.linalg.solve(quu, qux)
        kk = -jnp.linalg.solve(quu, qu)
        Vxxn = qxx + qux.T @ Kk
        Vxxn = 0.5 * (Vxxn + Vxxn.T)
        return (qx + qux.T @ kk, Vxxn), (Kk, kk)

    (_, _), (Ks, ks) = jax.lax.scan(
        bwd, (Vx_T, Qf), (As[:-1], Bs[:-1], dLx[:-1], dLu[:-1]), reverse=True
    )
    return (jnp.concatenate([Ks, jnp.zeros((1, C, S))]),
            jnp.concatenate([ks, jnp.zeros((1, C))]))


@pytest.mark.parametrize("S,C,T", [(4, 2, 32), (4, 1, 17), (6, 3, 24)])
def test_riccati_kernel_matches_xla_scan(S, C, T):
    ks = jax.random.split(jax.random.PRNGKey(S * 100 + C), 8)
    As = jnp.eye(S) + 0.05 * jax.random.normal(ks[0], (T, S, S))
    Bs = 0.1 * jax.random.normal(ks[1], (T, S, C))
    dLx = jax.random.normal(ks[2], (T, S))
    dLu = jax.random.normal(ks[3], (T, C))
    Q, R, Qf = jnp.eye(S), jnp.eye(C), 2 * jnp.eye(S)
    Vx_T = jax.random.normal(ks[4], (S,))
    K0, k0 = _oracle(As, Bs, dLx, dLu, Q, R, Qf, Vx_T, 0.02)
    K1, k1 = riccati_backward(As, Bs, dLx, dLu, Q, R, Qf, Vx_T, 0.02,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                               rtol=1e-3, atol=1e-4)


def test_riccati_supported_bounds():
    assert supported(4, 2, 100)
    assert not supported(9, 2, 100)
    assert not supported(4, 5, 100)
    assert not supported(4, 2, 2048)
    with pytest.raises(ValueError):
        riccati_backward(jnp.zeros((2048, 4, 4)), jnp.zeros((2048, 4, 2)),
                         jnp.zeros((2048, 4)), jnp.zeros((2048, 2)),
                         jnp.eye(4), jnp.eye(2), jnp.eye(4), jnp.zeros(4),
                         0.02)


def test_ddp_feedback_falls_back_off_tpu():
    """On the CPU test backend the use_pallas flag must be inert: the XLA
    scan runs and gains match the use_pallas=False path bit-for-bit."""
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    goal = jnp.tile(x0, (16, 1))
    U = jnp.zeros((16, 2))
    g_on = DDPFeedback.create(dyn, 0.02, use_pallas=True).compute_feedback(
        x0, goal, U)
    g_off = DDPFeedback.create(dyn, 0.02, use_pallas=False).compute_feedback(
        x0, goal, U)
    np.testing.assert_array_equal(np.asarray(g_on.gains),
                                  np.asarray(g_off.gains))


def test_shard_controller_keeps_pallas_riccati_via_mesh():
    """shard_controller no longer disables the Pallas DDP path: it sets
    feedback.mesh so the kernel runs inside a replicated shard_map region
    (round 2; the end-to-end sharded parity lives in test_sharding.py)."""
    from mppi_generic_tpu.controllers import TubeMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create()
    ctrl = TubeMPPI(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64,
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    assert ctrl.feedback.use_pallas
    assert ctrl.feedback.mesh is None
    mesh = make_sample_mesh(num_devices=8)
    sharded = shard_controller(ctrl, mesh)
    assert sharded.feedback.use_pallas
    assert sharded.feedback.mesh is mesh


def test_riccati_via_cartpole_sanity():
    """C=1 single-control path through a real dynamics model."""
    dyn = CartpoleDynamics.create(cart_mass=1.0, pole_mass=1.0,
                                  pole_length=1.0)
    fb = DDPFeedback.create(dyn, 0.02)
    x0 = jnp.zeros(4)
    goal = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (20, 1))
    st = fb.compute_feedback(x0, goal, jnp.zeros((20, 1)))
    assert st.gains.shape == (20, 1, 4)
    assert np.all(np.isfinite(np.asarray(st.gains)))
    # driving toward +x from rest: position gain must push positively
    assert float(st.gains[0, 0, 0]) != 0.0


def test_riccati_ladder_solve_matches_xla_iteration():
    """Fused backward+line-search kernel (interpret mode): gains match the
    XLA backward scan and the per-alpha forward trajectories/costs match
    the XLA forward_pass + trajectory_cost (ddp/ddp.h run() semantics)."""
    from mppi_generic_tpu.feedback.ilqr import _alpha_ladder, ilqr_tracking
    from mppi_generic_tpu.ops.pallas_riccati import riccati_ladder_solve

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-2, 2], [-2, 2]])
    S, C, T = 4, 2, 24
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(0)
    goal_x = 0.1 * jax.random.normal(key, (T, S))
    goal_u = jnp.zeros((T, C))
    u_init = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (T, C))
    Q, R, Qf = jnp.eye(S), 0.5 * jnp.eye(C), 3 * jnp.eye(S)
    dt = jnp.float32(0.02)

    ref = ilqr_tracking(dyn, x0, u_init, goal_x, goal_u, Q, R, Qf, dt,
                        use_pallas=False)

    f = lambda x, u: dyn.state_deriv(x, u)
    u_min = dyn.control_ranges[:, 0]
    u_max = dyn.control_ranges[:, 1]
    us0 = jnp.clip(u_init, u_min, u_max)

    def fr(x0, U):
        def step(x, u):
            return x + f(x, jnp.clip(u, u_min, u_max)) * dt, x

        _, xs = jax.lax.scan(step, x0, U)
        return xs

    xs0 = fr(x0, us0)

    def jac(x, u):
        A = jax.jacfwd(lambda s: f(s, u))(x) * dt + jnp.eye(S)
        B = jax.jacfwd(lambda c: f(x, c))(u) * dt
        return A, B

    As, Bs = jax.vmap(jac)(xs0, us0)
    ts = jnp.arange(T)
    dLx = jax.vmap(lambda x, t: Q @ (x - goal_x[t]))(xs0, ts)
    dLu = jax.vmap(lambda u, t: R @ (u - goal_u[t]))(us0, ts)
    Vxx_T = 0.5 * (Qf + Qf.T)
    Vx_T = Qf @ (xs0[-1] - goal_x[-1])

    Ks, ks, cs, xns, uns = riccati_ladder_solve(
        dyn, xs0, us0, As, Bs, dLx, dLu, Q, R, Qf, Vxx_T, Vx_T,
        goal_x, goal_u, _alpha_ladder(), u_min, u_max, dt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(ref.gains),
                               rtol=2e-3, atol=2e-4)
    # iteration 0 always accepts alpha[0] = 1.0 -> the reference trajectory
    np.testing.assert_allclose(np.asarray(xns[0]), np.asarray(ref.x_traj),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(uns[0]), np.asarray(ref.u_traj),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(cs[0]), float(ref.total_cost),
                               rtol=1e-4)
    # smaller alphas blend toward the unshifted reference controls
    assert cs.shape == (_alpha_ladder().shape[0],)
    assert np.all(np.isfinite(np.asarray(cs)))
