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


def test_shard_controller_disables_pallas_riccati():
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
    sharded = shard_controller(ctrl, make_sample_mesh(num_devices=8))
    assert not sharded.feedback.use_pallas


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
