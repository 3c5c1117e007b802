"""Tests for the suspension-family models: RacerSuspension (full rigid-body
4-wheel suspension), RacerDubinsElevationSuspension, and
RacerDubinsElevationLSTMUncertainty (learned process noise)."""

import jax
import jax.numpy as jnp
import numpy as np

import mppi_generic_tpu.models.base as mb
from mppi_generic_tpu.models import (
    RacerDubinsElevationLSTMUncertainty,
    RacerDubinsElevationSuspension,
    RacerSuspensionDynamics,
)
from mppi_generic_tpu.models.racer_dubins_unc import (
    propagate_uncertainty,
    unc_matrix_to_state,
    unc_state_to_matrix,
)


# ------------------------------------------------------------ racer suspension
def test_racer_suspension_equilibrium():
    dyn = RacerSuspensionDynamics.create()
    x0 = dyn.get_zero_state()
    xdot = dyn.state_deriv(x0, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(xdot), 0.0, atol=1e-4)


def test_racer_suspension_rollout_moves_forward():
    dyn = RacerSuspensionDynamics.create()
    x0 = dyn.get_zero_state()
    U = jnp.tile(jnp.array([0.3, 0.0]), (50, 1))
    states, outs = mb.rollout_single(dyn, x0, U, 0.02)
    assert bool(jnp.all(jnp.isfinite(states)))
    assert float(states[-1][0]) > 0.1  # moved forward
    # quaternion stays normalized through the whole rollout
    norms = jnp.linalg.norm(states[:, 3:7], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)
    assert outs.shape == (50, 26)


def test_racer_suspension_ackermann_steering_turns():
    dyn = RacerSuspensionDynamics.create()
    x0 = dyn.get_zero_state().at[7].set(3.0)  # 3 m/s forward
    U = jnp.tile(jnp.array([0.3, 1.0]), (100, 1))
    states, _ = mb.rollout_single(dyn, x0, U, 0.02)
    # steering command (scaled by -2.45) must produce lateral motion
    assert abs(float(states[-1][1])) > 0.05


# --------------------------------------------------- uncertainty pack/propagate
def test_uncertainty_matrix_roundtrip():
    s10 = jnp.arange(10.0) + 1.0
    S = unc_state_to_matrix(s10)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S.T))
    np.testing.assert_allclose(np.asarray(unc_matrix_to_state(S)),
                               np.asarray(s10))


def test_uncertainty_propagation_discretization():
    """Zero A: Sigma' = Sigma + Q dt exactly."""
    s10 = jnp.zeros(10)
    out = propagate_uncertainty(s10, jnp.zeros((4, 4)), jnp.eye(4), 0.1)
    np.testing.assert_allclose(np.asarray(out[:4]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[4:]), 0.0, atol=1e-7)


def test_uncertainty_propagation_jacobian_mixing():
    """A with dx/dv coupling turns vel variance into position variance."""
    s10 = jnp.zeros(10).at[3].set(1.0)  # Var[vel_x] = 1
    A = jnp.zeros((4, 4)).at[2, 0].set(1.0)  # pos_x row, vel_x col
    out = propagate_uncertainty(s10, A, jnp.zeros((4, 4)), 0.1)
    assert float(out[0]) > 0  # Var[pos_x] grew
    assert float(out[6]) != 0  # Cov[pos_x, vel_x] appeared


# ----------------------------------------------------- elevation susp. models
def test_elevation_suspension_step_shapes_and_growth():
    dyn = RacerDubinsElevationSuspension.create()
    assert dyn.STATE_DIM == 23 and dyn.OUTPUT_DIM == 27
    x0 = dyn.get_zero_state()
    U = jnp.tile(jnp.array([0.5, 0.2]), (40, 1))
    states, outs = mb.rollout_single(dyn, x0, U, 0.02)
    assert bool(jnp.all(jnp.isfinite(states)))
    assert outs.shape == (40, 27)
    # uncertainty diag entries are nonnegative and grow while driving
    unc_diag = states[:, 13:17]
    assert bool(jnp.all(unc_diag >= -1e-6))
    assert float(jnp.sum(unc_diag[-1])) > float(jnp.sum(unc_diag[1]))


def test_lstm_uncertainty_model():
    dyn = RacerDubinsElevationLSTMUncertainty.create()
    assert dyn.STATE_DIM == 26
    x0 = dyn.get_zero_state()
    rec = dyn.init_recurrent_state()
    assert len(rec) == 6  # steer + mean + uncertainty (h, c) each
    U = jnp.tile(jnp.array([0.5, 0.2]), (40, 1))
    states, outs = mb.rollout_single(dyn, x0, U, 0.02)
    assert bool(jnp.all(jnp.isfinite(states)))
    # omega_z mirrors the yaw rate sign while steering
    assert abs(float(states[-1][23])) > 0
    # uncertainty LSTM keeps Q positive -> diag grows
    assert float(states[-1][16]) > 0  # Var[vel_x]


def test_models_vmap_parity():
    """Batched (vmap) step must equal the single-sample step — the rollout
    path contract."""
    for cls in (RacerDubinsElevationSuspension,
                RacerDubinsElevationLSTMUncertainty):
        dyn = cls.create()
        x0 = dyn.get_zero_state()
        rec = dyn.init_recurrent_state()
        us = jnp.array([[0.5, 0.2], [-0.3, -0.6], [0.0, 1.0]])
        single = jnp.stack([
            dyn.step_recurrent(x0, rec, u, 0.0, 0.02)[0] for u in us
        ])
        batched = jax.vmap(
            lambda u: dyn.step_recurrent(x0, rec, u, 0.0, 0.02)[0]
        )(us)
        np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                                   rtol=1e-5, atol=1e-6)


def test_lstm_unc_fused_kernel_parity_interpret():
    """The 26-state LSTM-uncertainty model (3 recurrent nets + covariance
    block) lowers into the fused Pallas rollout kernel — interpret-mode
    parity vs the XLA combined scan (compiled parity runs in the TPU tier).
    The component-first rewrites that admit it: unrolled 4x4 uncertainty
    propagation (no multi-batch einsum) and per-component sigmoid scaling."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMUncertainty
    from mppi_generic_tpu.ops import pallas_rollout, rollout as rollout_ops

    dyn = RacerDubinsElevationLSTMUncertainty.create()
    cost = ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1))
    K, T = 32, 8
    x0 = dyn.get_zero_state().at[0].set(3.0)
    U = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (K, T, 2))
    c_ref, _, cr_ref = rollout_ops.rollout_combined(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    c_p, cr_p = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cr_p), np.asarray(cr_ref))


def test_suspension_fused_kernel_parity_interpret():
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.models import RacerDubinsElevationSuspension
    from mppi_generic_tpu.ops import pallas_rollout, rollout as rollout_ops

    dyn = RacerDubinsElevationSuspension.create()
    cost = ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1))
    K, T = 32, 8
    x0 = dyn.get_zero_state().at[0].set(3.0)
    U = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (K, T, 2))
    c_ref, _, _ = rollout_ops.rollout_combined(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    c_p, _ = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_racer_suspension_fused_kernel_parity_interpret():
    """The 14-state quaternion rigid-body suspension model lowers into the
    fused kernel (atan2/asin polynomial approximations replaced the exact
    trig, which has no Mosaic lowering)."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.ops import pallas_rollout, rollout as rollout_ops

    dyn = RacerSuspensionDynamics.create()
    cost = ARStandardCost(output_indices=(0, 1, 5, 6, 3, 4))
    K, T = 32, 8
    x0 = dyn.get_zero_state()
    U = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (K, T, 2))
    c_ref, _, _ = rollout_ops.rollout_combined(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    c_p, _ = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
