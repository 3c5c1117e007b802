"""Pallas fused rollout kernel parity + auto-tuner tests.

Mirrors the reference's kernel-parity strategy (GPU kernel vs CPU oracle
across a sweep of block dims, tests/mppi_core/rollout_kernel_tests.cu):
here the oracle is the XLA combined scan and the sweep is over sample tile
sizes. On the CPU test backend the kernel runs in Pallas interpret mode;
the compiled path is exercised on real TPU by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import CartpoleQuadraticCost, DoubleIntegratorCircleCost
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics
from mppi_generic_tpu.ops import (
    PallasIncompatible,
    choose_appropriate_kernel,
    fused_rollout_costs,
    rollout_combined,
)
from mppi_generic_tpu.sampling import GaussianDistribution


def _cases():
    return [
        (
            DoubleIntegratorDynamics.create(),
            DoubleIntegratorCircleCost(),
            jnp.array([2.0, 0.0, 0.0, 1.0]),
        ),
        (
            CartpoleDynamics.create(),
            CartpoleQuadraticCost(),
            jnp.array([0.1, 0.0, 0.2, 0.0]),
        ),
    ]


@pytest.mark.parametrize("tile_k", [128, 256, 512])
@pytest.mark.parametrize("K", [256, 300, 1024])
def test_fused_rollout_matches_xla_combined(tile_k, K):
    """Tile-size sweep (the reference's block-dim sweep) incl. ragged K
    needing padding."""
    for dyn, cost, x0 in _cases():
        T, C = 40, dyn.CONTROL_DIM
        U = jax.random.normal(jax.random.PRNGKey(1), (K, T, C)) * 0.5
        dt = jnp.float32(0.02)
        c_ref, _, crash_ref = rollout_combined(dyn, cost, x0, U, dt)
        c_p, crash_p = fused_rollout_costs(dyn, cost, x0, U, dt, tile_k=tile_k)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(crash_p), np.asarray(crash_ref))


def _make_controller(kernel):
    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=32,
        num_rollouts=256,
        num_iters=1,
        kernel=kernel,
    )


def test_full_solve_parity_pallas_vs_combined():
    """End-to-end solve (same RNG key) must produce identical control means
    whichever rollout path is used."""
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    ref = _make_controller("combined")
    pal = _make_controller("pallas")
    cs = ref.init_state(jax.random.PRNGKey(0))
    r_ref, _ = jax.jit(ref.solve)(x0, cs)
    r_pal, _ = jax.jit(pal.solve)(x0, cs)
    np.testing.assert_allclose(
        np.asarray(r_pal.control_mean), np.asarray(r_ref.control_mean),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(r_pal.baseline), float(r_ref.baseline), rtol=1e-5
    )


def test_oversized_recurrent_state_rejected():
    """Small 1-D recurrent leaves (LSTM hidden/cell) are supported in the
    kernel; anything bigger must fall back (the shared-mem-overflow analog)."""

    class FakeBigRecurrent(DoubleIntegratorDynamics):
        def init_recurrent_state(self):
            return jnp.zeros((4, 4))  # 2-D rec leaf: not hostable

    dyn = FakeBigRecurrent.create()
    with pytest.raises(PallasIncompatible):
        fused_rollout_costs(
            dyn, DoubleIntegratorCircleCost(),
            jnp.zeros(4), jnp.zeros((128, 8, 2)), 0.02,
        )


def test_choose_appropriate_kernel_smoke():
    ctrl = _make_controller("combined")
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    tuned = choose_appropriate_kernel(ctrl, x0, num_evaluations=2)
    assert tuned.kernel in ("combined", "split", "pallas")
    # cached second call must be instant and identical
    tuned2 = choose_appropriate_kernel(ctrl, x0, num_evaluations=2)
    assert tuned2.kernel == tuned.kernel


def test_fnn_model_on_pallas_path():
    """NN-dynamics models lower into the fused kernel via forward_axis0
    (component-first matmuls; no lane-transposing moveaxis)."""
    from mppi_generic_tpu.costs import QuadraticCost
    from mppi_generic_tpu.models import AutorallyNNDynamics

    dyn = AutorallyNNDynamics.create(key=jax.random.PRNGKey(0))
    cost = QuadraticCost.create(goal=jnp.zeros(7), output_dim=7)
    K, T = 256, 24
    x0 = jnp.zeros(7).at[4].set(3.0)
    U = jax.random.normal(jax.random.PRNGKey(1), (K, T, 2)) * 0.3
    dt = jnp.float32(0.02)
    c_ref, _, _ = rollout_combined(dyn, cost, x0, U, dt)
    c_p, _ = fused_rollout_costs(dyn, cost, x0, U, dt, tile_k=128)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_rmppi_rollout_matches_xla():
    """Augmented real+nominal rollout with feedback-in-loop: Pallas kernel vs
    the controller's XLA scan (rmppi_kernels.cu analog)."""
    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.ops.pallas_rollout import fused_rmppi_rollout

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    sampler = GaussianDistribution.create(
        std_dev=[1.0, 0.8], control_cost_coeff=[0.02, 0.01]
    )
    fb = DDPFeedback.create(dyn, 0.02)
    K, T = 192, 24
    ctrl = RobustMPPI(
        dynamics=dyn, cost=cost, sampler=sampler,
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, feedback=fb,
    )
    x_nom = jnp.array([2.0, 0.0, 0.0, 1.0])
    x_real = jnp.array([2.2, -0.1, 0.1, 0.9])
    goal = jnp.tile(x_nom, (T, 1))
    fb_state = fb.compute_feedback(x_real, goal, jnp.zeros((T, 2)))
    U = jax.random.normal(jax.random.PRNGKey(2), (K, T, 2)) * 0.7
    U = ctrl._clamp_controls(U)

    s_nom_r, j_real_r, s_fb_r, _, _, Ur_r, crash_r = ctrl._augmented_rollout(
        x_nom, x_real, U, fb_state
    )
    s_nom_p, j_real_p, s_fb_p, crash_p, Ur_p = fused_rmppi_rollout(
        dyn, cost, x_nom, x_real, U, fb_state.gains,
        sampler._sigma(T, 0), sampler.control_cost_coeff,
        jnp.float32(0.02), 1.0, 0.0, tile_k=128,
    )
    np.testing.assert_allclose(np.asarray(s_nom_p), np.asarray(s_nom_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_real_p), np.asarray(j_real_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fb_p), np.asarray(s_fb_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ur_p), np.asarray(Ur_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(crash_p), np.asarray(crash_r))


def test_fused_rollout_per_sample_x0():
    """Per-sample initial states (the RMPPI candidate-eval pattern)."""
    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    K, T = 256, 20
    U = jax.random.normal(jax.random.PRNGKey(3), (K, T, 2)) * 0.5
    x0s = jax.random.normal(jax.random.PRNGKey(4), (K, 4))
    dt = jnp.float32(0.02)
    c_ref, _, crash_ref = rollout_combined(dyn, cost, x0s, U, dt)
    c_p, crash_p = fused_rollout_costs(dyn, cost, x0s, U, dt, tile_k=128)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(crash_p), np.asarray(crash_ref))


def test_lstm_recurrent_model_on_pallas_path():
    """Recurrent (LSTM-in-rollout) dynamics carry hidden/cell state through
    the kernel's horizon loop (the reference keeps them in kernel shared
    memory, lstm_helper.cuh:130-133)."""
    from mppi_generic_tpu.costs import QuadraticCost
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMSteering

    dyn = RacerDubinsElevationLSTMSteering.create()
    cost = QuadraticCost.create(goal=jnp.zeros(13), output_dim=13)
    K, T = 256, 20
    x0 = jnp.zeros(9).at[0].set(3.0)
    U = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (K, T, 2)) * 0.3,
                 -1, 1)
    dt = jnp.float32(0.02)
    c_ref, _, _ = rollout_combined(dyn, cost, x0, U, dt)
    c_p, _ = fused_rollout_costs(dyn, cost, x0, U, dt, tile_k=128)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=2e-4, atol=1e-5)


def test_fused_rollout_in_kernel_lr():
    """lr_params accumulates the Gaussian likelihood-ratio cost inside the
    kernel: equals the XLA LR pass added outside (gaussian.cu:481-568)."""
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    K, T, C = 256, 24, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    U = mean[None] + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (K, T, C))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)

    base, crash0 = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    lr = samp.likelihood_ratio_cost(U, mean, lam, alpha)
    fused, crash1 = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02),
        lr_params=(mean, samp._sigma(T, 0), samp.control_cost_coeff,
                   lam, alpha, (1.0 - samp.pure_noise_percentage) * K),
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base + lr / T), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(crash0), np.asarray(crash1))


def test_fused_rollout_bf16_state_option():
    """state_dtype="bfloat16" (dynamics in bf16, cost in f32) stays within
    a few percent of the f32 kernel on the double integrator — the
    measured-and-documented option from the BASELINE.md bf16 study (not a
    default; see the study for why)."""
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    K, T = 256, 32
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    U = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (K, T, 2))
    c32, cr32 = fused_rollout_costs(dyn, cost, x0, U, jnp.float32(0.02))
    c16, cr16 = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02), state_dtype="bfloat16"
    )
    rel = np.abs(np.asarray(c16) - np.asarray(c32)) / (
        np.abs(np.asarray(c32)) + 1e-6
    )
    # median-robust only: ~10% of samples straddle the crash boundary and
    # legitimately flip in bf16, blowing up their relative error — exactly
    # the measured behavior that keeps f32 the default (BASELINE.md study)
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.all(np.isfinite(np.asarray(c16)))


def test_long_horizon_vmem_tables():
    """Horizons whose (T, C) parameter tables exceed the ~13 KB SMEM
    scalar-memory budget switch to the sublane-stacked (T, R8, LANES) VMEM
    table layout instead of losing the fused kernel: at T=1024 the
    in-kernel-LR path still runs and matches the XLA LR decomposition
    (the reference's per-timestep parameter reads, core/mppi_common.cu:
    98-137, have no horizon ceiling; now neither does this kernel)."""
    from mppi_generic_tpu.ops.pallas_rollout import _table_mode
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    K, T = 128, 1024
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    U = mean[None] + 0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                             (K, T, 2))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)

    assert _table_mode((T, 2), (T, 2)) == "vmem"

    # table-free fused rollout: fine at long T (interpret mode here)
    base, crash0 = fused_rollout_costs(dyn, cost, x0, U, jnp.float32(0.02))
    assert np.all(np.isfinite(np.asarray(base)))

    # in-kernel LR via the stacked VMEM table == XLA LR added outside
    lr = samp.likelihood_ratio_cost(U, mean, lam, alpha)
    fused, crash1 = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02),
        lr_params=(mean, samp._sigma(T, 0), samp.control_cost_coeff,
                   lam, alpha, (1.0 - samp.pure_noise_percentage) * K),
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base + lr / T), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(crash0), np.asarray(crash1))

    # the controller's in-kernel-LR branch keeps the fused kernel too
    ctrl = VanillaMPPI(
        dynamics=dyn, cost=cost,
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel="pallas",
    )
    cs = ctrl.init_state(jax.random.PRNGKey(1))
    res, _ = ctrl.solve(x0, cs)
    assert bool(jnp.isfinite(res.baseline))

    # only past the VMEM budget (~4 MB stacked) does the fused path gate
    with pytest.raises(PallasIncompatible):
        _table_mode((20000, 2), (20000, 2))


def test_fused_weighted_rollout_matches_xla_epilogue():
    """fused_weighted_rollout: the in-kernel flash (online-softmax) normExp
    weights + weighted mean equal the XLA epilogue (baseline_cost /
    norm_exp_weights / update_mean) on the same precomputed U — incl. a
    ragged K that exercises the padded-tail valid mask."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    T, C = 24, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)

    for K in (256, 300):  # 300: K_pad=384 > K — padded lanes must not enter
        U = mean[None] + 0.5 * jax.random.normal(
            jax.random.PRNGKey(3), (K, T, C)
        )
        lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                     lam, alpha, (1.0 - samp.pure_noise_percentage) * K)
        costs, crash, new_mean, baseline, eta = fused_weighted_rollout(
            dyn, cost, x0, U, jnp.float32(0.02), lam,
            lr_params=lr_params, tile_k=128,
        )
        # XLA oracle on the same costs
        c_ref, crash_ref = fused_rollout_costs(
            dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params,
            tile_k=128,
        )
        np.testing.assert_allclose(np.asarray(costs), np.asarray(c_ref),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(crash),
                                      np.asarray(crash_ref))
        bl_ref = weight_ops.baseline_cost(c_ref)
        w_ref = weight_ops.norm_exp_weights(c_ref, lam, bl_ref)
        eta_ref = weight_ops.normalizer(w_ref)
        mean_ref, _ = samp.update_mean(U, None, w_ref, eta_ref, mean)
        np.testing.assert_allclose(float(baseline), float(bl_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(eta), float(eta_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_mean),
                                   np.asarray(mean_ref),
                                   rtol=1e-5, atol=1e-6)


def test_fused_weighted_rollout_no_lr():
    """lr_params=None: pure state-cost weighting still matches XLA."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout

    dyn, cost, x0 = _cases()[0]
    K, T, C = 256, 16, 2
    U = 0.4 * jax.random.normal(jax.random.PRNGKey(5), (K, T, C))
    lam = jnp.float32(0.8)
    costs, crash, new_mean, baseline, eta = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, tile_k=128,
    )
    c_ref, _, _ = rollout_combined(dyn, cost, x0, U, jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(costs), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-6)
    bl = weight_ops.baseline_cost(c_ref)
    w = weight_ops.norm_exp_weights(c_ref, lam, bl)
    np.testing.assert_allclose(float(eta), float(weight_ops.normalizer(w)),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_mean),
        np.asarray(jnp.sum((w / jnp.sum(w))[:, None, None] * U, axis=0)),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_weighted_rollout_long_horizon_vmem_tables():
    # NOTE: mean parity at T=1024 uses atol=2e-5 — f32 flash-rescaled tile
    # accumulation vs XLA's single-pass sum differ in summation order
    """The flash epilogue composes with the sublane-stacked VMEM parameter
    tables: T past the ~13 KB SMEM scalar budget keeps BOTH the in-kernel
    LR and the in-kernel weights/mean."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import (
        _table_mode,
        fused_weighted_rollout,
    )
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
    )
    K, T, C = 128, 1024, 2
    assert _table_mode((T, C), (T, C)) == "vmem"
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    lam = jnp.float32(1.3)
    U = mean[None] + 0.3 * jax.random.normal(jax.random.PRNGKey(0), (K, T, C))
    lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                 lam, jnp.float32(0.2), jnp.float32(K))
    costs, crash, new_mean, baseline, eta = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, lr_params=lr_params,
        tile_k=128,
    )
    c_ref, _ = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params, tile_k=128
    )
    np.testing.assert_allclose(np.asarray(costs), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-7)
    bl = weight_ops.baseline_cost(c_ref)
    w = weight_ops.norm_exp_weights(c_ref, lam, bl)
    np.testing.assert_allclose(float(baseline), float(bl), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_mean),
        np.asarray(jnp.sum((w / jnp.sum(w))[:, None, None] * U, axis=0)),
        rtol=1e-4, atol=2e-5,
    )


def test_map_bearing_cost_on_fused_path_matches_xla():
    """The in-kernel tent-mask map bilinear: a map-bearing AR track cost on
    the fused rollout kernel (interpret mode on CPU; compiled on the TPU
    tier) must match the XLA combined scan — costs to float tolerance,
    crash flags bitwise (boundary crashes come from the map values)."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import BicycleSlipDynamics

    rng = np.random.RandomState(5)
    m = (0.4 * np.abs(rng.randn(48, 48))).astype("f")
    # hot half-plane ahead of the car (world x >= 1, y >= 0): samples that
    # drive straight crash mid-horizon, samples that turn right stay safe
    m[24:, 25:] = 3.0
    tex = MapTexture2D.create(m, origin=(-24, -24, 0), resolution=1.0)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6),
                          boundary_threshold=jnp.float32(1.5))
    K, T, C = 256, 40, dyn.CONTROL_DIM
    x0 = jnp.zeros(dyn.STATE_DIM).at[5].set(3.0)
    U = jax.random.normal(jax.random.PRNGKey(2), (K, T, C)) * 0.4
    dt = jnp.float32(0.02)
    c_ref, _, crash_ref = rollout_combined(dyn, cost, x0, U, dt)
    c_p, crash_p = fused_rollout_costs(dyn, cost, x0, U, dt, tile_k=128)
    assert int(jnp.sum(crash_ref)) > 0
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(crash_p), np.asarray(crash_ref))


def test_map_bearing_elevation_model_on_fused_path_matches_xla():
    """Elevation-map dynamics (terrain settling queries INSIDE the horizon
    loop) through the fused kernel vs the XLA scan."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import RacerDubinsElevationDynamics

    rng = np.random.RandomState(6)
    elev = MapTexture2D.create(
        (0.05 * rng.randn(32, 32)).astype("f"), origin=(-16, -16, 0),
        resolution=1.0,
    )
    dyn = RacerDubinsElevationDynamics.create(elevation_map=elev)
    cost = ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1))
    K, T, C = 256, 20, dyn.CONTROL_DIM
    x0 = jnp.zeros(dyn.STATE_DIM).at[0].set(3.0)
    U = jax.random.normal(jax.random.PRNGKey(3), (K, T, C)) * 0.4
    dt = jnp.float32(0.02)
    c_ref, _, crash_ref = rollout_combined(dyn, cost, x0, U, dt)
    c_p, crash_p = fused_rollout_costs(dyn, cost, x0, U, dt, tile_k=128)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(crash_p), np.asarray(crash_ref))


def test_autotune_disk_cache_skips_sweep(tmp_path, monkeypatch):
    """Auto-tune decisions persist on disk: a fresh process (simulated by
    clearing the in-memory caches) must skip the timing sweep entirely and
    reuse the stored (kernel, tile, split); retune=True forces a fresh
    sweep (VERDICT r3 item 7)."""
    from mppi_generic_tpu.ops import autotune

    monkeypatch.setenv("MPPI_TUNE_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("MPPI_RETUNE", raising=False)
    monkeypatch.setattr(autotune, "_DISK_LOADED", False)
    monkeypatch.setattr(autotune, "_DISK", {})
    monkeypatch.setattr(autotune, "_CACHE", {})

    calls = {"n": 0}
    real_time_solve = autotune.time_solve

    def counting_time_solve(ctrl, x0, cs, n=10):
        calls["n"] += 1
        # deterministic fake timings: prefer "split" so the decision is
        # recognizable; no real compilation needed
        return {"combined": 2.0, "split": 1.0, "pallas": 3.0,
                "pallas_fused": 4.0}.get(ctrl.kernel, 5.0) * 1e-3

    monkeypatch.setattr(autotune, "time_solve", counting_time_solve)

    ctrl = _make_controller("combined")
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    tuned = autotune.choose_appropriate_kernel(ctrl, x0)
    assert calls["n"] > 0
    assert tuned.kernel == "split"
    assert (tmp_path / "autotune.json").exists()

    # "new process": in-memory caches gone, disk remains
    monkeypatch.setattr(autotune, "_DISK_LOADED", False)
    monkeypatch.setattr(autotune, "_DISK", {})
    monkeypatch.setattr(autotune, "_CACHE", {})
    calls["n"] = 0
    tuned2 = autotune.choose_appropriate_kernel(ctrl, x0)
    assert calls["n"] == 0, "disk hit must skip the sweep"
    assert tuned2.kernel == "split"
    assert tuned2.pallas_tile_k == tuned.pallas_tile_k
    assert tuned2.pallas_split_cost == tuned.pallas_split_cost

    # escape hatch: retune re-measures and overwrites
    calls["n"] = 0
    tuned3 = autotune.choose_appropriate_kernel(ctrl, x0, retune=True)
    assert calls["n"] > 0
    assert tuned3.kernel == "split"
    del real_time_solve


def test_fused_weighted_rollout_tsallis_matches_xla():
    """weight_kind="tsallis": the two-pass in-kernel epilogue (pass 1
    rollout + running min, pass 2 rollout-free tile revisit with Tsallis
    weights) equals the XLA epilogue (tsallis_weights + update_mean) —
    incl. a ragged K exercising the padded-tail mask and a gamma small
    enough that some weights clamp to exactly 0 (TsallisTransform,
    mppi_common.cu:958-985)."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    T, C = 24, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)
    gamma, r = jnp.float32(0.12), jnp.float32(2.4)

    for K in (256, 300):
        U = mean[None] + 0.5 * jax.random.normal(
            jax.random.PRNGKey(3), (K, T, C)
        )
        lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                     lam, alpha, (1.0 - samp.pure_noise_percentage) * K)
        costs, crash, new_mean, baseline, eta = fused_weighted_rollout(
            dyn, cost, x0, U, jnp.float32(0.02), lam,
            lr_params=lr_params, tile_k=128,
            weight_kind="tsallis", weight_params=(gamma, r),
        )
        c_ref, crash_ref = fused_rollout_costs(
            dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params,
            tile_k=128,
        )
        np.testing.assert_allclose(np.asarray(costs), np.asarray(c_ref),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(crash),
                                      np.asarray(crash_ref))
        bl_ref = weight_ops.baseline_cost(c_ref)
        w_ref = weight_ops.tsallis_weights(c_ref, gamma, r, bl_ref)
        assert float(jnp.min(w_ref)) == 0.0  # the clamp branch is exercised
        eta_ref = weight_ops.normalizer(w_ref)
        mean_ref, _ = samp.update_mean(U, None, w_ref, eta_ref, mean)
        np.testing.assert_allclose(float(baseline), float(bl_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(eta), float(eta_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_mean),
                                   np.asarray(mean_ref),
                                   rtol=1e-5, atol=1e-6)


def test_fused_weighted_rollout_tsallis_sharded_refuses():
    """Sharded Tsallis must raise PallasIncompatible (per-shard partial
    sums against per-shard minima cannot be merged exactly) so controllers
    fall back to the XLA weight pass."""
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the virtual multi-device CPU mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()[:2]), ("samples",))
    sh = NamedSharding(mesh, PartitionSpec("samples"))
    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    U = 0.4 * jax.random.normal(jax.random.PRNGKey(5), (256, 16, 2))
    import pytest
    with pytest.raises(PallasIncompatible):
        fused_weighted_rollout(
            dyn, cost, jnp.array([2.0, 0.0, 0.0, 1.0]), U,
            jnp.float32(0.02), jnp.float32(1.0), sharding=sh,
            weight_kind="tsallis", weight_params=(2.5, 2.0),
        )


def test_vanilla_tsallis_colored_pallas_matches_combined():
    """End-to-end: a ColoredMPPI-style solve (colored noise + Tsallis
    weighting, colored_mppi_controller.cu:206) on kernel="pallas" — which
    routes through the two-pass Tsallis fused epilogue — produces the same
    solution as the XLA combined path."""
    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.sampling import ColoredNoiseDistribution

    def build(kernel):
        return VanillaMPPI(
            dynamics=DoubleIntegratorDynamics.create(),
            cost=DoubleIntegratorCircleCost(),
            sampler=ColoredNoiseDistribution.create(
                std_dev=[1.0, 0.8], exponents=[1.0, 2.0],
                control_cost_coeff=[0.02, 0.01],
            ),
            dt=jnp.float32(0.02), lam=jnp.float32(1.0),
            alpha=jnp.float32(0.0), num_timesteps=16, num_rollouts=256,
            num_iters=2, kernel=kernel,
            weight_transform="tsallis",
            tsallis_gamma=jnp.float32(5.0), tsallis_r=jnp.float32(2.0),
        )

    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(11)
    res_p, _ = build("pallas").solve(x0, build("pallas").init_state(key))
    res_c, _ = build("combined").solve(x0, build("combined").init_state(key))
    np.testing.assert_allclose(np.asarray(res_p.costs),
                               np.asarray(res_c.costs), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_p.control_mean),
                               np.asarray(res_c.control_mean),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(res_p.baseline), float(res_c.baseline),
                               rtol=1e-5)


def test_streamed_tables_match_resident(monkeypatch):
    """table_mode="stream" (HBM-resident stacked LR table, double-buffered
    DMA chunks): forced via a tiny resident-VMEM budget, the streamed
    kernel must match the resident-table kernel bit-for-bit on the same U
    (VERDICT r3 task 8 — horizon stops being a fused-kernel boundary)."""
    import mppi_generic_tpu.ops.pallas_rollout as pr
    from mppi_generic_tpu.ops.pallas_rollout import fused_rollout_costs
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.2,
    )
    K, T, C = 256, 40, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    U = mean[None] + 0.5 * jax.random.normal(jax.random.PRNGKey(3),
                                             (K, T, C))
    lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                 1.3, 0.2, 0.8 * K)
    c_ref, crash_ref = fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params,
        tile_k=128,
    )
    # shrink the budget so T=40 tables overflow -> stream. Chunk 8: five
    # exact chunks (the double-buffered prefetch crosses 4 boundaries).
    # Chunk 16: a RAGGED tail — chunks 16/16/8 with 8 padded table rows,
    # exercising the dynamic n_steps tail bound and the host-side pad.
    monkeypatch.setattr(pr, "_MAX_SMEM_TABLE_BYTES", 0)
    monkeypatch.setattr(pr, "_MAX_VMEM_TABLE_BYTES", 0)
    for chunk in (8, 16):
        monkeypatch.setattr(pr, "_STREAM_CHUNK_T", chunk)
        c_s, crash_s = fused_rollout_costs(
            dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params,
            tile_k=128,
        )
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_ref),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"chunk={chunk}")
        np.testing.assert_array_equal(np.asarray(crash_s),
                                      np.asarray(crash_ref))
    # an explicitly forced split must keep its raise semantics rather
    # than silently downgrading to the streamed combined loop
    import pytest

    with pytest.raises(PallasIncompatible):
        fused_rollout_costs(
            dyn, cost, x0, U, jnp.float32(0.02), lr_params=lr_params,
            tile_k=128, split_cost=True,
        )
