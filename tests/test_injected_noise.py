"""Algorithmic CPU parity tests for the HW-PRNG fused kernels via
injected noise (VERDICT r4 task 4).

The fused sample+rollout kernels (`fused_sample_rollout_costs`,
`fused_solve_iteration`) draw their Gaussian noise from the TPU hardware
PRNG, so the default CI previously exercised only their refusal paths and
the suite winner's MATH was verified only in the hardware tier. With
``injected_noise`` the pre-drawn standard normals replace the in-kernel
draw one-for-one and the kernel runs in Pallas interpret mode, so
everything downstream of the draw — carve-outs, constraint clamp,
likelihood ratio, rollout, cost/crash accumulation, and the flash
(online-softmax) weight epilogue — parity-checks here against the XLA
oracle. This is the reference's own test pattern: its rollout kernel
tests inject known noise and compare against CPU-computed expectations
(rollout_kernel_tests.cu:211-213). The remaining hardware-only coverage
is PRNG statistics (scripts/tpu_selfcheck.py::check_hw_prng_statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.ops.pallas_rollout import fused_sample_rollout_costs
from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration
from mppi_generic_tpu.ops.rollout import (
    rollout_outputs,
    trajectory_state_costs,
)
from mppi_generic_tpu.sampling import (
    GaussianDistribution,
    NLNDistribution,
    SmoothMPPIDistribution,
)

K, T, C = 256, 10, 2
DT, LAM, ALPHA, STRIDE = 0.02, 1.2, 0.1, 2


def _dyn():
    return DoubleIntegratorDynamics.create(
        control_ranges=[[-0.9, 0.9], [-0.8, 0.8]]
    )


def _clamp(dyn, U):
    """enforce_constraints over (K, T, C) (the base API is channel-
    leading)."""
    return jnp.moveaxis(
        dyn.enforce_constraints(None, jnp.moveaxis(U, -1, 0)), 0, -1
    )


def _oracle_costs(dyn, cost, sampler, x0, U, mean):
    """XLA oracle for the fused kernels' cost contract: state costs +
    likelihood-ratio term, both normalized by T."""
    Y = rollout_outputs(dyn, x0, U, DT)
    costs, crash = trajectory_state_costs(cost, Y, U, sequential_crash=True)
    lr = sampler.likelihood_ratio_cost(U, mean, LAM, ALPHA)
    return costs + lr / T, crash


def _mean():
    t = jnp.arange(T, dtype=jnp.float32)[:, None]
    return 0.3 * jnp.sin(jnp.stack([t[:, 0], 2 * t[:, 0]], axis=-1))


def test_injected_gaussian_sample_rollout_matches_oracle():
    dyn = _dyn()
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[0.7, 0.4], pure_noise_percentage=0.25
    )
    x0 = jnp.array([1.5, 0.0, 0.0, 0.5])
    mean = _mean()
    Z = jax.random.normal(jax.random.PRNGKey(3), (K, T, C))
    costs, crash, U, aux = fused_sample_rollout_costs(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=STRIDE, tile_k=128, injected_noise=Z,
    )
    # oracle: the sampler's own carve-outs + the dynamics clamp
    U_ref = _clamp(dyn, samp._apply_carveouts(Z, mean, K, 0, STRIDE))
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-6)
    ref_costs, ref_crash = _oracle_costs(dyn, cost, samp, x0, U_ref, mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    assert aux is None
    # the carve-outs actually hit: sample 0 pinned to the mean, the pure
    # tail has no mean added
    np.testing.assert_allclose(np.asarray(U[0]),
                               np.asarray(_clamp(dyn, mean[None])[0]),
                               rtol=1e-6, atol=1e-6)


def test_injected_nln_sample_rollout_matches_oracle():
    dyn = _dyn()
    cost = DoubleIntegratorCircleCost()
    samp = NLNDistribution.create(
        std_dev=[0.5, 0.3], pure_noise_percentage=0.125
    )
    x0 = jnp.array([1.0, 0.2, -0.3, 0.5])
    mean = _mean()
    kz = jax.random.split(jax.random.PRNGKey(11))
    Z = jnp.stack([jax.random.normal(k, (K, T, C)) for k in kz])
    costs, crash, U, _ = fused_sample_rollout_costs(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=1, tile_k=128, injected_noise=Z,
    )
    # NLN oracle: eps = z1 * exp(std_dev * z2) (createNLNNoise,
    # nln.cu:12-24), then the inherited Gaussian carve-outs
    eps = Z[0] * jnp.exp(samp.std_dev * Z[1])
    U_ref = _clamp(dyn, samp._apply_carveouts(eps, mean, K, 0, 1))
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-6)
    ref_costs, ref_crash = _oracle_costs(dyn, cost, samp, x0, U_ref, mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))


def test_injected_smooth_epilogue_matches_oracle():
    """Smooth-MPPI with the in-kernel W flash epilogue: weights over J,
    weighted mean over the UNCLAMPED derivative noise W
    (smooth-MPPI.cu:203-236)."""
    dyn = _dyn()
    cost = DoubleIntegratorCircleCost()
    samp = SmoothMPPIDistribution.create(
        std_dev=[0.6, 0.6], num_timesteps=T, dt=0.05,
        pure_noise_percentage=0.25,
    )
    x0 = jnp.array([1.5, 0.0, 0.0, 0.5])
    mean = _mean()
    deriv_mean = 0.1 * jnp.ones((T, C), jnp.float32)
    Z = jax.random.normal(jax.random.PRNGKey(5), (K, T, C))
    costs, crash, U, new_dmean, baseline, eta = fused_sample_rollout_costs(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=STRIDE, tile_k=128,
        sampler_state=deriv_mean, epilogue=True, injected_noise=Z,
    )
    W_ref = samp._apply_carveouts(Z, deriv_mean, K, 0, STRIDE)
    U_ref = _clamp(dyn, mean[None] + W_ref * samp.dt_smooth)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-6)
    ref_costs, _ = _oracle_costs(dyn, cost, samp, x0, U_ref, mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-5, atol=1e-5)
    ref_baseline = jnp.min(ref_costs)
    w = jnp.exp(-(ref_costs - ref_baseline) / LAM)
    np.testing.assert_allclose(float(baseline), float(ref_baseline),
                               rtol=1e-5)
    # eta sums ~K weights in tile order vs jnp.sum's tree order
    np.testing.assert_allclose(float(eta), float(jnp.sum(w)), rtol=1e-4)
    ref_dmean = jnp.einsum("k,ktc->tc", w, W_ref) / jnp.sum(w)
    np.testing.assert_allclose(np.asarray(new_dmean), np.asarray(ref_dmean),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("noise_kind", ["gaussian", "nln"])
@pytest.mark.parametrize("split_cost", [False, None])
def test_injected_solve_iteration_matches_oracle(noise_kind, split_cost):
    """The fully-fused solve iteration (time-vectorized generation + flash
    weighted-mean epilogue) against the XLA oracle."""
    dyn = _dyn()
    cost = DoubleIntegratorCircleCost()
    if noise_kind == "nln":
        samp = NLNDistribution.create(
            std_dev=[0.5, 0.3], pure_noise_percentage=0.125
        )
        kz = jax.random.split(jax.random.PRNGKey(7))
        Z = jnp.stack([jax.random.normal(k, (K, T, C)) for k in kz])
        eps = Z[0] * jnp.exp(samp.std_dev * Z[1])
    else:
        samp = GaussianDistribution.create(
            std_dev=[0.7, 0.4], pure_noise_percentage=0.25
        )
        Z = jax.random.normal(jax.random.PRNGKey(9), (K, T, C))
        eps = Z
    x0 = jnp.array([1.5, 0.0, 0.0, 0.5])
    mean = _mean()
    costs, crash, new_mean, baseline, eta, U = fused_solve_iteration(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=STRIDE, tile_k=128, return_samples=True,
        injected_noise=Z, split_cost=split_cost,
    )
    U_ref = _clamp(dyn, samp._apply_carveouts(eps, mean, K, 0, STRIDE))
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-6)
    ref_costs, ref_crash = _oracle_costs(dyn, cost, samp, x0, U_ref, mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    ref_baseline = jnp.min(ref_costs)
    w = jnp.exp(-(ref_costs - ref_baseline) / LAM)
    np.testing.assert_allclose(float(baseline), float(ref_baseline),
                               rtol=1e-5, atol=1e-6)
    # eta sums ~K weights in tile order vs jnp.sum's tree order
    np.testing.assert_allclose(float(eta), float(jnp.sum(w)), rtol=1e-4)
    ref_mean = jnp.einsum("k,ktc->tc", w, U_ref) / jnp.sum(w)
    np.testing.assert_allclose(np.asarray(new_mean), np.asarray(ref_mean),
                               rtol=1e-4, atol=1e-5)


def test_injected_solve_iteration_sharded_matches_single_chip():
    """8-device CPU mesh: the sharded fused solve (per-shard kernels +
    flash_combine) must reproduce the single-chip injected result exactly
    — same noise, so any deviation is a sharding bug (global carve-out
    indices, carry merging)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    dyn = _dyn()
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[0.7, 0.4], pure_noise_percentage=0.25
    )
    x0 = jnp.array([1.5, 0.0, 0.0, 0.5])
    mean = _mean()
    Z = jax.random.normal(jax.random.PRNGKey(13), (K, T, C))
    single = fused_solve_iteration(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=STRIDE, tile_k=128,
        return_samples=True, injected_noise=Z,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("k",))
    sharding = NamedSharding(mesh, P("k"))
    sharded = fused_solve_iteration(
        dyn, cost, samp, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        optimization_stride=STRIDE, tile_k=128,
        return_samples=True, injected_noise=Z, sharding=sharding,
    )
    for a, b, tol in zip(single, sharded, (1e-6, 0, 1e-5, 1e-6, 1e-5, 1e-6)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol)
