"""Multi-device sharding tests on the virtual 8-device CPU mesh —
the analog of the reference's mock-the-boundary strategy (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution
from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller


def make_controller(**kw):
    defaults = dict(
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
    )
    defaults.update(kw)
    return VanillaMPPI(**defaults)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("kernel", ["combined", "pallas"])
def test_sharded_solve_matches_unsharded(kernel):
    """XLA and shard_mapped-Pallas solves both match their unsharded
    twins — per-shard kernel launches + cross-shard reductions reproduce
    the single-chip math (reference reduction contract,
    core/mppi_common.cu:710-765)."""
    ctrl = make_controller(kernel=kernel)
    mesh = make_sample_mesh()
    sharded = shard_controller(ctrl, mesh)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    r_plain, _ = ctrl.solve(x0, cs)
    r_shard, _ = sharded.solve(x0, cs)
    np.testing.assert_allclose(
        r_plain.control_mean, r_shard.control_mean, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(r_plain.baseline, r_shard.baseline, rtol=1e-5)
    np.testing.assert_allclose(r_plain.normalizer, r_shard.normalizer, rtol=1e-4)


def test_sharded_costs_actually_sharded():
    ctrl = make_controller(return_samples=True)
    mesh = make_sample_mesh()
    sharded = shard_controller(ctrl, mesh)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = sharded.init_state(jax.random.PRNGKey(0))
    res, _ = sharded.solve(x0, cs)
    shard_devs = {s.device for s in res.sampled_controls.addressable_shards}
    assert len(shard_devs) == 8


def test_indivisible_rollouts_raises():
    ctrl = make_controller(num_rollouts=100)
    mesh = make_sample_mesh()
    with pytest.raises(ValueError):
        shard_controller(ctrl, mesh)


def test_tube_sharded_solve():
    """Tube-MPPI's dual-system solve under sample-axis sharding — the
    collectives ride through both system solves."""
    from mppi_generic_tpu.controllers import TubeMPPI
    from mppi_generic_tpu.feedback import DDPFeedback

    dyn = DoubleIntegratorDynamics.create()
    ctrl = TubeMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
        nominal_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    mesh = make_sample_mesh(num_devices=8)
    sharded = shard_controller(ctrl, mesh)
    cs = sharded.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res_s, _ = jax.jit(sharded.solve)(x0, cs)
    res_u, _ = jax.jit(ctrl.solve)(x0, cs)
    np.testing.assert_allclose(
        np.asarray(res_s.real.control_mean), np.asarray(res_u.real.control_mean),
        rtol=1e-4, atol=1e-5,
    )


def test_sharded_pallas_costs_actually_sharded():
    """The shard_mapped fused kernel's outputs really live on 8 devices
    (one per-shard kernel launch each), not gathered to one."""
    ctrl = make_controller(kernel="pallas", return_samples=True)
    mesh = make_sample_mesh()
    sharded = shard_controller(ctrl, mesh)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, _ = sharded.solve(x0, sharded.init_state(jax.random.PRNGKey(0)))
    shard_devs = {s.device for s in res.sampled_controls.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_pallas_per_sample_x0():
    """shard_map path with (K, S) per-sample initial states (the RMPPI
    candidate-eval pattern) shards x0 alongside U."""
    from mppi_generic_tpu.ops import pallas_rollout

    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    mesh = make_sample_mesh()
    from mppi_generic_tpu.parallel import sample_sharding

    K, T, C = 256, 16, 2
    key = jax.random.PRNGKey(3)
    U = jax.random.normal(key, (K, T, C))
    x0s = jax.random.normal(jax.random.PRNGKey(4), (K, 4))
    ref_c, ref_cr = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0s, U, jnp.float32(0.02)
    )
    sh_c, sh_cr = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0s, U, jnp.float32(0.02),
        sharding=sample_sharding(mesh),
    )
    np.testing.assert_allclose(np.asarray(sh_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sh_cr), np.asarray(ref_cr))


def test_tube_sharded_pallas_solve():
    """Tube-MPPI's stacked dual-system solve through the shard_mapped
    fused kernel matches the unsharded Pallas solve."""
    from mppi_generic_tpu.controllers import TubeMPPI
    from mppi_generic_tpu.feedback import DDPFeedback

    dyn = DoubleIntegratorDynamics.create()
    tube = TubeMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
        nominal_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        kernel="pallas",
    )
    mesh = make_sample_mesh()
    sharded = shard_controller(tube, mesh)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    ts = tube.init_state(jax.random.PRNGKey(1))
    res_s, _ = jax.jit(sharded.solve)(x0, ts)
    res_u, _ = jax.jit(tube.solve)(x0, ts)
    np.testing.assert_allclose(
        np.asarray(res_s.real.control_mean),
        np.asarray(res_u.real.control_mean), rtol=1e-4, atol=1e-5,
    )


def test_robust_sharded_pallas_solve():
    """RMPPI's fused augmented rollout (feedback-in-loop) and fused
    candidate eval under shard_map match the unsharded Pallas solve."""
    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.feedback import DDPFeedback

    dyn = DoubleIntegratorDynamics.create()
    ctrl = RobustMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
        num_candidates=9,
        samples_per_condition=32,
        value_function_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        kernel="pallas",
    )
    mesh = make_sample_mesh()
    sharded = shard_controller(ctrl, mesh)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    cs_s, _ = jax.jit(sharded.update_importance_sampling)(x0, cs, 1)
    cs_u, _ = jax.jit(ctrl.update_importance_sampling)(x0, cs, 1)
    res_s, _ = jax.jit(sharded.solve)(x0, cs_s)
    res_u, _ = jax.jit(ctrl.solve)(x0, cs_u)
    np.testing.assert_allclose(
        np.asarray(res_s.real.control_mean),
        np.asarray(res_u.real.control_mean), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_s.nominal.control_mean),
        np.asarray(res_u.nominal.control_mean), rtol=1e-4, atol=1e-5,
    )


def test_robust_sharded_solve():
    """RMPPI under sample-axis sharding: both the candidate eval and the
    augmented rollout shard."""
    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.feedback import DDPFeedback

    dyn = DoubleIntegratorDynamics.create()
    ctrl = RobustMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
        num_candidates=9,
        samples_per_condition=32,
        value_function_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    mesh = make_sample_mesh(num_devices=8)
    sharded = shard_controller(ctrl, mesh)
    cs = sharded.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs, _ = jax.jit(sharded.update_importance_sampling)(x0, cs, 1)
    res_s, _ = jax.jit(sharded.solve)(x0, cs)
    assert np.all(np.isfinite(np.asarray(res_s.real.control_mean)))
    assert np.all(np.isfinite(np.asarray(res_s.nominal.control_mean)))


def test_sharded_pallas_ddp_ladder_replicated():
    """On a mesh the DDP synthesis keeps its fused Pallas ladder kernel by
    running it in a fully-replicated shard_map region (every device
    computes the same gains); parity vs the unsharded XLA ladder."""
    import mppi_generic_tpu.feedback.ilqr as ilqr_mod
    from mppi_generic_tpu.controllers import TubeMPPI
    from mppi_generic_tpu.feedback import DDPFeedback

    dyn = DoubleIntegratorDynamics.create()
    tube = TubeMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
        nominal_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02, use_pallas=True),
    )
    mesh = make_sample_mesh()
    sharded = shard_controller(tube, mesh)
    assert sharded.feedback.mesh is mesh
    assert sharded.feedback.use_pallas
    cs = tube.init_state(jax.random.PRNGKey(1))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    old = ilqr_mod._LADDER_INTERPRET
    ilqr_mod._LADDER_INTERPRET = True  # the kernel itself, off-TPU
    try:
        r_sh, _ = jax.jit(sharded.solve)(x0, cs)
    finally:
        ilqr_mod._LADDER_INTERPRET = old
    ref = tube.replace(feedback=tube.feedback.replace(use_pallas=False))
    r_ref, _ = jax.jit(ref.solve)(x0, cs)
    np.testing.assert_allclose(
        np.asarray(r_sh.real.control_mean),
        np.asarray(r_ref.real.control_mean), rtol=1e-3, atol=1e-4,
    )


def test_flash_combine_matches_global_softmax():
    """The sharded fused-solve epilogue's cross-chip merge
    (ops/pallas_solve.flash_combine: pmax + two rescaled psums) must
    reproduce the GLOBAL normExp-weighted mean exactly from per-shard
    online-softmax carries. The kernel producing the carries is TPU-only,
    so this runs the actual collective lines on the CPU mesh with carries
    built the way the kernel builds them (flash-attention convention:
    m = max s, d = sum exp(s - m), num = sum exp(s - m) * U)."""
    from jax.sharding import PartitionSpec as P

    from mppi_generic_tpu.ops.pallas_solve import flash_combine

    n, K_loc, T, C = 8, 64, 5, 2
    lam = 1.3
    rng = np.random.RandomState(0)
    J = rng.uniform(0.5, 40.0, size=(n, K_loc)).astype(np.float32)
    U = rng.randn(n, K_loc, T, C).astype(np.float32)

    # per-shard carries exactly as the kernel accumulates them
    s = -J / lam
    m_sh = s.max(axis=1)                                   # (n,)
    e = np.exp(s - m_sh[:, None])                          # (n, K_loc)
    d_sh = e.sum(axis=1)                                   # (n,)
    num_sh = np.einsum("nk,nktc->ntc", e, U)               # (n, T, C)

    mesh = make_sample_mesh(n)
    out = jax.jit(jax.shard_map(
        lambda m, d, num: flash_combine(m[0], d[0], num[0], "samples"),
        mesh=mesh,
        in_specs=(P("samples"), P("samples"), P("samples")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))(jnp.asarray(m_sh), jnp.asarray(d_sh), jnp.asarray(num_sh))
    m_g, d_g, num_g = (np.asarray(o) for o in out)

    # oracle: plain global softmax over all n*K_loc samples
    w = np.exp((s - s.max()).reshape(-1))
    mean_ref = np.einsum("k,ktc->tc", w / w.sum(),
                         U.reshape(-1, T, C))
    np.testing.assert_allclose(m_g, s.max(), rtol=0, atol=0)
    np.testing.assert_allclose(num_g / d_g, mean_ref, rtol=1e-5, atol=1e-6)
    # baseline and eta come from the same carries
    np.testing.assert_allclose(-lam * m_g, J.min(), rtol=1e-6)
    np.testing.assert_allclose(
        d_g, np.exp(-(J.reshape(-1) - J.min()) / lam).sum(), rtol=1e-5
    )


def test_sharded_fused_weighted_rollout():
    """fused_weighted_rollout under shard_map: 8 per-shard kernels + the
    flash_combine pmax/psum merge reproduce the unsharded in-kernel
    weights/mean epilogue (and the XLA oracle) exactly."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout
    from mppi_generic_tpu.parallel import sample_sharding

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    K, T, C = 512, 16, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)
    U = mean[None] + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (K, T, C))
    lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                 lam, alpha, (1.0 - samp.pure_noise_percentage) * K)

    ref = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, lr_params=lr_params,
        tile_k=128,
    )
    mesh = make_sample_mesh()
    sh = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, lr_params=lr_params,
        tile_k=128, sharding=sample_sharding(mesh),
    )
    for r, s, tol in zip(ref, sh, (1e-6, 0, 1e-5, 1e-6, 1e-5)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=tol, atol=tol)
    # against the XLA epilogue too
    bl = weight_ops.baseline_cost(ref[0])
    w = weight_ops.norm_exp_weights(ref[0], lam, bl)
    mean_ref, _ = samp.update_mean(U, None, w, weight_ops.normalizer(w), mean)
    np.testing.assert_allclose(np.asarray(sh[2]), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)


def test_sharded_fused_weighted_rollout_tsallis():
    """The round-5 two-LAUNCH sharded Tsallis epilogue: per-shard rollout
    launch -> pmin (the exact global rho) -> per-shard Tsallis reduction
    launch -> psum. Must match the single-chip two-pass in-kernel epilogue
    (up to psum reassociation) and the XLA Tsallis oracle."""
    from mppi_generic_tpu.ops import weights as weight_ops
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout
    from mppi_generic_tpu.parallel import sample_sharding

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    K, T, C = 512, 16, 2
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)
    gamma, r_t = jnp.float32(10.0), jnp.float32(2.0)
    U = mean[None] + 0.5 * jax.random.normal(jax.random.PRNGKey(4), (K, T, C))
    lr_params = (mean, samp._sigma(T, 0), samp.control_cost_coeff,
                 lam, alpha, (1.0 - samp.pure_noise_percentage) * K)

    ref = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, lr_params=lr_params,
        tile_k=128, weight_kind="tsallis", weight_params=(gamma, r_t),
    )
    mesh = make_sample_mesh()
    sh = fused_weighted_rollout(
        dyn, cost, x0, U, jnp.float32(0.02), lam, lr_params=lr_params,
        tile_k=128, weight_kind="tsallis", weight_params=(gamma, r_t),
        sharding=sample_sharding(mesh),
    )
    # (costs, crash, mean, rho, eta)
    for r, s, tol in zip(ref, sh, (1e-6, 0, 1e-5, 1e-6, 1e-4)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=tol, atol=tol)
    # against the XLA Tsallis oracle too
    bl = weight_ops.baseline_cost(ref[0])
    w = weight_ops.tsallis_weights(ref[0], gamma, r_t, bl)
    mean_ref, _ = samp.update_mean(U, None, w, weight_ops.normalizer(w),
                                   mean)
    np.testing.assert_allclose(np.asarray(sh[2]), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)
