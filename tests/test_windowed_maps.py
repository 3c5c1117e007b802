"""CPU (interpret-mode) parity tests for the HBM-windowed in-kernel map
query (round-5 VERDICT tasks 1-2).

Maps larger than the resident-VMEM crossover (256 texels/side, measured —
scripts/map_size_sweep.py) and channel-major multichannel maps route
through ``maps.texture._WindowedMapData``: the map stays HBM-resident
(padded, memory_space=ANY), a (win_h, win_w) VMEM window is DMA'd lazily
and re-fetched when a query call's coordinate bounding box escapes it, and
the tent-mask bilinear runs inside the window. These tests drive the full
kernel plumbing (leaf routing, scratch, origin cache) in Pallas interpret
mode against the XLA oracle — the reference's arbitrary-size texture
behavior (texture_helper.cuh:12-127) checked at realistic map scale
without hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.costs import ARStandardCost
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models import (
    BicycleSlipDynamics,
    RacerDubinsDynamics,
)
from mppi_generic_tpu.ops.pallas_rollout import (
    PallasIncompatible,
    fused_rmppi_rollout,
    fused_rollout_costs,
    fused_sample_rollout_costs,
)
from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration
from mppi_generic_tpu.ops.rollout import (
    rollout_outputs,
    trajectory_state_costs,
)
from mppi_generic_tpu.sampling import GaussianDistribution

DT, LAM, ALPHA = 0.02, 1.0, 0.0
BIKE_IDX = (0, 1, 2, 8, 5, 6)  # bicycle-slip output layout for the AR cost


def _tex(side=1024, seed=0, **kw):
    rng = np.random.default_rng(seed)
    return MapTexture2D.create(
        np.abs(rng.normal(size=(side, side))).astype("f") * 0.01,
        origin=(-side // 2, -side // 2, 0), resolution=1.0, **kw,
    )


def _oracle(dyn, cost, x0, U, sampler=None, mean=None):
    Y = rollout_outputs(dyn, x0, U, DT)
    costs, crash = trajectory_state_costs(cost, Y, U, sequential_crash=True)
    if sampler is not None:
        T = U.shape[1]
        costs = costs + sampler.likelihood_ratio_cost(U, mean, LAM,
                                                      ALPHA) / T
    return costs, crash


# --------------------------------------------------------------------------
# routing policy
# --------------------------------------------------------------------------


def test_pallas_window_policy():
    # small single-channel: VMEM-resident (below the measured crossover)
    assert _tex(128).pallas_window() is None
    assert _tex(256).pallas_window() is None
    # above the crossover: windowed with the 256 auto policy
    assert _tex(512).pallas_window() == (256, 256)
    assert _tex(1024).pallas_window() == (256, 256)
    # explicit override
    assert _tex(1024, window_texels=512).pallas_window() == (512, 512)
    # window clamps to the (aligned) map extent
    assert _tex(300, window_texels=512).pallas_window() == (304, 384)
    # channel-major multichannel: windowed at ANY size (no resident form)
    t4 = MapTexture2D.create(np.zeros((4, 128, 128), "f"),
                             channel_major=True)
    assert t4.pallas_window() == (128, 128)
    # trailing-channel multichannel: XLA-only (plain leaf, kernels refuse)
    t3 = MapTexture2D.create(np.zeros((128, 128, 4), "f"))
    assert t3.pallas_window() is None


# --------------------------------------------------------------------------
# precomputed-U kernel (fused_rollout_costs)
# --------------------------------------------------------------------------


def test_windowed_1024_map_matches_xla():
    rng = np.random.default_rng(1)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=_tex(1024), output_indices=BIKE_IDX)
    K, T, C = 256, 50, 2
    U = jnp.asarray(0.3 * rng.normal(size=(K, T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    cj, crj = fused_rollout_costs(dyn, cost, x0, U, DT, tile_k=128,
                                  interpret=True)
    co, cro = _oracle(dyn, cost, x0, U)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crj), np.asarray(cro))


def test_windowed_nonconforming_shape_pads():
    """A 1000x900 map (H % 8 != 0, W % 128 != 0) edge-pads for the DMA
    alignment and still matches the XLA oracle on the LOGICAL extent."""
    rng = np.random.default_rng(2)
    tex = MapTexture2D.create(
        np.abs(rng.normal(size=(1000, 900))).astype("f") * 0.01,
        origin=(-500, -450, 0), resolution=1.0,
    )
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=BIKE_IDX)
    K, T, C = 128, 40, 2
    U = jnp.asarray(0.3 * rng.normal(size=(K, T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    cj, crj = fused_rollout_costs(dyn, cost, x0, U, DT, tile_k=128,
                                  interpret=True)
    co, cro = _oracle(dyn, cost, x0, U)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crj), np.asarray(cro))


def test_windowed_refetch_across_drift():
    """A fast vehicle on a fine-resolution map crosses several window
    refresh boundaries within one horizon (>> 128 texels of drift): the
    in-loop origin-cache re-fetch must keep exact parity."""
    rng = np.random.default_rng(3)
    tex = MapTexture2D.create(
        np.abs(rng.normal(size=(2048, 2048))).astype("f") * 0.01,
        origin=(-102.4, -102.4, 0), resolution=0.1,  # 10 texels per meter
    )
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=BIKE_IDX)
    K, T, C = 128, 60, 2
    U = jnp.asarray(0.2 * rng.normal(size=(K, T, C)), jnp.float32)
    # vx = 8 m/s: 60 steps * 0.02 s * 8 m/s = 9.6 m = 96 texels of forward
    # drift + sample divergence — multiple x-origin refreshes at win 256
    x0 = jnp.zeros(10).at[3].set(8.0)
    cj, crj = fused_rollout_costs(dyn, cost, x0, U, DT, tile_k=128,
                                  interpret=True)
    co, cro = _oracle(dyn, cost, x0, U)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crj), np.asarray(cro))


def test_window_overflow_clamps_and_override_fixes_it():
    """The documented degradation boundary: a per-call query cluster wider
    than (window - alignment slack) CLAMPS to the window edge — and the
    ``window_texels`` override restores exactness."""
    rng = np.random.default_rng(4)
    side = 1024
    data = np.abs(rng.normal(size=(side, side))).astype("f")
    # per-sample initial positions spread ~300 texels: wider than the
    # 256-window's guaranteed x coverage (~126), inside the 512-window's
    K, T, C = 256, 10, 2
    x0s = np.zeros((K, 10), "f")
    x0s[:, 0] = rng.uniform(-150, 150, size=K)  # world x == texel offset
    x0s[:, 1] = rng.uniform(-40, 40, size=K)
    x0s[:, 3] = 2.0
    x0s = jnp.asarray(x0s)
    U = jnp.asarray(0.2 * rng.normal(size=(K, T, C)), jnp.float32)

    def run(tex):
        dyn = BicycleSlipDynamics.create()
        cost = ARStandardCost(costmap=tex, output_indices=BIKE_IDX)
        cj, _ = fused_rollout_costs(dyn, cost, x0s, U, DT, tile_k=256,
                                    interpret=True)
        co, _ = _oracle(dyn, cost, x0s, U)
        # relative to the cost magnitude (the unscaled map makes costs
        # O(1e4); f32-exact parity lands ~2e-7 relative)
        return (np.abs(np.asarray(cj) - np.asarray(co)).max()
                / np.abs(np.asarray(co)).max())

    tex_small = MapTexture2D.create(data, origin=(-side // 2, -side // 2, 0),
                                    resolution=1.0)
    tex_big = MapTexture2D.create(data, origin=(-side // 2, -side // 2, 0),
                                  resolution=1.0, window_texels=512)
    assert run(tex_small) > 0.1   # clamped: visibly wrong (measured ~0.97)
    assert run(tex_big) < 1e-5    # covered: f32-exact (measured ~2e-7)


# --------------------------------------------------------------------------
# multichannel (channel-major float4 layout, channel-0 read)
# --------------------------------------------------------------------------


def _tex4(side=1024, seed=5):
    """The reference's float4 costmap layout (ar_standard_cost.cu:50-56)
    as a channel-major band texture; only channel 0 carries the track."""
    rng = np.random.default_rng(seed)
    chw = rng.normal(size=(4, side, side)).astype("f")
    chw[0] = np.abs(chw[0]) * 0.01
    return MapTexture2D.create(
        chw, origin=(-side // 2, -side // 2, 0), resolution=1.0,
        channel_major=True,
    )


def test_windowed_multichannel_channel0_matches_xla():
    rng = np.random.default_rng(6)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=_tex4(), output_indices=BIKE_IDX)
    K, T, C = 256, 40, 2
    U = jnp.asarray(0.3 * rng.normal(size=(K, T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    cj, crj = fused_rollout_costs(dyn, cost, x0, U, DT, tile_k=128,
                                  interpret=True)
    co, cro = _oracle(dyn, cost, x0, U)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crj), np.asarray(cro))


def test_channel_major_xla_queries_match_trailing_layout():
    """The two multichannel layouts compute identical XLA-path values."""
    rng = np.random.default_rng(7)
    chw = rng.normal(size=(3, 64, 96)).astype("f")
    t_cm = MapTexture2D.create(chw, channel_major=True, resolution=0.5)
    t_tr = MapTexture2D.create(np.moveaxis(chw, 0, -1), resolution=0.5)
    u = jnp.asarray(rng.uniform(-0.1, 1.1, size=(37,)), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.1, 1.1, size=(37,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(t_cm.query_tex(u, v)), np.asarray(t_tr.query_tex(u, v)),
        rtol=1e-6, atol=1e-6,
    )
    for ch in range(3):
        np.testing.assert_allclose(
            np.asarray(t_cm.query_tex_channel(u, v, ch)),
            np.asarray(t_tr.query_tex_channel(u, v, ch)),
            rtol=1e-6, atol=1e-6,
        )


# --------------------------------------------------------------------------
# the sampling / solve / RMPPI kernels (injected noise, interpret mode)
# --------------------------------------------------------------------------


def test_windowed_fused_solve_iteration_matches_oracle():
    rng = np.random.default_rng(8)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=_tex(1024, seed=8),
                          output_indices=BIKE_IDX)
    sampler = GaussianDistribution.create(std_dev=[0.3, 0.5])
    K, T, C = 256, 48, 2
    mean = jnp.asarray(0.1 * rng.normal(size=(T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    z = jnp.asarray(rng.normal(size=(K, T, C)), jnp.float32)
    costs, crash, new_mean, baseline, eta, U = fused_solve_iteration(
        dyn, cost, sampler, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        tile_k=128, return_samples=True, injected_noise=z,
    )
    co, cro = _oracle(dyn, cost, x0, U, sampler=sampler, mean=mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(cro))
    w = np.exp(-(np.asarray(co) - np.asarray(co).min()) / LAM)
    ref_mean = (w[:, None, None] * np.asarray(U)).sum(0) / w.sum()
    np.testing.assert_allclose(np.asarray(new_mean), ref_mean,
                               rtol=1e-4, atol=1e-5)
    assert abs(float(baseline) - float(np.asarray(co).min())) < 1e-5


def test_windowed_fused_solve_sharded_matches_single_chip():
    """8-device CPU mesh: the windowed map replicates; per-shard kernels +
    flash_combine must agree with the single-chip solve exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(9)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=_tex(1024, seed=9),
                          output_indices=BIKE_IDX)
    sampler = GaussianDistribution.create(std_dev=[0.3, 0.5])
    K, T, C = 256, 24, 2
    mean = jnp.asarray(0.1 * rng.normal(size=(T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    z = jnp.asarray(rng.normal(size=(K, T, C)), jnp.float32)
    single = fused_solve_iteration(
        dyn, cost, sampler, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        tile_k=128, injected_noise=z,
    )
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("samples",))
    sharded = fused_solve_iteration(
        dyn, cost, sampler, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        tile_k=128, injected_noise=z,
        sharding=NamedSharding(mesh, P("samples")),
    )
    for a, b, tol in zip(single[:5], sharded[:5],
                         (1e-6, 0, 1e-6, 1e-6, 1e-4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol)


def test_windowed_fused_sample_rollout_matches_oracle():
    rng = np.random.default_rng(10)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=_tex(1024, seed=10),
                          output_indices=BIKE_IDX)
    sampler = GaussianDistribution.create(std_dev=[0.3, 0.5])
    K, T, C = 256, 24, 2
    mean = jnp.asarray(0.1 * rng.normal(size=(T, C)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    z = jnp.asarray(rng.normal(size=(K, T, C)), jnp.float32)
    costs, crash, U, _aux = fused_sample_rollout_costs(
        dyn, cost, sampler, x0, mean, jnp.int32(0), DT, LAM, ALPHA, K,
        tile_k=128, injected_noise=z,
    )
    co, cro = _oracle(dyn, cost, x0, U, sampler=sampler, mean=mean)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(co),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(cro))


def test_windowed_rmppi_rollout_matches_oracle():
    """The augmented RMPPI kernel with a windowed 1024^2 track map: the
    nominal/real split, feedback-in-loop and feedback cost all evaluate
    against the XLA double-rollout oracle."""
    rng = np.random.default_rng(11)
    dyn = RacerDubinsDynamics.create()
    cost = ARStandardCost(costmap=_tex(1024, seed=11),
                          output_indices=(2, 3, 5, 6, 0, 1))
    S, C = dyn.STATE_DIM, dyn.CONTROL_DIM
    K, T = 128, 20
    U = jnp.asarray(0.2 * rng.normal(size=(K, T, C)), jnp.float32)
    gains = jnp.asarray(0.05 * rng.normal(size=(T, C, S)), jnp.float32)
    sigma = jnp.asarray([0.3, 0.5], jnp.float32)
    coeff = jnp.asarray([1.0, 1.0], jnp.float32)
    x0_nom = jnp.zeros(S).at[0].set(3.0)
    x0_real = x0_nom.at[1].set(0.05)
    s_nom, j_real, s_fb, crash_r, U_real = fused_rmppi_rollout(
        dyn, cost, x0_nom, x0_real, U, gains, sigma, coeff, DT, LAM, ALPHA,
        tile_k=128, interpret=True,
    )

    # XLA oracle: scan the augmented pair exactly as the kernel does
    def clamp(u):
        return dyn.enforce_constraints(None, u)

    def step_pair(carry, inp):
        xn, xr = carry
        u_raw, g_t = inp  # (K, C), (C, S)
        u_nom = jax.vmap(clamp)(u_raw)
        u_fb = jnp.einsum("cs,ks->kc", g_t, xr - xn)
        u_real = jax.vmap(clamp)(u_raw + u_fb)
        fb_cost = 0.5 * LAM * (1 - ALPHA) * jnp.sum(
            coeff * u_fb ** 2 / sigma ** 2, axis=-1
        )
        t = jnp.float32(0)
        xn2, yn = jax.vmap(lambda x, u: dyn.step(x, u, t, DT))(
            jnp.broadcast_to(xn, (K, S)) if xn.ndim == 1 else xn, u_nom)
        xr2, yr = jax.vmap(lambda x, u: dyn.step(x, u, t, DT))(
            jnp.broadcast_to(xr, (K, S)) if xr.ndim == 1 else xr, u_real)
        return (xn2, xr2), (yn, yr, u_nom, u_real, fb_cost)

    carry = (jnp.broadcast_to(x0_nom, (K, S)),
             jnp.broadcast_to(x0_real, (K, S)))
    (xnf, xrf), (Yn, Yr, Un, Ur, FB) = jax.lax.scan(
        step_pair, carry, (jnp.moveaxis(U, 0, 1), gains))
    Yn = jnp.moveaxis(Yn, 0, 1)  # (K, T, O)
    Yr = jnp.moveaxis(Yr, 0, 1)
    Un = jnp.moveaxis(Un, 0, 1)
    Ur = jnp.moveaxis(Ur, 0, 1)
    ref_snom, _ = trajectory_state_costs(cost, Yn, Un,
                                         sequential_crash=True)
    ref_jreal, ref_crash = trajectory_state_costs(cost, Yr, Ur,
                                                  sequential_crash=True)
    ref_sfb = ref_jreal + jnp.sum(jnp.moveaxis(FB, 0, 1), axis=1) / T
    np.testing.assert_allclose(np.asarray(s_nom), np.asarray(ref_snom),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_real), np.asarray(ref_jreal),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_fb), np.asarray(ref_sfb),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(crash_r),
                                  np.asarray(ref_crash))
    np.testing.assert_allclose(np.asarray(U_real), np.asarray(Ur),
                               rtol=1e-6, atol=1e-6)


def test_trailing_channel_multichannel_still_refuses_in_kernel():
    """The trailing-channel (H, W, CH) layout has no in-kernel form: the
    kernels must refuse loudly (fall back to XLA in the controllers), not
    silently miscompute."""
    rng = np.random.default_rng(12)
    tex = MapTexture2D.create(
        np.abs(rng.normal(size=(512, 512, 4))).astype("f") * 0.01,
        origin=(-256, -256, 0), resolution=1.0,
    )
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=BIKE_IDX)
    U = jnp.asarray(0.3 * rng.normal(size=(64, 10, 2)), jnp.float32)
    x0 = jnp.zeros(10).at[3].set(3.0)
    with pytest.raises(PallasIncompatible):
        fused_rollout_costs(dyn, cost, x0, U, DT, tile_k=128,
                            interpret=True)
