"""TPU perf-regression gate (VERDICT r3 task 4): chip-day-proof RELATIVE
invariants measured same-session, so a Mosaic/XLA upgrade that silently
halves a kernel's throughput fails CI even though absolute times swing
±40% between chip-days (BASELINE.md caveat). The reference gates the same
way — it times its kernel variants against each other at construction
(mppi_controller.cu:45-143), never against a stored absolute number.

All timings use ops/autotune.time_solve: jitted n-vs-2n solve-chain slope,
so the relay's ~27 ms dispatch cancels and only marginal device time is
compared.

Run: MPPI_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_perf_gate.py
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

_on_tpu = jax.default_backend() == "tpu"


def _di_controller(kernel, K=8192, T=100, tile=None):
    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel=kernel,
        pallas_tile_k=tile,
    )


def _measure(ctrl, key=0):
    from mppi_generic_tpu.ops.autotune import time_solve

    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = ctrl.init_state(jax.random.key(key, impl="rbg"))
    return time_solve(ctrl, x0, cs)


@pytest.fixture(scope="module")
def di_times():
    """One same-session measurement of every DI rollout path (module-scoped:
    the gate's invariants all read the same A/B sweep)."""
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    return {
        k: _measure(_di_controller(k))
        for k in ("combined", "split", "pallas", "pallas_fused")
    }


def test_fused_paths_beat_xla_on_di(di_times):
    """The Pallas paths' whole reason to exist: on the DI headline both must
    clearly beat the XLA scan (measured r3: fused 0.06 ms vs combined ~0.3 —
    a 0.8x gate only trips on a real regression, not chip-day noise)."""
    assert di_times["pallas_fused"] < 0.8 * di_times["combined"], di_times
    assert di_times["pallas"] < 0.8 * di_times["combined"], di_times


def test_split_within_calibrated_band_of_combined(di_times):
    """Split-vs-combined on DI measured 1.05-1.10x in favor of split
    (BASELINE.md); a split slower than 1.4x combined means the split cost
    pass regressed."""
    assert di_times["split"] < 1.4 * di_times["combined"], di_times


def test_autotuner_still_picks_a_fused_path(di_times):
    """The tuner must keep choosing a Pallas kernel for DI K=8192 — if XLA
    starts winning here, either the fused kernels regressed or the sweep is
    mismeasuring (retune=True bypasses both caches)."""
    from mppi_generic_tpu.ops.autotune import choose_appropriate_kernel

    ctrl = _di_controller("combined")
    tuned = choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]), retune=True
    )
    assert tuned.kernel.startswith("pallas"), tuned.kernel


def test_gate_sensitivity_detects_detuned_tile(di_times):
    """Demonstrate the harness actually resolves kernel-level slowdowns: a
    deliberately detuned sample tile (128 -> 64 grid steps at K=8192, each
    paying the per-grid-step latency floor) must measure clearly slower
    than the tuned kernel. If this stops failing-the-detuned-variant, the
    gate itself has gone blind."""
    t_detuned = _measure(_di_controller("pallas_fused", tile=128), key=1)
    assert t_detuned > 1.3 * di_times["pallas_fused"], (
        t_detuned, di_times["pallas_fused"]
    )


# --------------------------------------------------------------------------
# map tier (round-5 widening: the rows most exposed to Mosaic changes had
# no speed guard, and the suite pins were past measurements)
# --------------------------------------------------------------------------


def _bike_map_controller(kernel, side=128, window_texels=0, K=1920, T=100):
    """The bicycle-slip + AR-trackmap suite config at a given map side —
    128^2 rides the VMEM-resident tent-mask, >=512 the HBM-windowed path."""
    import numpy as np

    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import BicycleSlipDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    tex = MapTexture2D.create(
        np.abs(np.random.default_rng(0).normal(
            size=(side, side))).astype("f"),
        origin=(-side * 0.05, -side * 0.05, 0), resolution=0.1,
        window_texels=window_texels,
    )
    return VanillaMPPI(
        dynamics=BicycleSlipDynamics.create(),
        cost=ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel=kernel,
    )


def _measure_map(kernel, side=128, window_texels=0, key=0):
    x0 = jnp.zeros(10)
    ctrl = _bike_map_controller(kernel, side, window_texels)
    from mppi_generic_tpu.ops.autotune import time_solve

    cs = ctrl.init_state(jax.random.key(key, impl="rbg"))
    return time_solve(ctrl, x0, cs)


@pytest.fixture(scope="module")
def map_times():
    """Same-session A/B of the map data plane at both routing tiers:
    128^2 (VMEM-resident tent-mask) and 1024^2 (HBM-windowed)."""
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    return {
        "xla_128": _measure_map("combined", 128),
        "kernel_128": _measure_map("pallas_fused", 128),
        "xla_1024": _measure_map("combined", 1024),
        "kernel_1024": _measure_map("pallas_fused", 1024),
    }


def test_resident_map_kernel_beats_xla(map_times):
    """The 128^2 tier: the in-kernel tent-mask measured 1.4-1.7x the XLA
    paths in round 4; slower than 0.85x XLA means the map kernel (or its
    Mosaic lowering) regressed."""
    assert map_times["kernel_128"] < 0.85 * map_times["xla_128"], map_times


def test_windowed_map_kernel_beats_xla(map_times):
    """The realistic-scale tier: the windowed query measured 8.5-8.6x the
    XLA gather path at 1024^2 (scripts/large_map_probe.py) — a 0.5x gate
    only trips on a real regression."""
    assert map_times["kernel_1024"] < 0.5 * map_times["xla_1024"], map_times


def test_gate_sensitivity_detects_detuned_window(map_times):
    """Injected detuned map kernel (round-5 'done when'): forcing a 512
    window quadruples the tent-mask work per point (2*win^2 FLOPs/point;
    measured 14.1 vs 3.6 ns standalone) on an MXU-bound config — the gate
    must resolve it. If the detuned variant stops measuring slower, the
    map gate has gone blind. (A whole-map 1024 window is NOT used: its
    4 MB scratch + 1024-deep matmul temporaries exhaust VMEM.)"""
    t_detuned = _measure_map("pallas_fused", 1024, window_texels=512,
                             key=1)
    assert t_detuned > 1.5 * map_times["kernel_1024"], (
        t_detuned, map_times["kernel_1024"]
    )


# --------------------------------------------------------------------------
# tube / RMPPI tier (fused in-kernel ladder vs the XLA ladder)
# --------------------------------------------------------------------------


def _corl_controller(cls_name, kernel, K=2560, T=50):
    from mppi_generic_tpu.controllers import RobustMPPI, TubeMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create()
    common = dict(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        dt=jnp.float32(0.02), lam=jnp.float32(2.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K,
        feedback=DDPFeedback.create(dyn, 0.02), kernel=kernel,
    )
    if cls_name == "tube":
        return TubeMPPI(nominal_threshold=jnp.float32(20.0), **common)
    return RobustMPPI(num_candidates=9, samples_per_condition=256,
                      value_function_threshold=jnp.float32(20.0), **common)


def _measure_corl(cls_name, kernel):
    import bench

    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    return bench._steady_state_ms(_corl_controller(cls_name, kernel), x0)


@pytest.fixture(scope="module")
def corl_times():
    """Same-session tube/RMPPI A/B at the reference's own RMPPI scale
    (K=2560, robust_mppi_controller.cuh:58), full per-step pipeline (incl.
    RMPPI candidate eval + fused Riccati DDP synthesis) via
    bench._steady_state_ms."""
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    return {
        ("tube", k): _measure_corl("tube", k)
        for k in ("combined", "pallas")
    } | {
        ("rmppi", k): _measure_corl("rmppi", k)
        for k in ("combined", "pallas")
    }


def test_tube_fused_path_not_slower_than_xla(corl_times):
    """The fused tube pipeline (stacked dual solve + in-kernel Riccati
    ladder) must stay at least at parity with the XLA ladder — 1.15x
    headroom absorbs chip noise; past it the fused path regressed."""
    assert (corl_times[("tube", "pallas")]
            < 1.15 * corl_times[("tube", "combined")]), corl_times


def test_rmppi_fused_path_not_slower_than_xla(corl_times):
    assert (corl_times[("rmppi", "pallas")]
            < 1.15 * corl_times[("rmppi", "combined")]), corl_times
