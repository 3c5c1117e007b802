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
