"""Cross-validate the analytic per-config rooflines against hardware
profiler traces (round-5 VERDICT task 8).

bench.suite_roofline's unit-busy times are hand-counted work models; a
drifted op count or peak constant would silently mislabel a row's binding
resource. This probe, for one row per tier (DI = issue-latency, autorally
= MXU, racer-elevation = MXU):

1. measures the per-solve device time by the two-length scan slope (the
   number the roofline divides by);
2. captures a jax.profiler trace of the same closed-loop program and sums
   the XLA-op device durations -> trace us/solve, plus the fused kernel
   op's own duration;
3. recomputes the model's per-unit busy times (suite_roofline fracs x the
   measured time) and reports model-vs-trace ratios:
   - slope_vs_trace: the slope methodology against the profiler ground
     truth (expected ~1.0 +- 10%);
   - model_bound_vs_kernel: the model's binding-unit busy time against
     the kernel op's traced duration — for MXU-bound rows this is the
     roofline fraction re-derived from the trace; for issue-latency rows
     it must sit well below 1 (that IS the diagnosis).

Results are recorded in BASELINE.md ("Roofline cross-validation").

Usage (TPU): timeout 1800 python scripts/roofline_crosscheck.py
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import ARStandardCost
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models import (
    AutorallyNNDynamics,
    RacerDubinsElevationLSTMSteering,
)
from mppi_generic_tpu.sampling import GaussianDistribution

S_TRACE = 60


def configs():
    yield ("di_K8192", bench.build_controller(K=8192, T=100,
                                              kernel="pallas_fused"),
           jnp.array([2.0, 0.0, 0.0, 1.0]), 8192)
    rng = np.random.default_rng(0)
    tex = MapTexture2D.create(
        np.abs(rng.normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0)
    elev = MapTexture2D.create(
        (0.1 * rng.normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0)
    common = dict(dt=jnp.float32(0.02), lam=jnp.float32(1.0),
                  alpha=jnp.float32(0.0), num_iters=1,
                  kernel="pallas_fused")
    yield ("autorally_nn_K1920_T150", VanillaMPPI(
        dynamics=AutorallyNNDynamics.create(key=jax.random.PRNGKey(0)),
        cost=ARStandardCost(costmap=tex),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=150, num_rollouts=1920, **common,
    ), jnp.zeros(7).at[4].set(3.0), 1920)
    yield ("racer_lstm_steering_elevation_K1920", VanillaMPPI(
        dynamics=RacerDubinsElevationLSTMSteering.create(elevation_map=elev),
        cost=ARStandardCost(costmap=tex, output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(9).at[0].set(3.0), 1920)


def _trace_us_per_solve(ctrl, x0, outdir):
    """(total XLA-op device us/solve, fused-kernel-op us/solve)."""
    cs = ctrl.init_state(jax.random.key(0, impl="rbg"))

    def body(carry, _):
        x, cs = carry
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        x, _ = ctrl.dynamics.step(x, res.control_mean[0], 0.0, ctrl.dt)
        return (x, cs), res.baseline

    loop = jax.jit(lambda x, cs: jax.lax.scan(body, (x, cs), None,
                                              length=S_TRACE))
    out = loop(x0, cs)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # warm
    with jax.profiler.trace(outdir):
        out = loop(x0, cs)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(sorted(files)[-1])
    module_ns = 0
    kernel_ns = 0
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                # the module event's span IS the program's device time
                # (measured: it equals the merged-interval union of the
                # op events exactly; the raw op-duration SUM double-counts
                # nested fusion parents ~2x and must not be used)
                module_ns += sum(e.duration_ns for e in line.events)
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                nm = e.name.lower()
                if "custom-call" in nm or "fused_solve" in nm or \
                        "mosaic" in nm or "tpu_custom_call" in nm:
                    kernel_ns += e.duration_ns
    return module_ns / S_TRACE / 1e3, kernel_ns / S_TRACE / 1e3


def main():
    for name, ctrl, x0, K in configs():
        slope_ms = bench._steady_state_ms(ctrl, x0)
        tot_us, kern_us = _trace_us_per_solve(
            ctrl, x0, f"/tmp/roofline_trace_{name}")
        roof = bench.suite_roofline(ctrl, K, ctrl.num_timesteps, slope_ms)
        # re-derive the model's per-unit busy times (us) from the fracs
        busys = {k[4:]: v * slope_ms * 1e3
                 for k, v in roof.items() if k.startswith("mfu_")}
        bound_unit = max(busys, key=busys.get)
        row = {
            "config": name,
            "slope_us_per_solve": round(slope_ms * 1e3, 2),
            "trace_module_us_per_solve": round(tot_us, 2),
            "trace_kernel_us_per_solve": round(kern_us, 2),
            "slope_vs_module": round(slope_ms * 1e3 / tot_us, 3)
            if tot_us else None,
            "model_unit_busy_us": {k: round(v, 2) for k, v in busys.items()},
            "binding_unit": bound_unit,
            "model_bound_vs_kernel": round(busys[bound_unit] / kern_us, 3)
            if kern_us else None,
            "declared_bound": roof["binding_resource"].split(" ")[0],
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    main()
