"""A/B probe: tent-mask map-bilinear MXU precision, HIGHEST (exact-f32
6-pass emulation) vs HIGH (bf16x3, 3 passes, ~2x MXU rate) on the
map-bearing BASELINE configs.

Context: the in-kernel map query (maps/texture.py::_query_tex_pallas) is
the dominant MXU consumer on the map-bearing configs (bench.py rooflines:
65-72% of the exact-f32 interpolation bound), so halving its pass count is
the highest-leverage remaining knob. Precision budget: bf16x3 carries
~1e-7 relative error on the bilinear weights — about five orders of
magnitude tighter than the interpolation the reference library actually
ships (CUDA texture units quantize the lerp fraction to 9-bit fixed point,
~2e-3; texture_helper.cuh:12-127 relies on that hardware path).

Each (config, precision) cell runs in a SUBPROCESS: the precision is a
trace-time constant read from MPPI_MAP_MXU_PRECISION at import, so two
settings must never share a jit cache. Parity compares the two precisions'
solve outputs directly — same kernel, same PRNG stream, so any difference
is exactly the interpolation error (the fused kernels' in-kernel hardware
PRNG draws a different sample set than the XLA paths, so cross-kernel
control_mean comparison would mostly measure sampling, not precision).

Usage (TPU):  timeout 2400 python scripts/map_precision_probe.py
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CONFIG_KERNELS = {
    # the measured round-4 suite picks (bench.py --suite pins)
    "autorally_nn_K1920_T150": "pallas_fused",
    "bicycle_slip_colored_trackmap": "pallas",
    "racer_lstm_steering_elevation_K1920": "pallas_fused",
    # round-5 realistic-scale rows (HBM-windowed query; 83-85% MXU-bound
    # at HIGHEST, so these have the most to gain from the 3-pass)
    "bicycle_slip_colored_trackmap_1024": "pallas",
    "autorally_nn_float4_track_1024": "pallas_fused",
}


def all_configs():
    from large_map_probe import configs as large_configs
    from map_kernel_probe import configs as small_configs

    yield from small_configs()
    for name, kw, x0 in large_configs():
        if name in CONFIG_KERNELS:
            yield name, kw, x0


def run_cell(config_name, precision, out_npz):
    import jax
    import jax.numpy as jnp  # noqa: F401 (configs() builds jnp scalars)
    import numpy as np

    import bench
    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.maps import texture

    # the argv label and the import-time constant must agree, or the cell
    # would be silently mislabeled (the precision is trace-time state)
    assert texture._MAP_MXU_PRECISION == precision, (
        texture._MAP_MXU_PRECISION, precision)

    for name, kw, x0 in all_configs():
        if name != config_name:
            continue
        kernel = CONFIG_KERNELS[name]
        row = {"config": name, "precision": precision, "kernel": kernel}
        ctrl = VanillaMPPI(kernel=kernel, **kw)
        row["ms"] = bench._steady_state_ms(ctrl, x0)
        key = jax.random.PRNGKey(7)
        res, _ = jax.jit(ctrl.solve)(x0, ctrl.init_state(key))
        np.savez(out_npz, control_mean=np.asarray(res.control_mean))
        print(json.dumps(row), flush=True)
        return
    raise SystemExit(f"unknown config {config_name}")


def main():
    if len(sys.argv) == 4:  # subprocess cell: <config> <precision> <out>
        run_cell(sys.argv[1], sys.argv[2], sys.argv[3])
        return
    import numpy as np

    tmp = tempfile.mkdtemp(prefix="map_prec_probe_")
    for name in CONFIG_KERNELS:
        outs = {}
        for precision in ("highest", "high"):
            out = os.path.join(tmp, f"{name}_{precision}.npz")
            env = dict(os.environ, MPPI_MAP_MXU_PRECISION=precision)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 name, precision, out],
                env=env, check=True, timeout=900,
            )
            outs[precision] = np.load(out)["control_mean"]
        diff = np.abs(outs["high"] - outs["highest"])
        print(json.dumps({
            "config": name,
            "control_mean_max_abs_diff_high_vs_highest": float(diff.max()),
            "control_mean_scale": float(np.abs(outs["highest"]).max()),
        }), flush=True)


if __name__ == "__main__":
    main()
