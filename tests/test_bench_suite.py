"""CPU smoke of the driver-facing benchmark suite: `bench.py --suite
--tiny` must construct and solve every BASELINE.json config (the exact
code the driver runs on hardware) at seconds-scale shapes. A
config-construction regression (wrong output indices, renamed model,
bad sampler params) fails here instead of on the bench chip."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

EXPECTED = {
    "double_integrator_example_K1024",
    "cartpole_example_K8192",
    "bicycle_slip_colored_trackmap",
    "colored_flatground_fused_epilogue_K8192",
    "colored_tsallis_fused_epilogue_K8192",
    "autorally_nn_K1920_T150",
    "racer_lstm_steering_elevation_K1920",
    "racer_lstm_unc_flat_K1920",
    "rmppi_ddp_di_corl2020_K2560",
    "nln_logmppi_di_K8192",
    "smooth_mppi_di_K8192",
    "tube_ddp_di_corl2020_K2560",
}


def test_bench_suite_tiny_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['bench.py', '--suite', '--tiny'];"
         "import runpy; runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    seen = {}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            entry = json.loads(line)
            seen[entry["config"]] = entry
    missing = EXPECTED - set(seen)
    assert not missing, f"configs missing from --suite --tiny: {missing}"
    for name in EXPECTED:
        ms = seen[name]["steady_state_solve_ms"]
        assert ms > 0 and ms == ms, (name, ms)  # positive and not NaN
