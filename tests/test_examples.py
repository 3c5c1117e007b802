"""Smoke tests that the shipped examples stay runnable (tiny scales, CPU).
The full-scale runs are exercised on TPU by the verify recipe."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the sitecustomize TPU plugin wins over the env var; examples run in a
    # subprocess, so force the CPU backend through a sitecustomize shim
    env["PYTHONSTARTUP"] = ""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.argv = {args!r};"
        f"g = {{'__file__': {args[0]!r}, '__name__': '__main__'}};"
        f"exec(compile(open({args[0]!r}).read(), {args[0]!r}, 'exec'), g)"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_cartpole_example_smoke():
    r = _run([os.path.join(REPO, "examples", "cartpole_example.py"),
              "--steps", "5", "--rollouts", "64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "average optimization time" in r.stdout


def test_double_integrator_example_smoke():
    r = _run([os.path.join(REPO, "examples", "double_integrator_example.py"),
              "--steps", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "distance to goal" in r.stdout


def test_quadrotor_waypoint_example_smoke():
    r = _run([os.path.join(REPO, "examples", "quadrotor_waypoint_example.py"),
              "--steps", "5", "--rollouts", "64", "--allow-incomplete"],
             timeout=360)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mission:" in r.stdout


def test_corl2020_example_smoke(tmp_path):
    r = _run([os.path.join(REPO, "examples", "double_integrator_corl2020.py"),
              "--steps", "4", "--rollouts", "64",
              "--out", str(tmp_path)], timeout=360)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "traces saved" in r.stdout
    assert (tmp_path / "robust_free_energy_bounds.npy").exists()
