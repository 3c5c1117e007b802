"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing the expensive boundary without
the hardware (its gmock plant tests, SURVEY §4.3): multi-chip sharding tests
run on ``--xla_force_host_platform_device_count=8`` CPU devices; the real
TPU path is exercised by bench.py / the driver.

Note: the environment's sitecustomize registers a TPU PJRT plugin at
interpreter startup, so setting JAX_PLATFORMS alone is not enough — we also
flip the jax config after import (backends are created lazily, so this takes
effect as long as no computation ran yet).
"""

import os
import sys

# TPU tier (VERDICT r1 item 6): `MPPI_TPU_TESTS=1 pytest -m tpu` (or plain
# `pytest -m tpu`, detected by parsing the actual -m option value) keeps
# the real TPU backend so the @pytest.mark.tpu kernel-parity tests in
# test_tpu_kernels.py run compiled on hardware. Everything else — incl.
# expressions like `-m "not tpu"` — runs on the virtual 8-device CPU mesh.


def _tpu_marker_requested(argv):
    for i, arg in enumerate(argv):
        if arg == "-m" and i + 1 < len(argv):
            expr = argv[i + 1]
        elif arg.startswith("-m="):
            expr = arg[3:]
        elif arg.startswith("--markexpr"):
            expr = arg.split("=", 1)[1] if "=" in arg else (
                argv[i + 1] if i + 1 < len(argv) else ""
            )
        else:
            continue
        return expr.strip().strip("'\"") == "tpu"
    return False


TPU_TIER = bool(os.environ.get("MPPI_TPU_TESTS")) or _tpu_marker_requested(
    sys.argv
)

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

if not TPU_TIER:
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend"
    )


# ---------------------------------------------------------------------------
# The kernel auto-tuner persists decisions to an on-disk cache
# (ops/autotune.py). Tests must neither READ a developer's real cache
# (stale decisions would mask arbitration bugs) nor WRITE to it (stubbed
# time_solve results would poison real runs) — point it at a per-session
# temporary directory.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_autotune_disk_cache(tmp_path_factory, monkeypatch):
    from mppi_generic_tpu.ops import autotune

    monkeypatch.setenv(
        "MPPI_TUNE_CACHE_DIR",
        str(tmp_path_factory.getbasetemp() / "autotune_cache"),
    )
    monkeypatch.setattr(autotune, "_DISK_LOADED", False)
    monkeypatch.setattr(autotune, "_DISK", {})
    yield
