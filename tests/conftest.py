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

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
