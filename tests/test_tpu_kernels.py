"""TPU hardware tier: the compiled-kernel parity checks as pytest tests
(VERDICT r1 item 6 — a Mosaic regression in any fused kernel must fail CI
on hardware, not only the manual selfcheck script).

Run on the bench chip with:

    MPPI_TPU_TESTS=1 python -m pytest -m tpu

Off-TPU (the default CPU-forced suite) every test here skips. The check
bodies live in scripts/tpu_selfcheck.py so the standalone script and the
pytest tier can never diverge.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import tpu_selfcheck  # noqa: E402

pytestmark = pytest.mark.tpu

_on_tpu = jax.default_backend() == "tpu"


@pytest.mark.parametrize(
    "check", tpu_selfcheck.CHECKS, ids=[c.__name__ for c in tpu_selfcheck.CHECKS]
)
def test_tpu_kernel_check(check):
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    check()
