"""TPU hardware tier: the live plant-runtime smokes as pytest tests
(VERDICT r2 item 9 — one command, ``MPPI_TPU_TESTS=1 pytest -m tpu``, must
run every hardware check; the closed-loop plant smokes used to be manual
scripts only).

Two closed loops on the real backend, each with an estimator thread
feeding states while the solver free-runs (reference runtime contract:
``base_plant.hpp`` runControlIteration + pubControl fast path):

* ``tpu_plant_smoke.main`` — donated solve dispatch, dynamics hot-swap
  reaching the native publisher's clamp, actuation fast path;
* ``tpu_racer_mission_smoke.main`` — the hardest integration path:
  BufferedPlant sensor buffer -> LSTM-LSTM warm-start -> elevation +
  track maps -> colored-noise solve -> native actuation publisher
  (``buffered_plant.hpp:11-84`` + ``lstm_lstm_helper.cuh``).

The smoke bodies live in scripts/ so the standalone scripts and the
pytest tier can never diverge (same pattern as test_tpu_kernels.py).
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import tpu_plant_smoke  # noqa: E402
import tpu_racer_mission_smoke  # noqa: E402

pytestmark = pytest.mark.tpu

_on_tpu = jax.default_backend() == "tpu"


def test_tpu_plant_smoke():
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    tpu_plant_smoke.main()


def test_tpu_racer_mission_smoke():
    if not _on_tpu:
        pytest.skip("requires the TPU backend (MPPI_TPU_TESTS=1 pytest -m tpu)")
    tpu_racer_mission_smoke.main()
