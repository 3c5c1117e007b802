"""Multi-host (2-process) execution of the sample-sharded solve.

The script under test (scripts/multihost_dryrun.py) spawns two OS
processes, initializes jax.distributed through
parallel.mesh.distributed_init, builds an 8-device global mesh (4 virtual
CPU devices per process, gloo collectives), and asserts parity of the
sharded vanilla (XLA + shard_mapped Pallas), Tube, and RMPPI per-step
pipelines against a single-process unsharded reference — the executed
evidence for the DCN scaling path (SURVEY §2.12; the reference library is
single-GPU)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    out = tmp_path / "multihost.json"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # timeout headroom: the recorded wall time grew to ~151 s after the
    # RMPPI pipeline landed (MULTIHOST_r03.json) — keep >5x slack so a
    # loaded host fails loudly via the parity asserts, not a silent skip
    try:
        proc = subprocess.run(
            [sys.executable, SCRIPT, "--out", str(out)],
            env=env, timeout=840, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        if out.exists():
            # the run got partway (workers were live): that is a real
            # failure, not a coordinator/port stall — surface it
            raise
        pytest.skip("multihost dryrun timed out before starting "
                    "(coordinator/port stall)")
    if proc.returncode != 0 and "Address already in use" in proc.stderr:
        pytest.skip("coordinator port unavailable")
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(out.read_text())
    assert result["ok"]
    assert result["global_devices"] == 8
    assert result["num_processes"] == 2
    names = {c["check"] for c in result["checks"]}
    assert names == {"vanilla_combined", "vanilla_pallas", "tube", "robust"}
