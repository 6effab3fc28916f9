"""Real 2-process jax.distributed dryrun as a test (VERDICT r4 item 2).

Launches the orchestrator in ``exps/dryrun_multihost.py``: 2 processes x 4
CPU devices, gloo collectives, hybrid dcn x ici global mesh via
``parallel.distributed.make_global_mesh``, one dp x tp train step + one
W4-TP decode — asserted equal to a single-process 8-device run.

Runs in subprocesses (the current process already owns a jax backend with 8
local devices; a distributed re-init is impossible in-process). Skippable
with ACCESSORY_SKIP_MULTIHOST=1 when wall-clock matters — the three
subprocess compiles cost ~1-3 min on one CPU core (warm compile cache).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("ACCESSORY_SKIP_MULTIHOST") == "1",
                    reason="ACCESSORY_SKIP_MULTIHOST=1")
def test_two_process_distributed_dryrun():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "exps", "dryrun_multihost.py")],
        cwd=REPO, timeout=1500, capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    verdict = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert verdict["ok"] is True, verdict
    assert verdict["loss_delta"] < 1e-4
    assert verdict["logits_max_delta"] < 1e-3
