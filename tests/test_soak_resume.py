"""Kill/resume soak protocol (examples/soak_zinc.py) at toy scale on CPU:
a real SIGKILL mid-fit, a fresh resuming process, plateau-lr state
surviving the crash. Slow tier (spawns two python subprocesses)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "soak_zinc.py")


@pytest.mark.slow
def test_soak_kill_resume_protocol(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, SCRIPT, "--ckpt", str(tmp_path / "ck"),
         "--epochs", "16", "--kill-at", "7", "--n-graphs", "32",
         "--batch", "8", "--d-model", "16", "--layers", "2",
         "--patience", "2"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["epochs_total"] == 16
    assert summary["gaps"] == []
    assert summary["killed_after_epoch"] >= 7
    assert summary["resumed_at_epoch"] == summary["killed_after_epoch"] + 1
    assert summary["loss_after_resume"] is not None
