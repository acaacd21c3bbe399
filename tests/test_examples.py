"""Docs-rot insurance: the tutorial's worked example must keep running
end-to-end with the outcomes the doc quotes (docs/TUTORIAL.md embeds the
same code). Slow tier (conftest.SLOW_NODE_PREFIXES) — its subjects
(odeint training, sdeint, checkpointing) have always-on representatives
in test_ode.py / test_sde.py / test_train.py."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_tutorial_example_end_to_end(tmp_path):
    # Subprocess: conftest's in-process CPU forcing does not reach it, so
    # the example's --cpu flag must keep it off the TPU (one-holder rule).
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "fhn_tutorial.py"),
         "--cpu"],
        cwd=tmp_path, capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TUTORIAL EXAMPLE OK" in out.stdout
    assert (tmp_path / "fhn.npz").exists()
