#!/usr/bin/env python
"""Rewrite README.md's test-count claim from a fresh pytest collection.

Round-2 VERDICT ("What's weak" #2) flagged doc drift on test counts; the
counts are now derived, not hand-maintained:

    python tools/update_test_counts.py          # rewrite README.md in place
    python -m pytest tests/test_meta.py -q      # CI check: claim == collected

The claim lives between ``<!-- test-counts -->`` markers in README.md. The
compiled-TPU tier is exactly ``tests/test_tpu_compiled.py`` (the only module
marked ``tpu``); everything else is the CPU tier.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MARKER = re.compile(r"<!-- test-counts -->.*?<!-- /test-counts -->", re.S)


def collect_counts() -> tuple[int, int]:
    """(n_cpu, n_tpu) from a collection-only pytest run."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=REPO, capture_output=True, text=True,
    )
    if out.returncode not in (0, 5):
        raise RuntimeError(f"collection failed:\n{out.stdout}\n{out.stderr}")
    nodes = [ln for ln in out.stdout.splitlines() if "::" in ln]
    n_tpu = sum(ln.startswith("tests/test_tpu_compiled.py") for ln in nodes)
    return len(nodes) - n_tpu, n_tpu


def claim_text(n_cpu: int, n_tpu: int) -> str:
    return (f"<!-- test-counts -->{n_cpu + n_tpu} tests "
            f"({n_cpu} CPU + {n_tpu} compiled-TPU)<!-- /test-counts -->")


def main() -> None:
    n_cpu, n_tpu = collect_counts()
    readme = REPO / "README.md"
    text = readme.read_text()
    new = MARKER.sub(claim_text(n_cpu, n_tpu), text)
    if new == text:
        print(f"README.md already current: {n_cpu} CPU + {n_tpu} TPU")
    else:
        readme.write_text(new)
        print(f"README.md updated: {n_cpu} CPU + {n_tpu} TPU")


if __name__ == "__main__":
    main()
