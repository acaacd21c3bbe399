"""Structured training metrics: JSONL writer + stdout mirror.

Replaces the reference's bare ``print('Iter {:02d} | Total Loss ...')``
lines (reference: scripts/wta_ode.py:189, scripts/parity_ode.py:252) with
machine-readable per-step records (loss, grad norm, solver stats, timing).
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, path: str | None = None, print_every: int = 1):
        self.path = path
        self.print_every = print_every
        self._fh = None
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)
            self._fh = open(path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "wall_time": time.time() - self._t0}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            parts = [f"step {step:4d}"]
            for k, v in rec.items():
                if k in ("step", "wall_time"):
                    continue
                parts.append(f"{k} {v:.5f}" if isinstance(v, float) else f"{k} {v}")
            print(" | ".join(parts), flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
