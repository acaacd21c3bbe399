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
        # One host transfer for all device values: each separate float()
        # of a device array costs a full device->host round-trip (~30 ms
        # over the TPU tunnel), which would dwarf a ~30 ms train step.
        import jax

        metrics = jax.device_get(metrics)
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


class StepProfiler:
    """Traces a window of training steps with ``jax.profiler`` (SURVEY.md
    section 5: the reference has no tracing at all; this is the TPU-native
    replacement — open the dump with TensorBoard or xprof).

    Usage: call ``prof.step(it)`` at the top of each training iteration;
    steps in [start, stop) are captured. A no-op when ``profile_dir`` is
    falsy, so call sites can pass the CLI flag straight through.
    """

    def __init__(self, profile_dir: str | None, start: int = 2,
                 stop: int = 5):
        self.profile_dir = profile_dir
        self.start = start
        self.stop = stop
        self._active = False

    def step(self, it: int):
        if not self.profile_dir:
            return
        import jax

        if it == self.start and not self._active:
            os.makedirs(self.profile_dir, exist_ok=True)
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
        elif it == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
