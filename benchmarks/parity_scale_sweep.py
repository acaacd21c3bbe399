"""Parity train-step wall-clock vs model scale (beyond the reference's size).

The reference's parity network is [8,4,1] columns = 104 populations = 312-dim
state (scripts/parity_ode.py:162-174). This sweep multiplies columns_per_area
to measure how the fused Pallas train step scales, e.g.:

    python benchmarks/parity_scale_sweep.py --scales 1 2 4 8 --fused

Prints one JSON line per scale: {"scale": s, "columns": c, "state_dim": d,
"ms_per_step": t, "path": "fused"|"xla"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def time_step(step, params, opt_state, stims, iters: int = 10) -> float:
    params, opt_state, *aux = step(params, opt_state, stims)
    jax.block_until_ready(aux)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, *aux = step(params, opt_state, stims)
    jax.block_until_ready(aux)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--split2", action="store_true",
                    help="fused 208-column scale tier (3-pass bf16 "
                         "matmuls for values/gradients; see tasks/parity)")
    ap.add_argument("--engine", default=None,
                    choices=["auto", "xla", "fused", "fused-split2"],
                    help="use the trainer's scale-aware engine dispatch "
                         "(tasks.parity.resolve_engine) instead of manual "
                         "flags; records the resolved choice per scale so "
                         "the auto policy can be re-verified against the "
                         "measured-best rows (RESULTS.md crossover table)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.split2 and not args.fused:
        ap.error("--split2 requires --fused (it is a fused-engine tier)")

    from columnflow.config import ColumnConfig
    from columnflow.data import make_parity_batch
    from columnflow.tasks import parity as par

    cfg = ColumnConfig.load()
    for s in args.scales:
        cpa = (8 * s, 4 * s, 1 * s)
        use_fused, split2, resolved = args.fused, args.split2, None
        if args.engine is not None:
            flags, why = par.resolve_engine(args.engine, sum(cpa))
            use_fused, split2 = flags["use_fused"], flags["split2"]
            resolved = ("fused" + ("-split2" if split2 else "")
                        if use_fused else "xla")
            print(f"# engine {args.engine} @ {sum(cpa)} columns -> "
                  f"{resolved}: {why}", file=sys.stderr)
        task = par.build_task(cfg, jax.random.PRNGKey(0),
                              columns_per_area=cpa)
        step = par.make_train_step(task, use_fused=use_fused,
                                   split2=split2)
        opt_state = task.optimizer.init(task.params)
        stims = make_parity_batch(jax.random.PRNGKey(1), 4, args.batch)
        path = ("fused" + ("-split2" if split2 else "")
                if use_fused else "xla")
        if use_fused:
            # Same graceful fallback the trainer applies: past the VMEM
            # ceiling the row records the XLA-fallback timing instead of a
            # raw Mosaic error (BASELINE.md "Single-chip scale ceiling").
            from columnflow.solvers.fused import compile_or_fallback

            step, used_fused = compile_or_fallback(
                step, lambda: par.make_train_step(task, use_fused=False),
                (task.params, opt_state, stims),
                what=f"parity fused step at {sum(cpa)} columns")
            if used_fused:
                path = "fused" + ("-split2" if split2 else "")
            else:
                path = "xla-fallback"
        try:
            ms = time_step(step, task.params, opt_state, stims,
                           iters=args.iters)
            rec = {"scale": s, "columns": sum(cpa),
                   "state_dim": 3 * task.net.num_pops,
                   "ms_per_step": round(ms, 2),
                   "path": path}
            if resolved is not None:
                rec["engine"] = args.engine
                rec["resolved"] = resolved
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            rec = {"scale": s, "columns": sum(cpa),
                   "state_dim": 3 * task.net.num_pops,
                   "error": f"{type(e).__name__}: {str(e)[:200]}",
                   "path": path}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
