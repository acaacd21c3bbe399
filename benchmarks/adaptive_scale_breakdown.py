"""Adaptive-SDE cost breakdown at the 104-column scale (one chip).

Formalizes the measurement behind RESULTS.md's fused/XLA batch-crossover
and bandwidth-roofline analysis: per-sample (B=1) timings of the three
phases of a differentiable adaptive solve — the adaptive pass (inference),
the frozen-sequence replay forward, and the full fwd+bwd — on the
(64, 32, 8) parity topology (832 pops, 2496-dim state, T=1000,
max_steps=16384), for both the XLA replay and the fused Pallas replay.

Prints one JSON line per row:

    python benchmarks/adaptive_scale_breakdown.py
    python benchmarks/adaptive_scale_breakdown.py --columns 32,16,4 --reps 2

Reference points (RESULTS.md, real v5e chip). f32 selection, round-2
baseline: XLA 3.2/7.5/12.3 s, fused 3.3/3.6/4.0 s — the fused backward is
0.41 s as kernels vs 4.8 s as an XLA scan, while the shared adaptive pass
(~3.2 s) sits at ~75% of the HBM bandwidth roofline for its algorithm.
With --select-bf16 and the lane-batched kernel replay (the fused rows'
engine): B=1 XLA 1.50/3.17/5.02 vs --fused-pass 0.22/0.22/0.50 (10x);
B=4 XLA 0.30/0.61/1.48-1.63 vs fused 0.34/0.34/1.09 (XLA selection +
lane-batched replay, the trainer default) vs --fused-pass
0.59/0.59/1.33 (per-lane selection kernels lose to the batched XLA
pass at B=4).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--columns", default="64,32,8",
                    help="comma-separated columns per area")
    ap.add_argument("--time-steps", type=int, default=1000)
    ap.add_argument("--max-steps", type=int, default=16384)
    ap.add_argument("--bptt-every", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help="number of samples per solve (the trainer uses 4)")
    ap.add_argument("--fused-pass", action="store_true",
                    help="run the step-size-selection pass in-kernel "
                         "(weights VMEM-resident across controller "
                         "attempts); applies to the fused rows only")
    ap.add_argument("--grad-bf16", action="store_true",
                    help="bf16-matmul weight-gradient VJPs in the outer "
                         "sweep (fused rows only; values stay f32)")
    ap.add_argument("--select-bf16", action="store_true",
                    help="pick step sizes with bf16 weight matrices (halves "
                         "the adaptive pass's HBM traffic; replay stays f32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.tasks import parity as pt

    cpa = tuple(int(x) for x in args.columns.split(","))
    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0), columns_per_area=cpa,
                         n_inputs=4, time_steps=args.time_steps, dt=1e-3,
                         max_steps=args.max_steps)
    stims = jnp.tile(jnp.asarray([[15.0, 15.0, 0.0, 0.0]], jnp.float32),
                     (args.batch, 1))
    key = jax.random.PRNGKey(7)

    def timeit(fn, *a):
        out = fn(*a)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        return (time.perf_counter() - t0) / args.reps

    for fused in (False, True):
        engine = "fused" if fused else "xla"
        fp = bool(args.fused_pass) and fused
        if fp:
            engine = "fused_pass"

        fwd = jax.jit(lambda p, k: pt.batched_rollout(
            p, task, stims, stochastic=True, adaptive=True, use_fused=fused,
            key=k, differentiable=False, select_bf16=args.select_bf16,
            fused_pass=fp, grad_bf16=args.grad_bf16 and fused))
        t_pass = timeit(fwd, task.params, key)

        replay = jax.jit(lambda p, k: pt.batched_rollout(
            p, task, stims, stochastic=True, adaptive=True, use_fused=fused,
            key=k, differentiable=True, select_bf16=args.select_bf16,
            fused_pass=fp, grad_bf16=args.grad_bf16 and fused,
            adaptive_bptt_every=args.bptt_every))
        t_replay = timeit(replay, task.params, key)

        def loss(p, k):
            ys = pt.batched_rollout(p, task, stims, stochastic=True,
                                    adaptive=True, use_fused=fused, key=k,
                                    differentiable=True,
                                    select_bf16=args.select_bf16,
                                    fused_pass=fp,
                                    grad_bf16=args.grad_bf16 and fused,
                                    adaptive_bptt_every=args.bptt_every)
            return jnp.sum(ys[:, -1, :] ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        t_grad = timeit(vg, task.params, key)

        print(json.dumps({
            "row": f"adaptive_breakdown_{engine}",
            "batch": args.batch,
            "select_bf16": args.select_bf16,
            "grad_bf16": args.grad_bf16,
            "columns_per_area": list(cpa),
            "state_dim": 3 * task.net.num_pops,
            "pass_s": round(t_pass, 4),
            "replay_fwd_s": round(t_replay, 4),
            "fwd_bwd_s": round(t_grad, 4),
            "backward_s": round(t_grad - t_replay, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
