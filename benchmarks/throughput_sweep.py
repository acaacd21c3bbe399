"""Throughput-mode flagship benchmark: batch sweep of the at-scale train
steps (round-4 VERDICT #1: "prove the batch-first thesis at the flagship
scale").

The framework's design thesis is batch-first — throughput comes from
trajectories in flight (README, parallel/sharding.py), replacing the
reference's sequential per-sample loop (scripts/parity_ode.py:227-236).
BASELINE.md's utilization accounting shows the batch-4 protocol fills
4/128 of the MXU's rows (0.84% MFU) and names the flagship metric "the
one to push"; the lockstep-cost study says vmap lanes are ~95% useful.
This sweep measures what actually happens as lanes scale:

    python benchmarks/throughput_sweep.py --workload adaptive \
        --batches 4 8 16 32 64 128 256
    python benchmarks/throughput_sweep.py --workload split2 \
        --batches 4 8 16 32 64 128

Workloads:
  adaptive  the 104-column (2496-dim) adaptive stochastic train step —
            per-sample SRA1 step-doubling on virtual-Brownian-tree paths,
            lane-batched fused replay, bf16 selection/weight-grad tiers,
            truncated BPTT (the flagship bench config).
  split2    the 208-column (4992-dim) deterministic fused --split2 train
            step (the scale tier that beats XLA 1.43x at batch 4).

Per batch size prints ONE JSON line:
    {"workload": ..., "batch": B, "s_per_iter": t,
     "samples_per_sec": B/t, "model_tflops_per_iter": F,
     "mfu_pct": ..., "path": "fused"|"xla-fallback"|"error: ..."}

MFU uses the same analytic model-FLOP accounting as bench.py
(BASELINE.md "Utilization accounting"), with FLOPs scaled linearly in
batch (every lane does the full controller chain — lockstep replays are
per-lane grids, selection controllers are per-sample). Timing follows
the tunnel methodology rule: each measured iteration consumes the
previous iteration's params (a dependent chain), never repeated
identical calls (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

# Repo-local persistent compilation cache (CLAUDE.md: every TPU driver
# shares it — the flagship programs cost ~10 min of remote compile cold).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

CHIP_BF16_PEAK = 197e12  # TPU v5e (BASELINE.md "Utilization accounting")


def adaptive_flops_per_iter(batch, naccept, nreject, P=832):
    """bench.py parity104_accounting generalized to batch (model FLOPs)."""
    drift_flops = 2 * P * P + 35 * P
    evals = 6.0 * (naccept + nreject) + 12.0 * naccept
    return batch * evals * drift_flops


def split2_flops_per_iter(batch, naccept, nreject, P=1664):
    """Deterministic dopri5: selection = 6 drift evals per controller
    iteration (FSAL amortized), replay = 6 per accepted step, backward
    ~= 2x replay -> 18 x naccept."""
    drift_flops = 2 * P * P + 35 * P
    evals = 6.0 * (naccept + nreject) + 18.0 * naccept
    return batch * evals * drift_flops


def build_adaptive(batch):
    from columnflow.config import ColumnConfig
    from columnflow.tasks import parity as pt

    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0),
                         columns_per_area=(64, 32, 8), n_inputs=4,
                         time_steps=1000, dt=1e-3, max_steps=16384)
    step = pt.make_train_step(task, use_fused=True, stochastic=True,
                              adaptive=True, bptt_every=32,
                              clip_grad_norm=1.0, loss_scale=1e-6,
                              select_bf16=True, grad_bf16=True, split2=True)
    return task, step, True


def build_split2(batch):
    from columnflow.config import ColumnConfig
    from columnflow.tasks import parity as pt

    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0),
                         columns_per_area=(128, 64, 16), n_inputs=4,
                         time_steps=1000, dt=1e-3, max_steps=3072)
    step = pt.make_train_step(task, use_fused=True, split2=True)
    return task, step, False


def measure(workload, batch, iters, probe_stats):
    from columnflow.data import make_parity_batch
    from columnflow.solvers.fused import compile_or_fallback
    from columnflow.tasks import parity as pt

    task, step, stochastic = (build_adaptive(batch) if workload == "adaptive"
                              else build_split2(batch))
    params = task.params
    opt_state = task.optimizer.init(params)
    stims = make_parity_batch(jax.random.PRNGKey(1), 4, batch)
    # Stats probe BEFORE the timing loop: the train step donates its
    # (params, opt_state) inputs, so task.params is consumed by warmup.
    # na/nr are PER-SAMPLE controller counts (independent of batch), so
    # --na/--nr from an earlier row skip the ~2 min probe compile.
    if probe_stats is not None:
        na, nr = probe_stats(task, stims[: min(batch, 4)], stochastic)
    else:
        na = nr = None

    args = ((params, opt_state, stims, jax.random.PRNGKey(2))
            if stochastic else (params, opt_state, stims))
    step, used_fused = compile_or_fallback(
        step,
        lambda: pt.make_train_step(task, use_fused=False,
                                   stochastic=stochastic,
                                   adaptive=stochastic, bptt_every=32,
                                   clip_grad_norm=1.0, loss_scale=1e-6,
                                   select_bf16=True)
        if stochastic else pt.make_train_step(task, use_fused=False),
        args, what=f"{workload} step at batch {batch}")
    path = ("fused" if used_fused else "xla-fallback")

    # Warmup/compile.
    out = step(*args)
    jax.block_until_ready(out[2])
    params, opt_state = out[0], out[1]

    t0 = time.perf_counter()
    for i in range(iters):
        a = ((params, opt_state, stims, jax.random.PRNGKey(10 + i))
             if stochastic else (params, opt_state, stims))
        out = step(*a)
        params, opt_state = out[0], out[1]
    jax.block_until_ready(out[2])
    s_per_iter = (time.perf_counter() - t0) / iters

    rec = {
        "workload": workload,
        "batch": batch,
        "s_per_iter": round(s_per_iter, 4),
        "samples_per_sec": round(batch / s_per_iter, 2),
        "path": path,
    }
    if na is not None:
        flops = (adaptive_flops_per_iter(batch, na, nr)
                 if workload == "adaptive"
                 else split2_flops_per_iter(batch, na, nr))
        rec.update({
            "naccept_mean": round(na, 1),
            "nreject_mean": round(nr, 1),
            "model_tflops_per_iter": round(flops / 1e12, 3),
            "mfu_pct": round(100.0 * flops / s_per_iter / CHIP_BF16_PEAK,
                             3),
        })
    return rec


def probe_stats(task, stims, stochastic):
    """Controller-iteration counts for the FLOP accounting (same selection
    configuration as training; see bench.py)."""
    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus
    from columnflow.models.network import (network_diffusion, network_drift,
                                           network_drift_select16,
                                           select_weights_bf16)

    y0 = jnp.zeros(3 * task.net.num_pops)
    if stochastic:
        from columnflow.solvers import sdeint_adaptive

        w16, iw16 = select_weights_bf16(task.params, task.net)

        def one(stim_raw, k):
            table = parity_stim_table(stim_raw, 1000)
            stim = Stimulus(0.0, task.dt, table)
            _, st = sdeint_adaptive(
                lambda t, y: network_drift(t, y, task.params, task.net,
                                           stim),
                lambda t, y: network_diffusion(t, y, task.params, task.net,
                                               stim),
                y0, task.ts, k, method="sra1", rtol=1e-3, atol=1e-3,
                max_steps=task.max_steps, return_stats=True,
                select_drift=lambda t, y: network_drift_select16(
                    t, y, w16, iw16, task.net, stim))
            return st

        ks = jax.random.split(jax.random.PRNGKey(4), stims.shape[0])
        st = jax.jit(jax.vmap(one))(stims, ks)
        return float(jnp.mean(st.naccept)), float(jnp.mean(st.nreject))

    from columnflow.solvers import odeint_stats

    def one(stim_raw):
        table = parity_stim_table(stim_raw, 1000)
        stim = Stimulus(0.0, task.dt, table)
        return odeint_stats(
            lambda t, y: network_drift(t, y, task.params, task.net, stim),
            y0, task.ts, method="dopri5", rtol=task.rtol, atol=task.atol,
            max_steps=task.max_steps)

    st = jax.jit(jax.vmap(one))(stims)
    return float(jnp.mean(st.naccept)), float(jnp.mean(st.nreject))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload", choices=["adaptive", "split2"],
                    default="adaptive")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64, 128, 256])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--na", type=float, default=None,
                    help="reuse a measured naccept mean (skips the "
                         "~2 min stats-probe compile; na/nr are "
                         "per-sample counts, batch-independent)")
    ap.add_argument("--nr", type=float, default=None)
    args = ap.parse_args()
    if (args.na is None) != (args.nr is None):
        ap.error("--na and --nr must be given together (a lone --na "
                 "would crash the MFU computation after the timing ran)")

    probe = probe_stats if args.na is None else None
    for b in args.batches:
        try:
            rec = measure(args.workload, b, args.iters, probe)
            if args.na is not None:
                flops = (adaptive_flops_per_iter(b, args.na, args.nr)
                         if args.workload == "adaptive"
                         else split2_flops_per_iter(b, args.na, args.nr))
                rec.update({
                    "naccept_mean": args.na, "nreject_mean": args.nr,
                    "model_tflops_per_iter": round(flops / 1e12, 3),
                    "mfu_pct": round(100.0 * flops / rec["s_per_iter"]
                                     / CHIP_BF16_PEAK, 3),
                })
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"workload": args.workload, "batch": b,
                   "path": f"error: {type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
