"""Headline benchmark. The PRIMARY metric (round-4 VERDICT #4: "the live
metric leads") is the flagship 104-column adaptive stochastic train step —
the at-scale configuration the reference's README describes but never
runs (/root/reference/README.md:27-29, scripts/parity_ode.py:234), and
the number that has tracked real kernel work every round (0.687 -> 0.645
-> 0.571 s/iter). Prints ONE JSON line:

    {"metric": "parity104_adaptive_train_s_per_iter", "value": N,
     "unit": "s/iter", "vs_baseline": M, ..., "extra_metrics": [...]}

``vs_baseline`` for the primary metric is the speedup over the measured
3.4 s/iter XLA-engine path of the SAME step on the same chip (RESULTS.md
round 2) — the reference itself cannot run this configuration at all, so
there is no torch-CPU number for it.

``extra_metrics`` carries:
- ``parity104_throughput_samples_per_sec`` — the SAME step at the
  measured-optimal batch from benchmarks/throughput_sweep.py (round-4
  VERDICT #1: the batch-first thesis, measured);
- ``wta_train_iters_per_sec`` — the legacy reference-protocol WTA metric
  (saturated at ~500 for four rounds because the workload is a serial
  chain of 1499 dependent 16-wide steps; annotated ``latency_bound``),
  with ``vs_baseline`` = speedup over the torch-CPU implementation run
  the way the reference runs it (sequential per-sample stepping). That
  baseline is measured once and cached in
  benchmarks/baseline_torch_cpu.json with a machine fingerprint; delete
  the file to re-measure; COLUMNFLOW_BENCH_SKIP_BASELINE=1 skips.

All metrics carry absolute-utilization fields (``mfu_pct``,
``hbm_roofline_pct``) computed from the analytic model-FLOP / minimum
HBM-byte accounting documented in BASELINE.md ("Utilization accounting"),
against the chip peaks in ``CHIP_PEAKS``.
"""

from __future__ import annotations

import json
import os
import sys
import time

BATCH = 16  # reference batch size; 15 train + 1 held out
TIME_STEPS = 1500
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_torch_cpu.json")

# Documented single-chip peaks (BASELINE.md "Utilization accounting").
# MFU follows the standard convention: model FLOPs / (wall time x bf16
# matmul peak). HBM percentages use the analytic MINIMUM traffic model, so
# they are lower bounds of true bandwidth utilization.
CHIP_PEAKS = {
    # TPU v5e (jax device_kind "TPU v5 lite"): 197 TFLOP/s bf16 MXU peak,
    # 819 GB/s HBM.
    "TPU v5 lite": {"flops_bf16": 197e12, "hbm_bytes_per_s": 819e9},
    "TPU v5e": {"flops_bf16": 197e12, "hbm_bytes_per_s": 819e9},
}


def _enable_compile_cache():
    """Repo-local persistent compilation cache (the same one the test
    suite and the multihost workers use): the flagship fused program costs
    ~10 min of remote compile on this tunnel; warm runs skip it. Timing
    loops are unaffected (compiles happen before the measured windows)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    return kind, CHIP_PEAKS.get(kind)


def _utilization(flops_per_iter, bytes_per_iter, iters_per_sec, peaks):
    if peaks is None or not iters_per_sec or iters_per_sec != iters_per_sec:
        return {"mfu_pct": None, "hbm_roofline_pct": None}
    return {
        "mfu_pct": round(
            100.0 * flops_per_iter * iters_per_sec / peaks["flops_bf16"], 4),
        "hbm_roofline_pct": round(
            100.0 * bytes_per_iter * iters_per_sec
            / peaks["hbm_bytes_per_s"], 4),
    }


def wta_accounting():
    """Model FLOPs and minimum HBM bytes of ONE WTA training iteration
    (formulas audited in BASELINE.md). n=16 populations, S=48 state,
    B=15 lanes, 1499 sequential SRA1 steps; backward ~= 2x forward."""
    n, S, B, steps = 16, 48, BATCH - 1, TIME_STEPS - 1
    drift_flops = 2 * n * n + 35 * n          # matvec + elementwise
    step_flops = 2 * drift_flops + 12 * S     # 2 drift evals + SRA1 combos
    fwd = B * steps * step_flops
    flops = 3 * fwd                           # fwd + bwd (~2x fwd)
    # Minimum traffic: targets in, predicted trajectories out (+bwd reread),
    # parameters/optimizer state. Everything else is VMEM-resident.
    bytes_ = 3 * (B * TIME_STEPS * 2 * 4) * 2 + 3 * (n * n * 4)
    return flops, bytes_


def parity104_accounting(naccept, nreject, batch=4, time_steps=1000):
    """Model FLOPs and minimum HBM bytes of ONE 104-column adaptive
    stochastic training iteration (BASELINE.md "Utilization accounting").
    P=832 populations; step-doubling selection = 6 drift evals per
    controller iteration, frozen-grid replay = 4 per accepted step,
    backward ~= 2x replay."""
    P, S = 832, 2496
    drift_flops = 2 * P * P + 35 * P
    evals = 6.0 * (naccept + nreject) + 12.0 * naccept
    flops = batch * evals * drift_flops
    # Minimum traffic: replay output buffer written + re-read by the loss/
    # backward, plus ~4 weight-matrix loads (selection, replay, 2 in bwd).
    bytes_ = batch * time_steps * S * 4 * 2 + 4 * (P * P * 4)
    return flops, bytes_


def bench_columnflow(iters: int = 100):
    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.tasks import wta as wta_task

    cfg = ColumnConfig.load()
    task = wta_task.build_task(cfg, jax.random.PRNGKey(0),
                               time_steps=TIME_STEPS)
    scan_fn = wta_task.make_train_scan(task)

    n = BATCH - 1
    true_states = jnp.broadcast_to(
        0.5 * jnp.ones((n, TIME_STEPS, 2)), (iters, n, TIME_STEPS, 2)
    )
    stims = jnp.broadcast_to(jnp.asarray([[20.0, 8.0]]), (iters, n, 2))
    params = task.params
    opt_state = task.optimizer.init(params)

    # Warmup/compile.
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    params, opt_state, losses, _ = scan_fn(params, opt_state, true_states,
                                           stims, keys)
    losses.block_until_ready()

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(2), iters)
    params, opt_state, losses, _ = scan_fn(params, opt_state, true_states,
                                           stims, keys)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    return iters / dt


def bench_torch_baseline(n_samples: int = 3):
    """Torch-CPU baseline: the same math, executed the way the reference
    executes it — a sequential Python loop over samples, each building a
    1500-step autograd graph (SRA1 stages), then backward + masked RMSprop.
    Measured over ``n_samples`` and extrapolated linearly to 15 (the loop is
    sample-sequential, so scaling is linear by construction)."""
    import numpy as np
    import torch

    from columnflow.config import ColumnConfig
    from columnflow.models import build_area_params
    from columnflow.models.wta import wta_lat_in_mask

    torch.set_num_threads(os.cpu_count() or 1)
    cfg = ColumnConfig.load()
    area = build_area_params(cfg, "mt", 2, small_network=True)

    W = torch.nn.Parameter(torch.tensor(np.asarray(area.recurrent_weights)))
    bg = torch.tensor(np.asarray(area.background_current))
    ffw = torch.tensor(np.asarray(area.feedforward_weights))
    adapt = torch.tensor(np.asarray(area.adaptation_strength))
    mask = torch.tensor(wta_lat_in_mask())
    out_w = torch.zeros(8)
    out_w[0] = 1.0
    tau_s, tau_m, tau_a, R = 0.0005, 0.02, 10.0, 80.0
    dt = 0.15 / TIME_STEPS
    sqrt_dt = dt**0.5

    def fr_of(x):
        xn = 48.0 * x - 981.0
        return xn / (1 - torch.exp(80.0 * torch.tanh(-0.0089 * xn / 80.0)))

    def drift(y, stim_t):
        v, a, r = y[:16], y[16:32], y[32:]
        fr = fr_of(v - a)
        cur = (ffw * stim_t + bg + W @ fr) * tau_s
        return torch.cat([(-v + cur * R) / tau_m,
                          (-a + adapt * fr) / tau_a,
                          (-r + fr) / tau_s])

    stim = torch.zeros(TIME_STEPS, 16)
    stim[TIME_STEPS // 3 : 2 * TIME_STEPS // 3, [2, 3]] = 20.0
    stim[TIME_STEPS // 3 : 2 * TIME_STEPS // 3, [10, 11]] = 8.0
    target = 0.5 * torch.ones(TIME_STEPS, 2)
    opt = torch.optim.RMSprop([W], lr=10.0, alpha=0.9)

    t0 = time.perf_counter()
    opt.zero_grad()
    losses = []
    for s in range(n_samples):
        y = torch.zeros(48)
        traj = []
        g = torch.full((48,), 100.0)
        for i in range(TIME_STEPS - 1):
            # SRA1 (additive noise), same scheme as the TPU path.
            dW = torch.randn(()) * sqrt_dt
            i10 = dt * (0.5 * dW + (dt / 12) ** 0.5 * torch.randn(()))
            f1 = drift(y, stim[i])
            h2 = y + 0.75 * dt * f1 + 1.5 * (i10 / dt) * g
            f2 = drift(h2, stim[i])
            y = y + dt * (f1 / 3 + 2 * f2 / 3) + dW * g
            traj.append(y)
        traj = torch.stack(traj)
        fr = fr_of(traj[:, :16] - traj[:, 16:32])
        pred = torch.stack([(fr[:, :8] * out_w).sum(-1),
                            (fr[:, 8:] * out_w).sum(-1)], dim=-1)
        losses.append(torch.nn.SmoothL1Loss()(pred, target[1:]))
    loss = torch.stack(losses).mean()
    loss.backward()
    W.grad *= mask
    opt.step()
    dt_wall = time.perf_counter() - t0
    # Extrapolate to the full 15-sample iteration.
    return 1.0 / (dt_wall * (BATCH - 1) / n_samples)


def _baseline_fingerprint():
    """Environment identity of a torch-CPU baseline measurement: the
    numbers are only comparable on the same machine/torch build."""
    import platform

    import torch

    return {
        "torch": torch.__version__,
        "python": platform.python_version(),
        "machine": platform.machine(),
        "cpu_count": os.cpu_count(),
        "platform": platform.platform(),
    }


def measure_and_cache_baseline():
    ips = bench_torch_baseline()
    os.makedirs(os.path.dirname(BASELINE_PATH), exist_ok=True)
    with open(BASELINE_PATH, "w") as f:
        json.dump({
            "iters_per_sec": ips,
            "note": "torch CPU, sequential per-sample, extrapolated to 15 "
                    "samples",
            "measured_date": time.strftime("%Y-%m-%d"),
            "fingerprint": _baseline_fingerprint(),
        }, f, indent=1)
    return ips


def get_baseline():
    """Cached torch-CPU baseline with staleness detection: warns on stderr
    (never pollutes the stdout JSON line) when the cached record has no
    fingerprint or was measured on a different machine/torch build."""
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            rec = json.load(f)
        fp = rec.get("fingerprint")
        if fp is None:
            print("bench: baseline cache has no fingerprint (pre-round-4 "
                  "record) — delete benchmarks/baseline_torch_cpu.json to "
                  "re-measure", file=sys.stderr)
        else:
            try:
                cur = _baseline_fingerprint()
            except Exception:
                cur = None
            if cur is not None and cur != fp:
                diffs = {k: (fp.get(k), cur.get(k)) for k in cur
                         if fp.get(k) != cur.get(k)}
                print(f"bench: baseline fingerprint is STALE {diffs} — "
                      "delete benchmarks/baseline_torch_cpu.json to "
                      "re-measure", file=sys.stderr)
        return rec["iters_per_sec"], rec.get("measured_date")
    if os.environ.get("COLUMNFLOW_BENCH_SKIP_BASELINE"):
        return None, None
    return measure_and_cache_baseline(), time.strftime("%Y-%m-%d")


# Measured-optimal throughput batch for the flagship step (round-5 sweep:
# benchmarks/throughput_sweep.py on the real chip; RESULTS.md "Throughput
# mode"): batch 8 = 11.5 samples/sec (1.5x the batch-4 protocol) is the
# knee — past 8 lanes the fused replay's compile dies (remote-compiler
# crash, graceful XLA fallback at 8.99 samples/s), so more lanes LOWER
# throughput. Updated when the sweep moves the knee.
THROUGHPUT_BATCH = 8


def bench_parity_adaptive(iters: int = 5, batch: int = 4,
                          with_stats: bool = True):
    """The round-2 flagship: the 104-column (2496-dim) adaptive stochastic
    train step — per-sample SRA1 step-doubling controllers on
    virtual-Brownian-tree paths, lane-batched fused Pallas replay with
    truncated BPTT, bf16 step-size selection and bf16 weight-gradient
    VJPs, clipped masked update (tasks/parity.py; RESULTS.md "In-kernel
    selection pass": 0.66 s/iter on one v5e chip). The configuration the
    reference's README describes but never runs
    (/root/reference/README.md:27-29, scripts/parity_ode.py:234).

    Returns seconds per training iteration (batch 4, T=1000, 1 s horizon,
    max_steps=16384).
    """
    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.data import make_parity_batch
    from columnflow.tasks import parity as pt

    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0),
                         columns_per_area=(64, 32, 8), n_inputs=4,
                         time_steps=1000, dt=1e-3, max_steps=16384)
    step = pt.make_train_step(task, use_fused=True, stochastic=True,
                              adaptive=True, bptt_every=32,
                              clip_grad_norm=1.0, loss_scale=1e-6,
                              select_bf16=True, grad_bf16=True,
                              # round-4 tier: replay values/state-cotangent
                              # sweeps as 3-pass bf16 splits (measured 11%
                              # step win at identical convergence,
                              # RESULTS.md "ceiling, broken")
                              split2=True)
    params = task.params
    opt_state = task.optimizer.init(params)
    key = jax.random.PRNGKey(1)

    # Per-iteration dispatch, blocking only at the end: the host enqueues
    # iteration i+1 while the device runs i, so the tunnel RTT pipelines
    # behind the ~0.5 s step (measured: a one-dispatch lax.scan block of
    # the same K iterations times ~4% SLOWER, so scanning buys nothing
    # here). Still a dependent chain — params update every iteration.
    def one(params, opt_state, k):
        k_batch, k_noise = jax.random.split(k)
        stims = make_parity_batch(k_batch, 4, batch)
        return step(params, opt_state, stims, k_noise)

    # Warmup/compile.
    params, opt_state, loss, *_ = one(params, opt_state, key)
    loss.block_until_ready()

    keys = jax.random.split(jax.random.PRNGKey(2), iters)
    t0 = time.perf_counter()
    for k in keys:
        params, opt_state, loss, *_ = one(params, opt_state, k)
    loss.block_until_ready()
    s_per_iter = (time.perf_counter() - t0) / iters
    if not with_stats:
        return s_per_iter, None, None

    # Controller-iteration counts for the FLOP accounting: probe the SAME
    # selection configuration the step trains with (bf16 selection drift,
    # jax Brownian backend) over one representative batch.
    from columnflow.models import Stimulus
    from columnflow.models.network import (network_diffusion, network_drift,
                                           network_drift_select16,
                                           select_weights_bf16)
    from columnflow.solvers import sdeint_adaptive

    stims = make_parity_batch(jax.random.PRNGKey(3), 4, 4)
    y0 = jnp.zeros(3 * task.net.num_pops)
    w16, iw16 = select_weights_bf16(params, task.net)

    def stats_one(stim_raw, k):
        from columnflow.data import parity_stim_table

        table = parity_stim_table(stim_raw, 1000)
        stim = Stimulus(0.0, task.dt, table)
        _, st = sdeint_adaptive(
            lambda t, y: network_drift(t, y, params, task.net, stim),
            lambda t, y: network_diffusion(t, y, params, task.net, stim),
            y0, task.ts, k, method="sra1", rtol=1e-3, atol=1e-3,
            max_steps=task.max_steps, return_stats=True,
            select_drift=lambda t, y: network_drift_select16(
                t, y, w16, iw16, task.net, stim))
        return st

    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    st = jax.jit(jax.vmap(stats_one))(stims, ks)
    na = float(jnp.mean(st.naccept))
    nr = float(jnp.mean(st.nreject))
    return s_per_iter, na, nr


def wta_record(peaks):
    """Legacy reference-protocol WTA metric (saturated; latency-bound —
    the chain is 1499 SEQUENTIAL solver steps per iteration, so MFU is
    intrinsically tiny and the informative absolute number is the
    serial-chain step latency, BASELINE.md)."""
    value = bench_columnflow()
    baseline, baseline_date = get_baseline()
    vs = value / baseline if baseline else float("nan")
    w_flops, w_bytes = wta_accounting()
    wta_util = _utilization(w_flops, w_bytes, value, peaks)
    chain_steps = value * (TIME_STEPS - 1) * 3  # fwd + ~2x bwd traversals
    wta_util.update({
        "latency_bound": True,
        "why_low_mfu": "serial chain of 1499 dependent solver steps per "
                       "iteration (16-pop matvecs); see BASELINE.md "
                       "'Utilization accounting'",
        "serial_chain_steps_per_sec": round(chain_steps),
        "serial_step_latency_ns": round(1e9 / chain_steps)
        if chain_steps else None,
    })
    return {
        "metric": "wta_train_iters_per_sec",
        "value": round(value, 4),
        "unit": "iters/sec",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        "baseline_date": baseline_date,
        "saturated_legacy_metric": True,
        "utilization": wta_util,
    }


def main():
    _enable_compile_cache()
    kind, peaks = _chip_peaks()

    # --- PRIMARY: the flagship 104-column adaptive stochastic step ---
    try:
        flagship_s, na, nr = bench_parity_adaptive()
        f_flops, f_bytes = parity104_accounting(na, nr)
        f_util = _utilization(f_flops, f_bytes, 1.0 / flagship_s, peaks)
        primary = {
            "metric": "parity104_adaptive_train_s_per_iter",
            "value": round(flagship_s, 4),
            "unit": "s/iter",
            # vs the measured 3.4 s/iter XLA-path baseline of the same
            # step on the same chip (RESULTS.md round 2) — the reference
            # never attempts this configuration, so no torch-CPU number
            # exists for it.
            "vs_baseline": round(3.4 / flagship_s, 2),
            "baseline": "same step, XLA engine, same chip (3.4 s/iter)",
            "naccept_mean": round(na, 1),
            "nreject_mean": round(nr, 1),
            "model_tflops_per_iter": round(f_flops / 1e12, 3),
            **f_util,
        }
    except Exception as e:
        primary = {"metric": "parity104_adaptive_train_s_per_iter",
                   "error": f"{type(e).__name__}: {e}"}
        na = nr = None

    extra = []

    # --- throughput mode: same step at the measured-optimal batch
    # (round-4 VERDICT #1; knee from benchmarks/throughput_sweep.py) ---
    try:
        thr_s, _, _ = bench_parity_adaptive(iters=2, batch=THROUGHPUT_BATCH,
                                            with_stats=False)
        if na is None:
            na, nr = 9163.0, 348.0  # round-4 measured means (BASELINE.md)
        t_flops, t_bytes = parity104_accounting(na, nr,
                                                batch=THROUGHPUT_BATCH)
        t_util = _utilization(t_flops, t_bytes, 1.0 / thr_s, peaks)
        extra.append({
            "metric": "parity104_throughput_samples_per_sec",
            "value": round(THROUGHPUT_BATCH / thr_s, 2),
            "unit": "samples/sec",
            "batch": THROUGHPUT_BATCH,
            "s_per_iter": round(thr_s, 4),
            "model_tflops_per_iter": round(t_flops / 1e12, 3),
            **t_util,
        })
    except Exception as e:
        extra.append({"metric": "parity104_throughput_samples_per_sec",
                      "error": f"{type(e).__name__}: {e}"})

    # --- legacy WTA metric (vs the fingerprinted torch-CPU baseline) ---
    try:
        extra.append(wta_record(peaks))
    except Exception as e:
        extra.append({"metric": "wta_train_iters_per_sec",
                      "error": f"{type(e).__name__}: {e}"})

    if "error" in primary and extra and "error" not in extra[-1]:
        # Keep the driver's (metric, value, vs_baseline) contract usable
        # even if the flagship measurement failed: promote the WTA metric.
        primary, extra = extra[-1], extra[:-1] + [primary]
    print(json.dumps({**primary, "device_kind": kind,
                      "extra_metrics": extra}))


if __name__ == "__main__":
    main()
