"""Solver-engine throughput microbenchmarks (steps/sec/chip).

BASELINE.md tracks "ODE solver steps/sec/chip" as a first-class metric; this
harness measures it on reference-sized workloads (BASELINE.md workload
table) for each engine path, printing one JSON line per row:

    python benchmarks/solver_throughput.py            # all rows
    python benchmarks/solver_throughput.py --rows ode_fused sde_scan

Rows:
    ode_xla    adaptive dopri5, XLA while_loop/scan path, parity-sized
               (312-dim) drift, batch 4 vmapped (per-sample controllers)
    ode_fused  the same workload through the fused Pallas dopri5
               (shared controller)
    sde_scan   SRA1 over lax.scan, WTA-sized (48-dim), batch 128
    sde_fused  the same through the fused Pallas SDE rollout kernel
               (kernels/column_step.py)

"steps" counts solver steps (accepted steps for adaptive rows; fixed-grid
steps for SDE rows) x batch; each timing is steady-state (post-compile)
median of --reps runs in this process.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _med_time(fn, reps):
    import jax

    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _parity_setup():
    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.tasks import parity as pt

    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0))
    stims = jnp.asarray(
        [[15.0, 15.0, 0.0, 0.0], [15.0, 0.0, 15.0, 0.0],
         [0.0, 15.0, 0.0, 15.0], [15.0, 15.0, 15.0, 0.0]], jnp.float32)
    return task, stims


def _adaptive_steps(task, stims):
    import jax.numpy as jnp

    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus
    from columnflow.models.network import network_drift
    from columnflow.solvers import odeint_stats

    total = 0
    for i in range(stims.shape[0]):
        table = parity_stim_table(stims[i], task.ts.shape[0])
        st = odeint_stats(
            lambda t, y: network_drift(t, y, task.params, task.net,
                                       Stimulus(0.0, task.dt, table)),
            jnp.zeros(3 * task.net.num_pops), task.ts,
            max_steps=task.max_steps)
        total += int(st.naccept)
    return total


def row_ode_xla(reps):
    import jax

    from columnflow.tasks.parity import batched_rollout

    task, stims = _parity_setup()
    fn = jax.jit(lambda: batched_rollout(task.params, task, stims,
                                         differentiable=False))
    dt = _med_time(fn, reps)
    steps = _adaptive_steps(task, stims)
    return {"metric": "ode_steps_per_sec", "path": "xla",
            "workload": "parity 4x312-dim dopri5",
            "value": round(steps / dt), "unit": "steps/sec"}


def row_ode_fused(reps):
    import jax

    from columnflow.tasks.parity import batched_rollout

    task, stims = _parity_setup()
    fn = jax.jit(lambda: batched_rollout(task.params, task, stims,
                                         use_fused=True,
                                         differentiable=False))
    dt = _med_time(fn, reps)
    # Shared controller: one step sequence drives the whole batch.
    steps = _adaptive_steps(task, stims) // stims.shape[0] * stims.shape[0]
    return {"metric": "ode_steps_per_sec", "path": "fused",
            "workload": "parity 4x312-dim dopri5 (shared controller)",
            "value": round(steps / dt), "unit": "steps/sec"}


def _wta_setup(batch):
    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.data import wta_stim_three_phases
    from columnflow.models import build_wta

    cfg = ColumnConfig.load()
    params, area = build_wta(cfg, jax.random.PRNGKey(0))
    T = 1500
    ts = jnp.linspace(0.0, (T - 1) * 1e-4, T)
    stims = jnp.tile(jnp.asarray([[20.0, 8.0]]), (batch, 1))
    tables = jax.vmap(lambda s: wta_stim_three_phases(s, T))(stims)
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    return params, area, ts, tables, keys, T


def row_sde_scan(reps, batch=128):
    import jax
    import jax.numpy as jnp

    from columnflow.models import Stimulus, wta_diffusion, wta_drift
    from columnflow.solvers import sdeint

    params, area, ts, tables, keys, T = _wta_setup(batch)
    dt = float(ts[1] - ts[0])

    def one(table, k):
        stim = Stimulus(0.0, dt, table)
        return sdeint(
            lambda t, y: wta_drift(t, y, params, area, stim),
            lambda t, y: wta_diffusion(t, y, params, area, stim),
            jnp.zeros(48), ts, k, method="srk", noise="scalar",
            additive=True)

    fn = jax.jit(lambda: jax.vmap(one)(tables, keys))
    sec = _med_time(fn, reps)
    return {"metric": "sde_steps_per_sec", "path": "xla_scan",
            "workload": f"wta {batch}x48-dim SRA1 x {T - 1} steps",
            "value": round(batch * (T - 1) / sec), "unit": "steps/sec"}


def row_sde_fused(reps, batch=128):
    import jax

    from columnflow.kernels.column_step import make_wta_rollout_diff
    from columnflow.solvers.sde import _brownian_pack

    params, area, ts, tables, keys, T = _wta_setup(batch)
    import jax.numpy as jnp

    _, i1, i10, _, _ = jax.vmap(
        lambda k: _brownian_pack(k, ts, (), jnp.float32))(keys)
    rollout = make_wta_rollout_diff(area, ts)
    fn = jax.jit(lambda: rollout(params["recurrent_weights"], tables,
                                 i1.T, i10.T))
    sec = _med_time(fn, reps)
    return {"metric": "sde_steps_per_sec", "path": "fused",
            "workload": f"wta {batch}x48-dim SRA1 x {T - 1} steps",
            "value": round(batch * (T - 1) / sec), "unit": "steps/sec"}


def row_sde_adaptive(reps, batch=16):
    """Adaptive step-doubling SRA1 on the virtual Brownian tree (inference
    path), WTA-sized: steps counted as per-lane accepted+rejected attempts
    (each attempt = 3 stepper evaluations via step doubling)."""
    import jax
    import jax.numpy as jnp

    from columnflow.models import Stimulus, wta_diffusion, wta_drift
    from columnflow.solvers import sdeint_adaptive

    params, area, ts, tables, keys, T = _wta_setup(batch)
    dt = float(ts[1] - ts[0])

    def one(table, k):
        stim = Stimulus(0.0, dt, table)
        return sdeint_adaptive(
            lambda t, y: wta_drift(t, y, params, area, stim),
            lambda t, y: wta_diffusion(t, y, params, area, stim),
            jnp.zeros(48), ts, k, method="sra1", rtol=1e-3, atol=1e-3,
            max_steps=8192, return_stats=True)

    fn = jax.jit(lambda: jax.vmap(one)(tables, keys))
    sec = _med_time(fn, reps)
    _, st = fn()
    steps = int(jax.numpy.sum(st.naccept + st.nreject))
    return {"metric": "sde_adaptive_steps_per_sec", "path": "xla_vbt",
            "workload": f"wta {batch}x48-dim adaptive SRA1 (VBT)",
            "value": round(steps / sec), "unit": "steps/sec"}


ROWS = {
    "ode_xla": row_ode_xla,
    "ode_fused": row_ode_fused,
    "sde_scan": row_sde_scan,
    "sde_fused": row_sde_fused,
    "sde_adaptive": row_sde_adaptive,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", nargs="+", default=list(ROWS),
                    choices=list(ROWS))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    for name in args.rows:
        print(json.dumps(ROWS[name](args.reps)), flush=True)


if __name__ == "__main__":
    main()
