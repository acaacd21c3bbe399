"""Gradient-memory comparison at the 104-column scale: frozen-grid replay
(with/without remat and truncated BPTT) vs the adaptive stochastic adjoint
(round-3 VERDICT directive #2's measurement).

Both paths differentiate the SAME quantity — the final state of an
adaptive stochastic solve over the SAME frozen accepted-step grid
(``sde_select_grid`` once, shared) — so the comparison isolates the
gradient MACHINERY'S memory:

- replay (``sdeint_replay``): reverse-mode AD through the bounded scan —
  the stored residuals grow with ``max_steps`` (remat=False stores every
  half-step's stage intermediates; remat=True stores one state per step
  and recomputes stages).
- adjoint (``sdeint_adjoint_adaptive`` internals): re-integrates
  (y, a, p_bar) backward over the grid — stored residuals are
  O(|state| + |outputs|) regardless of the step budget.

Memory is read from XLA's own compile-time accounting
(``compiled.memory_analysis()``: temp + argument + output bytes), which on
TPU is the actual HBM reservation. Prints one JSON line per row:

    python benchmarks/adjoint_memory.py               # (64, 32, 8), 16384
    python benchmarks/adjoint_memory.py --columns 8,4,1 --max-steps 2048
"""

from __future__ import annotations

import argparse
import functools
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--columns", default="64,32,8")
    ap.add_argument("--time-steps", type=int, default=1000)
    ap.add_argument("--max-steps", type=int, default=16384)
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--run", action="store_true",
                    help="also execute each compiled gradient once and "
                         "report wall time (default: compile-only, so "
                         "rows that would OOM still report their demand)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus
    from columnflow.models.network import network_diffusion, network_drift
    from columnflow.solvers import FrozenGrid, sde_select_grid, sdeint_replay
    from columnflow.solvers.sde_adjoint import _sdeint_adaptive_backsolve
    from columnflow.tasks import parity as pt

    cpa = tuple(int(x) for x in args.columns.split(","))
    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0), columns_per_area=cpa,
                         n_inputs=4, time_steps=args.time_steps, dt=1e-3,
                         max_steps=args.max_steps)
    state_dim = 3 * task.net.num_pops
    table = parity_stim_table(
        jnp.asarray([15.0, 15.0, 0.0, 0.0]), args.time_steps)
    stim = Stimulus(0.0, task.dt, table)
    key = jax.random.PRNGKey(7)
    y0 = jnp.zeros(state_dim)

    def drift(t, y, p):
        return network_drift(t, y, p, task.net, stim)

    def diffusion(t, y, p):
        return network_diffusion(t, y, p, task.net, stim)

    grid = jax.jit(lambda p: sde_select_grid(
        drift, diffusion, y0, task.ts, key, p, method="sra1",
        rtol=args.rtol, atol=args.rtol,
        max_steps=args.max_steps))(task.params)
    grid = jax.tree_util.tree_map(lambda x: jnp.asarray(x), grid)
    print(json.dumps({"row": "grid", "columns_per_area": list(cpa),
                      "state_dim": state_dim,
                      "naccept": int(grid.naccept),
                      "success": bool(grid.stats.success)}), flush=True)
    g2 = FrozenGrid(grid.step_times, grid.naccept, None)

    def replay_loss(p, remat, bptt):
        ys = sdeint_replay(drift, diffusion, y0, task.ts, key, g2, p,
                           method="sra1", remat=remat, bptt_every=bptt)
        return jnp.sum(ys[-1] ** 2)

    def adjoint_loss(p):
        ys = _sdeint_adaptive_backsolve(
            drift, diffusion, "sra1", 20, y0, task.ts, key,
            grid.step_times, grid.naccept, (p,))
        return jnp.sum(ys[-1] ** 2)

    rows = [
        ("replay", functools.partial(replay_loss, remat=False, bptt=None)),
        ("replay_remat", functools.partial(replay_loss, remat=True,
                                           bptt=None)),
        ("replay_remat_bptt32", functools.partial(replay_loss, remat=True,
                                                  bptt=32)),
        ("adjoint", adjoint_loss),
    ]
    for name, loss in rows:
        try:
            g = jax.jit(jax.grad(loss))
            compiled = g.lower(task.params).compile()
            mem = compiled.memory_analysis()
            rec = {
                "row": name,
                "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
                "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
                "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
            }
            if args.run:
                import time

                out = g(task.params)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = g(task.params)
                jax.block_until_ready(out)
                rec["wall_s"] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            rec = {"row": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
