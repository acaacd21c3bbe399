"""TP-vs-single-chip crossover accounting on the virtual mesh (round-4
VERDICT #8: "the scale story ends in a number rather than an estimate").

Wall-clock on the virtual CPU mesh is meaningless, but the COMPILED
PROGRAM is not: XLA's SPMD partitioner emits the real collective
schedule. This tool compiles the parity TP train step at a given scale
on a virtual (batch, model) mesh, parses the optimized HLO, and counts
every collective (kind, operand bytes, count). Combined with the
measured single-chip rates (RESULTS.md round-4 probes) it prints a
predicted real-mesh step time with its assumptions stated inline:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/tp_crossover.py --columns 416 --mesh 2,4

Accounting model (every number printed so the prediction is auditable):
- compute: the measured M=4 bf16 MXU pass on one chip is ~27 us at
  P=1664 and scales with operand bytes (RESULTS.md "kernel economics");
  a TP-n model shard does 1/n of each pass.
- collectives: per all-gather, bytes / bw + latency, with the effective
  ICI all-gather bandwidth swept over {25, 45, 90} GB/s (v5e one-axis
  ICI estimates; the TPU v5e spec gives 1600 Gbps aggregate ICI over 4
  links -> ~50 GB/s/direction/link) and 2 us launch latency per
  collective.

Reference basis: the reference has no distributed code at all
(SURVEY.md section 2.3); BASELINE.md "Single-chip scale ceiling + TP
continuation" asked for the crossover number.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must run on the virtual CPU mesh.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
# Repo-local persistent compilation cache: the 416-column TP compile is
# minutes of CPU compile; warm re-runs of the accounting skip it.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}
COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")


def shape_bytes(shape_str):
    """Bytes of an HLO shape string like 'f32[4,9984]' (0 if unparsable)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def parse_collectives(hlo_text):
    """Count LOGICAL collectives and their result bytes in optimized HLO.

    - Async pairs (``all-gather-start``/``all-gather-done`` etc., TPU
      HLO) are ONE logical collective: the ``-start`` line is counted,
      the ``-done`` (a wait on the same transfer) is skipped.
    - Result bytes: a plain op's tuple shape is a VARIADIC collective
      (one op over several tensors — XLA emits these for fused gradient
      reduces), so its elements are summed; a ``-start``'s tuple is
      ``(operands..., results...)`` and only the results half is summed
      (summing all would double-count the transfer).
    - Ops inside while-loop bodies execute once per loop iteration; the
      static count is per-ITERATION there, reported via ``in_loop_body``
      (the op's ``op_name`` metadata carries the jaxpr scope, e.g.
      ``jit(step)/jvp()/while/body/...``; enclosing-computation names
      containing while/body are also honored).
    """
    op_re = re.compile(
        r"(?:ROOT\s+)?%?\S+\s*=\s*(.+?)\s+(all-gather|all-reduce|"
        r"reduce-scatter|collective-permute|all-to-all)(-start|-done)?\(")
    comp_re = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*"
                         r"(?:->[^{]*)?\{\s*(?:/\*.*\*/\s*)?$")
    out = {}
    comp = ""
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{"):
            mc = comp_re.match(stripped)
            if mc:
                comp = mc.group(1)
            continue
        m = op_re.match(stripped)
        if not m:
            continue
        shape_str, kind, suffix = m.groups()
        if suffix == "-done":
            continue
        sizes = [shape_bytes(s)
                 for s in re.findall(r"\w+\[[\d,]*\]", shape_str)]
        if suffix == "-start" and len(sizes) > 1:
            sizes = sizes[len(sizes) // 2:]       # results half only
        in_body = ("while" in comp.lower() or "body" in comp.lower()
                   or "/while/" in stripped)
        rec = out.setdefault(kind, {"count": 0, "bytes": 0,
                                    "in_loop_body": 0})
        rec["count"] += 1
        rec["bytes"] += sum(sizes)
        rec["in_loop_body"] += int(in_body)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--columns", type=int, default=416,
                    help="total columns (split 8:4:1 scaled)")
    ap.add_argument("--mesh", default="2,4",
                    help="batch,model mesh shape (product <= 8)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--time-steps", type=int, default=50,
                    help="output grid length (collective STRUCTURE is "
                         "step-count independent; keep small for compile "
                         "time)")
    ap.add_argument("--max-steps", type=int, default=256)
    args = ap.parse_args()
    nb, nm = (int(x) for x in args.mesh.split(","))

    from columnflow.config import ColumnConfig
    from columnflow.data import make_parity_batch
    from columnflow.parallel.tp import (
        make_mesh_2d,
        make_tp_train_step,
        shard_network_opt_state,
        shard_network_params,
    )
    from columnflow.tasks import parity as pt

    s = args.columns // 13
    cpa = (8 * s, 4 * s, 1 * s)
    cfg = ColumnConfig.load()
    task = pt.build_task(cfg, jax.random.PRNGKey(0), columns_per_area=cpa,
                         time_steps=args.time_steps,
                         max_steps=args.max_steps)
    P = task.net.num_pops
    mesh = make_mesh_2d(nb, nm)
    step = make_tp_train_step(task, mesh)
    params = shard_network_params(task.params, mesh)
    opt_state = shard_network_opt_state(
        task.optimizer.init(task.params), task.params, mesh)
    stims = make_parity_batch(jax.random.PRNGKey(1), 4, args.batch)

    lowered = step.lower(params, opt_state, stims)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    colls = parse_collectives(hlo)

    # --- auditable prediction ---
    # Measured single-chip anchors (RESULTS.md round 4):
    #   one M=4 bf16 pass at P=1664: 27 us (~206 GB/s operand streaming);
    #   f32 HIGHEST contraction = 6 such passes.
    pass_us_1664 = 27.0
    pass_us = pass_us_1664 * (P / 1664.0) ** 2
    stage_us_single = 6 * pass_us              # f32 drift contraction
    stage_us_tp = stage_us_single / nm
    ag_bytes = args.batch * P * 4              # (B, P) f32 activations
    preds = {}
    for bw_gbs in (25, 45, 90):
        ag_us = ag_bytes / (bw_gbs * 1e3) + 2.0   # bytes/GB/s -> us + lat
        preds[f"ici_{bw_gbs}GBs"] = {
            "stage_us_single_chip": round(stage_us_single, 1),
            "stage_us_tp_compute": round(stage_us_tp, 1),
            "allgather_us": round(ag_us, 2),
            "stage_us_tp_total": round(stage_us_tp + ag_us, 1),
            "predicted_speedup": round(
                stage_us_single / (stage_us_tp + ag_us), 2),
        }

    print(json.dumps({
        "columns": args.columns,
        "pops": P,
        "mesh": [nb, nm],
        "batch": args.batch,
        "collectives_in_compiled_hlo": colls,
        "allgather_bytes_per_stage_model": ag_bytes,
        "anchors": {
            "pass_us_M4_P1664_measured": pass_us_1664,
            "pass_us_at_P": round(pass_us, 1),
            "assumption": "per-stage cost = 6 bf16-pass-equivalents "
                          "(f32 HIGHEST) split over model shards + one "
                          "(B, P) f32 all-gather; ICI bw swept, 2 us "
                          "launch latency",
        },
        "prediction": preds,
    }, indent=1))


if __name__ == "__main__":
    main()
