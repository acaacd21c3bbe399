"""Multi-host (multi-process) scaffold: ``jax.distributed`` + a
process-spanning mesh (SURVEY.md §5 "Distributed communication backend";
round-4 VERDICT Missing #4).

The reference is single-process CPU (scripts/parity_ode.py:292); SURVEY
§5 plans ``jax.distributed.initialize`` with collectives riding ICI
inside a slice and DCN across slices. Real multi-chip hardware is not
reachable in this environment, so the scaffold is proven the way JAX
itself tests it: N local CPU PROCESSES under a coordination service,
each contributing ``--xla_force_host_platform_device_count`` virtual
devices to one global mesh, with GSPMD inserting the cross-process
collectives. The code path (initialize → global mesh →
``make_array_from_process_local_data`` → jitted step with sharded
inputs → replicated outputs) is exactly the multi-host TPU recipe; only
the transport differs (TCP between local processes instead of ICI/DCN).

Axis-placement note (the "How to Scale Your Model" recipe): on real
multi-slice TPU, order mesh axes so the FAST-collective axes map to ICI
— e.g. ``Mesh(devices.reshape(n_slices, chips_per_slice), ("dcn_dp",
"ici"))`` with tensor/fully-sharded axes on ``"ici"`` and only
low-frequency data-parallel all-reduces on ``"dcn_dp"``. In this
scaffold every axis is TCP, so the placement is exercised structurally,
not for bandwidth.

Worker entry (one per process):

    python -m columnflow.parallel.multihost --process-id I \
        --num-processes N --coordinator localhost:PORT --local-devices M

Launcher (spawns the N workers, collects results):

    python tools/dryrun_multihost.py --processes 2 --local-devices 4
"""

from __future__ import annotations

import json
import os
import sys


def _worker(process_id: int, num_processes: int, coordinator: str,
            local_devices: int, seed: int = 0):
    # Platform/device-count flags must be set before jax INITIALIZES THE
    # BACKEND. The launcher (tools/dryrun_multihost.py) sets them in the
    # Popen env — before this interpreter even starts — which is the
    # robust ordering (advisor, round 4: `python -m` has already imported
    # the columnflow package, and with it jax, by the time this function
    # runs; mutating env here only works while nothing in the import
    # chain touches the backend). For direct invocation without the
    # launcher we still append the flag as a best-effort fallback.
    flag = f"--xla_force_host_platform_device_count={local_devices}"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes
    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("dp",))

    # --- DP: global-batch gradient step, grads all-reduced by GSPMD ---
    # Tiny least-squares model; data deterministic from the seed so every
    # process can independently compute the single-host reference.
    K, per_dev = 8, 2
    B = n_global * per_dev
    key = jax.random.PRNGKey(seed)
    xs = jax.random.normal(key, (B, K))
    w_true = jnp.arange(1.0, K + 1.0)
    ys = xs @ w_true
    w0 = jnp.zeros(K)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    x_sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    # Each process contributes only ITS slice of the global batch — the
    # multi-host data-loading contract.
    lo = process_id * local_devices * per_dev
    hi = lo + local_devices * per_dev
    x_glob = jax.make_array_from_process_local_data(
        x_sh, np.asarray(xs[lo:hi]), global_shape=(B, K))
    y_glob = jax.make_array_from_process_local_data(
        x_sh, np.asarray(ys[lo:hi]), global_shape=(B,))

    step = jax.jit(jax.value_and_grad(loss_fn),
                   in_shardings=(rep, x_sh, x_sh),
                   out_shardings=(rep, rep))
    loss, grad = step(w0, x_glob, y_glob)
    loss_ref, grad_ref = jax.value_and_grad(loss_fn)(w0, xs, ys)
    # Relative errors: the sharded reduction associates differently than
    # the single-host one (f32 reassociation only).
    dp_loss_err = float(abs(loss - loss_ref) / jnp.maximum(abs(loss_ref),
                                                           1.0))
    gref = jax.device_get(grad_ref)
    dp_grad_err = float(jnp.max(jnp.abs(jax.device_get(grad) - gref))
                        / max(1.0, float(np.max(np.abs(gref)))))

    # --- TP: model-axis-sharded matmul with a GSPMD-inserted gather ---
    D = 4 * n_global
    tp_mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("tp",))
    W = jax.random.normal(jax.random.fold_in(key, 1), (D, D)) / np.sqrt(D)
    xv = jax.random.normal(jax.random.fold_in(key, 2), (4, D))
    w_sh = NamedSharding(tp_mesh, P(None, "tp"))
    rep_tp = NamedSharding(tp_mesh, P())
    mm = jax.jit(lambda a, b: a @ b, in_shardings=(rep_tp, w_sh),
                 out_shardings=rep_tp)
    tp_err = float(jnp.max(jnp.abs(
        jax.device_get(mm(xv, W)) - jax.device_get(xv @ W))))

    # --- explicit collective across processes (psum over the mesh) ---
    from jax.experimental.shard_map import shard_map

    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.ones((local_devices, 1), np.float32),
        global_shape=(n_global, 1))
    total = jax.jit(shard_map(
        lambda a: jax.lax.psum(a, "dp"), mesh=mesh,
        in_specs=P("dp"), out_specs=P("dp")))(ones)
    # The result stays sharded across processes; a process may only read
    # its own (addressable) shards.
    psum_ok = all(bool(np.all(np.asarray(sh.data) == n_global))
                  for sh in total.addressable_shards)

    result = {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": n_global,
        "dp_loss_err": dp_loss_err,
        "dp_grad_err": dp_grad_err,
        "tp_err": tp_err,
        "psum_ok": psum_ok,
        "ok": (dp_loss_err < 1e-5 and dp_grad_err < 1e-5
               and tp_err < 1e-4 and psum_ok),
    }
    print("MULTIHOST_RESULT " + json.dumps(result), flush=True)
    jax.distributed.shutdown()
    return result


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    res = _worker(args.process_id, args.num_processes, args.coordinator,
                  args.local_devices, args.seed)
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
