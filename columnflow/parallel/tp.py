"""Tensor parallelism: model-sharded training for the hierarchical network.

The reference is single-device and its largest matmul is 104x104 — SURVEY.md
section 2.3 records TP as absent there. columnflow scales the ColumnNetwork
family far past that (benchmarks/parity_scale_sweep.py runs 104 columns per
area = 2496-dim recurrent matrices, and nothing caps the column count); once
the premixed (P, P) recurrent matrix grows to 10^4+ rows, a single chip's
matmul time and memory dominate the train step. The TPU-native scaling
recipe (the standard GSPMD/scaling-book approach):

- a 2-D ``Mesh`` with axes ``("batch", "model")``;
- every (P, ...) weight matrix row-sharded over ``"model"`` (output-row
  partition: each chip owns the rows of the network state it produces);
- the training batch sharded over ``"batch"``;
- plain ``jax.jit`` — XLA's SPMD partitioner propagates the shardings
  through the solver's ``scan``/``while_loop`` and inserts the collectives
  (an all-gather of the (B, P) firing-rate activations per drift stage, a
  gradient all-reduce over "batch"), all riding ICI.

The TP path integrates the whole batch as ONE (B, 3P) state through the
adaptive solver with a shared step controller — torchdiffeq's batched
semantics (same choice as the fused path, tasks/parity.py) — because a
per-sample vmapped controller would put the "model"-sharded axis under
``vmap`` where XLA cannot shard the per-sample 1-D matvecs efficiently.
Pallas fused kernels are single-chip by construction, so TP uses the XLA
drift (models/network.py: ``network_drift_batched``); fused kernels remain
the single-chip fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
MODEL_AXIS = "model"


def make_mesh_2d(n_batch: int, n_model: int, devices=None) -> Mesh:
    """A (n_batch, n_model) mesh with axes ("batch", "model").

    On real hardware, lay ``model`` along the fastest interconnect axis —
    the per-stage activation all-gather rides it every solver step, while
    the "batch" axis only carries one gradient all-reduce per train step.
    """
    devs = jax.devices() if devices is None else list(devices)
    need = n_batch * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_batch, n_model)
    return Mesh(grid, (BATCH_AXIS, MODEL_AXIS))


# Network trainable-parameter shardings: row-sharded over "model" so each
# chip owns the output rows it produces; the (8,) readout is replicated.
NETWORK_PARAM_SPECS = {
    "input_weights": P(MODEL_AXIS, None),
    "feedforward": P(MODEL_AXIS, None),
    "lateral": P(MODEL_AXIS, None),
    "output_weights": P(),
}


def network_param_shardings(mesh: Mesh):
    """Pytree of NamedShardings mirroring the network params dict."""
    return {k: NamedSharding(mesh, spec)
            for k, spec in NETWORK_PARAM_SPECS.items()}


def shard_network_params(params: dict, mesh: Mesh) -> dict:
    """Place network params with their TP shardings (committed arrays)."""
    sh = network_param_shardings(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in params.items()}


def shard_network_opt_state(opt_state, params: dict, mesh: Mesh):
    """Shard optimizer-state leaves like the params they mirror.

    Optax states (adam's mu/nu, rmsprop's nu) are pytrees whose array
    leaves either mirror a parameter (same shape -> same sharding) or are
    scalars/schedules (replicated).
    """
    sh = network_param_shardings(mesh)
    by_shape = {np.shape(v): sh[k] for k, v in params.items()}
    rep = NamedSharding(mesh, P())

    def place(leaf):
        leaf = jnp.asarray(leaf)
        return jax.device_put(leaf, by_shape.get(leaf.shape, rep))

    return jax.tree_util.tree_map(place, opt_state)


def make_tp_train_step(task, mesh: Mesh):
    """Jitted dp x tp training step for the parity-family ColumnNetwork.

    ``task`` is a ``tasks.parity.ParityTask``. Returns
    ``step(params, opt_state, stims_raw) -> (params, opt_state, loss)``
    with params/opt_state sharded per ``NETWORK_PARAM_SPECS`` and
    ``stims_raw`` (B, n_inputs) sharded over "batch". Loss semantics match
    ``tasks.parity`` (readout + L1 to parity targets,
    scripts/parity_ode.py:239-249); trajectories use one shared adaptive
    controller across the batch.
    """
    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus
    from columnflow.models.network import network_drift_batched
    from columnflow.solvers import odeint
    from columnflow.tasks.parity import parity_targets, readout
    from columnflow.train import clamp_params, mask_grads

    time_steps = task.ts.shape[0]
    state_dim = 3 * task.net.num_pops
    batch_sh = NamedSharding(mesh, P(BATCH_AXIS))

    def drift(t, y, p, tables):
        return network_drift_batched(t, y, p, task.net,
                                     Stimulus(0.0, task.dt, tables))

    def step(params, opt_state, stims_raw):
        def loss_fn(p):
            # (B, T, n) per-sample tables -> (T, B, n) as the batched drift
            # expects.
            tables = jax.vmap(
                functools.partial(parity_stim_table,
                                  time_steps=time_steps))(stims_raw)
            tables = jnp.transpose(tables, (1, 0, 2))
            y0 = jnp.zeros((stims_raw.shape[0], state_dim))
            ys = odeint(drift, y0, task.ts, p, tables,
                        max_steps=task.max_steps, remat=False)
            ys = jnp.transpose(ys, (1, 0, 2))  # (B, T, 3P)
            ys = jax.lax.with_sharding_constraint(ys, batch_sh)
            pred = readout(ys, p, task.net)
            return jnp.mean(jnp.abs(pred - parity_targets(stims_raw)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = mask_grads(grads, task.grad_mask)
        updates, opt_state = task.optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p_, u: p_ + u, params, updates)
        params = clamp_params(params, task.clamps)
        params = jax.lax.with_sharding_constraint(
            params, network_param_shardings(mesh))
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_tp_stochastic_adaptive_train_step(task, mesh: Mesh,
                                           rtol: float = 1e-3,
                                           atol: float = 1e-3,
                                           max_steps: int | None = None,
                                           bptt_every: int | None = None):
    """tp x stochastic-adaptive training step: the round-2 flagship engine
    (per-sample adaptive SRA1 controllers on virtual-Brownian-tree paths,
    frozen-grid replay gradients, optional truncated BPTT —
    ``solvers.sde_adaptive.sdeint_adaptive_batch``) composed with the
    model-sharded weight layout of :func:`make_tp_train_step`.

    Semantics are EXACTLY ``tasks.parity.batched_rollout(stochastic=True,
    adaptive=True)`` + readout loss + masked update + clamps — the same
    engine the DP step shards over "batch" — with the (P, P) weight
    matrices row-sharded over "model". Under GSPMD the per-sample vmapped
    drift matvecs batch into (B, P) x (P, P) contractions, which the
    partitioner splits over ("batch", "model") with a per-stage all-gather
    of the (B, P) firing rates — the same collective pattern as the
    deterministic TP step. The selection pass is a vmapped lockstep
    ``while_loop`` (per-sample controllers; lockstep cost measured at
    ~95% useful work, BASELINE.md).

    Returns ``step(params, opt_state, stims_raw, key) ->
    (params, opt_state, loss)``; ``key`` is one PRNG key, split per sample
    INSIDE the step (replicated), so trajectories are identical across
    mesh shapes — the basis of the TP == unsharded parity tests
    (tests/test_parallel.py::TestTPFullScale).

    Reference basis: torchsde's ``adaptive=True`` held commented-in at
    /root/reference/scripts/parity_ode.py:234; no multi-device analog
    exists there (SURVEY.md section 2.3).
    """
    from columnflow.tasks.parity import (
        batched_rollout,
        parity_targets,
        readout,
    )
    from columnflow.train import clamp_params, mask_grads

    batch_sh = NamedSharding(mesh, P(BATCH_AXIS))
    a_max_steps = task.max_steps if max_steps is None else max_steps

    def step(params, opt_state, stims_raw, key):
        def loss_fn(p):
            ys = batched_rollout(p, task, stims_raw, stochastic=True,
                                 adaptive=True, key=key,
                                 adaptive_rtol=rtol, adaptive_atol=atol,
                                 adaptive_max_steps=a_max_steps,
                                 adaptive_bptt_every=bptt_every)
            ys = jax.lax.with_sharding_constraint(ys, batch_sh)
            pred = readout(ys, p, task.net)
            return jnp.mean(jnp.abs(pred - parity_targets(stims_raw)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = mask_grads(grads, task.grad_mask)
        updates, opt_state = task.optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p_, u: p_ + u, params, updates)
        params = clamp_params(params, task.clamps)
        params = jax.lax.with_sharding_constraint(
            params, network_param_shardings(mesh))
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
