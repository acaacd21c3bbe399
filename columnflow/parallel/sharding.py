"""Device-mesh data parallelism over batch x noise realizations.

The reference is single-process, single-device, sequential-per-sample
(SURVEY.md section 2.3: no torch.distributed anywhere). The TPU-native
scaling axis for these workloads is the batch of (samples x SDE noise
realizations): states are tiny (48-312 dims) so model sharding is pointless;
throughput comes from putting more trajectories in flight.

Design: a 1-D ``Mesh`` over all devices with axis "batch"; training batches
are sharded along it, parameters are replicated, and gradients are averaged
with ``psum``/``pmean`` over ICI inside a ``shard_map``-wrapped training
step. XLA lowers the psum to an all-reduce over the interconnect — no
NCCL/MPI analog needed.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place each leaf with its leading axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    """Place each leaf fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_dp_train_step(loss_fn, optimizer, grad_mask, mesh: Mesh,
                       axis_name: str = "batch", num_batch_args: int = 3,
                       post_update=None):
    """Build a jitted data-parallel training step.

    ``loss_fn(params, *batch_args) -> scalar`` is evaluated on each device's
    local batch shard; gradients and loss are ``pmean``-ed over the mesh axis
    (one XLA all-reduce over ICI), then the (replicated) optimizer update
    runs identically on every device.

    ``post_update(params) -> params`` runs INSIDE the sharded step after the
    optimizer update (e.g. the parity task's reference-matching weight
    clamps, scripts/parity_ode.py:267-274) so single-device and mesh paths
    apply identical semantics.

    Batch args must have leading axes divisible by mesh size.
    """
    from jax import shard_map

    from columnflow.train import mask_grads

    batch_specs = tuple(P(axis_name) for _ in range(num_batch_args))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()) + batch_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded_step(params, opt_state, *batch_args):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch_args)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        if grad_mask is not None:
            grads = mask_grads(grads, grad_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        if post_update is not None:
            params = post_update(params)
        return params, opt_state, loss

    return jax.jit(sharded_step, donate_argnums=(0, 1))
