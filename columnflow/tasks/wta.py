"""Winner-take-all training task (reference: scripts/wta_ode.py).

Learns the lateral-inhibition / self-excitation entries of a two-column
area so its L2/3e rate trajectories match Wong-Wang decision dynamics.

TPU-native restructuring of the reference's loop (scripts/wta_ode.py:139-205):
the reference integrates each of the 15 batch samples SEQUENTIALLY through
torchsde and backprops through Python solver internals; here the whole batch
(samples x SDE noise realizations) is one vmapped, jit-compiled ``sdeint``
over ``lax.scan``, and the optimizer update (torch-RMSprop lr=10.0 alpha=0.9
+ ExponentialLR gamma=0.99, gradients masked to the 4 trainable entries) is
fused into the same jitted step. Optionally shards the batch across a device
mesh (data parallelism over ICI) via ``columnflow.parallel``.

Faithfulness note on convergence (demonstrated, round 2): torch-RMSprop's
bias-uncorrected first step is lr/sqrt(0.1) = +-31.6 per trainable entry at
lr=10 REGARDLESS of gradient magnitude or weight scale (our masked step is
pinned against torch itself in tests/test_wta_oracle.py), so the published
protocol is non-convergent both at the current O(300)-weight config and at
the legacy x1e-3 anatomy that produced the reference's hardcoded "trained"
matrix (scripts/plotting_results.py:36-101; generation reproduced by
``--legacy-scale`` / ``columnflow.config.legacy_wta_config``, pinned in
tests/test_legacy_scale.py). At the legacy scale an effective lr ~ 0.01
converges and moves the 4 entries by exactly the shipped O(0.1-0.5) —
see RESULTS.md "WTA protocol archaeology". ``lr=0.01`` optimizes stably
(held-out trajectory loss 0.169 -> 0.118 over one epoch, measured on TPU);
``--noise-reps R`` averages gradients over R noise realizations per sample
(the rollout batch becomes samples x R, chunked to the VMEM budget
automatically).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.data import make_wta_dataset, wta_stim_three_phases
from columnflow.models import Stimulus, build_wta, wta_diffusion, wta_drift
from columnflow.models.wta import wta_lat_in_mask
from columnflow.ops.losses import huber_trajectory_loss_wta
from columnflow.train import MetricsLogger, StepProfiler, exponential_lr, mask_grads, torch_rmsprop

DT = 1e-4
STIM_PHASE = 0.05  # s; three phases -> 1500 steps (scripts/wta_ode.py:145-147)
TIME_STEPS = int(STIM_PHASE * 3 / DT)


class WTATask(NamedTuple):
    params: dict
    area: object
    ts: jax.Array
    dt: float
    grad_mask: dict
    optimizer: object


def build_task(cfg: ColumnConfig, key, lr: float = 10.0, alpha: float = 0.9,
               lr_gamma: float = 0.99, time_steps: int = TIME_STEPS,
               dt: float = DT) -> WTATask:
    params, area = build_wta(cfg, key)
    # Reference grid: linspace(0, N*dt, N) (scripts/wta_ode.py:136).
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    mask = jnp.asarray(wta_lat_in_mask())
    grad_mask = {"recurrent_weights": mask, "output_weights": None}
    optimizer = torch_rmsprop(exponential_lr(lr, lr_gamma), alpha=alpha)
    # dt as a host float: the ts grid is uniform (linspace); solver-time
    # stimulus lookup uses the O(1) uniform-grid interpolation.
    dt_grid = float(ts[1] - ts[0])
    return WTATask(params, area, ts, dt_grid, grad_mask, optimizer)


def batched_rollout(params, task: WTATask, stims, keys, method="srk",
                    use_fused: bool | None = None):
    """Integrate a batch of stimuli: stims (B, 2), keys (B,) -> (B, T, 48).

    ``use_fused`` selects the single-Pallas-kernel SRA1 rollout
    (kernels.column_step) with its custom-VJP backward kernel; ``None``
    auto-selects it on TPU. Both paths draw the identical Brownian pack per
    sample key, so they produce the same trajectories (up to fp32 ordering).
    """
    time_steps = task.ts.shape[0]
    dt = task.dt
    if use_fused is None:
        use_fused = jax.default_backend() not in ("cpu",)
    if use_fused and method == "srk":
        from columnflow.kernels.column_step import make_wta_rollout_diff
        from columnflow.solvers.sde import _brownian_pack

        tables = jax.vmap(lambda s: wta_stim_three_phases(s, time_steps))(stims)
        _, i1, i10, _, _ = jax.vmap(
            lambda k: _brownian_pack(k, task.ts, (), jnp.float32)
        )(keys)  # i1, i10: (B, T-1)
        rollout = make_wta_rollout_diff(task.area, task.ts)
        return rollout(params["recurrent_weights"], tables, i1.T, i10.T)

    def drift(t, y, p, table):
        return wta_drift(t, y, p, task.area, Stimulus(0.0, dt, table))

    def diffusion(t, y, p, table):
        return wta_diffusion(t, y, p, task.area, Stimulus(0.0, dt, table))

    def one(stim_pair, k):
        table = wta_stim_three_phases(stim_pair, time_steps)
        from columnflow.solvers import sdeint

        return sdeint(
            drift, diffusion, jnp.zeros(48), task.ts, k, params, table,
            method=method, noise="scalar", additive=True,
        )

    return jax.vmap(one)(stims, keys)


def loss_fn(params, task: WTATask, true_states, stims, keys):
    ys = batched_rollout(params, task, stims, keys)
    return huber_trajectory_loss_wta(ys, true_states, params["output_weights"])


def make_train_step(task: WTATask):
    """Build the fused, jitted training step closing over the (static) task:
    batched SDE rollout, loss, masked grads, RMSprop update."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, true_states, stims, key):
        keys = jax.random.split(key, stims.shape[0])
        loss, grads = jax.value_and_grad(loss_fn)(
            params, task, true_states, stims, keys
        )
        grads = mask_grads(grads, task.grad_mask)
        gnorm = global_norm(grads)
        updates, opt_state = task.optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, gnorm

    return train_step


def global_norm(tree):
    """Overflow-robust global L2 norm (columnflow.train.global_norm)."""
    from columnflow.train import global_norm as _gn

    return _gn(tree)[0]


def make_train_scan(task: WTATask):
    """Multi-step training as ONE jitted ``lax.scan`` over iterations.

    The per-step host round-trip (dispatch through the device tunnel) costs
    as much as the 2.7 ms fused step itself; scanning K steps on-device
    removes it entirely. Batches are passed with a leading step axis:
    true_states (K, B, T, 2), stims (K, B, 2), keys (K,).

    Returns (params, opt_state, losses (K,), grad_norms (K,)).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_scan(params, opt_state, true_states, stims, keys):
        def body(carry, xs):
            params, opt_state = carry
            ts_b, st_b, key = xs
            bkeys = jax.random.split(key, st_b.shape[0])
            loss, grads = jax.value_and_grad(loss_fn)(
                params, task, ts_b, st_b, bkeys
            )
            grads = mask_grads(grads, task.grad_mask)
            gnorm = global_norm(grads)
            updates, opt_state = task.optimizer.update(grads, opt_state,
                                                       params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return (params, opt_state), (loss, gnorm)

        (params, opt_state), (losses, gnorms) = jax.lax.scan(
            body, (params, opt_state), (true_states, stims, keys)
        )
        return params, opt_state, losses, gnorms

    return train_scan


def make_train_epoch(task: WTATask, n: int, batch_size: int):
    """Blocks of full training iterations as one jitted ``lax.scan`` per
    dispatch — batch sampling (random permutation over the device-resident
    dataset), SDE rollout, masked update, and held-out validation all
    on-device. Host round-trips on the TPU tunnel cost ~30 ms each, more
    than the fused step, so the per-iteration host loop is dispatch-bound.

    Returns ``epoch_fn(params, opt_state, states, stims, keys (K,)) ->
    (params, opt_state, losses, val_losses, gnorms)``; the last permutation
    index of each iteration is the held-out validation sample, matching the
    reference's loop (scripts/wta_ode.py:163-204).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, states, stims, keys):
        def body(carry, key):
            params, opt_state = carry
            k_perm, k_noise, k_val = jax.random.split(key, 3)
            idx = jax.random.permutation(k_perm, n)[:batch_size]
            bs, bst = states[idx[:-1]], stims[idx[:-1]]
            bkeys = jax.random.split(k_noise, batch_size - 1)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, task, bs, bst, bkeys
            )
            grads = mask_grads(grads, task.grad_mask)
            gnorm = global_norm(grads)
            updates, opt_state = task.optimizer.update(grads, opt_state,
                                                       params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            val_loss = loss_fn(params, task, states[idx[-1:]],
                               stims[idx[-1:]], jax.random.split(k_val, 1))
            return (params, opt_state), (loss, val_loss, gnorm)

        (params, opt_state), (losses, val_losses, gnorms) = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses, val_losses, gnorms

    return epoch_fn


def make_dp_train_step(task: WTATask, mesh):
    """Data-parallel training step: the (samples x noise) batch axis is
    sharded across the device mesh, gradients pmean over ICI
    (see columnflow.parallel). Batch args: (true_states, stims, keys), all
    leading-axis divisible by mesh size."""
    from columnflow.parallel import make_dp_train_step as _mk

    def local_loss(params, true_states, stims, keys):
        return loss_fn(params, task, true_states, stims, keys)

    return _mk(local_loss, task.optimizer, task.grad_mask, mesh,
               num_batch_args=3)


def train_wta(
    nr_samples: int = 3000,
    batch_size: int = 16,
    seed: int = 0,
    lr: float = 10.0,
    noise_reps: int = 1,
    time_steps: int = TIME_STEPS,
    metrics_path: str | None = None,
    profile_dir: str | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    dataset=None,
    plot_dir: str | None = None,
    plot_every: int = 10,
    resume_from: str | None = None,
    legacy_scale: bool = False,
):
    """Full training run (reference defaults: 3000 samples, batch 16,
    scripts/wta_ode.py:208-216). The last sample of each batch is held out
    for validation, like the reference (scripts/wta_ode.py:166).
    ``resume_from`` restores params/optimizer/RNG/step from a checkpoint
    written by ``checkpoint_path`` and continues. ``legacy_scale`` builds the
    anatomy generation that produced the reference's shipped trained matrix
    (baseline strength x1e-3, see ``columnflow.config.legacy_wta_config``) —
    the regime where the reference protocol's RMSprop(lr=10) converges."""
    cfg = ColumnConfig.load()
    if legacy_scale:
        from columnflow.config import legacy_wta_config

        cfg = legacy_wta_config(cfg)
    key = jax.random.PRNGKey(seed)
    key, k_build, k_data = jax.random.split(key, 3)
    task = build_task(cfg, k_build, lr=lr, time_steps=time_steps)

    if dataset is None:
        states, stims = make_wta_dataset(k_data, nr_samples + 10, time_steps)
    else:
        states, stims = dataset
    states = states / 20.0  # scale to L2/3 rates (scripts/wta_ode.py:103)

    opt_state = task.optimizer.init(task.params)
    params = task.params
    start_it = 0
    if resume_from:
        from columnflow.train import load_checkpoint

        ck = load_checkpoint(resume_from, params_like=params,
                             opt_state_like=opt_state, key_like=key)
        params = ck["params"]
        if ck["opt_state"] is not None:
            opt_state = ck["opt_state"]
        if ck["key"] is not None:
            key = jnp.asarray(ck["key"])
        start_it = int(ck["step"])
        print(f"resumed from {resume_from} at iteration {start_it}")
    logger = MetricsLogger(metrics_path)
    profiler = StepProfiler(profile_dir)
    step_fn = make_train_step(task)
    n = states.shape[0]
    num_batches = n // batch_size
    history = []

    # Fast path (the common one): blocks of iterations as one on-device
    # scan per dispatch. The per-iteration host loop below remains for
    # noise_reps > 1 and per-iteration plotting.
    if noise_reps == 1 and plot_dir is None:
        epoch_fn = make_train_epoch(task, n, batch_size)
        block = 25
        for it0 in range(start_it, num_batches, block):
            profiler.step(it0)
            k = min(block, num_batches - it0)
            key, k_keys = jax.random.split(key)
            keys = jax.random.split(k_keys, k)
            params, opt_state, losses, val_losses, gnorms = epoch_fn(
                params, opt_state, states, stims, keys
            )
            losses, val_losses, gnorms = jax.device_get(
                (losses, val_losses, gnorms)
            )
            for j in range(k):
                logger.log(it0 + j, loss=float(losses[j]),
                           val_loss=float(val_losses[j]),
                           grad_norm=float(gnorms[j]))
                history.append({"loss": float(losses[j]),
                                "val_loss": float(val_losses[j])})
            if checkpoint_path:
                from columnflow.train import save_checkpoint

                save_checkpoint(checkpoint_path, params=params,
                                opt_state=opt_state, key=key, step=it0 + k)
        if checkpoint_path:
            from columnflow.train import save_checkpoint

            save_checkpoint(checkpoint_path, params=params,
                            opt_state=opt_state, key=key, step=num_batches)
        profiler.close()
        logger.close()
        return params, history

    val_fn = jax.jit(
        lambda params, true_states, stims, keys: loss_fn(
            params, task, true_states, stims, keys
        )
    )

    for it in range(start_it, num_batches):
        profiler.step(it)
        key, k_perm, k_noise, k_val = jax.random.split(key, 4)
        idx = jax.random.permutation(k_perm, n)[:batch_size]
        bs, bst = states[idx[:-1]], stims[idx[:-1]]  # last held out
        if noise_reps > 1:  # gradient averaging over noise realizations
            bs = jnp.tile(bs, (noise_reps, 1, 1))
            bst = jnp.tile(bst, (noise_reps, 1))
        params, opt_state, loss, gnorm = step_fn(
            params, opt_state, bs, bst, k_noise
        )
        val_loss = val_fn(
            params, true_states=states[idx[-1:]], stims=stims[idx[-1:]],
            keys=jax.random.split(k_val, 1),
        )
        # single host sync for all logged scalars (tunnel round-trips are
        # ~30 ms each)
        loss, val_loss, gnorm = map(float,
                                    jax.device_get((loss, val_loss, gnorm)))
        logger.log(it, loss=loss, val_loss=val_loss, grad_norm=gnorm)
        history.append({"loss": loss, "val_loss": val_loss})
        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            from columnflow.train import save_checkpoint

            save_checkpoint(checkpoint_path, params=params,
                            opt_state=opt_state, key=key, step=it + 1)

        if plot_dir and it % plot_every == 0:
            # Per-iteration training figure (reference: scripts/wta_ode.py
            # :17-54): held-out sample prediction + current weights.
            from columnflow.analysis.plots import plot_wta_training

            ys = batched_rollout(params, task, stims[idx[-1:]],
                                 jax.random.split(k_val, 1))
            plot_wta_training(
                np.asarray(ys[0]), np.asarray(states[idx[-1]]),
                np.asarray(stims[idx[-1]]), params["output_weights"],
                params["recurrent_weights"], loss, val_loss,
                f"{plot_dir}/wta_{it:04d}.png",
            )

    if checkpoint_path:
        from columnflow.train import save_checkpoint

        save_checkpoint(checkpoint_path, params=params, opt_state=opt_state,
                        key=key, step=num_batches)
    profiler.close()
    logger.close()
    return params, history


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=10.0,
                   help="reference protocol uses 10.0; 0.01 optimizes stably")
    p.add_argument("--noise-reps", type=int, default=1,
                   help="average gradients over R noise realizations/sample")
    p.add_argument("--legacy-scale", action="store_true",
                   help="build the legacy x1e-3 anatomy generation (the "
                        "reference's shipped trained matrix regime)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny run: 48 samples, 300 steps")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="dump a jax.profiler trace of steps 2-4 here")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume training from a --checkpoint-out checkpoint")
    args = p.parse_args()

    if args.smoke:
        params, hist = train_wta(
            nr_samples=48, batch_size=8, seed=args.seed, time_steps=300,
            lr=args.lr, noise_reps=args.noise_reps,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir, checkpoint_path=args.checkpoint_out,
            legacy_scale=args.legacy_scale,
        )
    else:
        params, hist = train_wta(
            nr_samples=args.samples, batch_size=args.batch_size,
            seed=args.seed, lr=args.lr, noise_reps=args.noise_reps,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir,
            checkpoint_path=args.checkpoint_out,
            resume_from=args.resume,
            legacy_scale=args.legacy_scale,
        )
    print(f"final loss {hist[-1]['loss']:.5f} | val {hist[-1]['val_loss']:.5f}")


if __name__ == "__main__":
    main()
