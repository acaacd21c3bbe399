"""Hopf-bifurcation neural-ODE regression (reference: scripts/bifurcation_ode.py).

Trains an MLP drift (3 -> 100 -> 100 -> 100 -> 2) to reproduce supercritical
Hopf spiral trajectories under a time-varying sine input mu(t). Ground truth
comes from integrating the Hopf normal form with our own adaptive dopri5;
training integrates the MLP over the batch with a single shared controller —
exactly the reference's batched odeint call (scripts/bifurcation_ode.py:210).
RMSprop(lr=1e-3), SmoothL1 trajectory loss (scripts/bifurcation_ode.py:70-72,
198).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from columnflow.data import make_hopf_dataset
from columnflow.models import build_hopf_mlp, hopf_mlp_drift
from columnflow.models.column import Stimulus
from columnflow.ops.losses import smooth_l1
from columnflow.train import MetricsLogger, StepProfiler, torch_rmsprop

TOTAL_TIME = 25.0
TIME_POINTS = 1000  # scripts/bifurcation_ode.py:186-189


class HopfTask(NamedTuple):
    params: list
    ts: jax.Array
    dt: float
    optimizer: object
    max_steps: int


def build_task(key, lr: float = 1e-3, time_points: int = TIME_POINTS,
               total_time: float = TOTAL_TIME, max_steps: int = 1024):
    params = build_hopf_mlp(key)
    ts = jnp.linspace(0.0, total_time, time_points)
    # torch RMSprop default alpha = 0.99 (scripts/bifurcation_ode.py:198).
    return HopfTask(params, ts, float(ts[1] - ts[0]),
                    torch_rmsprop(lr, alpha=0.99), max_steps)


def rollout(params, task: HopfTask, y0, mu_table, differentiable=True,
            use_fused: bool | None = None, adjoint: str = "replay"):
    """Batched integration with one shared adaptive controller:
    y0 (B, 2), mu_table (T, B) -> (T, B, 2).

    ``use_fused`` selects the Pallas fused dopri5 (solvers.fused) — same
    shared-controller semantics, every solver loop in-kernel; ``None``
    auto-selects it on TPU.
    """
    if use_fused is None:
        use_fused = (adjoint == "replay"
                     and jax.default_backend() not in ("cpu",))
    if use_fused:
        from columnflow.ops.interp import interp_at_onehot
        from columnflow.solvers import odeint_dopri5_fused

        dt = task.dt

        def drift(t, y, p, mu_tab):
            return hopf_mlp_drift(t, y, p, Stimulus(0.0, dt, mu_tab),
                                  interp_fn=interp_at_onehot)

        return odeint_dopri5_fused(
            drift, y0, task.ts, params, mu_table, max_steps=task.max_steps,
            nondiff_args=(1,),  # mu(t) is data
        )

    from columnflow.solvers import odeint

    stim = Stimulus(0.0, task.dt, mu_table)
    return odeint(
        lambda t, y, p: hopf_mlp_drift(t, y, p, stim),
        y0, task.ts, params,
        method="dopri5", max_steps=task.max_steps,
        adjoint=adjoint if differentiable else "none",
    )


def make_train_step(task: HopfTask, adjoint: str = "replay"):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, true_y):
        """true_y: (T, B, 3) with channels (x, y, mu)."""
        y0 = true_y[0, :, :2]
        target = true_y[:, :, :2]
        mu_table = true_y[:, :, 2]

        def loss_fn(p):
            pred = rollout(p, task, y0, mu_table, adjoint=adjoint)
            return smooth_l1(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = task.optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def make_dp_train_step(task: HopfTask, mesh):
    """Data-parallel training step: trajectories shard across the mesh.
    Batch arg: true_y_bt (B, T, 3) — batch-major so the mesh shards the
    leading axis; transposed to the solver's (T, B, .) internally."""
    from columnflow.parallel import make_dp_train_step as _mk

    def local_loss(params, true_y_bt):
        true_y = jnp.transpose(true_y_bt, (1, 0, 2))
        pred = rollout(params, task, true_y[0, :, :2], true_y[:, :, 2])
        return smooth_l1(pred, true_y[:, :, :2])

    return _mk(local_loss, task.optimizer, None, mesh, num_batch_args=1)


def train_bifurcation(
    nr_samples: int = 5000,
    batch_size: int = 32,
    seed: int = 0,
    time_points: int = TIME_POINTS,
    total_time: float = TOTAL_TIME,
    test_freq: int = 3,
    max_steps: int = 1024,
    metrics_path: str | None = None,
    profile_dir: str | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    dataset=None,
    plot_dir: str | None = None,
    adjoint: str = "replay",
    resume_from: str | None = None,
):
    """Reference defaults: 5000 samples, batch 32 (scripts/bifurcation_ode.py:179-198).

    ``resume_from`` restores params/optimizer/RNG/step from a checkpoint
    written by ``checkpoint_path`` (saved every ``checkpoint_every``
    iterations and at the end) and continues where the run stopped."""
    key = jax.random.PRNGKey(seed)
    key, k_build, k_data = jax.random.split(key, 3)
    task = build_task(k_build, time_points=time_points, total_time=total_time,
                      max_steps=max_steps)

    n_val = max(1, (nr_samples // batch_size) // test_freq + 1)
    if dataset is None:
        ds = make_hopf_dataset(k_data, nr_samples + n_val, task.ts)
    else:
        ds = dataset
    train_ds = ds[:, :nr_samples, :]
    val_ds = ds[:, nr_samples:, :]

    step_fn = make_train_step(task, adjoint=adjoint)
    val_fn = jax.jit(
        lambda p, true_y: smooth_l1(
            rollout(p, task, true_y[0, :, :2], true_y[:, :, 2],
                    differentiable=False),
            true_y[:, :, :2],
        )
    )

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
    history = []
    n = train_ds.shape[1]
    ii = (start_it + test_freq - 1) // test_freq

    for it in range(start_it, n // batch_size):
        profiler.step(it)
        key, k_perm = jax.random.split(key)
        idx = jax.random.permutation(k_perm, n)[:batch_size]
        batch = train_ds[:, idx, :]
        params, opt_state, loss = step_fn(params, opt_state, batch)
        rec = {"loss": float(jax.device_get(loss))}
        if it % test_freq == 0:
            vi = min(ii, val_ds.shape[1] - 1)
            val_true = val_ds[:, vi : vi + 1, :]
            val_loss = val_fn(params, val_true)
            rec["val_loss"] = float(val_loss)
            if plot_dir:
                # Validation figure (reference: scripts/bifurcation_ode.py
                # :23-64, :217-226).
                from columnflow.analysis.plots import plot_hopf

                pred = rollout(params, task, val_true[0, :, :2],
                               val_true[:, :, 2], differentiable=False)
                plot_hopf(val_true, pred, task.ts, float(loss),
                          float(val_loss), f"{plot_dir}/hopf_{ii:03d}.png")
            ii += 1
        logger.log(it, **rec)
        history.append(rec)
        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            from columnflow.train import save_checkpoint

            save_checkpoint(checkpoint_path, params=params,
                            opt_state=opt_state, key=key, step=it + 1)

    if checkpoint_path:
        from columnflow.train import save_checkpoint

        save_checkpoint(checkpoint_path, params=params, opt_state=opt_state,
                        key=key, step=start_it + len(history))
    profiler.close()
    logger.close()
    return params, history


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--adjoint", default="replay",
                   choices=["replay", "backsolve"],
                   help="gradient mode: discrete backprop through the frozen"
                        " step sequence (reference semantics) or continuous"
                        " adjoint (O(1) memory)")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="dump a jax.profiler trace of steps 2-4 here")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume training from a --checkpoint-out checkpoint")
    args = p.parse_args()

    if args.smoke:
        params, hist = train_bifurcation(
            nr_samples=16, batch_size=8, time_points=100, total_time=2.5,
            max_steps=512, seed=args.seed, adjoint=args.adjoint,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir,
        )
    else:
        params, hist = train_bifurcation(
            nr_samples=args.samples, batch_size=args.batch_size,
            seed=args.seed, adjoint=args.adjoint,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir,
            checkpoint_path=args.checkpoint_out,
            resume_from=args.resume,
        )
    print(f"final loss {hist[-1]['loss']:.5f}")


if __name__ == "__main__":
    main()
