"""XOR classification task (reference: scripts/xor_ode.py).

Trains the feedforward weights of a 3-column, 2-area network so the output
column C fires high for different inputs (target 1.0) and low for same inputs
(target 0.25). Deterministic adaptive dopri5 integration, RMSprop(lr=0.5,
alpha=0.95) + ExponentialLR(0.8), gradients masked to L4e/L4i targets
(reference: scripts/xor_ode.py:161-198).

The reference runs the four XOR conditions sequentially through torchdiffeq
(scripts/xor_ode.py:104-117); here they are one vmapped, jitted adaptive
solve with replay gradients.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.data import prep_xor_stim, xor_conditions
from columnflow.models import Stimulus, build_xor_network, xor_drift
from columnflow.models.xor import FF_SOURCE_MASK, FF_TARGET_MASK, XOR_STATE_DIM
from columnflow.ops.transfer import compute_firing_rate
from columnflow.train import MetricsLogger, StepProfiler, exponential_lr, mask_grads, torch_rmsprop

DT = 1e-3
STIM_DURATION = 0.5
TIME_STEPS = int(STIM_DURATION * 2 / DT)  # scripts/xor_ode.py:152-155


class XORTask(NamedTuple):
    params: dict
    net: object
    ts: jax.Array
    dt: float
    grad_mask: dict
    optimizer: object
    max_steps: int
    # Deterministic-solve settings; dopri5 at torchdiffeq's default
    # tolerances is the reference pin (scripts/xor_ode.py:114). "kvaerno3"
    # (implicit, L-stable) is the loose-tolerance choice on this stiff
    # physics (RESULTS.md).
    ode_method: str = "dopri5"
    rtol: float = 1e-7
    atol: float = 1e-9


def build_task(cfg: ColumnConfig, key, lr: float = 0.5, alpha: float = 0.95,
               lr_gamma: float = 0.8, time_steps: int = TIME_STEPS,
               dt: float = DT, max_steps: int = 3072,
               ode_method: str = "dopri5",
               rtol: float = 1e-7, atol: float = 1e-9) -> XORTask:
    params, net = build_xor_network(cfg, key)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grad_mask = {
        "ff_w0": jnp.tile(jnp.asarray(FF_TARGET_MASK), 2)[None, :],
        "ff_w1": jnp.asarray(FF_TARGET_MASK)[None, :],
    }
    optimizer = torch_rmsprop(exponential_lr(lr, lr_gamma), alpha=alpha)
    return XORTask(params, net, ts, float(ts[1] - ts[0]), grad_mask,
                   optimizer, max_steps,
                   ode_method=ode_method, rtol=rtol, atol=atol)


def batched_rollout(params, task: XORTask, conditions, method=None,
                    differentiable=True, use_fused: bool = False,
                    stochastic: bool = False, key=None,
                    adaptive: bool = False, adaptive_rtol: float = 1e-3,
                    adaptive_atol: float = 1e-3,
                    adaptive_max_steps: int = 2048,
                    adaptive_bptt_every: int | None = None,
                    fused_pass: bool = False):
    """Integrate the four XOR conditions: (4, 2) -> (4, T, 72).

    ``use_fused=True``: one shared-controller Pallas fused dopri5 solve for
    the whole batch (see tasks.parity.batched_rollout for the semantics
    trade-off vs the reference's per-sample solves).

    ``stochastic=True``: integrate the Ito SDE instead (membrane-only
    sigma=10 diffusion, scripts/xor_ode.py's commented-in sdeint at :115);
    requires ``key``; SRA1 on the fixed dt grid, per-sample Brownian.
    ``adaptive=True`` (with ``stochastic``): adaptive step-doubling SRA1 on
    a virtual-Brownian-tree path with replay gradients (torchsde's
    ``adaptive=True`` with training support). ``fused_pass=True`` (with
    ``adaptive`` and ``use_fused``) additionally runs the step-size-
    selection pass in-kernel on the krng Brownian backend (see
    tasks.parity.batched_rollout).
    """
    from columnflow.solvers import odeint

    if method is None:  # deterministic solver settings ride on the task
        method = task.ode_method
    time_steps = task.ts.shape[0]
    if fused_pass and not (stochastic and adaptive and use_fused):
        raise ValueError("fused_pass requires stochastic=True, "
                         "adaptive=True and use_fused=True")

    if stochastic:
        if key is None:
            raise ValueError("stochastic rollout needs a PRNG key")
        from columnflow.models.xor import xor_diffusion
        from columnflow.solvers import sdeint

        keys = jax.random.split(key, conditions.shape[0])

        if adaptive:
            from columnflow.solvers import sdeint_adaptive

            if use_fused:
                # Kernel-safe replay (same formulation as the fused dopri5
                # path): batched drift, split ff rows, knot stimulus;
                # membrane-only sigma via iota mask (lane-concat-free).
                from columnflow.models.xor import (
                    XOR_NOISE_STD,
                    build_xor_fused_consts,
                    split_xor_params,
                    xor_drift_batched,
                )
                from columnflow.ops.interp import interp_knots, step_table_knots

                dt = task.dt
                fc = build_xor_fused_consts(task.net)
                kts, _ = step_table_knots(time_steps, dt, jnp.zeros(32),
                                          jnp.zeros(32))
                pf = split_xor_params(params)

                def a_drift(t, y, pf, fc, kv):
                    return xor_drift_batched(
                        t, y, pf, fc, Stimulus(0.0, dt, kv),
                        interp_fn=lambda t_, t0_, dt_, v:
                            interp_knots(t_, kts, v),
                    )

                def a_diff(t, y, pf, fc, kv):
                    idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                    return jnp.where(idx < 24, XOR_NOISE_STD, 0.0
                                     ).astype(y.dtype)

                from columnflow.solvers import sdeint_adaptive_batch

                # Per-lane selection + ONE lane-batched kernel replay over
                # all frozen grids (see tasks.parity.batched_rollout;
                # equality with the vmapped per-sample form is CI-pinned,
                # tests/test_sde_adaptive.py::TestBatchedFusedReplay).
                def lane_knots(cond):
                    table = prep_xor_stim(cond, time_steps)
                    on_vals = table[-1].reshape(1, 32)
                    return step_table_knots(time_steps, dt,
                                            jnp.zeros_like(on_vals),
                                            on_vals)[1]   # (4, 1, 32)

                kvals_all = jax.vmap(lane_knots)(conditions)  # (B, 4, 1, 32)
                B = conditions.shape[0]
                ys = sdeint_adaptive_batch(
                    a_drift, a_diff, jnp.zeros((B, 1, XOR_STATE_DIM)),
                    task.ts, keys, pf, fc,
                    batch_args=(kvals_all,),
                    method="sra1", rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    bptt_every=adaptive_bptt_every,
                    fused_pass=fused_pass,
                    fused=True, fused_drift=a_drift, fused_diffusion=a_diff,
                    fused_args=(pf, fc,
                                jnp.moveaxis(kvals_all[:, :, 0, :], 0, 1)),
                    fused_y0=jnp.zeros((B, XOR_STATE_DIM)),
                    nondiff_args=(1, 2),
                )                                         # (B, T, 72)
                return ys if differentiable else jax.lax.stop_gradient(ys)

            if differentiable:
                # Batched replay with the padding-tail chunk skip (see
                # tasks.parity.batched_rollout; per-sample controllers and
                # noise are identical to the vmapped per-sample path).
                from columnflow.solvers import sdeint_adaptive_batch

                tables = jax.vmap(
                    lambda c: prep_xor_stim(c, time_steps))(conditions)
                B = conditions.shape[0]
                return sdeint_adaptive_batch(
                    lambda t, y, tab: xor_drift(
                        t, y, params, task.net, Stimulus(0.0, task.dt, tab)),
                    lambda t, y, tab: xor_diffusion(
                        t, y, params, task.net, Stimulus(0.0, task.dt, tab)),
                    jnp.zeros((B, XOR_STATE_DIM)), task.ts, keys,
                    batch_args=(tables,), method="sra1",
                    rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    bptt_every=adaptive_bptt_every,
                )

            def one_adaptive(cond, k):
                table = prep_xor_stim(cond, time_steps)
                stim = Stimulus(0.0, task.dt, table)
                return sdeint_adaptive(
                    lambda t, y: xor_drift(t, y, params, task.net, stim),
                    lambda t, y: xor_diffusion(t, y, params, task.net, stim),
                    jnp.zeros(XOR_STATE_DIM), task.ts, k,
                    method="sra1", rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    differentiable=differentiable,
                    bptt_every=adaptive_bptt_every,
                )

            return jax.vmap(one_adaptive)(conditions, keys)

        if use_fused:
            # Whole batch in ONE fused fixed-grid SDE solve (the parity
            # pattern): kernel-safe batched drift, knot stimulus, one
            # shared-per-sample scalar Brownian via noise_shape=(B, 1).
            from columnflow.models.xor import (
                XOR_NOISE_STD,
                build_xor_fused_consts,
                split_xor_params,
                xor_drift_batched,
            )
            from columnflow.ops.interp import interp_knots, step_table_knots
            from columnflow.solvers import sdeint_fused

            dt = task.dt
            fc = build_xor_fused_consts(task.net)
            B = conditions.shape[0]
            tables = jax.vmap(lambda c: prep_xor_stim(c, time_steps))(
                conditions)
            on_vals = tables[:, -1].reshape(B, 32)
            kts, kvals = step_table_knots(time_steps, dt,
                                          jnp.zeros_like(on_vals), on_vals)

            def f_drift(t, y, p, fc, kv):
                return xor_drift_batched(
                    t, y, p, fc, Stimulus(0.0, dt, kv),
                    interp_fn=lambda t_, t0_, dt_, v:
                        interp_knots(t_, kts, v),
                )

            def f_diff(t, y, p, fc, kv):
                idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                return jnp.where(idx < 24, XOR_NOISE_STD, 0.0
                                 ).astype(y.dtype)

            ys = sdeint_fused(
                f_drift, f_diff, jnp.zeros((B, XOR_STATE_DIM)), task.ts,
                key, split_xor_params(params), fc, kvals,
                method="srk", noise_shape=(B, 1), nondiff_args=(1, 2),
                interpret=jax.default_backend() == "cpu",
            )  # (T, B, 72)
            return jnp.transpose(ys, (1, 0, 2))

        def one_sde(cond, k):
            table = prep_xor_stim(cond, time_steps)
            stim = Stimulus(0.0, task.dt, table)
            return sdeint(
                lambda t, y: xor_drift(t, y, params, task.net, stim),
                lambda t, y: xor_diffusion(t, y, params, task.net, stim),
                jnp.zeros(XOR_STATE_DIM), task.ts, k,
                method="srk", noise="scalar", additive=True,
            )

        return jax.vmap(one_sde)(conditions, keys)

    if use_fused and method == "dopri5":
        from columnflow.models.xor import (
            build_xor_fused_consts,
            split_xor_params,
            xor_drift_batched,
        )
        from columnflow.ops.interp import interp_knots, step_table_knots
        from columnflow.solvers import odeint_dopri5_fused

        dt = task.dt
        fc = build_xor_fused_consts(task.net)
        B = conditions.shape[0]
        # On-phase stimulus rows (slots flattened to (B, 32), see
        # xor_drift_batched), as 4 piecewise-linear knots instead of a
        # dense lane-padded (T, B, 32) table.
        tables = jax.vmap(lambda c: prep_xor_stim(c, time_steps))(conditions)
        on_vals = tables[:, -1].reshape(B, 32)
        kts, kvals = step_table_knots(time_steps, dt,
                                      jnp.zeros_like(on_vals), on_vals)

        def drift(t, y, p, fc, kv):
            return xor_drift_batched(
                t, y, p, fc, Stimulus(0.0, dt, kv),
                interp_fn=lambda t_, t0_, dt_, v: interp_knots(t_, kts, v),
            )

        y0 = jnp.zeros((conditions.shape[0], XOR_STATE_DIM))
        ys = odeint_dopri5_fused(
            drift, y0, task.ts, split_xor_params(params), fc, kvals,
            max_steps=task.max_steps,
            nondiff_args=(1, 2),  # anatomy + stimulus are data
        )
        return jnp.transpose(ys, (1, 0, 2))

    def drift(t, y, p, table):
        return xor_drift(t, y, p, task.net, Stimulus(0.0, task.dt, table))

    def one(cond):
        table = prep_xor_stim(cond, time_steps)
        return odeint(
            drift, jnp.zeros(XOR_STATE_DIM), task.ts, params, table,
            method=method, rtol=task.rtol, atol=task.atol,
            max_steps=task.max_steps,
            adjoint="replay" if differentiable else "none",
            remat=False,  # activations fit in HBM; ~1/3 faster backward
        )

    return jax.vmap(one)(conditions)


def readout(ys, targets_raw):
    """Final firing rate of column C projected through the L2/3e source mask
    (reference: scripts/xor_ode.py:119-130). Returns (final_fr_C, loss)."""
    fr = compute_firing_rate(ys[..., :24] - ys[..., 24:48])
    final_c = jnp.sum(fr[:, -1, 16:] * jnp.asarray(FF_SOURCE_MASK), axis=-1)
    loss = jnp.mean(jnp.abs(final_c - targets_raw))
    return final_c, loss


def xor_targets(conditions):
    """1.0 for different inputs, 0.25 for same (scripts/xor_ode.py:128-129)."""
    diff = conditions[:, 0] != conditions[:, 1]
    return jnp.where(diff, 1.0, 0.25)


def make_train_step(task: XORTask, use_fused: bool = False,
                    stochastic: bool = False, adaptive: bool = False,
                    fused_pass: bool = False):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, conditions, noise_key=None):
        def loss_fn(p):
            ys = batched_rollout(p, task, conditions, use_fused=use_fused,
                                 stochastic=stochastic, key=noise_key,
                                 adaptive=adaptive, fused_pass=fused_pass)
            _, loss = readout(ys, xor_targets(conditions))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = mask_grads(grads, task.grad_mask)
        updates, opt_state = task.optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def make_dp_train_step_mesh(task: XORTask, mesh, use_fused: bool = False):
    """Data-parallel training step over a device mesh (the 4 XOR
    conditions shard across devices; gradients pmean over ICI)."""
    from columnflow.parallel import make_dp_train_step as _mk

    def local_loss(params, conditions):
        ys = batched_rollout(params, task, conditions, use_fused=use_fused)
        _, loss = readout(ys, xor_targets(conditions))
        return loss

    return _mk(local_loss, task.optimizer, task.grad_mask, mesh,
               num_batch_args=1)


def train_xor(
    nr_samples: int = 160,
    batch_size: int = 4,
    seed: int = 0,
    time_steps: int = TIME_STEPS,
    max_steps: int = 3072,
    metrics_path: str | None = None,
    profile_dir: str | None = None,
    checkpoint_path: str | None = None,
    plot_dir: str | None = None,
    plot_every: int = 5,
    use_fused: bool = False,
    stochastic: bool = False,
    adaptive: bool = False,
    fused_pass: bool = False,
    checkpoint_every: int = 10,
    resume_from: str | None = None,
    ode_method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
):
    """Reference defaults: 160 samples / batch 4 -> 40 iterations
    (scripts/xor_ode.py:202-207). ``stochastic`` trains through the Ito
    SDE (the reference's commented-in sdeint, scripts/xor_ode.py:115);
    ``resume_from`` restores params/optimizer/RNG/step from a checkpoint
    and continues."""
    cfg = ColumnConfig.load()
    key = jax.random.PRNGKey(seed)
    key, k_build = jax.random.split(key)
    task = build_task(cfg, k_build, time_steps=time_steps,
                      max_steps=max_steps, ode_method=ode_method,
                      rtol=rtol, atol=atol)

    step_fn = make_train_step(task, use_fused=use_fused,
                              stochastic=stochastic, adaptive=adaptive,
                              fused_pass=fused_pass)
    eval_fn = jax.jit(
        lambda p, conds: readout(
            batched_rollout(p, task, conds, differentiable=False),
            xor_targets(conds),
        )
    )

    conds_all = jnp.asarray(xor_conditions())
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

    for it in range(start_it, nr_samples // batch_size):
        profiler.step(it)
        key, k_shuf, k_noise = jax.random.split(key, 3)
        conds = conds_all[jax.random.permutation(k_shuf, 4)]
        params, opt_state, loss = step_fn(
            params, opt_state, conds, k_noise if stochastic else None)
        final_c, test_loss = eval_fn(params, conds_all)
        # single host sync for all logged values
        loss, final_c, test_loss = jax.device_get((loss, final_c, test_loss))
        out = np.asarray(final_c)
        acc = float(np.mean((out > (out.min() + out.max()) / 2)
                            == np.asarray([True, True, False, False])))
        logger.log(it, loss=loss, test_loss=test_loss, acc=acc)
        history.append({"loss": float(loss), "test_loss": float(test_loss),
                        "acc": acc, "final_fr": out.tolist()})
        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            from columnflow.train import save_checkpoint

            save_checkpoint(checkpoint_path, params=params,
                            opt_state=opt_state, key=key, step=it + 1)

        if plot_dir and it % plot_every == 0:
            # Per-iteration test figures (reference: scripts/xor_ode.py:15-50).
            from columnflow.analysis.plots import plot_xor_training

            ys = batched_rollout(params, task, conds_all,
                                 differentiable=False)
            fr = compute_firing_rate(ys[..., :24] - ys[..., 24:48])
            for i in range(4):
                plot_xor_training(
                    np.asarray(fr[i]), np.asarray(conds_all[i]), loss,
                    f"{plot_dir}/xor_{it:03d}_{i}.png",
                )

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
    p.add_argument("--samples", type=int, default=160)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "xla", "fused"],
                   help="solver-engine selection (default auto — same "
                        "dispatch surface as tasks.parity: at the XOR "
                        "scale (3 columns) the fused engine is "
                        "measured-best, 27 vs 210 ms/step). Any explicit "
                        "engine flag (--fused/--fused-pass) or a "
                        "non-default --method switches to manual mode")
    p.add_argument("--fused", action="store_true",
                   help="shared-controller Pallas fused dopri5")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="dump a jax.profiler trace of steps 2-4 here")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--stochastic", action="store_true",
                   help="train through the Ito SDE (the reference's "
                        "commented-in sdeint, scripts/xor_ode.py:115)")
    p.add_argument("--adaptive", action="store_true",
                   help="with --stochastic: adaptive step-doubling SRA1 "
                        "with replay gradients (torchsde adaptive=True)")
    p.add_argument("--fused-pass", action="store_true",
                   help="with --adaptive --fused: run the step-size-"
                        "selection pass in-kernel (VMEM-resident weights, "
                        "krng Brownian backend)")
    p.add_argument("--method", default="dopri5", dest="ode_method",
                   help="deterministic ODE method (default dopri5 = the "
                        "reference's torchdiffeq pin, scripts/xor_ode.py:114;"
                        " 'kvaerno3' for loose-tolerance stiff solves)")
    p.add_argument("--rtol", type=float, default=1e-7,
                   help="deterministic-solve rtol (torchdiffeq default)")
    p.add_argument("--atol", type=float, default=1e-9,
                   help="deterministic-solve atol (torchdiffeq default)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume training from a --checkpoint-out checkpoint")
    args = p.parse_args()
    # Scale-aware engine dispatch, mirroring tasks.parity: explicit
    # engine flags (or a pinned non-default method) switch to manual
    # mode; otherwise auto/fused/xla resolve use_fused via the parity
    # crossover policy (XOR's 3-column scale sits in the fused band).
    manual_flags = (args.fused or args.fused_pass
                    or args.ode_method != "dopri5")
    if not manual_flags:
        from columnflow.tasks.parity import resolve_engine

        flags, why = resolve_engine(args.engine, 3,
                                    stochastic=args.stochastic,
                                    adaptive=args.adaptive)
        args.fused = flags["use_fused"]
        print(f"engine {args.engine} -> "
              f"{'fused' if args.fused else 'xla'}: {why}")

    if args.smoke:
        params, hist = train_xor(nr_samples=8, time_steps=200, max_steps=1024,
                                 seed=args.seed, metrics_path=args.metrics_out,
                                 profile_dir=args.profile_dir,
                                 stochastic=args.stochastic,
                                 adaptive=args.adaptive,
                                 use_fused=args.fused,
                                 fused_pass=args.fused_pass,
                                 ode_method=args.ode_method,
                                 rtol=args.rtol, atol=args.atol)
    else:
        params, hist = train_xor(nr_samples=args.samples, seed=args.seed,
                                 use_fused=args.fused,
                                 metrics_path=args.metrics_out,
                                 profile_dir=args.profile_dir,
                                 checkpoint_path=args.checkpoint_out,
                                 stochastic=args.stochastic,
                                 adaptive=args.adaptive,
                                 fused_pass=args.fused_pass,
                                 resume_from=args.resume,
                                 ode_method=args.ode_method,
                                 rtol=args.rtol, atol=args.atol)
    print(f"final loss {hist[-1]['loss']:.5f} | acc {hist[-1]['acc']:.2f}")


if __name__ == "__main__":
    main()
