"""Stochastic WTA noise-realization sweep (BASELINE.json config 5).

The reference can only run one SDE trajectory at a time (torchsde call sites:
scripts/wta_ode.py:174, scripts/plotting_results.py:391); its README notes
that adaptive SDE stepping "significantly increases computation time"
(reference: README.md:27-29). Here a sweep of 100+ noise realizations of the
stochastic WTA model is ONE vmapped, jitted computation per coherence:

- fixed-step path: the fused Pallas SRA1 rollout (kernels.column_step), all
  realizations batched through one kernel;
- adaptive path: ``sdeint_adaptive`` (Milstein + PI controller on a virtual
  Brownian tree) vmapped over realization keys — the "expensive" reference
  option, made cheap by running every realization in parallel on-chip.

Outputs decision statistics per coherence level (fraction of realizations
where column A wins, mean decision rates), i.e. the psychometric curve of the
model — the scientific object the reference's coherence analyses build by
hand (scripts/plotting_results.py:26-208).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.data import wta_stim_three_phases
from columnflow.models import Stimulus, build_wta, wta_diffusion, wta_drift
from columnflow.ops.transfer import compute_firing_rate

DT = 1e-4
STIM_PHASE = 0.05
TIME_STEPS = int(STIM_PHASE * 3 / DT)


@functools.partial(
    jax.jit,
    static_argnames=("time_steps", "dt", "mode", "chunk", "rtol", "atol"),
)
def _rollout_many_jit(params, area, stim_pairs, keys, *, time_steps, dt,
                      mode, chunk=0, rtol=1e-3, atol=1e-3):
    """Batched SRA1/adaptive rollouts: stim_pairs (B, 2), keys (B,)
    -> (B, T, 48). Module-level jit with static config so repeated sweeps
    (same shapes) reuse one compilation."""
    ts = np.linspace(0.0, time_steps * dt, time_steps)  # host grid (static)

    if mode == "adaptive":
        from columnflow.solvers import sdeint_adaptive

        def one(stim_pair, k):
            table = wta_stim_three_phases(stim_pair, time_steps)
            stim = Stimulus(0.0, float(ts[1]), table)
            return sdeint_adaptive(
                lambda t, y: wta_drift(t, y, params, area, stim),
                lambda t, y: wta_diffusion(t, y, params, area, stim),
                jnp.zeros(48), jnp.asarray(ts, jnp.float32), k,
                method="milstein", rtol=rtol, atol=atol,
            )

        return jax.vmap(one)(stim_pairs, keys)

    if mode == "fused":
        from columnflow.kernels.column_step import wta_rollout_fused_chunked
        from columnflow.solvers.sde import _brownian_pack

        tables = jax.vmap(
            lambda s: wta_stim_three_phases(s, time_steps)
        )(stim_pairs)
        _, i1, i10, _, _ = jax.vmap(
            lambda k: _brownian_pack(k, jnp.asarray(ts, jnp.float32), (),
                                     jnp.float32)
        )(keys)
        y0 = jnp.zeros((stim_pairs.shape[0], 48), dtype=jnp.float32)
        return wta_rollout_fused_chunked(
            params, area, y0, tables, ts, i1.T, i10.T, chunk=chunk
        )

    from columnflow.solvers import sdeint

    def one(stim_pair, k):
        table = wta_stim_three_phases(stim_pair, time_steps)
        stim = Stimulus(0.0, float(ts[1]), table)
        return sdeint(
            lambda t, y: wta_drift(t, y, params, area, stim),
            lambda t, y: wta_diffusion(t, y, params, area, stim),
            jnp.zeros(48), jnp.asarray(ts, jnp.float32), k,
            method="srk", additive=True,
        )

    return jax.vmap(one)(stim_pairs, keys)


def _rollout_many(params, area, ts, stim_pairs, keys, adaptive=False,
                  rtol=1e-3, atol=1e-3, use_fused=None):
    """See _rollout_many_jit; this wrapper resolves mode/chunk defaults."""
    ts_host = np.asarray(ts)
    time_steps = int(ts_host.shape[0])
    dt = float(ts_host[1] - ts_host[0])
    if adaptive:
        mode, chunk = "adaptive", 0
    else:
        if use_fused is None:
            use_fused = jax.default_backend() not in ("cpu",)
        if use_fused:
            from columnflow.kernels.column_step import auto_chunk

            mode, chunk = "fused", auto_chunk(int(stim_pairs.shape[0]))
        else:
            mode, chunk = "scan", 0
    return _rollout_many_jit(params, area, stim_pairs, keys,
                             time_steps=time_steps, dt=dt, mode=mode,
                             chunk=chunk, rtol=rtol, atol=atol)


_SHARDED_ROLLOUT_CACHE: dict = {}


def _rollout_many_sharded(params, area, ts, stim_pairs, keys, mesh,
                          **kw):
    """Shard the realization batch over a device mesh: each device runs the
    (possibly fused-Pallas) rollout on its local shard — embarrassingly
    parallel, so no collectives; the analysis reductions happen on the
    gathered result. Params are replicated. The batch must divide the mesh.

    The jitted shard_map is cached per (area, mesh, batch shape, solver
    options) so repeated sweeps don't retrace/recompile.
    """
    import functools

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ts_host = np.asarray(ts)
    ck = (id(area), id(mesh), tuple(stim_pairs.shape), int(ts_host.shape[0]),
          float(ts_host[-1]), tuple(sorted(kw.items())))
    run = _SHARDED_ROLLOUT_CACHE.get(ck)
    if run is None:
        axis = mesh.axis_names[0]

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(axis), P(axis)), out_specs=P(axis),
            check_vma=False,
        )
        def run(p, sp, ks):
            return _rollout_many(p, area, ts, sp, ks, **kw)

        _SHARDED_ROLLOUT_CACHE[ck] = run

    return run(params, stim_pairs, keys)


def sweep_noise_realizations(
    params,
    area,
    key,
    stim_pair,
    n_realizations: int = 128,
    time_steps: int = TIME_STEPS,
    dt: float = DT,
    adaptive: bool = False,
    rtol: float = 1e-3,
    atol: float = 1e-3,
    use_fused: bool | None = None,
    mesh=None,
):
    """Run ``n_realizations`` SDE trajectories of one stimulus condition.

    ``mesh``: optional 1-D device mesh — realizations are sharded across it
    (multi-chip sweeps; reference runs them one at a time on one CPU,
    scripts/plotting_results.py:391).

    Returns dict with 'frac_a_wins' (scalar), 'rate_a'/'rate_b'
    ((n_realizations,) mean L2/3e decision rates over the stim+post window),
    and 'trajectories' ((n_realizations, T, 48)).
    """
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    keys = jax.random.split(key, n_realizations)
    stim_pairs = jnp.broadcast_to(
        jnp.asarray(stim_pair, jnp.float32)[None], (n_realizations, 2)
    )
    if mesh is not None:
        ys = _rollout_many_sharded(params, area, ts, stim_pairs, keys, mesh,
                                   adaptive=adaptive, rtol=rtol, atol=atol,
                                   use_fused=use_fused)
    else:
        ys = _rollout_many(params, area, ts, stim_pairs, keys,
                           adaptive=adaptive, rtol=rtol, atol=atol,
                           use_fused=use_fused)

    fr = compute_firing_rate(ys[..., :16] - ys[..., 16:32])
    onset = time_steps // 3
    rate_a = fr[:, onset:, 0].mean(axis=1)
    rate_b = fr[:, onset:, 8].mean(axis=1)
    return {
        "frac_a_wins": float(jnp.mean(rate_a > rate_b)),
        "rate_a": rate_a,
        "rate_b": rate_b,
        "trajectories": ys,
    }


def psychometric_curve(params, area, key, coherences=None,
                       mu_base: float = 20.0, n_realizations: int = 128,
                       time_steps: int = TIME_STEPS, dt: float = DT,
                       mesh=None, **kw):
    """Fraction of A-wins per coherence: the model's psychometric function.

    coherence c drives column A with mu_base + c/2 and B with mu_base - c/2.
    The whole (coherences x realizations) grid is ONE flat batched rollout;
    with ``mesh`` the grid shards across the devices (C*R must divide the
    mesh size).
    Returns (coherences, frac_a_wins array).
    """
    if coherences is None:
        coherences = np.arange(-20.0, 21.0, 5.0)
    coherences = np.asarray(coherences, np.float32)
    C, R = len(coherences), n_realizations
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)

    pairs = np.stack([mu_base + coherences / 2.0,
                      mu_base - coherences / 2.0], axis=1)  # (C, 2)
    stim_pairs = jnp.asarray(np.repeat(pairs, R, axis=0))  # (C*R, 2)
    keys = jax.random.split(key, C * R)
    if mesh is not None:
        ys = _rollout_many_sharded(params, area, ts, stim_pairs, keys, mesh,
                                   **kw)
    else:
        ys = _rollout_many(params, area, ts, stim_pairs, keys, **kw)

    fr = compute_firing_rate(ys[..., :16] - ys[..., 16:32])
    onset = time_steps // 3
    rate_a = fr[:, onset:, 0].mean(axis=1).reshape(C, R)
    rate_b = fr[:, onset:, 8].mean(axis=1).reshape(C, R)
    fracs = np.asarray(jnp.mean(rate_a > rate_b, axis=1))
    return coherences, fracs


def main():
    import argparse
    import time

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--realizations", type=int, default=128)
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive Milstein on a virtual Brownian tree")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--demo", action="store_true",
                   help="use the packaged trained-WTA demo checkpoint")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="npz output path")
    p.add_argument("--mesh", action="store_true",
                   help="shard the (coherence x realization) grid over all "
                        "devices")
    args = p.parse_args()

    cfg = ColumnConfig.load()
    params, area = build_wta(cfg, jax.random.PRNGKey(0))
    if args.demo:
        from columnflow.analysis.demo import load_demo_wta

        params, area = load_demo_wta()
    elif args.checkpoint:
        from columnflow.train import load_checkpoint

        params = load_checkpoint(args.checkpoint, params_like=params)["params"]

    mesh = None
    if args.mesh:
        from columnflow.parallel import make_mesh

        mesh = make_mesh()
    key = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    coherences, fracs = psychometric_curve(
        params, area, key, n_realizations=args.realizations,
        adaptive=args.adaptive, mesh=mesh,
    )
    wall = time.perf_counter() - t0
    # Second sweep reuses the compilation: the steady-state number.
    t0 = time.perf_counter()
    psychometric_curve(params, area, jax.random.PRNGKey(args.seed + 1),
                       n_realizations=args.realizations,
                       adaptive=args.adaptive, mesh=mesh)
    wall_hot = time.perf_counter() - t0
    for c, f in zip(coherences, fracs):
        print(f"coherence {c:+6.1f}: P(A wins) = {f:.3f}")
    n_traj = len(coherences) * args.realizations
    method = "adaptive milstein" if args.adaptive else "fixed-step srk"
    print(f"{n_traj} trajectories: {wall:.2f}s incl. compile, "
          f"{wall_hot:.3f}s steady-state ({n_traj / wall_hot:,.0f} traj/sec, "
          f"{method})")
    if args.out:
        np.savez(args.out, coherences=coherences, frac_a_wins=fracs)


if __name__ == "__main__":
    main()
