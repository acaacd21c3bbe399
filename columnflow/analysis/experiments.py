"""Post-hoc analysis experiments on trained column networks
(reference: scripts/plotting_results.py).

Compute is decoupled from rendering (see plots.py): every experiment returns
arrays. All sweeps are vmapped/jitted; chained-state runs (bistable
perception, time courses) carry the final state into the next segment exactly
as the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.analysis.stats import alternation_rate, dominance_time
from columnflow.data import prep_xor_stim, wta_stim_three_phases
from columnflow.models import Stimulus, wta_diffusion, wta_drift, xor_diffusion, xor_drift
from columnflow.ops.transfer import compute_firing_rate
from columnflow.solvers import odeint, sdeint


def _wta_segment_runner(params, area, ts, use_fused: bool | None = None):
    """Jitted SRA1 segment integrator ``run(y0 (48,), key, stim_row (16,))
    -> (T, 48)`` with a constant stimulus row.

    ``use_fused=None`` auto-selects the chunked Pallas rollout on TPU (one
    kernel call per VMEM-sized chunk — the 10 s rivalry segments are ~100k
    steps); both paths draw the identical Brownian pack from the key, so
    trajectories agree up to fp32 ordering.
    """
    if use_fused is None:
        use_fused = jax.default_backend() not in ("cpu",)
    T = ts.shape[0]
    total_time = float(np.asarray(ts)[-1])

    if use_fused:
        from columnflow.kernels.column_step import wta_rollout_fused_chunked
        from columnflow.solvers.sde import _brownian_pack

        @jax.jit
        def run(y0, k, stim_row):
            tables = jnp.broadcast_to(stim_row[None, None, :], (1, T, 16))
            _, i1, i10, _, _ = _brownian_pack(k, ts, (), jnp.float32)
            ys = wta_rollout_fused_chunked(
                params, area, y0[None], tables, ts, i1[:, None], i10[:, None]
            )
            return ys[0]

        return run

    @jax.jit
    def run(y0, k, stim_row):
        stim = Stimulus(0.0, total_time, jnp.tile(stim_row, (2, 1)))
        return sdeint(
            lambda t, y: wta_drift(t, y, params, area, stim),
            lambda t, y: wta_diffusion(t, y, params, area, stim),
            y0, ts, k, method="srk", additive=True,
        )

    return run


def coherence_sweep(params, area, coherences=None, mu_base: float = 20.0,
                    dt: float = 1e-4, stim_phase: float = 0.05,
                    window=(400, 1000)):
    """Deterministic coherence sweep (reference:
    scripts/plotting_results.py:26-208): for each coherence c, drive column A
    with mu_base and column B with mu_base - c, and collect the rate-block
    time courses of layers 2/3, 4, 5, 6 of both columns in the analysis
    window.

    Returns (4, C, window, 2): layer x coherence x time x column.
    """
    if coherences is None:
        coherences = jnp.arange(0.0, 21.0, 2.0)
    coherences = jnp.asarray(coherences)
    time_steps = int(stim_phase * 3 / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grid_dt = float(np.asarray(ts)[1])

    def one(c):
        stim_pair = jnp.stack([mu_base, mu_base - c])
        table = wta_stim_three_phases(stim_pair, time_steps)
        stim = Stimulus(0.0, grid_dt, table)
        ys = odeint(
            lambda t, y: wta_drift(t, y, params, area, stim),
            jnp.zeros(48), ts, method="dopri5", adjoint="none",
            max_steps=8192,
        )
        fr = ys[:, 32:]  # rate block, as the reference reads it (:135)
        win = fr[window[0]:window[1]]
        layers = jnp.stack([
            win[:, jnp.array([0, 8])],
            win[:, jnp.array([2, 10])],
            win[:, jnp.array([4, 12])],
            win[:, jnp.array([6, 14])],
        ])
        return layers  # (4, T_win, 2)

    out = jax.jit(jax.vmap(one))(coherences)  # (C, 4, T, 2)
    return jnp.transpose(out, (1, 0, 2, 3))


def bistable_perception(params, area, key, mu_a: float = 20.0,
                        mu_b: float = 20.0, nr_iterations: int = 10,
                        phase: float = 10.0, dt: float = 1e-4,
                        sliding_window: int = 10_000,
                        use_fused: bool | None = None,
                        segment_runner=None):
    """Equal-evidence rivalry runs with dominance statistics (reference:
    scripts/plotting_results.py:290-431): ``nr_iterations`` chained 10 s SDE
    segments, constant stimulation of both columns, firing rates recomputed
    from membrane - adaptation.

    Returns dict with 'rates' (T_total, 16), 'dominance' (signed intervals),
    'alternation_rate', 'alternations'.
    """
    time_steps = int(phase / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    stim_row = (
        jnp.zeros(16)
        .at[jnp.array([2, 3])].set(mu_a)
        .at[jnp.array([10, 11])].set(mu_b)
    )
    # Reuse a caller-provided runner (grid sweeps would otherwise retrace
    # and recompile the rollout once per grid cell).
    segment = segment_runner or _wta_segment_runner(params, area, ts,
                                                    use_fused)

    state = jnp.zeros(48)
    chunks = []
    for i in range(nr_iterations):
        key, k = jax.random.split(key)
        ys = segment(state, k, stim_row)
        state = ys[-1]
        fr = compute_firing_rate(ys[:, :16] - ys[:, 16:32])
        chunks.append(np.asarray(fr))
    rates = np.concatenate(chunks, axis=0)

    a1, a2 = rates[:, 0], rates[:, 8]
    dom = dominance_time(a1, a2, dt=dt, sliding_window=sliding_window)
    alt_rate, alts = alternation_rate(a1, a2, dt=dt)
    return {"rates": rates, "dominance": dom, "alternation_rate": alt_rate,
            "alternations": alts}


def rivalry_sweep(params, area, key, mu_values=None,
                  nr_iterations: int = 3, phase: float = 10.0,
                  dt: float = 1e-4, use_fused: bool | None = None):
    """Dominance-duration and alternation-rate statistics over a
    (mu_A, mu_B) stimulation grid — the data behind the reference's
    dominance/alternation heatmaps (scripts/plotting_results.py:434-465).

    Returns dict with 'mu_values' (M,), 'mean_dominance' (M, M),
    'alternation_rate' (M, M); entry [i, j] is the run at
    (mu_A = mu_values[i], mu_B = mu_values[j]).
    """
    if mu_values is None:
        mu_values = np.arange(10.0, 21.0, 2.5)
    mu_values = np.asarray(mu_values, np.float32)
    M = len(mu_values)
    mean_dom = np.zeros((M, M))
    alt = np.zeros((M, M))
    time_steps = int(phase / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    runner = _wta_segment_runner(params, area, ts, use_fused)
    for i, mu_a in enumerate(mu_values):
        for j, mu_b in enumerate(mu_values):
            key, k = jax.random.split(key)
            out = bistable_perception(
                params, area, k, mu_a=float(mu_a), mu_b=float(mu_b),
                nr_iterations=nr_iterations, phase=phase, dt=dt,
                use_fused=use_fused, segment_runner=runner,
            )
            dom = np.abs(out["dominance"])
            mean_dom[i, j] = float(dom.mean()) if dom.size else float("nan")
            alt[i, j] = out["alternation_rate"]
    return {"mu_values": mu_values, "mean_dominance": mean_dom,
            "alternation_rate": alt}


def wta_timecourse(params, area, key, stim_sequence=None, phase: float = 0.5,
                   dt: float = 1e-4, initial_membrane=None,
                   use_fused: bool | None = None):
    """Chained stimulus-sequence run for the WTA/bistable poster figure
    (reference: scripts/plotting_results.py:469-562).

    Returns (rates (T_total, 16), stim_course (T_total, 16)).
    """
    if stim_sequence is None:
        stim_sequence = [[0., 0.], [0., 0.], [0., 0.], [10., 30.], [0., 0.],
                         [30., 10.], [0., 0.], [20., 20.], [20., 20.],
                         [20., 20.], [20., 20.], [0., 0.]]
    time_steps = int(phase / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)

    state = jnp.zeros(48)
    if initial_membrane is not None:
        state = state.at[:16].set(jnp.tile(jnp.asarray(initial_membrane), 2))

    segment = _wta_segment_runner(params, area, ts, use_fused)
    rate_chunks, stim_chunks = [], []
    for pair in stim_sequence:
        key, k = jax.random.split(key)
        stim_row = (
            jnp.zeros(16)
            .at[jnp.array([2, 3])].set(pair[0])
            .at[jnp.array([10, 11])].set(pair[1])
        )
        ys = segment(state, k, stim_row)
        state = ys[-1]
        fr = compute_firing_rate(ys[:, :16] - ys[:, 16:32])
        rate_chunks.append(np.asarray(fr))
        stim_chunks.append(np.tile(np.asarray(stim_row), (time_steps, 1)))
    return np.concatenate(rate_chunks), np.concatenate(stim_chunks)


def xor_timecourse(params, net, key, conditions=None, dt: float = 1e-3,
                   stim_duration: float = 0.5, stochastic: bool = True,
                   use_fused: bool | None = None):
    """Chained XOR-condition run for the poster figure (reference:
    scripts/plotting_results.py:565-647): an extra leading (0,0) condition,
    then the four XOR conditions, state carried through.

    ``use_fused`` runs the stochastic segments through the generic fused
    Pallas SDE solver (same Brownian key convention -> same paths); ``None``
    auto-selects it on TPU. Returns (rates (T_total, 24),
    stim_course (T_total, 2)).
    """
    from columnflow.data import xor_conditions

    if conditions is None:
        base = np.asarray(xor_conditions())
        conditions = np.concatenate([base[3:4], base], axis=0)
    time_steps = int(stim_duration * 2 / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grid_dt = float(np.asarray(ts)[1])

    if use_fused is None:
        use_fused = stochastic and jax.default_backend() not in ("cpu",)

    if stochastic and use_fused:
        from columnflow.models.xor import (
            XOR_NOISE_STD,
            build_xor_fused_consts,
            split_xor_params,
            xor_drift_batched,
        )
        from columnflow.ops.interp import interp_at_onehot
        from columnflow.solvers import sdeint_fused

        fc = build_xor_fused_consts(net)
        pf = split_xor_params(params)
        g_const = jnp.zeros((1, 72)).at[:, :24].set(XOR_NOISE_STD)

        def drift(t, y, pf, fc, tab, g):
            return xor_drift_batched(t, y, pf, fc,
                                     Stimulus(0.0, grid_dt, tab),
                                     interp_fn=interp_at_onehot)

        def diffusion(t, y, pf, fc, tab, g):
            return g

        @jax.jit
        def segment(y0, k, table):
            tab = table.reshape(time_steps, 1, 32)  # slots flattened, B=1
            ys = sdeint_fused(drift, diffusion, y0[None], ts, k,
                              pf, fc, tab, g_const,
                              method="srk", nondiff_args=(1, 2, 3))
            return ys[:, 0]
    else:
        def run(y0, k, table):
            stim = Stimulus(0.0, grid_dt, table)
            if stochastic:
                return sdeint(
                    lambda t, y: xor_drift(t, y, params, net, stim),
                    lambda t, y: xor_diffusion(t, y, params, net, stim),
                    y0, ts, k, method="srk", additive=True,
                )
            return odeint(
                lambda t, y: xor_drift(t, y, params, net, stim),
                y0, ts, method="dopri5", adjoint="none", max_steps=8192,
            )

        segment = jax.jit(run)
    state = jnp.zeros(72)
    rate_chunks, stim_chunks = [], []
    for cond in conditions:
        key, k = jax.random.split(key)
        table = prep_xor_stim(jnp.asarray(cond), time_steps)
        ys = segment(state, k, table)
        state = ys[-1]
        fr = compute_firing_rate(ys[:, :24] - ys[:, 24:48])
        rate_chunks.append(np.asarray(fr))
        # Inputs as seen by L4 of each input column (reference :601-602).
        stim_chunks.append(np.concatenate(
            [np.asarray(table[:, 0, 2:3]), np.asarray(table[:, 1, 2:3])],
            axis=1,
        ))
    return np.concatenate(rate_chunks), np.concatenate(stim_chunks)


def _run_one(name, args, cfg, key):
    import os

    os.makedirs(args.out_dir, exist_ok=True)

    if name == "ww-phase-plane":
        from columnflow.analysis.phase_plane import wong_wang_phase_plane
        from columnflow.analysis.plots import plot_phase_plane

        pp = wong_wang_phase_plane(args.mu, args.mu,
                                   coherence=args.coherence)
        for s, lab in zip(pp.fixed_points, pp.stability):
            print(f"fixed point ({s[0]:.4f}, {s[1]:.4f}): {lab}")
        plot_phase_plane(pp, f"{args.out_dir}/ww_phase_plane.png",
                         title=f"mu0={args.mu:g}, c={args.coherence:g}")
        print(f"wrote {args.out_dir}/ww_phase_plane.png")
        return

    if name == "latent-sde":
        # Latent SDE trained by ELBO on the Girsanov KL path
        # (tasks/latent_sde.py; torchsde's flagship application). Trains
        # in-process — the model is small enough that the demo trains in
        # about a minute headless.
        from columnflow.tasks.latent_sde import (plot_latent_sde,
                                                 train_latent_sde)

        iters = (args.train_iters if args.train_iters
                 else (300 if args.demo else 800))
        params, task, hist = train_latent_sde(
            iters=iters, seed=args.seed, time_points=32, n_samples=6,
            kl_anneal=min(80, max(1, iters // 3)))
        plot_latent_sde(params, task, jax.random.PRNGKey(args.seed + 1),
                        f"{args.out_dir}/latent_sde.png")
        print(f"-ELBO {hist[0]['loss']:.1f} -> {hist[-1]['loss']:.1f}; "
              f"wrote {args.out_dir}/latent_sde.png")
        return

    if name == "hopf-spiral":
        # Reference: the Hopf task's spiral figure
        # (scripts/bifurcation_ode.py:23-64) — ground-truth supercritical-
        # Hopf trajectories vs the neural-ODE rollout.
        from columnflow.analysis.plots import plot_hopf
        from columnflow.data import make_hopf_dataset
        from columnflow.tasks.bifurcation import build_task, rollout

        task = build_task(jax.random.PRNGKey(0))
        if args.demo:
            from columnflow.analysis.demo import load_demo_hopf

            params, task = load_demo_hopf()
        elif args.checkpoint:
            from columnflow.train import load_checkpoint

            params = load_checkpoint(args.checkpoint,
                                     params_like=task.params)["params"]
        else:
            params = task.params
        true = make_hopf_dataset(key, 1, task.ts)
        pred = rollout(params, task, true[0, :, :2], true[:, :, 2],
                       differentiable=False)
        from columnflow.ops.losses import smooth_l1

        val = float(smooth_l1(pred, true[:, :, :2]))
        plot_hopf(true, pred, task.ts, val, val,
                  f"{args.out_dir}/hopf_spiral.png")
        print(f"wrote {args.out_dir}/hopf_spiral.png (smooth-l1 {val:.4f})")
        return

    if name == "xor-timecourse":
        from columnflow.analysis.plots import plot_timecourse
        from columnflow.models import build_xor_network

        params, net = build_xor_network(cfg, jax.random.PRNGKey(0))
        if args.demo:
            from columnflow.analysis.demo import load_demo_xor

            params, net = load_demo_xor()
        elif args.checkpoint:
            from columnflow.train import load_checkpoint

            params = load_checkpoint(args.checkpoint,
                                     params_like=params)["params"]
        rates, stim = xor_timecourse(params, net, key)
        plot_timecourse(rates, stim, 1e-3,
                        f"{args.out_dir}/xor_timecourse.png",
                        columns=(0, 8, 16))
        print(f"wrote {args.out_dir}/xor_timecourse.png")
        return

    from columnflow.models import build_wta

    params, area = build_wta(cfg, jax.random.PRNGKey(0))
    if args.demo:
        from columnflow.analysis.demo import load_demo_wta

        params, area = load_demo_wta()
    elif args.checkpoint:
        from columnflow.train import load_checkpoint

        params = load_checkpoint(args.checkpoint, params_like=params)["params"]

    if name == "coherence":
        from columnflow.analysis.plots import plot_coherence_sweep

        coherences = jnp.arange(0.0, 21.0, 2.0)
        layers = coherence_sweep(params, area, coherences)
        plot_coherence_sweep(np.asarray(layers), np.asarray(coherences),
                             f"{args.out_dir}/coherence.png")
        print(f"wrote {args.out_dir}/coherence.png")
    elif name == "rivalry-sweep":
        from columnflow.analysis.plots import plot_dom_alt_heatmaps

        out = rivalry_sweep(params, area, key,
                            nr_iterations=args.iterations)
        mv = out["mu_values"]
        plot_dom_alt_heatmaps(
            out["mean_dominance"], out["alternation_rate"],
            f"{args.out_dir}/rivalry_sweep.png",
            extent=(mv[0], mv[-1], mv[0], mv[-1]),
        )
        print(f"wrote {args.out_dir}/rivalry_sweep.png")
    elif name == "bistable":
        from columnflow.analysis.plots import plot_dominance_histogram

        out = bistable_perception(params, area, key,
                                  nr_iterations=args.iterations)
        print(f"alternation rate: {out['alternation_rate']:.4f} Hz "
              f"({out['alternations']} alternations)")
        plot_dominance_histogram(out["dominance"],
                                 f"{args.out_dir}/dominance.png")
        print(f"wrote {args.out_dir}/dominance.png")
    else:  # wta-timecourse
        from columnflow.analysis.plots import plot_timecourse

        rates, stim = wta_timecourse(params, area, key)
        plot_timecourse(rates, stim, 1e-4,
                        f"{args.out_dir}/wta_timecourse.png")
        print(f"wrote {args.out_dir}/wta_timecourse.png")


GALLERY = ("coherence", "bistable", "wta-timecourse", "xor-timecourse",
           "hopf-spiral", "ww-phase-plane", "latent-sde")


def main(argv=None):
    """CLI: run an analysis experiment on a trained WTA/XOR checkpoint and
    write figures (reference entry point: scripts/plotting_results.py:652-667).

    ``all`` generates the full CCN-style figure gallery (coherence sweep,
    bistable dominance histogram, WTA/XOR timecourses, Hopf spiral,
    Wong-Wang phase plane) from the packaged demo checkpoints in one
    headless run:

        python -m columnflow.analysis.experiments all --demo \
            --out-dir docs/figures

    Without ``--checkpoint``/``--demo``, analyses the anatomical
    (untrained) weights.
    """
    import argparse

    from columnflow.config import ColumnConfig

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("experiment", choices=["coherence", "bistable",
                                          "rivalry-sweep", "wta-timecourse",
                                          "xor-timecourse", "ww-phase-plane",
                                          "hopf-spiral", "latent-sde",
                                          "all"])
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path from the wta/xor task trainers")
    p.add_argument("--demo", action="store_true",
                   help="use the packaged trained demo checkpoints "
                        "(the reference analysis script's hardcoded trained "
                        "matrix, scripts/plotting_results.py:36-101)")
    p.add_argument("--out-dir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iterations", type=int, default=10,
                   help="bistable: number of chained 10 s segments")
    p.add_argument("--train-iters", type=int, default=None,
                   help="latent-sde: training iterations for the panel "
                        "(default 300 with --demo, 800 without)")
    p.add_argument("--mu", type=float, default=30.0,
                   help="ww-phase-plane: mean external drive mu0")
    p.add_argument("--coherence", type=float, default=0.0,
                   help="ww-phase-plane: coherence bias in [-1, 1]")
    args = p.parse_args(argv)

    cfg = ColumnConfig.load()
    key = jax.random.PRNGKey(args.seed)

    names = GALLERY if args.experiment == "all" else (args.experiment,)
    for name in names:
        _run_one(name, args, cfg, key)


if __name__ == "__main__":
    main()
