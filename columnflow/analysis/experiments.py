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
                        sliding_window: int = 10_000):
    """Equal-evidence rivalry runs with dominance statistics (reference:
    scripts/plotting_results.py:290-431): ``nr_iterations`` chained 10 s SDE
    segments, constant stimulation of both columns, firing rates recomputed
    from membrane - adaptation.

    Returns dict with 'rates' (T_total, 16), 'dominance' (signed intervals),
    'alternation_rate', 'alternations'.
    """
    time_steps = int(phase / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grid_dt = float(np.asarray(ts)[1])
    table = jnp.zeros((2, 16))
    table = table.at[:, jnp.array([2, 3])].set(mu_a)
    table = table.at[:, jnp.array([10, 11])].set(mu_b)
    stim = Stimulus(0.0, phase, table)  # constant stimulus

    def drift(t, y):
        return wta_drift(t, y, params, area, stim)

    def diffusion(t, y):
        return wta_diffusion(t, y, params, area, stim)

    segment = jax.jit(
        lambda y0, k: sdeint(drift, diffusion, y0, ts, k, method="srk",
                             additive=True)
    )

    state = jnp.zeros(48)
    chunks = []
    for i in range(nr_iterations):
        key, k = jax.random.split(key)
        ys = segment(state, k)
        state = ys[-1]
        fr = compute_firing_rate(ys[:, :16] - ys[:, 16:32])
        chunks.append(np.asarray(fr))
    rates = np.concatenate(chunks, axis=0)

    a1, a2 = rates[:, 0], rates[:, 8]
    dom = dominance_time(a1, a2, dt=dt, sliding_window=sliding_window)
    alt_rate, alts = alternation_rate(a1, a2, dt=dt)
    return {"rates": rates, "dominance": dom, "alternation_rate": alt_rate,
            "alternations": alts}


def wta_timecourse(params, area, key, stim_sequence=None, phase: float = 0.5,
                   dt: float = 1e-4, initial_membrane=None):
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

    def make_segment():
        def run(y0, k, table):
            stim = Stimulus(0.0, phase, table)
            return sdeint(
                lambda t, y: wta_drift(t, y, params, area, stim),
                lambda t, y: wta_diffusion(t, y, params, area, stim),
                y0, ts, k, method="srk", additive=True,
            )
        return jax.jit(run)

    segment = make_segment()
    rate_chunks, stim_chunks = [], []
    for pair in stim_sequence:
        key, k = jax.random.split(key)
        table = jnp.zeros((2, 16))
        table = table.at[:, jnp.array([2, 3])].set(pair[0])
        table = table.at[:, jnp.array([10, 11])].set(pair[1])
        ys = segment(state, k, table)
        state = ys[-1]
        fr = compute_firing_rate(ys[:, :16] - ys[:, 16:32])
        rate_chunks.append(np.asarray(fr))
        stim_chunks.append(np.tile(np.asarray(table[0]), (time_steps, 1)))
    return np.concatenate(rate_chunks), np.concatenate(stim_chunks)


def xor_timecourse(params, net, key, conditions=None, dt: float = 1e-3,
                   stim_duration: float = 0.5, stochastic: bool = True):
    """Chained XOR-condition run for the poster figure (reference:
    scripts/plotting_results.py:565-647): an extra leading (0,0) condition,
    then the four XOR conditions, state carried through.

    Returns (rates (T_total, 24), stim_course (T_total, 2)).
    """
    from columnflow.data import xor_conditions

    if conditions is None:
        base = np.asarray(xor_conditions())
        conditions = np.concatenate([base[3:4], base], axis=0)
    time_steps = int(stim_duration * 2 / dt)
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grid_dt = float(np.asarray(ts)[1])

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
