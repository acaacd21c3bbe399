"""Dataset and stimulus builders for the four tasks.

Reimplements the reference's host-side data pipelines as jittable JAX
functions (reference: scripts/wta_ode.py:56-122, scripts/xor_ode.py:52-91,
scripts/parity_ode.py:116-153, scripts/bifurcation_ode.py:122-175). The
reference builds every sample in a sequential numpy/torch loop and caches to
pickle; here whole datasets are one vmapped, jitted call (with an optional
native C++ fast path for the Wong-Wang generator, ``columnflow.native``).

Stimulus *tables* (``wta_stim_three_phases``, ``prep_xor_stim``,
``parity_stim_table``) are pure traceable functions — they are built inside
the jitted/vmapped training step, not precomputed on the host, so the whole
(batch x time) stimulus tensor never leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# WTA (reference: scripts/wta_ode.py)
# ---------------------------------------------------------------------------

# Stimulus targets L4e/L4i of each column: indices 2,3 (column A) and
# 10,11 (column B) in the 16-population layout (scripts/wta_ode.py:113-116).
_WTA_STIM_IDX_A = (2, 3)
_WTA_STIM_IDX_B = (10, 11)


def wta_stim_three_phases(stim_pair, time_steps: int, num_pops: int = 16):
    """Three-phase stimulus table (T, 16): zeros, stimulus, zeros.

    The middle third of the time grid carries the (muA, muB) drive on the
    L4e/L4i populations of the two columns (reference:
    scripts/wta_ode.py:109-122). Traceable: built inside jit/vmap.
    """
    stim_pair = jnp.asarray(stim_pair)
    stim = (
        jnp.zeros(num_pops, dtype=stim_pair.dtype)
        .at[jnp.array(_WTA_STIM_IDX_A)].set(stim_pair[0])
        .at[jnp.array(_WTA_STIM_IDX_B)].set(stim_pair[1])
    )
    onset = time_steps // 3
    offset = onset + time_steps // 3
    step_idx = jnp.arange(time_steps)
    in_phase = (step_idx >= onset) & (step_idx < offset)
    return in_phase[:, None].astype(stim.dtype) * stim[None, :]


def sample_wta_mus(key, n_samples: int):
    """Random (muA, muB) drives: muA ~ U(15, 25), muB = muA + U(10, 20),
    order shuffled per sample (reference: scripts/wta_ode.py:77-81)."""
    k_a, k_gap, k_flip = jax.random.split(key, 3)
    mu_a = jax.random.uniform(k_a, (n_samples,), minval=15.0, maxval=25.0)
    mu_b = mu_a + jax.random.uniform(k_gap, (n_samples,), minval=10.0, maxval=20.0)
    flip = jax.random.bernoulli(k_flip, 0.5, (n_samples,))
    lo = jnp.where(flip, mu_b, mu_a)
    hi = jnp.where(flip, mu_a, mu_b)
    return jnp.stack([lo, hi], axis=-1)  # (N, 2)


def make_wta_dataset(key, n_samples: int, time_steps: int, phase_time: float = 5.0,
                     dt: float = 1e-3, use_native: bool = False):
    """Wong-Wang training dataset: (states (N, T, 2), stims (N, 2)).

    Each sample is a three-phase DM simulation, downsampled x10 and truncated
    to ``time_steps`` (reference: scripts/wta_ode.py:56-94). States are raw
    Wong-Wang rates — the caller scales by /20 (scripts/wta_ode.py:103).

    Default: one vmapped ``lax.scan`` on the accelerator (3,010 samples in
    ~10 s on one TPU chip). ``use_native=True`` runs the C++ host generator
    instead (the reference's host hot loop #0; 13x slower single-threaded
    but device-free — useful when the chip is busy, and the parity oracle
    for the JAX path).
    """
    from columnflow.models.ww import wong_wang_three_phase

    stims = sample_wta_mus(key, n_samples)

    if use_native:
        from columnflow import native

        if native.available():
            states = native.ww_dataset(
                np.asarray(stims, dtype=np.float64), time_steps,
                phase_time=phase_time, dt=dt,
                key=int(jax.random.randint(key, (), 0, 2**31 - 1)),
            )
            return jnp.asarray(states, dtype=jnp.float32), stims

    @jax.jit
    def run_all(stims):
        keys = jax.random.split(key, stims.shape[0])

        def one(k, mu):
            rates = wong_wang_three_phase(k, mu[0], mu[1],
                                          phase_time=phase_time, dt=dt)
            return rates[::10][:time_steps]

        return jax.vmap(one)(keys, stims)

    return run_all(stims), stims


# ---------------------------------------------------------------------------
# XOR (reference: scripts/xor_ode.py)
# ---------------------------------------------------------------------------


def xor_conditions() -> np.ndarray:
    """The four XOR input conditions in Hz (reference: scripts/xor_ode.py:58-61):
    (20,0) and (0,20) -> "different", (20,20) and (0,0) -> "same"."""
    return np.array(
        [[20.0, 0.0], [0.0, 20.0], [20.0, 20.0], [0.0, 0.0]], dtype=np.float32
    )


def prep_xor_stim(cond, time_steps: int, num_pops: int = 16):
    """XOR stimulus table (T, 2, 16): pre-stimulus half, stimulus half; the
    second slot carries the column-swapped copy so both input columns see
    both stimuli (reference: scripts/xor_ode.py:75-91). Traceable."""
    cond = jnp.asarray(cond)
    stim = (
        jnp.zeros(num_pops, dtype=cond.dtype)
        .at[jnp.array(_WTA_STIM_IDX_A)].set(cond[0])
        .at[jnp.array(_WTA_STIM_IDX_B)].set(cond[1])
    )
    mirror = jnp.concatenate([stim[8:], stim[:8]])
    pair = jnp.stack([stim, mirror])  # (2, 16)
    phase_length = time_steps // 2
    on = (jnp.arange(time_steps) >= phase_length).astype(cond.dtype)
    return on[:, None, None] * pair[None, :, :]


# ---------------------------------------------------------------------------
# Parity (reference: scripts/parity_ode.py)
# ---------------------------------------------------------------------------


def parity_combinations(n_inputs: int, fixed_position: bool = True,
                        level: float = 15.0) -> np.ndarray:
    """All input patterns, scaled to ``level`` Hz.

    ``fixed_position=True`` is the reference's training regime
    (scripts/parity_ode.py:121-129): patterns [0...0 1...1] with k trailing
    ones, k = 1..n_inputs. Otherwise all 2^n binary combinations
    (scripts/parity_ode.py:134-137).
    """
    if fixed_position:
        combos = np.tril(np.ones((n_inputs, n_inputs), dtype=np.float32))[:, ::-1]
    else:
        combos = np.array(
            [[(i >> bit) & 1 for bit in reversed(range(n_inputs))]
             for i in range(2**n_inputs)],
            dtype=np.float32,
        )
    return combos * level


def make_parity_batch(key, n_inputs: int, batch_size: int,
                      fixed_position: bool = True, level: float = 15.0):
    """A shuffled batch of parity input patterns (B, n_inputs)
    (reference: scripts/parity_ode.py:116-141, 220)."""
    combos = jnp.asarray(parity_combinations(n_inputs, fixed_position, level))
    reps = -(-batch_size // combos.shape[0])  # ceil
    tiled = jnp.tile(combos, (reps, 1))
    perm = jax.random.permutation(key, tiled.shape[0])
    return tiled[perm][:batch_size]


def parity_stim_table(stim_raw, time_steps: int):
    """Parity stimulus table (T, n_inputs): zeros for the first half,
    the input pattern for the second (reference: scripts/parity_ode.py:143-153).
    Traceable."""
    stim_raw = jnp.asarray(stim_raw)
    phase_length = time_steps // 2
    on = (jnp.arange(time_steps) >= phase_length).astype(stim_raw.dtype)
    return on[:, None] * stim_raw[None, :]


# ---------------------------------------------------------------------------
# Hopf bifurcation (reference: scripts/bifurcation_ode.py)
# ---------------------------------------------------------------------------

HOPF_OMEGA = 1.0
HOPF_SINE_AMP = 1.0
HOPF_SINE_FREQ = 0.25


def hopf_dynamics(t, state, mu_t):
    """Supercritical Hopf normal form with drive mu(t)
    (reference: scripts/bifurcation_ode.py:122-131)."""
    x, y = state[..., 0], state[..., 1]
    rad = mu_t - x * x - y * y
    dx = rad * x - HOPF_OMEGA * y
    dy = rad * y + HOPF_OMEGA * x
    return jnp.stack([dx, dy], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _hopf_solve(y0s, mus, ts, max_steps: int = 4096):
    """Integrate ground-truth Hopf trajectories: y0s (N, 2), mus (T, N)."""
    from columnflow.ops.interp import interp_at
    from columnflow.solvers import odeint

    t0 = ts[0]
    dt = ts[1] - ts[0]

    def one(y0, mu):
        def f(t, y, mu_table):
            return hopf_dynamics(t, y, interp_at(t, t0, dt, mu_table))

        return odeint(f, y0, ts, mu, method="dopri5", max_steps=max_steps,
                      adjoint="none")

    return jax.vmap(one, in_axes=(0, 1), out_axes=1)(y0s, mus)  # (T, N, 2)


def make_hopf_dataset(key, n_samples: int, ts, max_steps: int = 4096):
    """Ground-truth Hopf dataset (T, N, 3), channels (x, y, mu).

    Random start points U(-2,2)^2 and random-phase sine drives
    mu(t) = sin(0.25 t + c), c ~ U(-pi, pi), integrated with our own
    adaptive dopri5 (reference generates with torchdiffeq dopri5,
    scripts/bifurcation_ode.py:133-175).
    """
    ts = jnp.asarray(ts)
    k_y0, k_phase = jax.random.split(key)
    y0s = jax.random.uniform(k_y0, (n_samples, 2), minval=-2.0, maxval=2.0)
    phases = jax.random.uniform(
        k_phase, (n_samples,), minval=-jnp.pi, maxval=jnp.pi
    )
    mus = HOPF_SINE_AMP * jnp.sin(
        ts[:, None] * HOPF_SINE_FREQ + phases[None, :]
    )  # (T, N)
    ys = _hopf_solve(y0s, mus, ts, max_steps=max_steps)
    return jnp.concatenate([ys, mus[..., None]], axis=-1)
