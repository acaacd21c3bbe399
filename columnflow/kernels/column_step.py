"""Pallas TPU kernels for the column drift and full SDE rollouts.

The hot op of every workload is the drift evaluation inside the solver loop:
firing-rate nonlinearity (VPU) -> recurrent matvec (MXU) -> current/state
derivatives (VPU) (reference hot loop: SURVEY.md section 3.1). The reference
pays a Python/torch dispatch per 16x16 matvec; the XLA path here already
fuses each step — the Pallas kernel goes further and keeps the ENTIRE
trajectory loop on-chip: weights, stimulus tables, noise increments, and the
output trajectory all live in VMEM for all ~1500 steps of a batched SRA1
rollout (WTA workload: B=15, state 48 -> ~4.5 MB, well under the ~16 MB/core
VMEM budget).

The fused rollout is the inference/analysis/benchmark fast path; training
uses the differentiable ``lax.scan`` solver (same math — parity-tested here
against ``wta_rollout_reference``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from columnflow.models.column import AreaParams

_GAIN, _THRESH, _D, _CLAMP = 48.0, 981.0, 0.0089, 80.0


def _firing_rate(x):
    xn = _GAIN * x - _THRESH
    e = jnp.exp(_CLAMP * jnp.tanh((-_D * xn) / _CLAMP))
    den = 1.0 - e
    near = jnp.abs(den) < 1e-12
    return jnp.where(near, 1.0 / _D, xn / jnp.where(near, 1.0, den))


def _drift_block(v, a, r, s, w_t, consts, scalars):
    """Drift on (B, 16) blocks. consts rows: [bg_current, ffw, adapt].
    scalars: (tau_s, tau_m, tau_a, R)."""
    tau_s, tau_m, tau_a, R = scalars
    fr = _firing_rate(v - a)
    rec = jnp.dot(fr, w_t, preferred_element_type=jnp.float32)
    cur = (consts[1] * s + consts[0] + rec) * tau_s
    dv = (-v + cur * R) / tau_m
    da = (-a + consts[2] * fr) / tau_a
    dr = (-r + fr) / tau_s
    return dv, da, dr


def _drift_kernel(scal_ref, y_ref, s_ref, w_ref, c_ref, out_ref):
    v = y_ref[:, 0:16]
    a = y_ref[:, 16:32]
    r = y_ref[:, 32:48]
    scalars = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    dv, da, dr = _drift_block(
        v, a, r, s_ref[:], w_ref[:].T, c_ref[:], scalars
    )
    out_ref[:, 0:16] = dv
    out_ref[:, 16:32] = da
    out_ref[:, 32:48] = dr


def fused_drift(y, stim_t, params, area: AreaParams, interpret: bool = False):
    """Single fused batched WTA drift evaluation: y (B, 48), stim_t (B, 16).

    Equivalent to vmapped ``models.wta.wta_drift`` at a fixed stimulus row;
    parity-tested against it.
    """
    consts = jnp.stack([
        jnp.asarray(area.background_current),
        jnp.asarray(area.feedforward_weights),
        jnp.asarray(area.adaptation_strength),
    ])
    scalars = jnp.asarray(
        [area.tau_syn, area.tau_mem, area.tau_adapt, area.resistance],
        dtype=jnp.float32,
    )
    return pl.pallas_call(
        _drift_kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, y, stim_t, params["recurrent_weights"], consts)


def _rollout_kernel(scal_ref, w_ref, c_ref, g_ref, stim_ref, i1_ref, i10_ref,
                    out_ref):
    """Full SRA1 rollout, everything VMEM-resident.

    scal: SMEM (5,) = (h, tau_s, tau_m, tau_a, R)
    w:    (16, 16) recurrent weights
    c:    (3, 16) [bg_current, ffw, adapt]
    g:    (1, 48) constant diffusion vector
    stim: (B, T, 16)
    i1/i10: (T-1, B) Brownian increments / time integrals
    out:  (T, B, 48) trajectory (out[0] written as zeros = y0)
    """
    h = scal_ref[0]
    scalars = (scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4])
    T = out_ref.shape[0]
    B = out_ref.shape[1]
    w_t = w_ref[:].T
    consts = c_ref[:]
    g = g_ref[:]  # (1, 48)

    y0 = jnp.zeros((B, 48), dtype=jnp.float32)
    out_ref[0] = y0

    def drift(y, s):
        dv, da, dr = _drift_block(
            y[:, 0:16], y[:, 16:32], y[:, 32:48], s, w_t, consts, scalars
        )
        return jnp.concatenate([dv, da, dr], axis=1)

    def step(i, y):
        s0 = stim_ref[:, i, :]  # (B, 16)
        s1 = stim_ref[:, jnp.minimum(i + 1, T - 1), :]
        s_mid = s0 + 0.75 * (s1 - s0)

        i1 = i1_ref[i, :][:, None]  # (B, 1)
        i10_h = (i10_ref[i, :] / h)[:, None]

        f1 = drift(y, s0)
        h2 = y + 0.75 * h * f1 + 1.5 * i10_h * g
        f2 = drift(h2, s_mid)
        # Constant diffusion: the two g evaluations coincide, so the
        # stochastic terms reduce to i1 * g.
        y = y + h * (f1 / 3.0 + 2.0 * f2 / 3.0) + i1 * g
        out_ref[i + 1] = y
        return y

    jax.lax.fori_loop(0, T - 1, step, y0)


def wta_rollout_fused(params, area: AreaParams, stim_tables, ts, i1, i10,
                      noise_std: float = 100.0, membrane_only: bool = False,
                      interpret: bool = False):
    """Batched SRA1 rollout of the WTA model in ONE Pallas kernel.

    Args:
        stim_tables: (B, T, 16) per-sample stimulus on the ts grid.
        ts: (T,) uniform time grid.
        i1, i10: (T-1, B) Brownian increment / time-integral per step+sample
            (same convention as solvers.sde._brownian_pack).

    Returns (B, T, 48) trajectories from zero initial state.
    """
    import numpy as np

    B, T, _ = stim_tables.shape
    # ts must be a concrete (host) grid — the step size is baked into the
    # kernel. np.asarray fails loudly on traced input.
    ts_host = np.asarray(ts)
    h = float(ts_host[1] - ts_host[0])
    scalars = jnp.asarray(
        [h, area.tau_syn, area.tau_mem, area.tau_adapt, area.resistance],
        dtype=jnp.float32,
    )
    consts = jnp.stack([
        jnp.asarray(area.background_current),
        jnp.asarray(area.feedforward_weights),
        jnp.asarray(area.adaptation_strength),
    ])
    g = jnp.full((1, 48), noise_std, dtype=jnp.float32)
    if membrane_only:
        g = g.at[:, 16:].set(0.0)

    out = pl.pallas_call(
        _rollout_kernel,
        out_shape=jax.ShapeDtypeStruct((T, B, 48), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, params["recurrent_weights"], consts, g, stim_tables, i1, i10)
    return jnp.transpose(out, (1, 0, 2))


def wta_rollout_reference(params, area: AreaParams, stim_tables, ts, i1, i10,
                          noise_std: float = 100.0,
                          membrane_only: bool = False):
    """XLA lax.scan implementation of the identical rollout (the parity
    oracle for the fused kernel; same stage math, same noise convention)."""
    import numpy as np

    from columnflow.models.column import Stimulus
    from columnflow.models.wta import wta_diffusion, wta_drift
    from columnflow.solvers import sdeint

    B, T, _ = stim_tables.shape
    ts_host = np.asarray(ts)
    dt = float(ts_host[1] - ts_host[0])

    def one(table, i1_b, i10_b):
        stim = Stimulus(0.0, dt, table)

        def drift(t, y):
            return wta_drift(t, y, params, area, stim)

        def diffusion(t, y):
            return wta_diffusion(t, y, params, area, stim,
                                 membrane_only=membrane_only)

        zeros = jnp.zeros_like(i1_b)
        pack = (i1_b, i10_b, zeros, zeros)
        return sdeint(drift, diffusion, jnp.zeros(48), ts,
                      jax.random.PRNGKey(0), method="srk", additive=True,
                      noise_pack=pack)

    return jax.vmap(one)(stim_tables, jnp.transpose(i1), jnp.transpose(i10))
