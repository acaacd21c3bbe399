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

The fused rollout is differentiable through ``make_wta_rollout_diff``: a
``jax.custom_vjp`` whose forward AND backward sweeps run as Pallas kernels
(the backward replays the SRA1 steps in reverse with a hand-derived
transposed drift, accumulating the recurrent-weight cotangent on-chip).
Both sweeps split into VMEM-budgeted time chunks with carried state when
the (batch x trajectory) footprint demands it, so noise-averaged batches
of hundreds of rollouts train without leaving the fused path.
Parity-tested against the ``lax.scan`` solver path
(``wta_rollout_reference``) for values and gradients, and chunked-vs-
unchunked for exactness.
"""

from __future__ import annotations


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


def _rollout_kernel(scal_ref, w_ref, c_ref, g_ref, y0_ref, stim_ref, i1_ref,
                    i10_ref, out_ref):
    """Full SRA1 rollout, everything VMEM-resident.

    scal: SMEM (5,) = (h, tau_s, tau_m, tau_a, R)
    w:    (16, 16) recurrent weights
    c:    (3, 16) [bg_current, ffw, adapt]
    g:    (1, 48) constant diffusion vector
    y0:   (B, 48) initial state
    stim: (T, B, 16) — time-major so per-step reads and host-side time
          chunking are contiguous
    i1/i10: (T-1, B) Brownian increments / time integrals
    out:  (T, B, 48) trajectory (out[0] = y0)
    """
    h = scal_ref[0]
    scalars = (scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4])
    T = out_ref.shape[0]
    B = out_ref.shape[1]
    w_t = w_ref[:].T
    consts = c_ref[:]
    g = g_ref[:]  # (1, 48)

    y0 = y0_ref[:]
    out_ref[0] = y0

    def drift(y, s):
        dv, da, dr = _drift_block(
            y[:, 0:16], y[:, 16:32], y[:, 32:48], s, w_t, consts, scalars
        )
        return jnp.concatenate([dv, da, dr], axis=1)

    def step(i, y):
        s0 = stim_ref[i]  # (B, 16)
        s1 = stim_ref[jnp.minimum(i + 1, T - 1)]
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
                      interpret: bool = False, y0=None):
    """Batched SRA1 rollout of the WTA model in ONE Pallas kernel.

    Args:
        stim_tables: (B, T, 16) per-sample stimulus on the ts grid.
        ts: (T,) uniform time grid.
        i1, i10: (T-1, B) Brownian increment / time-integral per step+sample
            (same convention as solvers.sde._brownian_pack).
        y0: (B, 48) initial state; zeros if None.

    Returns (B, T, 48) trajectories.
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

    if y0 is None:
        y0 = jnp.zeros((stim_tables.shape[0], 48), dtype=jnp.float32)
    out = _forward_call(scalars, params["recurrent_weights"], consts, g, y0,
                        jnp.transpose(stim_tables, (1, 0, 2)), i1, i10,
                        interpret=interpret)
    return jnp.transpose(out, (1, 0, 2))


def _forward_call(scalars, w, consts, g, y0, stim_tb, i1, i10,
                  interpret: bool = False):
    """Raw forward rollout pallas_call; stim_tb is TIME-MAJOR (T, B, 16).
    Returns (T, B, 48)."""
    T, B, _ = stim_tb.shape
    return pl.pallas_call(
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, w, consts, g, y0, stim_tb, i1, i10)


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


# ---------------------------------------------------------------------------
# Differentiable fused rollout (custom_vjp; backward is a Pallas kernel too)
# ---------------------------------------------------------------------------


def _fr_and_grad(x):
    """Firing rate AND its derivative wrt x, sharing subexpressions.

    phi(x) = xn / (1 - exp(softclamp(-d*xn))), xn = 48x - 981; at the
    removable singularity xn=0 the limits are phi=1/d, phi'=48/2.
    """
    xn = _GAIN * x - _THRESH
    th = jnp.tanh((-_D * xn) / _CLAMP)
    e = jnp.exp(_CLAMP * th)
    den = 1.0 - e
    near = jnp.abs(den) < 1e-12
    sden = jnp.where(near, 1.0, den)
    fr = jnp.where(near, 1.0 / _D, xn / sden)
    # d(den)/dxn = -e * (1 - th^2) * (-d) = e*d*(1 - th^2)
    dden = e * _D * (1.0 - th * th)
    dfr_dxn = jnp.where(near, 0.5, (sden - xn * dden) / (sden * sden))
    return fr, _GAIN * dfr_dxn


def _drift_fwd_full(y, s, w_t, consts, scalars):
    """Forward drift on (B, 48) packed state; also returns fr for the VJP."""
    tau_s, tau_m, tau_a, R = scalars
    v, a, r = y[:, 0:16], y[:, 16:32], y[:, 32:48]
    fr = _firing_rate(v - a)
    rec = jnp.dot(fr, w_t, preferred_element_type=jnp.float32)
    cur = (consts[1] * s + consts[0] + rec) * tau_s
    dv = (-v + cur * R) / tau_m
    da = (-a + consts[2] * fr) / tau_a
    dr = (-r + fr) / tau_s
    return jnp.concatenate([dv, da, dr], axis=1)


def _drift_vjp(y, cot, w, consts, scalars):
    """Hand-derived VJP of the drift at packed state y (B, 48).

    Given cotangent ``cot`` on f(y), returns (y_bar (B, 48),
    w_bar (16, 16)); the stimulus and constants receive no cotangent
    (they are data in every reference workload).
    """
    tau_s, tau_m, tau_a, R = scalars
    v, a = y[:, 0:16], y[:, 16:32]
    cv, ca, cr = cot[:, 0:16], cot[:, 16:32], cot[:, 32:48]
    fr, frp = _fr_and_grad(v - a)
    # rec[b,p] = sum_q fr[b,q] w[p,q]; dv/drec = R*tau_s/tau_m (diagonal).
    rec_bar = cv * (R * tau_s / tau_m)
    fr_bar = (
        jnp.dot(rec_bar, w, preferred_element_type=jnp.float32)
        + ca * (consts[2] / tau_a)
        + cr / tau_s
    )
    x_bar = frp * fr_bar
    yb_v = -cv / tau_m + x_bar
    yb_a = -ca / tau_a - x_bar
    yb_r = -cr / tau_s
    w_bar = jnp.dot(rec_bar.T, fr, preferred_element_type=jnp.float32)
    return jnp.concatenate([yb_v, yb_a, yb_r], axis=1), w_bar


def _rollout_bwd_kernel(scal_ref, w_ref, c_ref, g_ref, stim_ref, i10_ref,
                        ys_ref, ysbar_ref, cin_ref, cout_ref, wbar_ref):
    """Reverse sweep over one chunk of K steps: accumulates the
    recurrent-weight cotangent, replaying each step's stages from the
    stored trajectory.

    Forward step (see _rollout_kernel):
        f1 = f(y_i, s0);  h2 = y_i + 0.75 h f1 + 1.5 (I10/h) g
        f2 = f(h2, s_mid);  y_{i+1} = y_i + h (f1/3 + 2 f2/3) + I1 g
    Backward given c = bar{y_{i+1}} (incl. its output cotangent):
        f2_bar = (2h/3) c;       (h2_bar, wb2) = f^T|_{h2} f2_bar
        f1_bar = (h/3) c + 0.75 h h2_bar
        (y_bar, wb1) = f^T|_{y_i} f1_bar
        bar{y_i} = c + h2_bar + y_bar + ysbar[i]

    Chunk slices for global steps [a, b): ys/ysbar rows a..b-1, stim rows
    a..b (K+1 rows, the last stage samples stim at i+1), i10 rows a..b-1;
    cin = cot(y_b) from the later chunk, cout = cot(y_a).
    """
    h = scal_ref[0]
    scalars = (scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4])
    K = ys_ref.shape[0]
    w = w_ref[:]
    w_t = w.T
    consts = c_ref[:]
    g = g_ref[:]  # (1, 48)

    def step(kk, carry):
        c_adj, wbar = carry
        k = K - 1 - kk
        y = ys_ref[k]
        s0 = stim_ref[k]  # stim is time-major (K+1, B, 16)
        s1 = stim_ref[k + 1]
        s_mid = s0 + 0.75 * (s1 - s0)
        i10_h = (i10_ref[k, :] / h)[:, None]

        f1 = _drift_fwd_full(y, s0, w_t, consts, scalars)
        h2 = y + 0.75 * h * f1 + 1.5 * i10_h * g

        f2_bar = (2.0 * h / 3.0) * c_adj
        h2_bar, wb2 = _drift_vjp(h2, f2_bar, w, consts, scalars)
        f1_bar = (h / 3.0) * c_adj + 0.75 * h * h2_bar
        y_bar, wb1 = _drift_vjp(y, f1_bar, w, consts, scalars)

        c_new = c_adj + h2_bar + y_bar + ysbar_ref[k]
        return (c_new, wbar + wb1 + wb2)

    init = (cin_ref[:], jnp.zeros((16, 16), dtype=jnp.float32))
    c_out, wbar = jax.lax.fori_loop(0, K, step, init)
    cout_ref[:] = c_out
    wbar_ref[:] = wbar


def make_wta_rollout_diff(area: AreaParams, ts, noise_std: float = 100.0,
                          membrane_only: bool = False,
                          interpret: bool = False,
                          chunk: int | None = None):
    """Build a differentiable fused WTA rollout.

    Returns ``rollout(w, stim_tables, i1, i10) -> (B, T, 48)`` where only the
    recurrent-weight matrix ``w`` receives a cotangent (stimulus and noise
    are data in every reference workload; their cotangents are zero).
    Forward and backward sweeps run as Pallas kernels, split into VMEM-sized
    time chunks when the (batch x trajectory) footprint requires it (e.g.
    noise-realization-averaged training with hundreds of rollouts); the only
    residual is the forward trajectory, which the loss needs anyway.
    """
    import numpy as np

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

    def _bwd_call(w, stim_k, i10_k, ys_k, ysbar_k, cin):
        B = cin.shape[0]
        return pl.pallas_call(
            _rollout_bwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((B, 48), jnp.float32),
                       jax.ShapeDtypeStruct((16, 16), jnp.float32)),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            interpret=interpret,
        )(scalars, w, consts, g, stim_k, i10_k, ys_k, ysbar_k, cin)

    def _fwd_impl(w, stim_tables, i1, i10):
        """Forward rollout, chunked when over the VMEM budget.
        Returns (ys_bt (B,T,48), stim_tb, ys_tb)."""
        B, T, _ = stim_tables.shape
        stim_tb = jnp.transpose(stim_tables, (1, 0, 2))
        y0 = jnp.zeros((B, 48), dtype=jnp.float32)
        n_steps = T - 1
        K = min(chunk or auto_chunk(B), n_steps)
        if K == n_steps:
            ys_tb = _forward_call(scalars, w, consts, g, y0, stim_tb, i1,
                                  i10, interpret=interpret)
        else:
            n_full = n_steps // K
            rem = n_steps - n_full * K

            def body(y, c):
                tab = jax.lax.dynamic_slice(stim_tb, (c * K, 0, 0),
                                            (K + 1, B, 16))
                i1_c = jax.lax.dynamic_slice(i1, (c * K, 0), (K, B))
                i10_c = jax.lax.dynamic_slice(i10, (c * K, 0), (K, B))
                out = _forward_call(scalars, w, consts, g, y, tab, i1_c,
                                    i10_c, interpret=interpret)
                return out[-1], out[1:]

            y_last, chunks = jax.lax.scan(body, y0, jnp.arange(n_full))
            ys = chunks.reshape((n_full * K, B, 48))
            if rem:
                out = _forward_call(scalars, w, consts, g, y_last,
                                    stim_tb[n_full * K:], i1[n_full * K:],
                                    i10[n_full * K:], interpret=interpret)
                ys = jnp.concatenate([ys, out[1:]], axis=0)
            ys_tb = jnp.concatenate([y0[None], ys], axis=0)
        return jnp.transpose(ys_tb, (1, 0, 2)), stim_tb, ys_tb

    @jax.custom_vjp
    def rollout(w, stim_tables, i1, i10):
        return _fwd_impl(w, stim_tables, i1, i10)[0]

    def fwd(w, stim_tables, i1, i10):
        ys_bt, stim_tb, ys_tb = _fwd_impl(w, stim_tables, i1, i10)
        return ys_bt, (w, stim_tb, i1, i10, ys_tb)

    def bwd(res, ys_bar):
        w, stim_tb, i1, i10, ys_tb = res
        ysbar_tb = jnp.transpose(ys_bar, (1, 0, 2)).astype(jnp.float32)
        T, B, S = stim_tb.shape
        n_steps = T - 1
        K = min(chunk or auto_chunk(B), n_steps)
        c = ysbar_tb[n_steps]  # cot(y_{T-1})
        wbar = jnp.zeros((16, 16), jnp.float32)
        n_full = n_steps // K
        rem = n_steps - n_full * K
        if rem:  # topmost (remainder) chunk first: steps [n_full*K, n_steps)
            a = n_full * K
            c, wb = _bwd_call(w, stim_tb[a:], i10[a:], ys_tb[a:a + rem],
                              ysbar_tb[a:a + rem], c)
            wbar = wbar + wb

        def body(carry, cc):
            c, wbar = carry
            ci = n_full - 1 - cc
            stim_k = jax.lax.dynamic_slice(stim_tb, (ci * K, 0, 0),
                                           (K + 1, B, 16))
            i10_k = jax.lax.dynamic_slice(i10, (ci * K, 0), (K, B))
            ys_k = jax.lax.dynamic_slice(ys_tb, (ci * K, 0, 0), (K, B, 48))
            ysb_k = jax.lax.dynamic_slice(ysbar_tb, (ci * K, 0, 0),
                                          (K, B, 48))
            c_new, wb = _bwd_call(w, stim_k, i10_k, ys_k, ysb_k, c)
            return (c_new, wbar + wb), None

        (c, wbar), _ = jax.lax.scan(body, (c, wbar), jnp.arange(n_full))
        return (wbar, jnp.zeros((B, T, S), stim_tb.dtype),
                jnp.zeros_like(i1), jnp.zeros_like(i10))

    rollout.defvjp(fwd, bwd)
    return rollout


def wta_rollout_fused_chunked(params, area: AreaParams, y0, stim_tables, ts,
                              i1, i10, chunk: int = 8192,
                              noise_std: float = 100.0,
                              membrane_only: bool = False,
                              interpret: bool = False):
    """Long-horizon fused rollout: the time axis is split into VMEM-sized
    chunks, each one Pallas kernel call, chained with a ``lax.scan`` carry.

    Chunks overlap by one stimulus row (the SRA1 stage at a chunk's last
    step reads stim[i+1]), so the result is identical to the unchunked
    kernel. Inference path for the analysis suite's 10 s rivalry segments
    (reference: scripts/plotting_results.py:290-431), whose ~100k-step
    trajectories exceed the VMEM budget of a single kernel invocation.

    Args mirror ``wta_rollout_fused`` plus explicit ``y0`` (B, 48).
    Returns (B, T, 48).
    """
    import numpy as np

    B, T, _ = stim_tables.shape
    n_steps = T - 1
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
    w = params["recurrent_weights"]
    # Time-major stim: chunk slices along the leading axis are contiguous
    # in HBM (slicing the middle axis of (B, T, 16) is a strided gather
    # that dominated the sweep wall-clock at large B).
    stim_tb = jnp.transpose(stim_tables, (1, 0, 2))  # (T, B, 16)

    K = min(chunk, n_steps)
    n_full = n_steps // K
    rem = n_steps - n_full * K

    def body(y, c):
        tab = jax.lax.dynamic_slice(stim_tb, (c * K, 0, 0), (K + 1, B, 16))
        i1_c = jax.lax.dynamic_slice(i1, (c * K, 0), (K, B))
        i10_c = jax.lax.dynamic_slice(i10, (c * K, 0), (K, B))
        out = _forward_call(scalars, w, consts, g, y, tab, i1_c, i10_c,
                            interpret=interpret)  # (K+1, B, 48)
        return out[-1], out[1:]

    y_last, chunks = jax.lax.scan(body, y0, jnp.arange(n_full))
    ys = chunks.reshape(n_full * K, B, 48)

    if rem:
        out = _forward_call(scalars, w, consts, g, y_last,
                            stim_tb[n_full * K:],
                            i1[n_full * K:], i10[n_full * K:],
                            interpret=interpret)
        ys = jnp.concatenate([ys, out[1:]], axis=0)

    ys = jnp.concatenate([y0[None], ys], axis=0)  # (T, B, 48)
    return jnp.transpose(ys, (1, 0, 2))


def auto_chunk(batch: int, budget_bytes: int = 8 << 20) -> int:
    """Time-chunk size for ``wta_rollout_fused_chunked`` under a VMEM budget.

    Per-chunk VMEM ~ (K+1) * B * 4 bytes * (48 out + 16 stim + 2 noise).
    The 16 MB/core VMEM also holds weights/consts and double-buffering
    headroom, hence the default 8 MB budget for the rollout blocks.
    """
    per_step = batch * 4 * (48 + 16 + 2)
    return max(16, budget_bytes // per_step)
