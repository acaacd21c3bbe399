"""Differentiable time-interpolation of stimuli.

Replaces the reference's ``torch_interp`` (reference: src/utils.py:31-46):
1-D linear interpolation of a (T, ...) table ``fp`` at scalar time ``x``,
clamped to the table's range. Used inside solver steps to look up the stimulus
at solver time t, so it must trace cleanly under jit/vmap/grad.

For the common case of a *uniform* time grid (every reference task builds
``time_vec`` with ``linspace``) ``interp_at`` avoids the O(log T) searchsorted
and computes the bracketing index in O(1) — cheaper on TPU where gather is
the expensive part.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp(x, xp, fp):
    """Linear interpolation of fp (shape (T, ...)) at scalar/array x over grid xp.

    Matches the reference semantics: x is clamped to [xp[0], xp[-1]].
    """
    x = jnp.clip(x, xp[0], xp[-1])
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, xp.shape[0] - 1)
    x0, x1 = xp[idx - 1], xp[idx]
    y0, y1 = fp[idx - 1], fp[idx]
    t = (x - x0) / (x1 - x0)
    # Broadcast scalar fraction over trailing feature dims of fp.
    t = jnp.reshape(t, jnp.shape(t) + (1,) * (fp.ndim - 1 - jnp.ndim(x)))
    return y0 + t * (y1 - y0)


def interp_at(x, t0, dt, fp):
    """Linear interpolation of fp (shape (T, ...)) at scalar x on a uniform grid.

    The grid is t0 + dt*arange(T); equivalent to ``interp`` with
    ``xp = linspace`` but with O(1) index computation.
    """
    T = fp.shape[0]
    pos = jnp.clip((x - t0) / dt, 0.0, T - 1.0)
    idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 2)
    frac = pos - idx
    y0 = fp[idx]
    y1 = fp[idx + 1]
    frac = jnp.reshape(frac, jnp.shape(frac) + (1,) * (fp.ndim - 1))
    return y0 + frac * (y1 - y0)


def interp_at_onehot(x, t0, dt, fp):
    """``interp_at`` without gathers: one-hot contraction over the time axis.

    Mosaic (Pallas TPU) does not lower ``dynamic_slice`` on register values,
    so inside fused solver kernels the table lookup becomes a masked
    reduction: sum over rows selected by an iota comparison. O(T) work per
    lookup instead of O(1), but T*n is tiny for every reference stimulus
    table and it runs on the VPU with no memory traffic.
    """
    T = fp.shape[0]
    pos = jnp.clip((x - t0) / dt, 0.0, T - 1.0)
    idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 2)
    frac = (pos - idx).astype(fp.dtype)
    if fp.ndim == 2:
        # Fold the linear blend into one selection row: (1-frac) at idx plus
        # frac at idx+1, contracted as a strict 2Dx2D matmul.
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        sel = ((rows == idx).astype(fp.dtype) * (1.0 - frac)
               + (rows == idx + 1).astype(fp.dtype) * frac)
        return jnp.matmul(sel, fp,
                          precision=jax.lax.Precision.HIGHEST)[0]
    # Higher-rank tables: masked reduction over the (untiled) time axis —
    # reshaping tiled trailing dims is an unsupported Mosaic shape cast.
    rows = jax.lax.broadcasted_iota(jnp.int32, (T,) + (1,) * (fp.ndim - 1), 0)
    sel = ((rows == idx).astype(fp.dtype) * (1.0 - frac)
           + (rows == idx + 1).astype(fp.dtype) * frac)
    return jnp.sum(sel * fp, axis=0)


def interp_knots(t, knot_ts, knot_vals):
    """Piecewise-linear interpolation through K static knots — exact for
    phase-structured stimuli (the WTA/XOR/parity tables are all flat
    segments joined by one-grid-step ramps).

    ``knot_ts``: K host floats (ascending); ``knot_vals``: (K, ...) values.
    Telescoped form: vals[0] + sum_k clip((t-t_{k-1})/(t_k-t_{k-1}), 0, 1)
    * (vals[k] - vals[k-1]) — O(K) adds, no gather, kernel-safe (Mosaic has
    no dynamic_slice on register values), and ~T/K times less VMEM than a
    dense (T, ...) table.
    """
    out = knot_vals[0]
    for k in range(1, len(knot_ts)):
        t0, t1 = float(knot_ts[k - 1]), float(knot_ts[k])
        frac = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        out = out + frac * (knot_vals[k] - knot_vals[k - 1])
    return out


def step_table_knots(time_steps: int, dt: float, off_vals, on_vals):
    """Knots reproducing ``interp_at`` on a half-off / half-on step table
    (the prep_stim_ode pattern, scripts/xor_ode.py:75-91,
    scripts/parity_ode.py:143-153): off until row T//2 - 1, a one-step ramp,
    then on. Returns (knot_ts (4,), knot_vals (4, ...))."""
    hl = time_steps // 2
    knot_ts = (0.0, (hl - 1) * dt, hl * dt, (time_steps - 1) * dt)
    vals = jnp.stack([off_vals, off_vals, on_vals, on_vals])
    return knot_ts, vals
