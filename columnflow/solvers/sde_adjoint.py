"""Stochastic-adjoint gradients for SDE integration (torchsde's flagship
``sdeint_adjoint``, Li et al. 2020 "Scalable Gradients for SDEs").

The reference imports torchsde (scripts/wta_ode.py:10) whose headline feature
is adjoint-based SDE gradients; the reference itself backprops through solver
steps, which this framework provides as the default "replay" gradient. This
module adds the adjoint alternative as a first-class, working feature: the
backward pass re-integrates the state TOGETHER with the adjoint variables in
reverse time, driven by the SAME Brownian path — so no per-step solver
internals are ever stored (memory is O(|state| + |outputs|) instead of
O(steps x stages x |state|)).

TPU-native twist: torchsde needs its C++ Brownian-interval cache to re-query
W(t) in reverse; here the noise is counter-based (``_brownian_pack`` draws are
a pure function of (key, step index)), so the backward pass simply regenerates
the increments — reverse reconstruction is free, stateless, and jit/vmap-safe.

Validity: the pathwise reverse-time adjoint SDE is a Stratonovich construction
(Li et al. 2020, Sec. 3). It therefore supports

- ``sde_type="stratonovich"`` with any state-dependent diffusion, and
- ``sde_type="ito"`` with ADDITIVE noise (where Ito and Stratonovich
  coincide) — the reference's model class: all three column models have
  constant diffusion (src/coupled_columns.py:239-249, 444-454, 790-800).

Ito with state-dependent diffusion is rejected (use replay gradients).

The augmented reverse system, integrated interval-by-interval from each
stored output state ys[i] down to ts[i-1] with one stochastic-Heun step per
grid interval (the forward integrator is also one step per interval):

    dy  = f dt + g dW
    da  = -(df/dy)^T a dt - (dg/dy)^T a dW
    dp  = -(df/dp)^T a dt - (dg/dp)^T a dW

with the incoming output-time cotangent added to ``a`` at each ts[i].
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers.sde import _brownian_pack, sdeint

_VALID = ("ito", "stratonovich")


def _check(sde_type: str, additive: bool):
    if sde_type not in _VALID:
        raise ValueError(f"unknown sde_type: {sde_type!r}")
    if sde_type == "ito" and not additive:
        raise ValueError(
            "sdeint_adjoint requires additive noise for Ito SDEs (the "
            "reverse-time adjoint SDE is a Stratonovich construction; for "
            "additive noise the calculi coincide). Use "
            "sde_type='stratonovich' or replay gradients (plain sdeint)."
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _sdeint_backsolve(drift, diffusion, method, noise, additive, sde_type,
                      y0, ts, key, args):
    return sdeint(drift, diffusion, y0, ts, key, *args, method=method,
                  noise=noise, additive=additive, sde_type=sde_type)


def _fwd(drift, diffusion, method, noise, additive, sde_type,
         y0, ts, key, args):
    ys = _sdeint_backsolve(drift, diffusion, method, noise, additive,
                           sde_type, y0, ts, key, args)
    return ys, (ys, ts, key, args)


def _bwd(drift, diffusion, method, noise, additive, sde_type, res, cot):
    ys, ts, key, args = res
    dtype = ys.dtype
    noise_shape = () if noise == "scalar" else ys.shape[1:]
    # Regenerate the forward pass's Brownian increments (counter-based: pure
    # function of the key, nothing was stored).
    _, i1, _, _, _ = _brownian_pack(key, ts, noise_shape, dtype)

    def aug_coeffs(t, y, a, h_r, dw_r):
        """One evaluation of the reverse augmented increment at (t, y, a).

        h_r = t_lo - t_hi (negative), dw_r = W(t_lo) - W(t_hi).
        Returns the (dy, da, dargs) contribution of this coefficient point.
        """
        f, vjp_f = jax.vjp(lambda y_, p_: drift(t, y_, *p_), y, args)
        g, vjp_g = jax.vjp(lambda y_, p_: diffusion(t, y_, *p_), y, args)
        fy_a, fp_a = vjp_f(a)
        gy_a, gp_a = vjp_g(a * dw_r)  # dW folded into the seed
        dy = f * h_r + g * dw_r
        da = -(fy_a * h_r + gy_a)
        dp = jax.tree_util.tree_map(
            lambda fp, gp: -(fp * h_r + gp), fp_a, gp_a)
        return dy, da, dp

    def back_interval(carry, idx):
        """One reverse stochastic-Heun step from ts[idx] to ts[idx-1]."""
        a, p_bar = carry
        a = a + cot[idx]
        y = ys[idx]
        t_hi = ts[idx]
        t_lo = ts[idx - 1]
        h_r = t_lo - t_hi
        dw_r = -i1[idx - 1]

        dy0, da0, dp0 = aug_coeffs(t_hi, y, a, h_r, dw_r)
        y_pred = y + dy0
        a_pred = a + da0
        _, da1, dp1 = aug_coeffs(t_lo, y_pred, a_pred, h_r, dw_r)
        a1 = a + 0.5 * (da0 + da1)
        p1 = jax.tree_util.tree_map(
            lambda p, d0, d1: p + 0.5 * (d0 + d1), p_bar, dp0, dp1)
        return (a1, p1), None

    n = ts.shape[0]
    zero_args = jax.tree_util.tree_map(jnp.zeros_like, args)
    init = (jnp.zeros_like(ys[0]), zero_args)
    (a_final, args_bar), _ = jax.lax.scan(
        back_interval, init, jnp.arange(n - 1, 0, -1))
    y0_bar = a_final + cot[0]
    # Gradients w.r.t. the time grid are not provided (the Brownian increments
    # are themselves functions of the grid); torchsde's adjoint likewise does
    # not differentiate ts.
    ts_bar = jnp.zeros_like(ts)
    key_bar = np.zeros(np.shape(key), dtype=jax.dtypes.float0)
    return (y0_bar, ts_bar, key_bar, args_bar)


_sdeint_backsolve.defvjp(_fwd, _bwd)


def sdeint_adjoint(
    drift: Callable,
    diffusion: Callable,
    y0,
    ts: jax.Array,
    key: jax.Array,
    *args,
    method: str = "srk",
    noise: str = "scalar",
    additive: bool = False,
    sde_type: str = "ito",
    dt: float | None = None,
    adaptive: bool = False,
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt_min: float = 0.0,
    max_steps: int = 16384,
):
    """``sdeint`` whose reverse-mode gradient is the stochastic adjoint.

    Same signature and forward values as :func:`columnflow.solvers.sdeint`
    (without ``noise_pack``/``remat``: the Brownian path must come from the
    key so the backward pass can regenerate it). Gradients flow to ``y0`` and
    ``*args``; memory does not grow with solver stage count or require
    rematerialisation of the step graph. ``dt`` refines the internal grid
    like ``sdeint``'s (the backward pass re-integrates the same fine grid
    in reverse on the same regenerated path).

    Replaces torchsde's ``sdeint_adjoint`` (unused by the reference's scripts
    but the package's central capability; reference import of the package at
    scripts/wta_ode.py:10).

    ``adaptive=True`` is torchsde's flagship combination
    ``sdeint_adjoint(..., adaptive=True)``: step sizes come from the
    adaptive controller (``rtol``/``atol``/``dt_min``/``max_steps``,
    solvers/sde_adaptive.py) and the adjoint runs backward over the frozen
    accepted grid — see :func:`sdeint_adjoint_adaptive` (which it forwards
    to; scalar additive noise, method mapped ``srk``->``sra1``).
    """
    _check(sde_type, additive)
    if adaptive:
        if noise != "scalar":
            raise ValueError(
                "adaptive=True supports noise='scalar' (the adaptive "
                "engine integrates one shared Brownian path)")
        if not additive:
            raise ValueError(
                "adaptive=True requires additive noise (the backward "
                "re-integrates over the frozen grid; for additive noise "
                "the Ito and Stratonovich calculi coincide)")
        a_method = {"srk": "sra1", "sra1": "sra1", "euler": "euler",
                    "milstein": "milstein"}.get(method)
        if a_method is None:
            raise ValueError(
                f"adaptive=True supports methods srk/sra1/euler/milstein; "
                f"got {method!r}")
        return sdeint_adjoint_adaptive(
            drift, diffusion, y0, ts, key, *args, method=a_method,
            rtol=rtol, atol=atol, dt0=dt, dt_min=dt_min,
            max_steps=max_steps)
    if dt is not None:
        try:
            ts_c = np.asarray(ts, dtype=np.float64)
        except Exception as e:  # traced ts — substep count must be static
            raise ValueError(
                "dt= needs concrete ts (the substep count per interval is "
                "a static compile-time quantity)") from e
        # Same hardening as sdeint's dt= path (solvers/sde.py): a
        # decreasing grid must fail loudly here too, not proceed into the
        # Brownian construction where sqrt of a negative interval NaNs
        # silently.
        if ts_c.size >= 2 and np.any(np.diff(ts_c) < 0):
            raise ValueError(
                "sdeint requires non-decreasing ts (Brownian increments "
                "are defined forward in time)")
        k = 1 if ts_c.size < 2 else max(
            1, int(np.ceil(float(np.max(np.diff(ts_c))) / float(dt)
                           - 1e-12)))
        if k > 1:
            tsj = jnp.asarray(ts)
            frac = jnp.arange(k, dtype=tsj.dtype) / k
            tfine = (tsj[:-1, None]
                     + frac[None, :] * jnp.diff(tsj)[:, None]).reshape(-1)
            tfine = jnp.concatenate([tfine, tsj[-1:]])
            ys = sdeint_adjoint(drift, diffusion, y0, tfine, key, *args,
                                method=method, noise=noise,
                                additive=additive, sde_type=sde_type)
            return jax.tree_util.tree_map(lambda a: a[::k], ys)

    leaves = jax.tree_util.tree_leaves(y0)
    if not (len(leaves) == 1 and y0 is leaves[0]):
        from jax.flatten_util import ravel_pytree

        flat_y0, unravel = ravel_pytree(y0)

        def flat_fn(fn):
            def g(t, y_flat, *a):
                return ravel_pytree(fn(t, unravel(y_flat), *a))[0]
            return g

        ys = sdeint_adjoint(flat_fn(drift), flat_fn(diffusion), flat_y0, ts,
                            key, *args, method=method, noise=noise,
                            additive=additive, sde_type=sde_type)
        return jax.vmap(unravel)(ys)

    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    ts = jnp.asarray(ts, dtype=y0.dtype)
    return _sdeint_backsolve(drift, diffusion, method, noise, additive,
                             sde_type, y0, ts, key, tuple(args))


# ---------------------------------------------------------------------------
# Adaptive stepping x O(|state|)-memory gradients (torchsde's flagship
# combination ``sdeint_adjoint(..., adaptive=True)``; reference basis: the
# torchsde import at scripts/wta_ode.py:10 and the README's adaptive note,
# README.md:27-29). The selection pass (solvers/sde_adaptive.py) freezes an
# accepted-step grid under stop_gradient; the forward value is the standard
# replay over that grid; the BACKWARD re-integrates (y, a, p_bar) in reverse
# time over the same frozen half-step grid on the SAME Brownian path
# (regenerated from the counter-based key) — no per-step state is ever
# stored, so gradient memory is O(|state| + |outputs|) however many steps
# the controller took, where replay gradients grow with naccept (at the
# 104-column scale: 16384-step budgets forced truncated BPTT,
# RESULTS.md).
# ---------------------------------------------------------------------------


def _adaptive_fine_grid(step_times):
    """(2*max_steps + 1,) half-step grid ht of a frozen accepted grid —
    exactly the points the replay pass steps through (sde_adaptive's
    ``_half_noise`` midpoints)."""
    hs = step_times[1:] - step_times[:-1]
    mids = step_times[:-1] + 0.5 * hs
    return jnp.concatenate(
        [jnp.stack([step_times[:-1], mids], axis=1).reshape(-1),
         step_times[-1:]])


def _interp_weights(ts, step_times, naccept):
    """(idx, theta) of ``_interp_accepted``'s linear map ys = W @ ys_acc:
    output i draws (1 - theta_i) from accepted point idx_i and theta_i
    from idx_i + 1."""
    idx = jnp.clip(
        jnp.searchsorted(step_times, ts, side="right") - 1, 0, naccept - 1
    ).astype(jnp.int32)
    t0s = step_times[idx]
    hs = step_times[idx + 1] - t0s
    theta = jnp.where(hs > 0, (ts - t0s) / jnp.where(hs > 0, hs, 1.0), 0.0)
    return idx, theta


def _lean_forward(stepper, with_i10, drift, diffusion, y0, ts, step_times,
                  naccept, max_steps, tree, i10_draw, args):
    """The frozen-grid replay with O(|outputs| + |state|) memory: instead
    of stacking every accepted state ((max_steps+1) x |state| — 163 MB at
    the 104-column budget) and interpolating afterwards, the scan carries
    the (T, |state|) output buffer and accumulates each accepted state's
    interpolation contribution as it passes (idx is monotone, so accepted
    point m touches only outputs bracketing it). Values equal
    ``_replay_pass``'s to 1 ulp (accumulation order); also returns the final accepted state
    (the adjoint backward's seed)."""
    dtype = y0.dtype
    idx, theta = _interp_weights(ts, step_times, naccept)
    bshape = (ts.shape[0],) + (1,) * y0.ndim

    def contrib(m):
        # W^T column m: (1-theta) where idx == m, theta where idx == m-1.
        w = (jnp.where(idx == m, 1.0 - theta, 0.0)
             + jnp.where(idx == m - 1, theta, 0.0))
        return w.reshape(bshape).astype(dtype)

    def body(carry, m):
        y, w0, out = carry
        out = out + contrib(m) * y[None]
        t0 = step_times[m]
        h = step_times[m + 1] - t0
        from columnflow.solvers.sde_adaptive import _half_noise

        dw_a, dw_b, i10_a, i10_b, _, w1 = _half_noise(
            tree, i10_draw, t0, h, dtype, with_i10, w0=w0)
        y_half = stepper(drift, diffusion, t0, y, 0.5 * h, dw_a, i10_a,
                         args)
        y1 = stepper(drift, diffusion, t0 + 0.5 * h, y_half, 0.5 * h, dw_b,
                     i10_b, args)
        return (y1, w1, out), None

    out0 = jnp.zeros((ts.shape[0],) + y0.shape, dtype)
    (y_end, _, out), _ = jax.lax.scan(
        body, (y0, tree.evaluate(step_times[0]), out0),
        jnp.arange(max_steps, dtype=jnp.int32))
    # The loop adds point m's contribution BEFORE stepping m -> m+1, so
    # point max_steps itself is only reached here (nonzero weight only if
    # naccept == max_steps; padded points carry y_end anyway, h == 0).
    out = out + contrib(jnp.asarray(max_steps, jnp.int32)) * y_end[None]
    return out, y_end


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _sdeint_adaptive_backsolve(drift, diffusion, method, levy_depth,
                               y0, ts, key, step_times, naccept, args):
    from columnflow.solvers.sde_adaptive import _setup

    (stepper, _, with_i10, _, ts_, _, _, tree, i10_draw, _) = _setup(
        method, y0, ts, key, None, levy_depth)
    max_steps = step_times.shape[0] - 1
    ys, _ = _lean_forward(stepper, with_i10, drift, diffusion, y0, ts_,
                          step_times, naccept, max_steps, tree, i10_draw,
                          args)
    return ys


def _ada_fwd(drift, diffusion, method, levy_depth,
             y0, ts, key, step_times, naccept, args):
    from columnflow.solvers.sde_adaptive import _setup

    (stepper, _, with_i10, _, ts_, _, _, tree, i10_draw, _) = _setup(
        method, y0, ts, key, None, levy_depth)
    max_steps = step_times.shape[0] - 1
    ys, y_end = _lean_forward(stepper, with_i10, drift, diffusion, y0, ts_,
                              step_times, naccept, max_steps, tree,
                              i10_draw, args)
    return ys, (y_end, ts, key, step_times, naccept, args)


def _ada_bwd(drift, diffusion, method, levy_depth, res, cot):
    from columnflow.solvers.sde_adaptive import _STEPPERS, _setup

    y_end, ts, key, step_times, naccept, args = res
    y0_shape_dummy = jnp.zeros_like(y_end)
    (stepper, _, with_i10, _, ts_, _, _, tree, i10_draw, _) = _setup(
        method, y0_shape_dummy, ts, key, None, levy_depth)
    max_steps = step_times.shape[0] - 1
    dtype = y_end.dtype

    # Regenerate the per-half-step Brownian data with EXACTLY the query
    # times the forward (_lean_forward -> _half_noise) used: interval m has
    # t0 = step_times[m] (the array value), h = step_times[m+1] - t0, and
    # queries t0, t0 + 0.5*h, t0 + h — the top is the COMPUTED t0 + h, not
    # step_times[m+1] (fl(a + fl(b - a)) == b is not guaranteed, so keying
    # draws on the array value could re-integrate a different
    # interval-keyed normal than the forward consumed). The forward also
    # carries W(t0 + h) as the next interval's W(t0+1), which the
    # interleaved bottom sequence below reproduces.
    def _ilv(a, b):
        return jnp.stack([a, b], axis=1).reshape(-1)

    hs = step_times[1:] - step_times[:-1]             # (max_steps,)
    mids = step_times[:-1] + 0.5 * hs
    tops = step_times[:-1] + hs                       # forward's t0 + h
    w_mid = jax.vmap(tree.evaluate)(mids)
    w_top = jax.vmap(tree.evaluate)(tops)
    w_bot = jnp.concatenate(
        [tree.evaluate(step_times[0])[None], w_top[:-1]])
    dw_a, dw_b = w_mid - w_bot, w_top - w_mid
    if with_i10:
        # The forward replay's exact space-time-integral draws, regenerated
        # from the counter-based key (interval-endpoint-keyed).
        za = jax.vmap(i10_draw)(step_times[:-1], mids).astype(dtype)
        zb = jax.vmap(i10_draw)(mids, tops).astype(dtype)
        hh = 0.5 * hs
        root = jnp.sqrt(hh / 12.0)
        i10_a = hh * (0.5 * dw_a + root * za)
        i10_b = hh * (0.5 * dw_b + root * zb)
    else:
        i10_a = i10_b = jnp.zeros_like(dw_a)
    lo_t = _ilv(step_times[:-1], mids)                # (2*max_steps,)
    hi_t = _ilv(mids, tops)
    h_half = _ilv(0.5 * hs, 0.5 * hs)
    dws = _ilv(dw_a, dw_b)
    i10s = _ilv(i10_a, i10_b)

    # Cotangent injection through the interpolation transpose WITHOUT
    # materializing a (max_steps+1, |state|) buffer (would be 163 MB at
    # the 104-column step budget — measured, benchmarks/adjoint_memory.py):
    # accepted point m's injection is a contiguous output range (idx is
    # monotone), so two (T+1, |state|) prefix-sum tables + per-m
    # searchsorted bounds give each injection as four O(|state|) gathers.
    idx, theta = _interp_weights(ts_, step_times, naccept)
    bshape = (ts_.shape[0],) + (1,) * y_end.ndim
    theta_b = theta.reshape(bshape)
    c0 = (1.0 - theta_b) * cot      # weight toward accepted point idx
    c1 = theta_b * cot              # weight toward accepted point idx + 1
    # Output 0 is y0 exactly (``_interp_accepted`` semantics): its
    # cotangent bypasses the interpolation and flows straight to y0.
    c0 = c0.at[0].set(0.0)
    c1 = c1.at[0].set(0.0)
    zrow = jnp.zeros((1,) + cot.shape[1:], dtype)
    s0 = jnp.concatenate([zrow, jnp.cumsum(c0, axis=0)])   # (T+1,) + state
    s1 = jnp.concatenate([zrow, jnp.cumsum(c1, axis=0)])
    marange = jnp.arange(max_steps + 1, dtype=jnp.int32)
    lo = jnp.searchsorted(idx, marange, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(idx, marange, side="right").astype(jnp.int32)

    def inj_at(m):
        a0 = s0[hi[m]] - s0[lo[m]]
        m1 = jnp.maximum(m - 1, 0)
        a1 = jnp.where(m >= 1, s1[hi[m1]] - s1[lo[m1]], 0.0)
        return a0 + a1

    def aug_coeffs(t, y, a, h_r, dw_r):
        f, vjp_f = jax.vjp(lambda y_, p_: drift(t, y_, *p_), y, args)
        g, vjp_g = jax.vjp(lambda y_, p_: diffusion(t, y_, *p_), y, args)
        fy_a, fp_a = vjp_f(a)
        gy_a, gp_a = vjp_g(a * dw_r)
        dy = f * h_r + g * dw_r
        da = -(fy_a * h_r + gy_a)
        dp = jax.tree_util.tree_map(
            lambda fp, gp: -(fp * h_r + gp), fp_a, gp_a)
        return dy, da, dp

    # Reverse-time reconstruction of y with the FORWARD stepper under the
    # time flip s = -t: Y(s) = y(-s) solves dY = f_r ds + g_r dV over the
    # flipped Brownian path V(s) = W(-s), with f_r(s, y) = -f(-s, y),
    # g_r(s, y) = g(-s, y), and the flipped path's per-interval data
    # following exactly from the substitution u = -s:
    #     dV  = V(s0+h) - V(s0)            = -dW
    #     I10_V = int (V - V(s0)) ds       = I10 - h dW.
    # (Valid pathwise for additive noise — the adjoint path's validity
    # domain.) Using the forward scheme (SRA1 for method="sra1") keeps the
    # reconstruction at the forward pass's strong order — a plain
    # reverse-Heun reconstruction drops the space-time integrals
    # (O(h^1.5) per-step path error), which measurably biased parameter
    # gradients on stochastic problems.
    def reconstruct(t_lo, t_hi, y_hi, h, dw, i10):
        f_r = lambda s, y_, *a_: -drift(-s, y_, *a_)
        g_r = lambda s, y_, *a_: diffusion(-s, y_, *a_)
        return stepper(f_r, g_r, -t_hi, y_hi, h, -dw, i10 - h * dw, args)

    def back_half_step(carry, xs):
        """One frozen half interval in reverse: y reconstructed with the
        forward scheme (nothing stored), the (a, p) adjoint integrated
        with stochastic Heun on the reconstructed endpoints, cotangent
        injected at the interval's top point (even fine indices are
        accepted points). Padding intervals (h == 0, dw == 0) are exact
        no-ops."""
        y, a, p_bar = carry
        t_lo, t_hi, h, dw, i10, j_top = xs
        a = a + jnp.where(j_top % 2 == 0, inj_at(j_top // 2), 0.0)
        h_r = -h
        dw_r = -dw
        y_lo = reconstruct(t_lo, t_hi, y, h, dw, i10)
        dy0, da0, dp0 = aug_coeffs(t_hi, y, a, h_r, dw_r)
        _, da1, dp1 = aug_coeffs(t_lo, y_lo, a + da0, h_r, dw_r)
        a1 = a + 0.5 * (da0 + da1)
        p1 = jax.tree_util.tree_map(
            lambda p, d0, d1: p + 0.5 * (d0 + d1), p_bar, dp0, dp1)
        return (y_lo, a1, p1), None

    zero_args = jax.tree_util.tree_map(jnp.zeros_like, args)
    init = (y_end, jnp.zeros_like(y_end), zero_args)
    xs = (lo_t, hi_t, h_half, dws, i10s,
          jnp.arange(1, 2 * max_steps + 1, dtype=jnp.int32))
    (y_start, a_final, args_bar), _ = jax.lax.scan(
        back_half_step, init, xs, reverse=True)
    y0_bar = a_final + inj_at(jnp.zeros((), jnp.int32)) + cot[0]

    import numpy as _np
    ts_bar = jnp.zeros_like(ts)
    key_bar = _np.zeros(_np.shape(key), dtype=jax.dtypes.float0)
    st_bar = jnp.zeros_like(step_times)
    na_bar = _np.zeros(_np.shape(naccept), dtype=jax.dtypes.float0)
    return (y0_bar, ts_bar, key_bar, st_bar, na_bar, args_bar)


_sdeint_adaptive_backsolve.defvjp(_ada_fwd, _ada_bwd)


def sdeint_adjoint_adaptive(
    drift: Callable,
    diffusion: Callable,
    y0,
    ts: jax.Array,
    key: jax.Array,
    *args,
    method: str = "sra1",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt0: float | None = None,
    dt_min: float = 0.0,
    max_steps: int = 16384,
    levy_depth: int = 20,
    controller: str = "pi",
    select_drift: Callable | None = None,
    select_diffusion: Callable | None = None,
    select_args: tuple | None = None,
    return_stats: bool = False,
):
    """Adaptive SDE integration whose gradient is the stochastic adjoint
    run backward over the frozen accepted-step grid — torchsde's
    ``sdeint_adjoint(..., adaptive=True)``.

    Forward values equal ``sdeint_adaptive(..., differentiable=True)``
    exactly (same selection pass, same replay over the frozen grid, same
    Brownian path). The BACKWARD re-integrates state + adjoint + parameter
    cotangents in reverse over the grid's half steps on the regenerated
    path: memory is O(|state| + |outputs|), independent of how many steps
    the controller accepted — where replay gradients store (or remat)
    every accepted step and at chaotic scale require truncated BPTT
    (``bptt_every``, RESULTS.md).

    Validity: the pathwise reverse-time adjoint SDE is a Stratonovich
    construction; the adaptive steppers here are Ito, so this path
    requires ADDITIVE noise (where the calculi coincide) — the reference's
    model class (all three column models have constant diffusion,
    src/coupled_columns.py:239-249, 444-454, 790-800). The gradient is a
    discretization of the continuous adjoint on the frozen grid: it
    converges to the replay gradient as rtol/atol tighten (pinned in
    tests/test_sde_adjoint.py) but is not bit-identical at finite
    tolerance. Like every backsolve scheme, reverse-time state
    reconstruction inherits the forward dynamics' conditioning: on
    chaotic/stiff attractors the reconstructed y drifts from the forward
    path and the adjoint degrades — measured honestly in RESULTS.md; use
    replay + ``bptt_every`` there.

    ``select_drift``/``select_diffusion``/``select_args`` override the
    functions the SELECTION pass uses (e.g. bf16 weights), exactly as in
    ``sdeint_adaptive``; values and gradients always use the
    full-precision functions.
    """
    from columnflow.solvers.sde_adaptive import sde_select_grid

    leaves = jax.tree_util.tree_leaves(y0)
    if not (len(leaves) == 1 and y0 is leaves[0]):
        from jax.flatten_util import ravel_pytree

        flat_y0, unravel = ravel_pytree(y0)

        def flat_fn(fn):
            def g(t, y_flat, *a):
                return ravel_pytree(fn(t, unravel(y_flat), *a))[0]
            return g

        out = sdeint_adjoint_adaptive(
            flat_fn(drift), flat_fn(diffusion), flat_y0, ts, key, *args,
            method=method, rtol=rtol, atol=atol, dt0=dt0, dt_min=dt_min,
            max_steps=max_steps, levy_depth=levy_depth,
            controller=controller,
            select_drift=(None if select_drift is None
                          else flat_fn(select_drift)),
            select_diffusion=(None if select_diffusion is None
                              else flat_fn(select_diffusion)),
            select_args=select_args,
            return_stats=return_stats)
        if return_stats:
            return jax.vmap(unravel)(out[0]), out[1]
        return jax.vmap(unravel)(out)

    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    ts = jnp.asarray(ts, dtype=y0.dtype)

    grid = sde_select_grid(
        drift if select_drift is None else select_drift,
        diffusion if select_diffusion is None else select_diffusion,
        y0, ts, key,
        *(args if select_args is None else select_args),
        method=method, rtol=rtol, atol=atol, dt0=dt0, dt_min=dt_min,
        max_steps=max_steps, levy_depth=levy_depth, controller=controller)
    ys = _sdeint_adaptive_backsolve(drift, diffusion, method, levy_depth,
                                    y0, ts, key, grid.step_times,
                                    grid.naccept, tuple(args))
    if return_stats:
        return ys, grid.stats
    return ys
