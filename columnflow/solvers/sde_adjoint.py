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
    """
    _check(sde_type, additive)
    if dt is not None:
        try:
            ts_c = np.asarray(ts, dtype=np.float64)
        except Exception as e:  # traced ts — substep count must be static
            raise ValueError(
                "dt= needs concrete ts (the substep count per interval is "
                "a static compile-time quantity)") from e
        k = 1 if ts_c.size < 2 else max(
            1, int(np.ceil(float(np.max(np.abs(np.diff(ts_c)))) / float(dt)
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
