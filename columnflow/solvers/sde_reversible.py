"""Exact O(1)-state-memory SDE gradients via the reversible Heun method.

torchsde pairs ``method='reversible_heun'`` with
``adjoint_method='adjoint_reversible_heun'`` (Kidger, Foster, Li & Lyons
2021): because the scheme is algebraically reversible on its extended state
(y, z), the backward pass can reconstruct every forward step exactly from
the final state — no stored trajectory, no checkpoints, and (unlike the
continuous backsolve adjoint in sde_adjoint.py) NO discretization mismatch:
the gradient equals backprop-through-the-solver to machine precision.

``sdeint_reversible`` is the columnflow version: a ``jax.custom_vjp`` whose
forward runs the reversible-Heun scan carrying only (y, z, f, g), and whose
backward runs one reverse ``lax.scan`` that (a) algebraically inverts each
step, (b) pulls the output cotangents through ``jax.vjp`` of the local step
map. State memory is O(1) in trajectory length (the Brownian increments —
scalars for the column models' scalar noise — are the only O(T) residual,
regenerated-size identical to the forward inputs).

Reference surface: torchsde's reversible_heun/adjoint pair is the
recommended training configuration in its README; the reference repo uses
torchsde wholesale (scripts/parity_ode.py:11).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from columnflow.solvers.sde import (_brownian_pack, _mul_elem,
                                    _mul_general, reversible_heun_step)


def _run(drift, diffusion, mul, y0, t0s, hs, i1, args):
    def step(carry, xs):
        y, z, f, g = carry
        t, h, w1 = xs
        y1, z1, f1, g1 = reversible_heun_step(
            drift, diffusion, t, t + h, y, z, f, g, h, w1, args, mul=mul)
        return (y1, z1, f1, g1), y1

    init = (y0, y0, drift(t0s[0], y0, *args), diffusion(t0s[0], y0, *args))
    (yN, zN, _, _), ys = jax.lax.scan(step, init, (t0s, hs, i1))
    return jnp.concatenate([y0[None], ys], axis=0), (yN, zN)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _solve(drift, diffusion, mul, y0, t0s, hs, i1, args):
    return _run(drift, diffusion, mul, y0, t0s, hs, i1, args)[0]


def _solve_fwd(drift, diffusion, mul, y0, t0s, hs, i1, args):
    ys, (yN, zN) = _run(drift, diffusion, mul, y0, t0s, hs, i1, args)
    # Only the FINAL extended state is saved — O(1) in trajectory length.
    return ys, (yN, zN, t0s, hs, i1, args)


def _solve_bwd(drift, diffusion, mul, res, ct_ys):
    yN, zN, t0s, hs, i1, args = res

    def step_map(t, h, w1, y, z, args_):
        # the forward step as a pure function of (y, z, args) — f, g are
        # deterministic functions of z, so the carried values in the
        # forward scan equal these recomputations exactly
        f = drift(t, z, *args_)
        g = diffusion(t, z, *args_)
        y1, z1, _, _ = reversible_heun_step(
            drift, diffusion, t, t + h, y, z, f, g, h, w1, args_, mul=mul)
        return y1, z1

    zero_args = jax.tree_util.tree_map(jnp.zeros_like, args)

    def back(carry, xs):
        y1, z1, ybar, zbar, abar = carry
        t, h, w1, ct_y1 = xs
        ybar = ybar + ct_y1
        # algebraic inversion: the same scheme applied with (-h, -w1)
        f1 = drift(t + h, z1, *args)
        g1 = diffusion(t + h, z1, *args)
        z0 = 2.0 * y1 - z1 - h * f1 - mul(g1, w1)
        f0 = drift(t, z0, *args)
        g0 = diffusion(t, z0, *args)
        y0_ = y1 - 0.5 * h * (f0 + f1) - 0.5 * mul(g0 + g1, w1)
        # pull the cotangents through the local step
        _, vjp_fn = jax.vjp(
            lambda y_, z_, a_: step_map(t, h, w1, y_, z_, a_), y0_, z0, args)
        dy, dz, da = vjp_fn((ybar, zbar))
        abar = jax.tree_util.tree_map(jnp.add, abar, da)
        return (y0_, z0, dy, dz, abar), None

    init = (yN, zN, jnp.zeros_like(yN), jnp.zeros_like(zN), zero_args)
    xs = (t0s, hs, i1, ct_ys[1:])
    (y0_, z0_, ybar, zbar, abar), _ = jax.lax.scan(
        back, init, xs, reverse=True)
    # z_0 == y_0: both auxiliary and primal seeds are y0
    dy0 = ybar + zbar + ct_ys[0]
    return (dy0, jnp.zeros_like(t0s), jnp.zeros_like(hs),
            jnp.zeros_like(i1), abar)


_solve.defvjp(_solve_fwd, _solve_bwd)


def sdeint_reversible(
    drift: Callable,
    diffusion: Callable,
    y0,
    ts: jax.Array,
    key: jax.Array,
    *args,
    noise: str = "scalar",
    noise_pack=None,
):
    """Stratonovich reversible-Heun solve with the exact reversible adjoint.

    Same contract as ``sdeint(..., method="reversible_heun",
    sde_type="stratonovich")`` — identical trajectories — but gradients come
    from the O(1)-state-memory algebraic-reversal backward pass instead of
    autodiff through the scan. Gradients w.r.t. ``y0`` and ``*args``;
    ``ts``/noise are treated as non-differentiable (torchsde semantics).
    """
    leaves = jax.tree_util.tree_leaves(y0)
    if not (len(leaves) == 1 and y0 is leaves[0]):
        if noise == "general":
            raise ValueError(
                "noise='general' requires a flat 1-D array state")
        from jax.flatten_util import ravel_pytree

        flat_y0, unravel = ravel_pytree(y0)

        def flat_fn(fn):
            def g(t, y_flat, *a):
                return ravel_pytree(fn(t, unravel(y_flat), *a))[0]
            return g

        ys = sdeint_reversible(flat_fn(drift), flat_fn(diffusion), flat_y0,
                               ts, key, *args, noise=noise,
                               noise_pack=noise_pack)
        return jax.vmap(unravel)(ys)

    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    ts = jnp.asarray(ts, dtype=y0.dtype)
    if noise == "scalar":
        noise_shape: tuple = ()
    elif noise == "diagonal":
        noise_shape = y0.shape
    elif noise == "general":
        if y0.ndim != 1:
            raise ValueError("noise='general' requires a 1-D state")
        g_shape = jax.eval_shape(
            lambda y_: diffusion(ts[0], y_, *args), y0).shape
        if len(g_shape) != 2 or g_shape[0] != y0.shape[0]:
            raise ValueError(
                f"noise='general' diffusion must return (d, m) = "
                f"({y0.shape[0]}, m); got {g_shape}")
        noise_shape = (g_shape[1],)
    else:
        raise ValueError(f"unknown noise kind: {noise!r}")
    mul = _mul_general if noise == "general" else _mul_elem

    if noise_pack is None:
        hs, i1, _, _, _ = _brownian_pack(key, ts, noise_shape, y0.dtype)
    else:
        hs = (ts[1:] - ts[:-1]).astype(y0.dtype)
        i1 = noise_pack[0]
    t0s = ts[:-1]
    return _solve(drift, diffusion, mul, y0, t0s,
                  jax.lax.stop_gradient(hs), jax.lax.stop_gradient(i1), args)


def sdeint_reversible_adaptive(
    drift: Callable,
    diffusion: Callable,
    y0,
    ts: jax.Array,
    key: jax.Array,
    *args,
    select_method: str = "sra1",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt0: float | None = None,
    dt_min: float = 0.0,
    max_steps: int = 16384,
    levy_depth: int = 20,
    controller: str = "pi",
    return_stats: bool = False,
):
    """Reversible Heun over an adaptively selected step grid: torchsde's
    ``adaptive=True`` + ``adjoint_method='adjoint_reversible_heun'``
    combination — EXACT O(1)-state-memory gradients on an adaptive grid.

    The selection pass (``sde_select_grid``, stepper ``select_method``)
    freezes the accepted-step sequence; the value is then the reversible
    Heun integration over that grid's half steps (Brownian increments from
    the same ``VirtualBrownianTree`` path), whose reverse-mode gradient is
    the algebraic-reversal adjoint of ``sdeint_reversible`` — equal to
    backprop-through-the-solver to machine precision, with only the final
    extended state stored. Where ``sdeint_adjoint_adaptive``'s continuous
    adjoint carries an O(h) discretization mismatch, this path's gradient
    is exact FOR ITS OWN forward; the forward is a (Stratonovich)
    reversible-Heun solution on the same grid — identical in law to the
    selection stepper's for ADDITIVE noise (the reference's model class),
    which is the intended domain.

    Scalar noise (one shared Brownian path — the adaptive engine's
    contract). Returns ys (len(ts),) + y0.shape; with
    ``return_stats=True`` also the controller's ``SDESolverStats``.
    """
    from columnflow.solvers.sde_adaptive import (_interp_accepted,
                                                 sde_select_grid)
    from columnflow.solvers.sde_adjoint import _adaptive_fine_grid

    leaves = jax.tree_util.tree_leaves(y0)
    if not (len(leaves) == 1 and y0 is leaves[0]):
        from jax.flatten_util import ravel_pytree

        flat_y0, unravel = ravel_pytree(y0)

        def flat_fn(fn):
            def g(t, y_flat, *a):
                return ravel_pytree(fn(t, unravel(y_flat), *a))[0]
            return g

        out = sdeint_reversible_adaptive(
            flat_fn(drift), flat_fn(diffusion), flat_y0, ts, key, *args,
            select_method=select_method, rtol=rtol, atol=atol, dt0=dt0,
            dt_min=dt_min, max_steps=max_steps, levy_depth=levy_depth,
            controller=controller, return_stats=return_stats)
        if return_stats:
            return jax.vmap(unravel)(out[0]), out[1]
        return jax.vmap(unravel)(out)

    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    ts = jnp.asarray(ts, dtype=y0.dtype)

    grid = sde_select_grid(drift, diffusion, y0, ts, key, *args,
                           method=select_method, rtol=rtol, atol=atol,
                           dt0=dt0, dt_min=dt_min, max_steps=max_steps,
                           levy_depth=levy_depth, controller=controller)
    max_steps_eff = grid.step_times.shape[0] - 1

    from columnflow.solvers.brownian import VirtualBrownianTree

    tree = VirtualBrownianTree(t0=ts[0], t1=ts[-1], key=key,
                               depth=levy_depth, dtype=y0.dtype)
    ht = _adaptive_fine_grid(grid.step_times)     # (2*max_steps + 1,)
    w = jax.vmap(tree.evaluate)(ht)
    i1 = jax.lax.stop_gradient(w[1:] - w[:-1])
    hs = jax.lax.stop_gradient(ht[1:] - ht[:-1])

    ys_fine = _solve(drift, diffusion, _mul_elem, y0, ht[:-1], hs, i1,
                     tuple(args))                 # (2*max_steps + 1,) + S
    ys = _interp_accepted(ys_fine[::2], y0, ts, grid.step_times,
                          grid.naccept)
    if return_stats:
        return ys, grid.stats
    return ys
