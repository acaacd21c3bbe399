"""Event-terminated ODE integration (torchdiffeq's ``odeint_event``).

torchdiffeq ships ``odeint_event(func, y0, t0, *, event_fn, ...)`` →
``(event_t, solution)``: integrate until the scalar ``event_fn(t, y)``
changes sign, root-find the crossing, and reroute gradients to the event
time through the implicit function theorem. The reference depends on
torchdiffeq's public surface (scripts import it wholesale,
scripts/parity_ode.py:10), so the API is part of capability parity even
though no reference script calls it.

TPU-native design — everything is one compiled program, no host control
flow:

1. **Bracketing**: the standard adaptive ``lax.while_loop``
   (dopri.py:_adaptive_pass) with the stop condition extended by "the
   event function's sign at the last accepted point still matches its
   sign at t0". The carry already holds the dense-output coefficients of
   the last accepted step, which is exactly the bracketing interval.
2. **Root refinement**: ``bisect_iters`` bisection steps (``fori_loop``)
   on the step's dense interpolant — no extra drift evaluations.
3. **Gradients**: the event time is defined implicitly by
   E(t*, y(t*; p)) = 0, so dt*/dp = -(e_y . dy*/dp) / (e_t + e_y . f*)
   (torchdiffeq's ImplicitFnGradientRerouting). Implemented as a
   ``jax.custom_vjp`` whose backward runs one differentiable replay solve
   to (t*, y*) and pulls the cotangent through it. The returned solution's
   endpoint carries the total derivative dy*/dp + f* dt*/dp.

Unlike torchdiffeq (which integrates until it finds an event, however
long), the search is bounded by ``max_steps`` and the optional ``t_max``;
if no sign change occurs the returned time is where integration stopped
(pass ``return_found=True`` to detect this under jit).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from jax.flatten_util import ravel_pytree

from columnflow.solvers.api import odeint
from columnflow.solvers.dopri import (_adaptive_pass, _resolve_method,
                                      dense_eval)
from columnflow.solvers.rk import DOPRI5_DENSE_D


def _sign(x):
    # sign with 0 treated as positive, so an event value of exactly 0 at t0
    # does not suppress detection of the first real crossing.
    return jnp.where(x >= 0, 1.0, -1.0)


def odeint_event(
    func: Callable,
    y0,
    t0,
    *args,
    event_fn: Callable,
    t_max: float | None = None,
    reverse_time: bool = False,
    method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
    dt0: float | None = None,
    max_steps: int = 2048,
    bisect_iters: int = 60,
    return_found: bool = False,
):
    """Integrate until ``event_fn(t, y)`` (scalar) changes sign.

    Returns ``(event_t, ys)`` with ``ys`` the solution at
    ``[t0, event_t]`` (leading axis 2), both differentiable w.r.t. ``y0``
    and ``*args`` — torchdiffeq's ``odeint_event`` contract. With
    ``return_found=True`` a third boolean output reports whether a sign
    change actually occurred within the search bounds.
    """
    # Any adaptive method, explicit OR implicit: the ESDIRK pair
    # (kvaerno3/5) makes event location on stiff systems practical — the
    # explicit pairs grind at the stability limit there (an event on the
    # column dynamics' tau_syn = 0.5 ms modes costs dopri5 ~10x the steps,
    # tests/test_event.py::TestStiffEvents).
    tab, step_impl = _resolve_method(method)
    dense_d = DOPRI5_DENSE_D if method == "dopri5" else None

    leaves = jax.tree_util.tree_leaves(y0)
    is_array_state = len(leaves) == 1 and (y0 is leaves[0])
    if is_array_state:
        flat_y0 = jnp.asarray(y0)
        if not jnp.issubdtype(flat_y0.dtype, jnp.inexact):
            flat_y0 = flat_y0.astype(jnp.float32)
        f, efn, unravel = func, event_fn, None
    else:
        flat_y0, unravel = ravel_pytree(y0)

        def f(t, y_flat, *a):
            return ravel_pytree(func(t, unravel(y_flat), *a))[0]

        def efn(t, y_flat):
            return event_fn(t, unravel(y_flat))

    t0 = jnp.asarray(t0, dtype=flat_y0.dtype)
    if reverse_time:
        fwd_f, fwd_efn = f, efn

        def f(t, y, *a):
            return jax.tree_util.tree_map(jnp.negative, fwd_f(-t, y, *a))

        def efn(t, y):
            return fwd_efn(-t, y)

        t0 = -t0
        t_max = None if t_max is None else -t_max

    t_end = (jnp.asarray(jnp.inf, dtype=flat_y0.dtype) if t_max is None
             else jnp.asarray(t_max, dtype=flat_y0.dtype))

    sg = jax.lax.stop_gradient
    y0_ng, args_ng = sg(flat_y0), sg(args)
    sign0 = _sign(efn(t0, y0_ng))

    def stop_fn(s):
        # keep stepping while the event sign at the newest accepted point
        # still matches the sign at t0
        return _sign(efn(s.t1, s.y1)) == sign0

    carry = _adaptive_pass(f, y0_ng, t0, t_end, rtol, atol, dt0, max_steps,
                           *args_ng, tab=tab, dense_d=dense_d,
                           step_impl=step_impl, stop_fn=stop_fn)
    found = _sign(efn(carry.t1, carry.y1)) != sign0

    # --- bisection on the bracketing step's dense interpolant ------------
    h_step = carry.t1 - carry.t0

    def g(theta):
        return efn(carry.t0 + theta * h_step, dense_eval(carry.coeffs, theta))

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        same = _sign(g(mid)) == sign0
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, bisect_iters, bisect,
        (jnp.zeros_like(h_step), jnp.ones_like(h_step)))
    theta_star = 0.5 * (lo + hi)
    # No crossing in the final step (no event found): report the stop time.
    t_star0 = jnp.where(found, carry.t0 + theta_star * h_step, carry.t1)

    # --- differentiable outputs ------------------------------------------
    ts_pair = jnp.stack([t0, t_star0])

    def solve_to_star(y0_, args_):
        return odeint(f, y0_, ts_pair, *args_, method=method, rtol=rtol,
                      atol=atol, dt0=dt0, max_steps=max_steps,
                      adjoint="replay")

    ys = solve_to_star(flat_y0, args)
    y_star = ys[-1]

    @jax.custom_vjp
    def event_time(y0_, args_):
        return t_star0

    def event_time_fwd(y0_, args_):
        return t_star0, (y0_, args_)

    def event_time_bwd(res, ct):
        y0_, args_ = res
        y_s, vjp_fn = jax.vjp(
            lambda y0__, args__: solve_to_star(y0__, args__)[-1], y0_, args_)
        e_y = jax.grad(lambda y: efn(t_star0, y))(y_s)
        e_t = jax.grad(lambda t: efn(t, y_s))(t_star0)
        f_star = f(t_star0, y_s, *sg(args_))
        denom = e_t + jnp.vdot(e_y, f_star)
        # IFT: dt*/dp = -(e_y . dy*/dp) / (e_t + e_y . f*); guard the
        # tangential-crossing singularity like torchdiffeq (denom -> eps).
        safe = jnp.where(jnp.abs(denom) < 1e-12,
                         jnp.where(denom < 0, -1e-12, 1e-12), denom)
        cot = jax.tree_util.tree_map(lambda e: (-(ct / safe)) * e, e_y)
        return vjp_fn(cot)

    event_time.defvjp(event_time_fwd, event_time_bwd)
    t_star = event_time(flat_y0, args)
    if reverse_time:
        t_star_out = -t_star
    else:
        t_star_out = t_star

    # Total derivative of the endpoint: dy*/dp at fixed t* plus f* dt*/dp.
    f_star = f(sg(t_star0), sg(y_star), *args_ng)
    y_star_total = y_star + f_star * (t_star - sg(t_star))
    ys = ys.at[-1].set(y_star_total)

    if unravel is not None:
        ys = jax.vmap(unravel)(ys)
    if return_found:
        return t_star_out, ys, found
    return t_star_out, ys
