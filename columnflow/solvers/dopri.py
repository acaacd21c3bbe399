"""Adaptive Dormand-Prince 4(5) with dense output, jit-native.

Replaces torchdiffeq's default ``dopri5`` solver (reference call sites:
scripts/bifurcation_ode.py:163,210, scripts/xor_ode.py:114,
scripts/parity_ode.py:233): adaptive step-size control with torchdiffeq's
default semantics (rtol=1e-7, atol=1e-9, RMS error norm over the whole state
-- a single controller even for batched states, which is what the reference's
batched Hopf integration relies on), outputs produced by 4th-order dense
interpolation of accepted steps rather than by stepping to each output time.

Control flow is a ``lax.while_loop`` over solver steps nested in a
``lax.scan`` over output times: everything compiles to one XLA program, no
host round-trips. ``lax.while_loop`` is not reverse-differentiable, so
gradients are provided two ways (see api.py):

- "replay": the adaptive pass records the accepted step sequence (under
  ``stop_gradient``); a second, differentiable ``lax.scan`` re-steps the same
  sequence and interpolates. This is the discrete backprop-through-the-solver
  gradient the reference uses (torchdiffeq without adjoint).
- "backsolve": continuous adjoint via ``jax.custom_vjp`` (adjoint.py).

Two precision notes for TPU: all solver arithmetic is float32 (or float64 if
x64 is enabled) and stage combinations use exact tableau constants; matmuls
inside user drift functions should use ``preferred_element_type=float32``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers.rk import (ADAPTIVE_TABLEAUS, DOP853_DENSE, DOPRI5,
                                   DOPRI5_DENSE_D, is_fsal, rk_step)

_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2
_ORDER = 5  # step-size control exponent, matching torchdiffeq's dopri5


class SolverStats(NamedTuple):
    naccept: jax.Array
    nreject: jax.Array
    nfev: jax.Array
    success: jax.Array  # False if max_steps was exhausted before t_end


def _resolve_method(method: str):
    """(tableau, step_impl) for an adaptive method name.

    Explicit embedded pairs come from rk.ADAPTIVE_TABLEAUS and step with
    ``rk_step``; implicit (ESDIRK) methods come from esdirk.ESDIRK_TABLEAUS
    and step with the modified-Newton ``esdirk_step`` (stiff systems).
    """
    method = {"dopri8": "dop853"}.get(method, method)
    if method in ADAPTIVE_TABLEAUS:
        return ADAPTIVE_TABLEAUS[method], rk_step
    from columnflow.solvers.esdirk import ESDIRK_TABLEAUS, esdirk_step

    if method in ESDIRK_TABLEAUS:
        return ESDIRK_TABLEAUS[method], esdirk_step
    raise ValueError(f"unknown adaptive method: {method!r}")


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def _error_ratio(err, rtol, atol, y0, y1, norm=None):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return (norm or _rms_norm)(err / scale)


def _step_error_ratio(tab, h, ks, rtol, atol, y0, y1, norm=None):
    """Error ratio of one attempted step (accept iff <= 1).

    Plain embedded pairs: RMS of h * (b_err @ ks) / scale — torchdiffeq's
    norm. Pairs with ``b_err2`` (dop853): Hairer's combined 5th/3rd-order
    estimator |h| * ||e5||^2 / sqrt((||e5||^2 + 0.01 ||e3||^2) * n), which
    damps the 5th-order estimate when the 3rd-order one is comparatively
    large (scipy's DOP853 uses the identical formula). ESDIRK steps feed
    the same raw combination by design — the (I - h*gamma*J)^(-1)
    smoothed variant was measured and rejected (esdirk.esdirk_step
    docstring, RESULTS.md "ESDIRK error estimator").
    """
    e = jnp.asarray(tab.b_err, dtype=y1.dtype)
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    if tab.b_err2 is None:
        return (norm or _rms_norm)(h * jnp.tensordot(e, ks, axes=1) / scale)
    e2 = jnp.asarray(tab.b_err2, dtype=y1.dtype)
    err5 = jnp.tensordot(e, ks, axes=1) / scale
    err3 = jnp.tensordot(e2, ks, axes=1) / scale
    n5 = jnp.sum(jnp.square(err5))
    n3 = jnp.sum(jnp.square(err3))
    denom = n5 + 0.01 * n3
    return jnp.where(
        denom > 0.0,
        jnp.abs(h) * n5 / jnp.sqrt(jnp.maximum(denom, 1e-38) * err5.size),
        jnp.zeros_like(n5),
    )


def _next_step_size(h, error_ratio, order: int = _ORDER,
                    safety: float = _SAFETY, ifactor: float = _IFACTOR,
                    dfactor: float = _DFACTOR, ratio_prev=None):
    # I-controller, torchdiffeq-style: grow/shrink clamped to [dfactor,
    # ifactor]. With ``ratio_prev`` (the previous ACCEPTED step's error
    # ratio): Gustafsson PI control, factor = safety * r^(-0.7/k) *
    # r_prev^(0.4/k) — damps the accept/reject oscillation the pure
    # I-controller falls into on oscillatory error histories (Hairer &
    # Wanner II.IV.2; torchdiffeq has no PI option).
    if ratio_prev is None:
        exponent = error_ratio ** (-1.0 / order)
    else:
        exponent = (error_ratio ** (-0.7 / order)
                    * jnp.maximum(ratio_prev, 1e-10) ** (0.4 / order))
    factor = jnp.where(
        error_ratio <= 0.0,
        ifactor,
        jnp.clip(safety * exponent, dfactor, ifactor),
    )
    return h * factor


def _initial_step_size(func, t0, y0, f0, rtol, atol, *args,
                       order: int = _ORDER, norm=None):
    """Hairer's starting-step heuristic."""
    nrm = norm or _rms_norm
    scale = atol + rtol * jnp.abs(y0)
    d0 = nrm(y0 / scale)
    d1 = nrm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = func(t0 + h0, y1, *args)
    d2 = nrm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / order),
    )
    return jnp.minimum(100.0 * h0, h1)


def dense_coeffs(y0, y1, h, ks, dense_d=DOPRI5_DENSE_D, f1=None):
    """Interpolation coefficients for one accepted step.

    With ``dense_d`` (dopri5): Hairer's CONTD5 4th-order interpolant.
    With ``dense_d=None``: r5 = 0, which reduces the same evaluator to the
    cubic Hermite interpolant on (y0, y1, h*f0, h*f1) — torchdiffeq's
    interpolant for its non-dopri5 adaptive solvers. ``f1`` supplies the
    end-derivative for non-FSAL tableaus (defaults to ks[-1]).

    Returns a (5,) + y.shape stack [r1..r5]; evaluate with ``dense_eval``.
    """
    dtype = y0.dtype
    dy = y1 - y0
    f0 = ks[0]
    if f1 is None:
        f1 = ks[-1]
    r1 = y0
    r2 = dy
    r3 = h * f0 - dy
    r4 = dy - h * f1 - r3
    if dense_d is None:
        r5 = jnp.zeros_like(y0)
    else:
        d = jnp.asarray(dense_d, dtype=dtype)
        r5 = h * jnp.tensordot(d, ks, axes=1)
    return jnp.stack([r1, r2, r3, r4, r5])


def dense_eval(coeffs, theta):
    """Evaluate the 4th-order interpolant at normalized position theta in [0,1]."""
    r1, r2, r3, r4, r5 = coeffs
    s = theta
    s1 = 1.0 - theta
    return r1 + s * (r2 + s1 * (r3 + s * (r4 + s1 * r5)))


def dop853_dense_coeffs(func, t0, h, y0, y1, ks, *args):
    """Hairer's 7th-order DOP853 interpolant for one accepted step.

    Computes the three extra stages (scipy's A_EXTRA/C_EXTRA rows against
    the 13 integration stages) and the seven interpolation vectors F (via
    scipy's D matrix), exactly scipy Dop853._dense_output_impl. Costs three
    extra drift evals per step — paid only in the replay pass, where output
    times are interpolated. Returns an (8,) + y.shape stack
    [y0, F0..F6]; evaluate with ``dop853_dense_eval``.
    """
    a_extra, c_extra, d = DOP853_DENSE
    dtype = y0.dtype
    ks_list = [ks[i] for i in range(ks.shape[0])]  # 13 stages
    for s in range(3):
        a_row = jnp.asarray(a_extra[s][: len(ks_list)], dtype=dtype)
        dy = h * jnp.tensordot(a_row, jnp.stack(ks_list), axes=1)
        ks_list.append(func(t0 + c_extra[s] * h, y0 + dy, *args))
    k_ext = jnp.stack(ks_list)  # (16,) + y.shape
    dmat = jnp.asarray(d, dtype=dtype)
    delta = y1 - y0
    f_old, f_new = ks[0], ks[12]
    f0 = delta
    f1 = h * f_old - delta
    f2 = 2.0 * delta - h * (f_new + f_old)
    f3456 = h * jnp.tensordot(dmat, k_ext, axes=1)  # (4,) + y.shape
    return jnp.concatenate([jnp.stack([y0, f0, f1, f2]), f3456])


def dop853_dense_eval(coeffs, x):
    """Evaluate the 7th-order interpolant at normalized x in [0, 1]."""
    y_old = coeffs[0]
    fs = [coeffs[i] for i in range(1, 8)]
    y = jnp.zeros_like(y_old)
    for i, f in enumerate(reversed(fs)):
        y = (y + f) * (x if i % 2 == 0 else 1.0 - x)
    return y + y_old


class _StepCarry(NamedTuple):
    t1: jax.Array  # end of last accepted step
    y1: jax.Array
    f1: jax.Array  # FSAL derivative at (t1, y1)
    h: jax.Array  # proposed next step size
    coeffs: jax.Array  # dense coefficients of last accepted step
    t0: jax.Array  # start of last accepted step
    step_times: jax.Array  # (max_steps + 1,) accepted times, padded with t_end
    naccept: jax.Array
    nreject: jax.Array
    ratio_prev: jax.Array  # last accepted error ratio (PI controller memory)


def _adaptive_pass(func, y0, t_start, t_end, rtol, atol, dt0, max_steps,
                   *args, tab=DOPRI5, dense_d=DOPRI5_DENSE_D, stop_fn=None,
                   step_impl=rk_step, norm=None, step_ts=None, jump_ts=None,
                   safety=_SAFETY, ifactor=_IFACTOR, dfactor=_DFACTOR,
                   controller="i", min_step=0.0, max_step=None):
    """Integrate from t_start to t_end, recording the accepted step sequence.

    Returns the final carry; ``step_times``/``naccept`` describe the step
    sequence for replay, and the final ``coeffs`` cover the last interval.
    Works for any embedded tableau; non-FSAL tableaus pay one extra drift
    eval per attempted step to keep the carried end-derivative exact.

    ``stop_fn(carry) -> bool`` optionally extends the loop condition:
    stepping continues only while it returns True (event detection,
    event.py) — the final carry's ``coeffs``/``t0``/``t1`` then bracket
    the stopping condition. ``t_end`` may be +inf in that case.

    ``step_ts``/``jump_ts`` (torchdiffeq's ``options={'step_t', 'jump_t'}``):
    sorted arrays of times no step may cross — the controller lands on each
    exactly. ``jump_ts`` additionally re-evaluates the carried derivative
    just PAST the time (``nextafter``), so a drift discontinuous in t hands
    the next step its right-limit dynamics instead of a stale FSAL stage.
    ``norm`` replaces the RMS error norm (plain embedded pairs only).

    ``min_step``/``max_step`` (torchdiffeq's ``options={'min_step',
    'max_step'}``): hard bounds on the proposed step size. torchdiffeq
    only clamps (so a rejected step AT the floor retries forever); here an
    attempt whose step is already at the floor is accepted unconditionally
    — the controller cannot reject-livelock, matching the SDE engine's
    ``dt_min`` semantics (sde_adaptive.py).
    """
    fsal = is_fsal(tab)
    crit_ts = None
    if step_ts is not None or jump_ts is not None:
        parts = [a for a in (step_ts, jump_ts) if a is not None]
        crit_ts = jnp.sort(jnp.concatenate(parts).astype(y0.dtype))
    f0 = func(t_start, y0, *args)
    if dt0 is None:
        h0 = _initial_step_size(func, t_start, y0, f0, rtol, atol, *args,
                                order=tab.order, norm=norm)
    else:
        h0 = jnp.asarray(dt0, dtype=y0.dtype)
    h0 = jnp.minimum(h0, t_end - t_start)
    if max_step is not None:
        h0 = jnp.minimum(h0, jnp.asarray(max_step, y0.dtype))
    h0 = jnp.maximum(h0, jnp.asarray(min_step, y0.dtype))

    step_times = jnp.full((max_steps + 1,), t_end, dtype=y0.dtype)
    step_times = step_times.at[0].set(t_start)
    zero_coeffs = jnp.stack([y0, jnp.zeros_like(y0), jnp.zeros_like(y0),
                             jnp.zeros_like(y0), jnp.zeros_like(y0)])

    init = _StepCarry(
        t1=t_start, y1=y0, f1=f0, h=h0, coeffs=zero_coeffs, t0=t_start,
        step_times=step_times,
        naccept=jnp.zeros((), jnp.int32), nreject=jnp.zeros((), jnp.int32),
        ratio_prev=jnp.ones((), y0.dtype),
    )

    def cond(s: _StepCarry):
        keep = ((s.t1 < t_end) & (s.naccept < max_steps)
                & (s.nreject < 4 * max_steps + 64))
        if stop_fn is not None:
            keep = keep & stop_fn(s)
        return keep

    def body(s: _StepCarry):
        h = jnp.minimum(s.h, t_end - s.t1)
        if crit_ts is not None:
            # Land exactly on the next critical time instead of crossing it.
            i = jnp.searchsorted(crit_ts, s.t1, side="right")
            nxt = crit_ts[jnp.minimum(i, crit_ts.shape[0] - 1)]
            gap = nxt - s.t1
            h = jnp.where((i < crit_ts.shape[0]) & (gap > 0) & (gap < h),
                          gap, h)
        y1, f_last, ks = step_impl(func, tab, s.t1, s.y1, h, s.f1, *args)
        f1 = f_last if fsal else func(s.t1 + h, y1, *args)
        if jump_ts is not None:
            # Past a jump, the carried derivative must see the right-limit
            # dynamics; re-evaluate just past the landing time.
            on_jump = jnp.any(s.t1 + h == jump_ts)
            t_right = jnp.nextafter(s.t1 + h, jnp.asarray(jnp.inf, h.dtype))
            f1 = jnp.where(on_jump, func(t_right, y1, *args), f1)
        ratio = _step_error_ratio(tab, h, ks, rtol, atol, s.y1, y1, norm=norm)
        # A step already at the floor is accepted unconditionally (see
        # docstring); min_step=0.0 (default) leaves behavior unchanged.
        accept = (ratio <= 1.0) | (h <= min_step)

        t_new = jnp.where(accept, s.t1 + h, s.t1)
        y_new = jnp.where(accept, y1, s.y1)
        f_new = jnp.where(accept, f1, s.f1)
        coeffs = jnp.where(
            accept, dense_coeffs(s.y1, y1, h, ks, dense_d, f1=f1), s.coeffs)
        t0_new = jnp.where(accept, s.t1, s.t0)
        naccept = s.naccept + accept.astype(jnp.int32)
        nreject = s.nreject + (1 - accept.astype(jnp.int32))
        step_times = jnp.where(
            accept, s.step_times.at[naccept].set(t_new), s.step_times
        )
        h_next = _next_step_size(
            h, ratio, tab.order, safety=safety, ifactor=ifactor,
            dfactor=dfactor,
            ratio_prev=s.ratio_prev if controller == "pi" else None)
        if max_step is not None:
            h_next = jnp.minimum(h_next, jnp.asarray(max_step, h.dtype))
        h_next = jnp.maximum(h_next, jnp.asarray(min_step, h.dtype))
        ratio_prev = jnp.where(accept, jnp.asarray(ratio, s.ratio_prev.dtype),
                               s.ratio_prev)
        return _StepCarry(
            t1=t_new, y1=y_new, f1=f_new, h=h_next, coeffs=coeffs, t0=t0_new,
            step_times=step_times, naccept=naccept, nreject=nreject,
            ratio_prev=ratio_prev,
        )

    return jax.lax.while_loop(cond, body, init)


def _replay_pass(func, y0, ts, step_times, naccept, max_steps, *args,
                 remat=True, tab=DOPRI5, dense_d=DOPRI5_DENSE_D,
                 dop853_dense=False, step_impl=rk_step, jump_ts=None):
    """Differentiable re-integration over a fixed accepted-step sequence.

    Steps through ``step_times`` with plain dopri5 stages under ``lax.scan``
    (FSAL chained), collecting dense coefficients per step, then interpolates
    every requested output time with one vectorized gather. Intervals beyond
    ``naccept`` have h == 0 and contribute nothing.

    ``remat=True`` checkpoints each step (O(max_steps * state) memory,
    backward recomputes stages); ``remat=False`` stores all stage
    intermediates — ~1/3 faster backward when the activations fit in HBM
    (they do for every reference workload).
    """
    fsal = is_fsal(tab)
    f0 = func(ts[0], y0, *args)

    def body(carry, idx):
        y, f = carry
        t0 = step_times[idx]
        t1 = step_times[idx + 1]
        h = t1 - t0
        y1, f_last, ks = step_impl(func, tab, t0, y, h, f, *args)
        f1 = f_last if fsal else func(t1, y1, *args)
        if jump_ts is not None:
            # Mirror the adaptive pass: carried derivative sees the
            # right-limit dynamics past a jump time.
            on_jump = jnp.any(t1 == jump_ts) & (h > 0)
            t_right = jnp.nextafter(t1, jnp.asarray(jnp.inf, t1.dtype))
            f1 = jnp.where(on_jump, func(t_right, y1, *args), f1)
        if dop853_dense:
            coeffs = dop853_dense_coeffs(func, t0, h, y, y1, ks, *args)
        else:
            coeffs = dense_coeffs(y, y1, h, ks, dense_d, f1=f1)
        return (y1, f1), coeffs

    if remat:
        body = jax.checkpoint(body)
    (_, _), all_coeffs = jax.lax.scan(
        body, (y0, f0), jnp.arange(max_steps, dtype=jnp.int32)
    )
    # all_coeffs: (max_steps, 5) + y.shape

    idx = jnp.clip(
        jnp.searchsorted(step_times, ts, side="right") - 1, 0, naccept - 1
    ).astype(jnp.int32)
    t0s = step_times[idx]
    t1s = step_times[idx + 1]
    hs = t1s - t0s
    theta = jnp.where(hs > 0, (ts - t0s) / jnp.where(hs > 0, hs, 1.0), 0.0)
    coeffs = all_coeffs[idx]  # (T, 5 or 8) + y.shape
    theta_b = theta.reshape(theta.shape + (1,) * y0.ndim)
    evaluator = dop853_dense_eval if dop853_dense else dense_eval
    ys = evaluator(jnp.moveaxis(coeffs, 1, 0), theta_b)
    # By definition y(ts[0]) == y0 exactly (keeps gradients to y0 direct).
    return ys.at[0].set(y0)


def odeint_adaptive(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *args,
    method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
    dt0: float | None = None,
    max_steps: int = 2048,
    differentiable: bool = True,
    remat: bool = True,
    norm=None,
    step_ts=None,
    jump_ts=None,
    safety: float = _SAFETY,
    ifactor: float = _IFACTOR,
    dfactor: float = _DFACTOR,
    controller: str = "i",
    min_step: float = 0.0,
    max_step: float | None = None,
):
    """Adaptive embedded-RK solve returning states at ``ts`` (ys[0] == y0).

    ``method`` is one of ``rk.ADAPTIVE_TABLEAUS`` — "dopri5" (Dormand-Prince
    4(5), FSAL, CONTD5 dense output: torchdiffeq's default), "bosh3"
    (Bogacki-Shampine 3(2), FSAL) or "adaptive_heun" (Heun-Euler 2(1));
    the non-dopri5 methods interpolate output times with the cubic Hermite
    interpolant, matching torchdiffeq's choice for those solvers.

    The adaptive pass (while_loop) determines the accepted step sequence; the
    replay pass (scan) re-steps it and interpolates the outputs. With
    ``differentiable=True`` the adaptive pass runs under ``stop_gradient`` and
    reverse-mode AD flows through the replay scan — the discrete
    backprop-through-the-solver gradient at a frozen step sequence.
    """
    tab, step_impl = _resolve_method(method)
    if norm is not None and tab.b_err2 is not None:
        raise ValueError(
            "custom norm is not supported with dop853 (its combined "
            "5th/3rd-order error estimator is RMS-specific)")
    dense_d = DOPRI5_DENSE_D if method == "dopri5" else None
    # dop853 replay interpolates with Hairer's 7th-order interpolant (three
    # extra drift evals per accepted step, matching the 8th-order solution);
    # the adaptive pass itself needs no interpolant.
    dop853_dense = method == "dop853" and DOP853_DENSE is not None
    ts = jnp.asarray(ts, dtype=y0.dtype)
    if step_ts is not None:
        step_ts = jnp.sort(jnp.asarray(step_ts, dtype=y0.dtype))
    if jump_ts is not None:
        jump_ts = jnp.sort(jnp.asarray(jump_ts, dtype=y0.dtype))
    if differentiable:
        carry = _adaptive_pass(
            func, jax.lax.stop_gradient(y0), ts[0], ts[-1], rtol, atol, dt0,
            max_steps, *(jax.lax.stop_gradient(args)),
            tab=tab, dense_d=dense_d, step_impl=step_impl, norm=norm,
            step_ts=step_ts, jump_ts=jump_ts,
            safety=safety, ifactor=ifactor, dfactor=dfactor,
            controller=controller, min_step=min_step, max_step=max_step,
        )
        step_times = jax.lax.stop_gradient(carry.step_times)
        naccept = jax.lax.stop_gradient(carry.naccept)
        return _replay_pass(func, y0, ts, step_times, naccept, max_steps,
                            *args, remat=remat, tab=tab, dense_d=dense_d,
                            dop853_dense=dop853_dense, step_impl=step_impl,
                            jump_ts=jump_ts)
    carry = _adaptive_pass(func, y0, ts[0], ts[-1], rtol, atol, dt0,
                           max_steps, *args, tab=tab, dense_d=dense_d,
                           step_impl=step_impl, norm=norm,
                           step_ts=step_ts, jump_ts=jump_ts,
                           safety=safety, ifactor=ifactor, dfactor=dfactor,
                           controller=controller, min_step=min_step,
                           max_step=max_step)
    return _replay_pass(func, y0, ts, carry.step_times, carry.naccept,
                        max_steps, *args, remat=remat, tab=tab,
                        dense_d=dense_d, dop853_dense=dop853_dense,
                        step_impl=step_impl, jump_ts=jump_ts)


def odeint_dopri5(func, y0, ts, *args, **kw):
    """Adaptive dopri5 (see ``odeint_adaptive``)."""
    return odeint_adaptive(func, y0, ts, *args, method="dopri5", **kw)


def odeint_stats(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *args,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    dt0: float | None = None,
    max_steps: int = 2048,
    method: str = "dopri5",
    norm=None,
    step_ts=None,
    jump_ts=None,
    controller: str = "i",
    min_step: float = 0.0,
    max_step: float | None = None,
) -> SolverStats:
    """Run the adaptive pass only and report solver statistics.

    Decreasing ``ts`` is handled like ``odeint``'s (tau = -t substitution)
    when ``ts`` is concrete.
    """
    tab, step_impl = _resolve_method(method)
    dense_d = DOPRI5_DENSE_D if method == "dopri5" else None
    ts = jnp.asarray(ts, dtype=jnp.result_type(float))
    try:
        th = np.asarray(ts)
        descending = th.shape[0] > 1 and th[1] < th[0]
    except Exception:
        descending = False
    if descending:
        fwd = func

        def func(t, y, *a):  # noqa: F811 - deliberate rebind
            return jax.tree_util.tree_map(jnp.negative, fwd(-t, y, *a))

        ts = -ts
    ts = ts.astype(y0.dtype)
    if step_ts is not None:
        step_ts = jnp.sort(jnp.asarray(step_ts, dtype=y0.dtype))
        step_ts = -step_ts[::-1] if descending else step_ts
    if jump_ts is not None:
        jump_ts = jnp.sort(jnp.asarray(jump_ts, dtype=y0.dtype))
        jump_ts = -jump_ts[::-1] if descending else jump_ts
    carry = _adaptive_pass(func, y0, ts[0], ts[-1], rtol, atol, dt0,
                           max_steps, *args, tab=tab, dense_d=dense_d,
                           step_impl=step_impl, norm=norm,
                           step_ts=step_ts, jump_ts=jump_ts,
                           controller=controller, min_step=min_step,
                           max_step=max_step)
    nsteps = carry.naccept + carry.nreject
    s_new = tab.c.shape[0] - 1  # stage 0 reuses the carried derivative
    if step_impl is not rk_step:
        # ESDIRK: each implicit stage costs NEWTON_ITERS + 1 drift evals
        # (iterations + the final stage derivative); Jacobian assembly
        # (jacfwd, one per attempted step) is counted as one state-size
        # batch eval.
        from columnflow.solvers.esdirk import NEWTON_ITERS

        nfev = 2 + (s_new * (NEWTON_ITERS + 1) + 1) * nsteps
    else:
        # FSAL: the last stage IS the next carry; non-FSAL pays one extra
        # eval per attempted step. +2 init (f0 + starting-step heuristic).
        nfev = 2 + (s_new + (0 if is_fsal(tab) else 1)) * nsteps
    return SolverStats(
        naccept=carry.naccept,
        nreject=carry.nreject,
        nfev=nfev,
        success=carry.t1 >= ts[-1],
    )
