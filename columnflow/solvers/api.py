"""Public ODE solver API.

``odeint(func, y0, ts, *args, ...)`` mirrors the call shape of torchdiffeq's
``odeint`` (reference call sites: scripts/bifurcation_ode.py:163,210,
scripts/xor_ode.py:114, scripts/parity_ode.py:233) with explicit extra
``*args`` (JAX-style: parameters are arguments, not module attributes, so
everything is traceable and differentiable).

Methods:
    "dopri5" (default)      adaptive, torchdiffeq-default tolerances
    "bosh3"/"adaptive_heun"/"fehlberg2"
                            adaptive lower-order pairs (torchdiffeq's)
    "dop853"                adaptive 8th-order (Hairer 8(5,3) pair with the
                            combined error estimator) for tight tolerances
    "dopri8"                alias of dop853 (torchdiffeq's method name for
                            its 8th-order pair; the underlying tableau here
                            is Hairer's 8(5,3) rather than the 8(7) pair —
                            same order, same role, better estimator)
    "kvaerno3"              implicit ESDIRK 4(3) (Kvaerno 2004): L-stable,
                            stiffly accurate, modified-Newton stages — for
                            stiff systems the explicit pairs grind on
                            (no torchdiffeq analog; scipy_solver territory)
    "kvaerno5"              implicit ESDIRK 5(4) (Kvaerno 2004): the
                            higher-order companion for stiff systems at
                            TIGHT tolerances, where the 3(2) pair is
                            accuracy-limited
    "euler"/"midpoint"/"heun"/"heun3"/"rk4"
                            fixed-grid, one step per ts interval
    "dopri5_fixed"          dopri5 tableau on the fixed grid
    "explicit_adams"        fixed-grid Adams-Bashforth 4 (RK4 startup)
    "implicit_adams"/"fixed_adams"
                            fixed-grid PECE Adams-Bashforth-Moulton 4

Gradient modes for "dopri5" (``adjoint=``):
    "replay" (default)      discrete backprop through the frozen accepted-step
                            sequence — the reference's gradient semantics
    "backsolve"             continuous adjoint (O(1) memory in trajectory len)

States may be arbitrarily shaped arrays or pytrees (pytrees are flattened
once at the boundary). For batched states the adaptive controller is shared
across the batch, matching torchdiffeq's behavior on the reference's batched
Hopf workload (scripts/bifurcation_ode.py:210); per-sample control comes from
``jax.vmap`` over this function.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from columnflow.solvers import rk
from columnflow.solvers.adjoint import odeint_backsolve
from columnflow.solvers.dopri import odeint_adaptive

_FIXED = ("euler", "midpoint", "heun", "heun3", "rk4", "dopri5_fixed")
# dopri5, bosh3, adaptive_heun, fehlberg2, dop853 + implicit kvaerno3/5
_ADAPTIVE = tuple(rk.ADAPTIVE_TABLEAUS) + ("kvaerno3", "kvaerno5")
_ALIASES = {"dopri8": "dop853"}
# torchdiffeq's fixed multistep solvers (implicit_adams == fixed_adams there
# too: both name the PECE Adams-Bashforth-Moulton sweep).
_ADAMS = ("explicit_adams", "implicit_adams", "fixed_adams")


def odeint(
    func: Callable,
    y0,
    ts,
    *args,
    method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
    dt0: float | None = None,
    max_steps: int = 2048,
    adjoint: str = "replay",
    remat: bool = True,
    norm=None,
    step_ts=None,
    jump_ts=None,
    adjoint_seminorm: bool = False,
    safety: float | None = None,
    ifactor: float | None = None,
    dfactor: float | None = None,
    controller: str = "i",
    step_size: float | None = None,
    first_step: float | None = None,
    min_step: float | None = None,
    max_step: float | None = None,
):
    """Integrate dy/dt = func(t, y, *args) and return states at ``ts``.

    ``ts`` may be decreasing (torchdiffeq semantics): the solve runs in
    reversed time via the substitution tau = -t (requires concrete ``ts``
    to detect the direction — the usual case, since adaptive solves bake
    the span into the compiled step loop anyway).

    Adaptive-method options (torchdiffeq's ``options`` dict, as kwargs):
    ``step_ts`` — times the controller must land on exactly (never steps
    across); ``jump_ts`` — like step_ts, and the carried derivative is
    re-evaluated just past the time (for drifts discontinuous in t:
    stimulus onsets, forcing switches); ``norm`` — callable replacing the
    RMS error norm (plain embedded pairs only). ``adjoint_seminorm=True``
    (with ``adjoint="backsolve"``) makes the backward solve's controller
    ignore the parameter-adjoint block of the augmented state —
    torchdiffeq's ``adjoint_options=dict(norm="seminorm")``, typically
    fewer backward steps at equal parameter-gradient quality.

    ``first_step`` — torchdiffeq's ``options=dict(first_step=...)``: the
    initial step size, overriding Hairer's starting-step heuristic
    (alias of ``dt0``; passing both is an error). ``min_step`` /
    ``max_step`` — torchdiffeq's step-size bounds: proposed steps are
    clamped into [min_step, max_step]; a step already at the floor is
    accepted unconditionally (livelock-proof variant of torchdiffeq's
    plain clamp — see dopri._adaptive_pass).

    Fixed-grid-method option: ``step_size`` — torchdiffeq's
    ``options=dict(step_size=...)``: internal steps of size <= step_size
    (each ts interval is split into ``ceil(max_interval / step_size)``
    uniform substeps; torchdiffeq's grid likewise never steps across an
    output time), with states returned at ``ts`` only. By default fixed
    methods take exactly one step per interval. Requires concrete ``ts``.

    Returns ys with leading axis len(ts); ys[0] == y0.
    """
    method = _ALIASES.get(method, method)

    # Validate option/method compatibility BEFORE any step_size recursion so
    # error behavior does not depend on the step_size value (advisor finding:
    # norm= with a fixed method used to be silently ignored when refinement
    # triggered but rejected when it did not).
    if controller not in ("i", "pi"):
        raise ValueError(f"unknown controller: {controller!r} "
                         "(choose 'i' — torchdiffeq's — or 'pi')")
    if (step_ts is not None or jump_ts is not None or norm is not None
            or safety is not None or ifactor is not None
            or dfactor is not None or controller != "i"
            or first_step is not None or min_step is not None
            or max_step is not None) \
            and method not in _ADAPTIVE:
        raise ValueError(
            "step_ts/jump_ts/norm/safety/ifactor/dfactor/first_step/"
            "min_step/max_step apply to adaptive methods only (fixed "
            "grids already step exactly on ts)")
    if first_step is not None:
        if dt0 is not None:
            raise ValueError(
                "first_step is torchdiffeq's name for dt0 — pass one, "
                "not both")
        dt0 = first_step
    bounds = {}
    if min_step is not None:
        bounds["min_step"] = min_step
    if max_step is not None:
        bounds["max_step"] = max_step

    if step_size is not None:
        if method not in _FIXED and method not in _ADAMS:
            raise ValueError(
                "step_size applies to fixed-grid methods only (adaptive "
                "methods choose their own steps; use rtol/atol)")
        try:
            ts_c = np.asarray(ts, dtype=np.float64)
        except Exception as e:  # traced ts — substep count must be static
            raise ValueError(
                "step_size needs concrete ts (the substep count per "
                "interval is a static compile-time quantity)") from e
        # A single output time has no intervals to refine (the base path
        # returns y0); np.max over the empty diff would raise.
        k = 1 if ts_c.size < 2 else max(
            1, int(np.ceil(float(np.max(np.abs(np.diff(ts_c))))
                           / float(step_size) - 1e-12)))
        if k > 1:
            tsj = jnp.asarray(ts)
            frac = jnp.arange(k, dtype=jnp.result_type(tsj.dtype,
                                                       jnp.float32)) / k
            tfine = (tsj[:-1, None]
                     + frac[None, :] * jnp.diff(tsj)[:, None]).reshape(-1)
            tfine = jnp.concatenate([tfine, tsj[-1:]])
            ys = odeint(func, y0, tfine, *args, method=method,
                        remat=remat)
            return jax.tree_util.tree_map(lambda a: a[::k], ys)
    leaves = jax.tree_util.tree_leaves(y0)
    is_array_state = len(leaves) == 1 and (y0 is leaves[0])

    if is_array_state:
        flat_y0, f = jnp.asarray(y0), func
        if not jnp.issubdtype(flat_y0.dtype, jnp.inexact):
            flat_y0 = flat_y0.astype(jnp.float32)
        unravel = None
    else:
        flat_y0, unravel = ravel_pytree(y0)

        def f(t, y_flat, *a):
            dy = func(t, unravel(y_flat), *a)
            return ravel_pytree(dy)[0]

    ts = jnp.asarray(ts, dtype=flat_y0.dtype)

    try:
        ts_host = np.asarray(ts)
        descending = ts_host.shape[0] > 1 and ts_host[1] < ts_host[0]
    except Exception:  # traced ts: assume increasing
        descending = False
    if descending:
        fwd_f = f

        def f(t, y, *a):
            return jax.tree_util.tree_map(jnp.negative, fwd_f(-t, y, *a))

        ts = -ts
        if step_ts is not None:
            step_ts = -jnp.asarray(step_ts, dtype=flat_y0.dtype)
        if jump_ts is not None:
            jump_ts = -jnp.asarray(jump_ts, dtype=flat_y0.dtype)

    ctrl = {k: v for k, v in
            (("safety", safety), ("ifactor", ifactor), ("dfactor", dfactor))
            if v is not None}
    ctrl["controller"] = controller

    if method in _FIXED:
        ys = rk.odeint_fixed(f, flat_y0, ts, *args, tableau=rk.FIXED_TABLEAUS[method])
    elif method in _ADAMS:
        from columnflow.solvers.adams import odeint_adams

        ys = odeint_adams(f, flat_y0, ts, *args,
                          corrector=(method != "explicit_adams"),
                          remat=remat)
    elif method in _ADAPTIVE:
        if adjoint == "backsolve":
            if method != "dopri5":
                raise ValueError(
                    "adjoint='backsolve' supports method='dopri5' only; "
                    "use adjoint='replay' for other adaptive methods")
            if (step_ts is not None or jump_ts is not None
                    or norm is not None or bounds):
                raise ValueError(
                    "step_ts/jump_ts/norm/min_step/max_step are "
                    "replay-path options; adjoint='backsolve' supports "
                    "adjoint_seminorm only")
            ys = odeint_backsolve(f, rtol, atol, dt0, max_steps,
                                  adjoint_seminorm, flat_y0, ts, args)
        elif adjoint == "replay":
            ys = odeint_adaptive(
                f, flat_y0, ts, *args, method=method,
                rtol=rtol, atol=atol, dt0=dt0, max_steps=max_steps,
                differentiable=True, remat=remat,
                norm=norm, step_ts=step_ts, jump_ts=jump_ts, **ctrl,
                **bounds,
            )
        elif adjoint in (None, "none"):
            ys = odeint_adaptive(
                f, flat_y0, ts, *args, method=method,
                rtol=rtol, atol=atol, dt0=dt0, max_steps=max_steps,
                differentiable=False,
                norm=norm, step_ts=step_ts, jump_ts=jump_ts, **ctrl,
                **bounds,
            )
        else:
            raise ValueError(f"unknown adjoint mode: {adjoint!r}")
    else:
        raise ValueError(f"unknown method: {method!r}")

    if unravel is None:
        return ys
    return jax.vmap(unravel)(ys)
