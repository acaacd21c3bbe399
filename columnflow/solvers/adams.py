"""Fixed-grid Adams multistep solvers (Adams-Bashforth / PECE ABM).

Completes the torchdiffeq method surface for the reference's solver calls
(reference call sites pass ``method`` strings straight through to
torchdiffeq's SOLVERS registry, e.g. scripts/parity_ode.py:233): torchdiffeq
ships 'explicit_adams' (Adams-Bashforth) and 'implicit_adams'/'fixed_adams'
(Adams-Bashforth-Moulton predictor-corrector) as fixed-step multistep
solvers. Here both run as a single ``lax.scan`` over the output grid — one
step per ts interval, the whole multistep history carried as a stacked
(order,)+y.shape array so everything is jit/vmap/grad-safe with static
shapes.

Differences from torchdiffeq's fixed Adams implementations (deliberate):
- Startup uses ``order-1`` RK4 steps (keeping the global order at
  ``order`` from the first output point) instead of ramping the Adams
  order up from 1.
- The corrector is a single PECE sweep (predict, evaluate, correct,
  re-evaluate for the history) rather than iterated functional correction.

The fixed Bashforth/Moulton coefficients assume a locally uniform grid —
the only grids the reference ever integrates on. On a non-uniform ts the
methods remain stable but drop below design order.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers.rk import RK4, rk_step

# Adams-Bashforth weights for y1 = y0 + h * (w @ [f_n, f_{n-1}, ...]),
# per order (index = order). Order 1 is forward Euler.
_BASHFORTH = {
    1: np.array([1.0]),
    2: np.array([3 / 2, -1 / 2]),
    3: np.array([23 / 12, -16 / 12, 5 / 12]),
    4: np.array([55 / 24, -59 / 24, 37 / 24, -9 / 24]),
}

# Adams-Moulton weights for y1 = y0 + h * (w @ [f_{n+1}, f_n, f_{n-1}, ...]).
# Order 2 is the trapezoid rule.
_MOULTON = {
    1: np.array([1.0]),
    2: np.array([1 / 2, 1 / 2]),
    3: np.array([5 / 12, 8 / 12, -1 / 12]),
    4: np.array([9 / 24, 19 / 24, -5 / 24, 1 / 24]),
}

MAX_ORDER = 4


def odeint_adams(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *args,
    order: int = 4,
    corrector: bool = True,
    remat: bool = True,
):
    """Fixed-grid Adams solve on ts; ys[0] == y0, one step per interval.

    ``corrector=False`` is pure Adams-Bashforth (torchdiffeq
    'explicit_adams', one drift eval per step at steady state);
    ``corrector=True`` runs the PECE Adams-Bashforth-Moulton sweep
    (torchdiffeq 'implicit_adams'/'fixed_adams', two drift evals per step).
    """
    if not 1 <= order <= MAX_ORDER:
        raise ValueError(f"order must be in [1, {MAX_ORDER}], got {order}")
    ts = jnp.asarray(ts, dtype=y0.dtype)
    n_out = ts.shape[0]
    n_startup = min(order - 1, n_out - 1)

    ab = jnp.asarray(_BASHFORTH[order], dtype=y0.dtype)
    am = jnp.asarray(_MOULTON[order], dtype=y0.dtype)

    # --- startup: RK4 steps, recording f at every node -------------------
    ys_start = []
    fs = [func(ts[0], y0, *args)]
    y = y0
    for i in range(n_startup):
        y, _, _ = rk_step(func, RK4, ts[i], y, ts[i + 1] - ts[i], fs[-1],
                          *args)
        ys_start.append(y)
        fs.append(func(ts[i + 1], y, *args))

    if n_out - 1 - n_startup <= 0:
        return jnp.stack([y0] + ys_start)

    # History, newest first: fh[j] = f(t_{n-j}). Reaching here means the
    # startup completed all order-1 steps, so exactly ``order`` nodes exist.
    fh0 = jnp.stack(list(reversed(fs)))

    def step(carry, t_pair):
        y, fh = carry
        t0, t1 = t_pair
        h = t1 - t0
        pred = y + h * jnp.tensordot(ab, fh, axes=1)
        if corrector:
            f_pred = func(t1, pred, *args)
            fh_c = jnp.concatenate([f_pred[None], fh[: order - 1]])
            y1 = y + h * jnp.tensordot(am, fh_c, axes=1)
        else:
            y1 = pred
        f1 = func(t1, y1, *args)
        fh_new = jnp.concatenate([f1[None], fh[: order - 1]])
        return (y1, fh_new), y1

    if remat:
        step = jax.checkpoint(step)

    t_lo = ts[n_startup:-1]
    t_hi = ts[n_startup + 1:]
    t_pairs = jnp.stack([t_lo, t_hi], axis=-1)
    (_, _), ys_tail = jax.lax.scan(step, (y, fh0), t_pairs)
    return jnp.concatenate([jnp.stack([y0] + ys_start), ys_tail], axis=0)
