"""Explicit Runge-Kutta machinery: tableaus and fixed-grid integrators.

Fixed-grid solvers step exactly on the requested output grid ``ts`` (one step
per interval) via ``lax.scan`` — the torchdiffeq fixed-grid convention. They
are natively reverse-differentiable; per-step rematerialisation keeps the
backward memory at O(T * |state|) (the trajectory itself), which is the right
trade at the reference's workload sizes (state <= 312, T <= 15000).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ButcherTableau(NamedTuple):
    c: np.ndarray  # (s,) stage times
    a: np.ndarray  # (s, s) strictly lower-triangular stage weights
    b: np.ndarray  # (s,) solution weights
    b_err: np.ndarray | None  # (s,) error-estimate weights (b - b_hat), or None
    order: int
    # Optional secondary (lower-order) error weights: when present the
    # controller uses the Hairer DOP853 combined estimator
    # |h| * ||e1||^2 / sqrt(||e1||^2 + 0.01 ||e2||^2) instead of the plain
    # RMS of h * b_err @ ks (guards against order reduction overestimating
    # the error on smooth problems).
    b_err2: np.ndarray | None = None


def _tab(c, a, b, b_err, order, b_err2=None) -> ButcherTableau:
    s = len(c)
    a_full = np.zeros((s, s))
    for i, row in enumerate(a):
        a_full[i, : len(row)] = row
    return ButcherTableau(
        c=np.asarray(c, dtype=np.float64),
        a=a_full,
        b=np.asarray(b, dtype=np.float64),
        b_err=None if b_err is None else np.asarray(b_err, dtype=np.float64),
        order=order,
        b_err2=None if b_err2 is None else np.asarray(b_err2, dtype=np.float64),
    )


EULER = _tab(c=[0.0], a=[[]], b=[1.0], b_err=None, order=1)

MIDPOINT = _tab(c=[0.0, 0.5], a=[[], [0.5]], b=[0.0, 1.0], b_err=None, order=2)

HEUN = _tab(c=[0.0, 1.0], a=[[], [1.0]], b=[0.5, 0.5], b_err=None, order=2)

# Heun's third-order method — torchdiffeq's "heun3".
HEUN3 = _tab(
    c=[0.0, 1 / 3, 2 / 3],
    a=[[], [1 / 3], [0.0, 2 / 3]],
    b=[1 / 4, 0.0, 3 / 4],
    b_err=None,
    order=3,
)

RK4 = _tab(
    c=[0.0, 0.5, 0.5, 1.0],
    a=[[], [0.5], [0.0, 0.5], [0.0, 0.0, 1.0]],
    b=[1 / 6, 1 / 3, 1 / 3, 1 / 6],
    b_err=None,
    order=4,
)

# Dormand-Prince 4(5) (FSAL). 5th-order solution weights b; the embedded
# 4th-order weights give the error estimate e = b - b_hat.
_DP_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_BHAT = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
DOPRI5 = _tab(
    c=[0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0],
    a=[
        [],
        [1 / 5],
        [3 / 40, 9 / 40],
        [44 / 45, -56 / 15, 32 / 9],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
    ],
    b=_DP_B,
    b_err=_DP_B - _DP_BHAT,
    order=5,
)

# Hairer's dopri5 dense-output weights for the 4th-order interpolant
# (the classic CONTD5 coefficients; stage 2 does not contribute).
DOPRI5_DENSE_D = np.array(
    [
        -12715105075 / 11282082432,
        0.0,
        87487479700 / 32700410799,
        -10690763975 / 1880347072,
        701980252875 / 199316789632,
        -1453857185 / 822651844,
        69997945 / 29380423,
    ]
)

# Bogacki-Shampine 3(2), FSAL — torchdiffeq's "bosh3".
_BS_B = np.array([2 / 9, 1 / 3, 4 / 9, 0.0])
_BS_BHAT = np.array([7 / 24, 1 / 4, 1 / 3, 1 / 8])
BOSH3 = _tab(
    c=[0.0, 1 / 2, 3 / 4, 1.0],
    a=[[], [1 / 2], [0.0, 3 / 4], [2 / 9, 1 / 3, 4 / 9]],
    b=_BS_B,
    b_err=_BS_B - _BS_BHAT,
    order=3,
)

# Heun-Euler 2(1) — torchdiffeq's "adaptive_heun". NOT FSAL: the second
# stage is evaluated at the Euler predictor, not at the accepted y1.
_AH_B = np.array([1 / 2, 1 / 2])
_AH_BHAT = np.array([1.0, 0.0])
ADAPTIVE_HEUN = _tab(
    c=[0.0, 1.0],
    a=[[], [1.0]],
    b=_AH_B,
    b_err=_AH_B - _AH_BHAT,
    order=2,
)

# Fehlberg 1(2) — torchdiffeq's "fehlberg2". Advances with the 2nd-order
# solution [1/256, 255/256, 0] (which makes the tableau FSAL: the third
# stage sits at c=1 with the solution weights); the embedded comparison
# solution is [1/512, 255/256, 1/512].
_FE_B = np.array([1 / 256, 255 / 256, 0.0])
_FE_BHAT = np.array([1 / 512, 255 / 256, 1 / 512])
FEHLBERG2 = _tab(
    c=[0.0, 1 / 2, 1.0],
    a=[[], [1 / 2], [1 / 256, 255 / 256]],
    b=_FE_B,
    b_err=_FE_B - _FE_BHAT,
    order=2,
)


def _dop853() -> ButcherTableau | None:
    """Hairer's DOP853 8(5,3) pair in 13-stage FSAL form.

    The published coefficients (Hairer, Norsett & Wanner, Solving ODEs I,
    dop853.f) are taken from scipy's float64 tables rather than transcribed
    by hand. The 12-stage method plus the FSAL evaluation at (t1, y1) form a
    13-stage tableau whose final row is the solution weights; the two error
    weight vectors (5th- and 3rd-order) drive the combined DOP853 error
    estimator (``b_err2`` semantics above). scipy is only touched at import
    time — solver execution is pure JAX.
    """
    try:
        from scipy.integrate._ivp import dop853_coefficients as _d
    except Exception:  # pragma: no cover - scipy always present in CI
        return None
    n = _d.N_STAGES  # 12
    c = np.concatenate([_d.C[:n], [1.0]])
    a = [list(_d.A[i, :i]) for i in range(n)] + [list(_d.B)]
    b = np.concatenate([_d.B, [0.0]])
    return _tab(c=c, a=a, b=b, b_err=np.asarray(_d.E5), order=8,
                b_err2=np.asarray(_d.E3))


DOP853 = _dop853()


def _dop853_dense():
    """Extra-stage table for Hairer's 7th-order DOP853 interpolant.

    scipy's tables: three additional stages (rows 13..15 of the extended
    (16, 16) A against the 13 integration stages + previously computed
    extras) and the (4, 16) D matrix producing interpolation vectors
    F[3..6]. Returns (a_extra, c_extra, d) as float64 numpy arrays, or None
    when scipy is unavailable (then dop853 falls back to cubic Hermite).
    """
    try:
        from scipy.integrate._ivp import dop853_coefficients as _d
    except Exception:  # pragma: no cover - scipy always present in CI
        return None
    n = _d.N_STAGES_EXTENDED  # 16
    return (np.asarray(_d.A[13:n, :n]), np.asarray(_d.C[13:n]),
            np.asarray(_d.D))


DOP853_DENSE = _dop853_dense()


def is_fsal(tab: ButcherTableau) -> bool:
    """First-same-as-last: the final stage derivative is f(t1, y1)."""
    return bool(
        tab.c[-1] == 1.0 and np.allclose(tab.a[-1, :], tab.b[: tab.a.shape[1]])
    )


FIXED_TABLEAUS = {
    "euler": EULER,
    "midpoint": MIDPOINT,
    "heun": HEUN,
    "heun3": HEUN3,
    "rk4": RK4,
    "dopri5_fixed": DOPRI5,
}

ADAPTIVE_TABLEAUS = {
    "dopri5": DOPRI5,
    "bosh3": BOSH3,
    "adaptive_heun": ADAPTIVE_HEUN,
    "fehlberg2": FEHLBERG2,
}
if DOP853 is not None:
    ADAPTIVE_TABLEAUS["dop853"] = DOP853


def rk_step(func: Callable, tab: ButcherTableau, t, y, h, f0=None, *args):
    """One explicit RK step. Returns (y1, f_last_stage, ks).

    ``f0`` reuses a precomputed first-stage derivative (FSAL chaining).
    ks has shape (s,) + y.shape.
    """
    dtype = y.dtype
    c = jnp.asarray(tab.c, dtype=dtype)
    a = jnp.asarray(tab.a, dtype=dtype)
    b = jnp.asarray(tab.b, dtype=dtype)
    s = tab.c.shape[0]

    k0 = func(t, y, *args) if f0 is None else f0
    ks = [k0]
    for i in range(1, s):
        # Unrolled stage loop: s is small and static, letting XLA fuse freely.
        incr = sum(a[i, j] * ks[j] for j in range(i))
        ks.append(func(t + c[i] * h, y + h * incr, *args))
    ks = jnp.stack(ks)
    y1 = y + h * jnp.tensordot(b, ks, axes=1)
    return y1, ks[-1], ks


def odeint_fixed(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *args,
    tableau: ButcherTableau = RK4,
    remat: bool = True,
):
    """Integrate dy/dt = func(t, y) on the grid ts, one RK step per interval.

    Returns ys with shape (len(ts),) + y0.shape; ys[0] == y0.
    """
    ts = jnp.asarray(ts)

    def step(carry, t_pair):
        y = carry
        t0, t1 = t_pair
        y1, _, _ = rk_step(func, tableau, t0, y, t1 - t0, None, *args)
        return y1, y1

    if remat:
        step = jax.checkpoint(step)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, ys = jax.lax.scan(step, y0, t_pairs)
    return jnp.concatenate([y0[None], ys], axis=0)
