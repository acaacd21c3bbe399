"""Implicit (ESDIRK) Runge-Kutta steps for stiff systems, jit-native.

The column physics is stiff by construction: tau_syn = 0.5 ms vs
tau_adapt = 10 s spans 4.3 decades (reference config/model.toml:33-36), and
the reference's README blames its fixed-grid firing-rate artefacts on
exactly this (README.md:27-29). The explicit adaptive methods (dopri5 etc.)
resolve the fastest mode everywhere; an L-stable implicit method steps at
the ACCURACY-limited rate instead. Neither torchdiffeq nor torchsde offers
a stiff solver (torchdiffeq punts to scipy_solver, leaving autodiff behind)
— this module provides one natively, differentiable through the same
replay-gradient machinery as every other adaptive method (dopri.py).

Methods: Kvaerno 4(3) and Kvaerno 5(4) — stiffly-accurate, L-stable ESDIRK
pairs (Kvaerno 2004, "Singly diagonally implicit Runge-Kutta methods with
an explicit first stage"). The first stage is explicit (so the FSAL carry
chains exactly like dopri5's); the implicit stages each solve

    z = rhs + h * gamma * f(t + c_i h, z)

by modified Newton: ONE Jacobian + LU factorization per attempted step
(evaluated at the step's start state), reused across all stages and
iterations — the standard stiff-solver economy (Hairer & Wanner II.IV.8).
A fixed iteration count keeps the step jit-native and reverse-differentiable
(gradients flow through the Newton iterates; at convergence they coincide
with the implicit-function-theorem gradient).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers.rk import ButcherTableau, _tab

_G = 0.43586652150845899941601945  # gamma: root of x^3 - 3x^2 + 3x/2 - 1/6

_A31 = (-4 * _G**2 + 6 * _G - 1) / (4 * _G)
_A32 = (-2 * _G + 1) / (4 * _G)
_A41 = (6 * _G - 1) / (12 * _G)
_A42 = -1 / ((24 * _G - 12) * _G)
_A43 = (-6 * _G**2 + 6 * _G - 1) / (6 * _G - 3)

_B = np.array([_A41, _A42, _A43, _G])
_BHAT = np.array([_A31, _A32, _G, 0.0])  # the 3rd stage IS the embedded soln

KVAERNO3 = _tab(
    c=[0.0, 2 * _G, 1.0, 1.0],
    a=[[], [_G, _G], [_A31, _A32, _G], [_A41, _A42, _A43, _G]],
    b=_B,
    b_err=_B - _BHAT,
    order=3,
)

# Kvaerno 5(4): 7-stage, stiffly-accurate, L-stable ESDIRK pair with
# gamma = 0.26 (Kvaerno 2004, same paper). The higher-order companion for
# the tight-tolerance stiff regime where the 3rd-order pair is
# accuracy-limited (RESULTS.md: kvaerno3 wins at loose tolerance, dopri5 at
# tight — kvaerno5 covers tight AND stiff). Stage 6 is the embedded
# 4th-order solution; stage 7 (== b, a77 = gamma) is the 5th-order one.
_G5 = 0.26
_KV5_A = [
    [],
    [_G5, _G5],
    [0.13, 0.84033320996790809, _G5],
    [0.22371961478320505, 0.47675532319799699, -0.06470895363112615, _G5],
    [0.16648564323248321, 0.10450018841591720, 0.03631482272098715,
     -0.13090704451073998, _G5],
    [0.13855640231268224, 0.0, -0.04245337201752043, 0.02446657898003141,
     0.61943039072480676, _G5],
    [0.13659751177640291, 0.0, -0.05496908796538376, -0.04118626728321046,
     0.62993304899016403, 0.06962479448202728, _G5],
]
_KV5_B = np.array(_KV5_A[6])
_KV5_BHAT = np.array(_KV5_A[5] + [0.0])  # stage 6 IS the embedded solution

KVAERNO5 = _tab(
    c=[0.0, 0.52, 1.230333209967908, 0.8957659843500759,
       0.43639360985864756, 1.0, 1.0],
    a=_KV5_A,
    b=_KV5_B,
    b_err=_KV5_B - _KV5_BHAT,
    order=5,
)

NEWTON_ITERS = 4

ESDIRK_TABLEAUS = {"kvaerno3": KVAERNO3, "kvaerno5": KVAERNO5}


def esdirk_step(func: Callable, tab: ButcherTableau, t, y, h, f0=None, *args):
    """One ESDIRK step. Returns (y1, f_last_stage, ks) — rk_step's contract.

    Stage 1 is explicit (reuses ``f0``, FSAL chaining); each implicit stage
    solves its nonlinear system with ``NEWTON_ITERS`` modified-Newton
    iterations against the shared LU-factorized I - h*gamma*J. Stiff
    accuracy (a[-1] == b) makes y1 the final stage value, so the returned
    ``f_last_stage`` is exactly f(t1, y1).

    Error estimation is the RAW embedded difference h * (b - bhat) @ ks,
    deliberately NOT filtered through (I - h*gamma*J)^(-1) (Hairer &
    Wanner IV.8's smoothed estimate). Measured on a 4-problem battery
    (RESULTS.md "ESDIRK error estimator"): the filtered estimate is 12x
    cheaper on Van der Pol mu=100 but livelocks in an accept/reject limit
    cycle at mu=1000 and under-resolves 1-D fully-stiff problems by
    ~(h*gamma*lam) x tolerance; the geometric-mean compromise breaks the
    lam=1e5 accuracy bound. Raw is the only estimator correct on all
    four; its cost is a ~50% rejection rate at the stiff limit (the
    estimate is undamped there) and lam-amplification of drift-evaluation
    noise (visible on TPU at rtol<=1e-7 as a ~2e-5 error floor — use
    rtol>=1e-6 on TPU, see RESULTS.md).

    Runs under f32 HIGHEST matmul precision (repo solver-matmul rule):
    the Jacobian/LU/triangular-solve matmuls must not run bf16 passes on
    TPU for n-D systems.
    """
    with jax.default_matmul_precision("highest"):
        return _esdirk_step(func, tab, t, y, h, f0, *args)


def _esdirk_step(func, tab, t, y, h, f0, *args):
    dtype = y.dtype
    c = jnp.asarray(tab.c, dtype=dtype)
    a = jnp.asarray(tab.a, dtype=dtype)
    gamma = jnp.asarray(tab.a[1, 1], dtype=dtype)
    s = tab.c.shape[0]
    shape = y.shape
    yf = y.reshape(-1)
    n = yf.shape[0]

    def ff(tt, zz):
        return func(tt, zz.reshape(shape), *args).reshape(-1)

    k0 = (func(t, y, *args) if f0 is None else f0).reshape(-1)

    jac = jax.jacfwd(lambda zz: ff(t, zz))(yf)  # (n, n)
    m = jnp.eye(n, dtype=dtype) - h * gamma * jac
    lu, piv = jax.scipy.linalg.lu_factor(m)

    ks = [k0]
    z = yf
    for i in range(1, s):
        rhs = yf + h * sum(a[i, j] * ks[j] for j in range(i))
        t_i = t + c[i] * h
        z = rhs + h * gamma * ks[i - 1]  # predictor from the last stage
        for _ in range(NEWTON_ITERS):
            resid = z - h * gamma * ff(t_i, z) - rhs
            z = z - jax.scipy.linalg.lu_solve((lu, piv), resid)
        ks.append(ff(t_i, z))

    ks = jnp.stack(ks)
    # stiffly accurate: y1 is the last stage value (bitwise consistent with
    # ks[-1] = f(t1, y1), which seeds the next step's explicit first stage)
    y1 = z.reshape(shape)
    return y1, ks[-1].reshape(shape), ks.reshape((s,) + shape)
