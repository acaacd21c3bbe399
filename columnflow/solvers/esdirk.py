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

Method: Kvaerno 4(3) — a 4-stage, stiffly-accurate, L-stable ESDIRK pair
(Kvaerno 2004, "Singly diagonally implicit Runge-Kutta methods with an
explicit first stage"). The first stage is explicit (so the FSAL carry
chains exactly like dopri5's); stages 2-4 each solve

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

NEWTON_ITERS = 4

ESDIRK_TABLEAUS = {"kvaerno3": KVAERNO3}


def esdirk_step(func: Callable, tab: ButcherTableau, t, y, h, f0=None, *args):
    """One ESDIRK step. Returns (y1, f_last_stage, ks) — rk_step's contract.

    Stage 1 is explicit (reuses ``f0``, FSAL chaining); each implicit stage
    solves its nonlinear system with ``NEWTON_ITERS`` modified-Newton
    iterations against the shared LU-factorized I - h*gamma*J. Stiff
    accuracy (a[-1] == b) makes y1 the final stage value, so the returned
    ``f_last_stage`` is exactly f(t1, y1).
    """
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
