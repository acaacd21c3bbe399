"""Stochastic differential equation solvers (Ito and Stratonovich), jit-native.

Replaces torchsde's ``sdeint`` (reference call sites: scripts/wta_ode.py:174,
200, scripts/plotting_results.py:391,506,594). The reference uses Ito SDEs
with ``noise_type="scalar"`` (ONE shared Brownian motion per trajectory,
reference: src/coupled_columns.py:155-156) and ``method='srk'``.

Ito methods (``sde_type="ito"``, the default):
    "euler"     Euler-Maruyama (strong 0.5 general / 1.0 additive)
    "milstein"  derivative-corrected (strong 1.0, scalar/diagonal), dg/dy
                taken by ``jax.jvp`` -- no hand-written derivatives
    "srk"       stochastic Runge-Kutta, strong 1.5: Rossler SRA1 when the
                diffusion is declared additive (the reference's models all
                have constant diffusion), Rossler SRIW1 otherwise
    "implicit_euler" / "implicit_milstein"
                drift-implicit (semi-implicit) variants: the drift is
                solved by modified Newton per step (shared LU), lifting the
                explicit schemes' stiff stability bound h < 2/lam while
                keeping the same strong order. No torchsde analog; the
                stiff-SDE companion of the kvaerno3 ODE method

Stratonovich methods (``sde_type="stratonovich"`` — torchsde's second SDE
type; its method surface euler_heun/heun/midpoint/milstein):
    "euler_heun"  Euler drift + Heun (trapezoidal) diffusion
    "heun"        full predictor-corrector (trapezoidal drift AND diffusion)
    "midpoint"    stochastic midpoint rule
    "milstein"    Stratonovich Milstein (no -h Ito correction term)
    "log_ode"     log-ODE midpoint with Davie Levy areas (noise="general"
                  only): strong order 1.0 where the Euler-type general-noise
                  schemes are 0.5 — torchsde's ``log_ode`` method

Milstein (either calculus) accepts ``grad_free=True`` — torchsde's
``options={'grad_free': True}``: the diffusion derivative is replaced by a
derivative-free two-evaluation difference quotient (same strong order 1.0).

Integration is fixed-step on the output grid ``ts`` (one step per interval)
over ``lax.scan`` — reverse-differentiable with per-step rematerialisation,
exactly the discrete backprop-through-the-solver gradient the reference
training loops use. Noise is counter-based (keyed by step index), so a
trajectory is a pure function of (key, inputs): reproducible under jit, vmap,
grad, and sharding.

Noise kinds:
    "scalar"    diffusion returns g with y's shape; dy += g * dW, dW scalar
    "diagonal"  diffusion returns g with y's shape; dy += g * dW, dW elementwise
    "general"   diffusion returns a (d, m) matrix against m independent
                Brownian channels; dy += g @ dW. Ito: "euler" only
                (torchsde's own noise_type="general" restriction).
                Stratonovich: "euler_heun", "heun", "midpoint",
                "reversible_heun" (strong 0.5), and "log_ode" (strong 1.0
                via Davie Levy areas, see ``solvers.levy``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _brownian_pack(key, ts, noise_shape, dtype):
    """Per-step stochastic integrals for strong-1.5 SRK schemes.

    Returns (I1, I10, I11, I111) with leading axis = num steps:
        I1   = dW                 ~ N(0, h)
        I10  = int_t^t+h (W_s - W_t) ds = h*(dW/2 + sqrt(h/12) Z), Z indep
        I11  = (dW^2 - h)/2
        I111 = (dW^3 - 3h dW)/6
    """
    n = ts.shape[0] - 1
    hs = (ts[1:] - ts[:-1]).astype(dtype)
    hs_b = jnp.reshape(hs, (n,) + (1,) * len(noise_shape))
    k1, k2 = jax.random.split(key)
    z_w = jax.random.normal(k1, (n,) + noise_shape, dtype)
    z_h = jax.random.normal(k2, (n,) + noise_shape, dtype)
    i1 = jnp.sqrt(hs_b) * z_w
    i10 = hs_b * (0.5 * i1 + jnp.sqrt(hs_b / 12.0) * z_h)
    i11 = 0.5 * (i1 * i1 - hs_b)
    i111 = (i1 * i1 * i1 - 3.0 * hs_b * i1) / 6.0
    return hs, i1, i10, i11, i111


# --- Rossler (2010) SRIW1: strong order 1.5 for scalar/diagonal Ito noise ---
_SRIW1_C0 = (0.0, 3 / 4, 0.0, 0.0)
_SRIW1_C1 = (0.0, 1 / 4, 1.0, 1 / 4)
_SRIW1_A0 = ((0.0, 0.0, 0.0, 0.0), (3 / 4, 0.0, 0.0, 0.0),
             (0.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 0.0))
_SRIW1_A1 = ((0.0, 0.0, 0.0, 0.0), (1 / 4, 0.0, 0.0, 0.0),
             (1.0, 0.0, 0.0, 0.0), (0.0, 0.0, 1 / 4, 0.0))
_SRIW1_B0 = ((0.0, 0.0, 0.0, 0.0), (3 / 2, 0.0, 0.0, 0.0),
             (0.0, 0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 0.0))
_SRIW1_B1 = ((0.0, 0.0, 0.0, 0.0), (1 / 2, 0.0, 0.0, 0.0),
             (-1.0, 0.0, 0.0, 0.0), (-5.0, 3.0, 1 / 2, 0.0))
_SRIW1_ALPHA = (1 / 3, 2 / 3, 0.0, 0.0)
_SRIW1_BETA1 = (-1.0, 4 / 3, 2 / 3, 0.0)
_SRIW1_BETA2 = (-1.0, 4 / 3, -1 / 3, 0.0)
_SRIW1_BETA3 = (2.0, -4 / 3, -2 / 3, 0.0)
_SRIW1_BETA4 = (-2.0, 5 / 3, -2 / 3, 1.0)


def _sriw1_step(drift, diffusion, t, y, h, i1, i10, i11, i111, args):
    """One SRIW1 step (4 drift + 4 diffusion evaluations). h == 0 safe
    (an exact no-op — zero-width padding intervals carry zero noise)."""
    h_safe = jnp.where(h > 0, h, 1.0)
    sqrt_h = jnp.sqrt(h_safe)
    i10_h = i10 / h_safe
    i11_s = i11 / sqrt_h
    i111_h = i111 / h_safe

    f_stages = []
    g_stages = []
    for i in range(4):
        af = sum(_SRIW1_A0[i][j] * f_stages[j] for j in range(i)) if i else 0.0
        bg = sum(_SRIW1_B0[i][j] * g_stages[j] for j in range(i)) if i else 0.0
        h0_i = y + h * af + i10_h * bg
        af1 = sum(_SRIW1_A1[i][j] * f_stages[j] for j in range(i)) if i else 0.0
        bg1 = sum(_SRIW1_B1[i][j] * g_stages[j] for j in range(i)) if i else 0.0
        h1_i = y + h * af1 + sqrt_h * bg1
        f_stages.append(drift(t + _SRIW1_C0[i] * h, h0_i, *args))
        g_stages.append(diffusion(t + _SRIW1_C1[i] * h, h1_i, *args))

    y1 = y + h * sum(_SRIW1_ALPHA[i] * f_stages[i] for i in range(4))
    y1 = y1 + sum(
        (_SRIW1_BETA1[i] * i1 + _SRIW1_BETA2[i] * i11_s
         + _SRIW1_BETA3[i] * i10_h + _SRIW1_BETA4[i] * i111_h) * g_stages[i]
        for i in range(4)
    )
    return y1


def _sra1_step(drift, diffusion, t, y, h, i1, i10, args):
    """One SRA1 step (2 drift + 2 diffusion evaluations), additive noise.
    h == 0 safe (exact no-op, like the adaptive variant's)."""
    i10_h = i10 / jnp.where(h > 0, h, 1.0)
    g_end = diffusion(t + h, y, *args)
    g_start = diffusion(t, y, *args)
    f1 = drift(t, y, *args)
    h2 = y + 0.75 * h * f1 + 1.5 * i10_h * g_end
    f2 = drift(t + 0.75 * h, h2, *args)
    return (
        y + h * (f1 / 3.0 + 2.0 * f2 / 3.0)
        + (i1 - i10_h) * g_end + i10_h * g_start
    )


def _mul_elem(g, w):
    # scalar/diagonal noise: g has y's shape, w is () or y-shaped
    return g * w


def _mul_general(g, w):
    # general noise: g is (d, m), w is (m,) -> contraction over channels
    return g @ w


def _euler_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem):
    return y + h * drift(t, y, *args) + mul(diffusion(t, y, *args), i1)


def _milstein_step(drift, diffusion, t, y, h, i1, args):
    g, dg_g = jax.jvp(
        lambda y_: diffusion(t, y_, *args), (y,), (diffusion(t, y, *args),)
    )
    return y + h * drift(t, y, *args) + g * i1 + 0.5 * dg_g * (i1 * i1 - h)


IMPLICIT_NEWTON_ITERS = 4


def _drift_implicit_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem,
                         milstein=False):
    """Drift-implicit (semi-implicit) Euler-Maruyama / Milstein step (Ito).

    Solves  y1 = y + h f(t+h, y1) + g(t, y) dW  [+ Milstein correction]
    by modified Newton against one LU-factorized I - h J per step (J =
    df/dy at the step's start state) — the stiff-SDE analog of the
    kvaerno3 machinery (solvers/esdirk.py). The diffusion stays explicit,
    so strong order matches the explicit scheme (0.5 Euler / 1.0 Milstein,
    and 1.0 for additive noise) while the DRIFT stability constraint
    disappears: for a stiff linear drift the scheme is unconditionally
    mean-square stable where explicit Euler-Maruyama requires h < 2/lam.

    No torchsde analog (its method surface is fully explicit); motivated
    by the column physics' tau_syn = 0.5 ms fast mode (reference
    config/model.toml:33-36), which bounds every explicit fixed grid at
    h ~ tau_syn regardless of the accuracy actually needed (RESULTS.md:
    the 104-column fixed-grid stochastic run destabilizes late).

    For LINEAR drift the Newton iteration is exact after one step, so the
    scheme coincides with the closed form y1 = (I - hA)^-1 (y + b h + g dW)
    to solve tolerance (pinned in tests/test_sde_implicit.py).
    """
    dtype = y.dtype
    shape = y.shape
    yf = y.reshape(-1)
    n = yf.shape[0]
    t1 = t + h

    gdw = mul(diffusion(t, y, *args), i1)
    if milstein:
        g, dg_g = jax.jvp(
            lambda y_: diffusion(t, y_, *args), (y,),
            (diffusion(t, y, *args),)
        )
        gdw = g * i1 + 0.5 * dg_g * (i1 * i1 - h)
    rhs = (y + gdw).reshape(-1)

    def ff(zz):
        return drift(t1, zz.reshape(shape), *args).reshape(-1)

    jac = jax.jacfwd(ff)(yf)
    m = jnp.eye(n, dtype=dtype) - h * jac
    lu, piv = jax.scipy.linalg.lu_factor(m)
    z = rhs + h * ff(yf)  # explicit predictor
    for _ in range(IMPLICIT_NEWTON_ITERS):
        resid = z - h * ff(z) - rhs
        z = z - jax.scipy.linalg.lu_solve((lu, piv), resid)
    return z.reshape(shape)


def _milstein_grad_free_step(drift, diffusion, t, y, h, i1, args, ito=True):
    """Derivative-free Milstein (torchsde's ``options={'grad_free': True}``).

    The dg/dy . g term is replaced by the difference quotient
    (g(y_support) - g(y)) / sqrt(h) — two diffusion evaluations, no jvp.
    Same strong order 1.0 (scalar/diagonal noise).

    Support point: Ito uses Platen's y + f h + g sqrt(h) (the f h term's
    contribution is zero-mean against the centered Ito weight dW^2 - h).
    Stratonovich drops the drift term — its weight dW^2 has MEAN h, so the
    f h contamination of the quotient would otherwise accumulate as a
    systematic O(sqrt(h)) error (measured: it degrades GBM to strong 0.5).
    """
    f0 = drift(t, y, *args)
    g0 = diffusion(t, y, *args)
    sqrt_h = jnp.sqrt(h)
    support = y + h * f0 + g0 * sqrt_h if ito else y + g0 * sqrt_h
    g_bar = diffusion(t, support, *args)
    ii = i1 * i1 - h if ito else i1 * i1
    return y + h * f0 + g0 * i1 + 0.5 * (g_bar - g0) / sqrt_h * ii


# --- Stratonovich steppers (torchsde's stratonovich method surface) ---------


def _milstein_strat_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem):
    """Stratonovich Milstein: the Ito scheme without the -h correction.

    ``mul`` is accepted for stepper-signature uniformity but must be the
    elementwise kind — general noise is rejected upstream (needs Levy areas).
    """
    g, dg_g = jax.jvp(
        lambda y_: diffusion(t, y_, *args), (y,), (diffusion(t, y, *args),)
    )
    return y + h * drift(t, y, *args) + g * i1 + 0.5 * dg_g * (i1 * i1)


def _euler_heun_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem):
    """Euler drift + Heun (trapezoidal) diffusion — strong 0.5 Stratonovich."""
    g0 = diffusion(t, y, *args)
    g1 = diffusion(t + h, y + mul(g0, i1), *args)
    return y + h * drift(t, y, *args) + 0.5 * mul(g0 + g1, i1)


def _heun_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem):
    """Full stochastic Heun: trapezoidal drift AND diffusion (Stratonovich)."""
    f0 = drift(t, y, *args)
    g0 = diffusion(t, y, *args)
    y_pred = y + h * f0 + mul(g0, i1)
    f1 = drift(t + h, y_pred, *args)
    g1 = diffusion(t + h, y_pred, *args)
    return y + 0.5 * h * (f0 + f1) + 0.5 * mul(g0 + g1, i1)


def _log_ode_field(drift, diffusion, t, y, h, i1, a_levy, args):
    """The log-ODE vector field V(y) over one step (general noise).

    V = h f + g @ W + sum_{j,k} (dg_k . g_j) A_{jk}: the degree-2 truncated
    log-signature of (time, Brownian path) pushed through the SDE's vector
    fields; the Lie-bracket term is the antisymmetric Levy-area correction
    (Sum_{j<k} [g_j, g_k] A_{jk} rewritten with A's antisymmetry). The
    brackets contract via m jvps of the diffusion, one per source channel.
    """
    f = drift(t, y, *args)
    g = diffusion(t, y, *args)

    def dg_dir(v):
        return jax.jvp(lambda y_: diffusion(t, y_, *args), (y,), (v,))[1]

    dgs = jax.vmap(dg_dir, in_axes=1)(g)        # (m, d, m): dgs[j,:,k]=dg_k.g_j
    bracket = jnp.einsum("jdk,jk->d", dgs, a_levy)
    return h * f + g @ i1 + bracket


def _log_ode_midpoint_step(drift, diffusion, t, y, h, i1, a_levy, args):
    """One midpoint step of the log-ODE (strong order 1.0, general noise)."""
    v0 = _log_ode_field(drift, diffusion, t, y, h, i1, a_levy, args)
    return y + _log_ode_field(drift, diffusion, t + 0.5 * h, y + 0.5 * v0,
                              h, i1, a_levy, args)


def _midpoint_step(drift, diffusion, t, y, h, i1, args, mul=_mul_elem):
    """Stochastic midpoint rule (Stratonovich)."""
    y_mid = (y + 0.5 * h * drift(t, y, *args)
             + 0.5 * mul(diffusion(t, y, *args), i1))
    t_mid = t + 0.5 * h
    return (y + h * drift(t_mid, y_mid, *args)
            + mul(diffusion(t_mid, y_mid, *args), i1))


def reversible_heun_step(drift, diffusion, t, t1, y, z, f, g, h, i1, args,
                         mul=_mul_elem):
    """One reversible Heun step (Kidger et al. 2021) on the extended state.

    (y, z) with z the auxiliary stage state (z_0 = y_0); f = drift(t, z),
    g = diffusion(t, z) carried so each step costs ONE drift + ONE diffusion
    eval. Algebraically reversible: applying the same map from
    (y1, z1, f1, g1) with (-h, -i1) recovers (y, z) exactly in exact
    arithmetic — the basis for the exact O(1)-state-memory adjoint in
    sde_reversible.py. Converges to the Stratonovich solution (torchsde's
    'reversible_heun').
    """
    z1 = 2.0 * y - z + h * f + mul(g, i1)
    f1 = drift(t1, z1, *args)
    g1 = diffusion(t1, z1, *args)
    y1 = y + 0.5 * h * (f + f1) + 0.5 * mul(g + g1, i1)
    return y1, z1, f1, g1


def sdeint(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    *args,
    method: str = "srk",
    noise: str = "scalar",
    additive: bool = False,
    sde_type: str = "ito",
    remat: bool = True,
    noise_pack=None,
    grad_free: bool = False,
    bm=None,
    dt: float | None = None,
    levy_area_approximation: str = "davie",
):
    """Integrate the SDE dy = drift dt + diffusion dW on the grid ``ts``.

    Args:
        drift, diffusion: ``f(t, y, *args)`` pure functions; diffusion returns
            an array of y's shape (scalar noise multiplies it by one shared
            Brownian increment; diagonal by elementwise increments).
        y0: initial state (any array shape).
        ts: (T,) increasing times; one solver step per interval.
        key: PRNG key — the trajectory is a pure function of it.
        method: sde_type="ito": "euler" | "milstein" | "srk" |
            "implicit_euler" | "implicit_milstein" (drift-implicit, for
            stiff drift — see module docstring);
            sde_type="stratonovich": "euler_heun" | "heun" | "midpoint" |
            "milstein" | "reversible_heun" (algebraically reversible
            extended-state scheme; exact O(1)-state-memory gradients via
            ``sdeint_reversible``).
        noise: "scalar" | "diagonal" | "general" (see module docstring).
        additive: declare the diffusion state-independent (selects SRA1).
        sde_type: "ito" (default, the reference's setting) or "stratonovich"
            (torchsde's second calculus; for additive noise the two coincide).
        bm: optional ``BrownianInterval`` (solvers.brownian) supplying the
            path — torchsde's ``sdeint(..., bm=bm)``. Its shape must match
            the noise kind (() scalar, y.shape diagonal, (m,) general);
            ``method='srk'`` requires it constructed with
            ``levy_area_approximation='space-time'`` (torchsde's own
            requirement). Mutually exclusive with ``noise_pack``; ``key``
            is ignored for path generation when given.
        noise_pack: optional precomputed stochastic integrals
            (i1, i10, i11, i111), each with leading axis T-1 — used to pin
            a Brownian path externally (tests, coupling across resolutions).
            For method="log_ode" the pack is (i1, a_levy) with a_levy the
            (T-1, m, m) antisymmetric Levy areas (see ``solvers.levy``).
        grad_free: Milstein only — replace the jvp diffusion derivative with
            a derivative-free difference quotient (torchsde's
            ``options={'grad_free': True}``).
        dt: optional internal step size (torchsde's ``sdeint(..., dt=)``).
            By default the solver takes one step per ``ts`` interval; with
            ``dt`` each interval is integrated with
            ``k = ceil(max_interval / dt)`` uniform substeps (size <= dt)
            and only the states at ``ts`` are returned. torchsde's fixed
            solvers step ``min(dt, next_output_t - t)`` — same contract
            (steps never exceed dt, always land exactly on output times);
            the only difference is that the shortened remainder step is
            spread uniformly across the interval here, which keeps the
            substep count static for jit. Requires concrete ``ts``.
            Incompatible with ``noise_pack`` (whose leading axis is tied
            to the grid — pre-build it on the fine grid instead); ``bm``
            works (increments are queried by time).
        levy_area_approximation: for method="log_ode" without an explicit
            pack/bm: how the space-space Levy-area tail is drawn —
            "davie" (default) or "foster" (exact (W, H)-conditional tail
            variance; torchsde's recommendation for higher-order
            general-noise schemes). See ``solvers.levy``.

    Returns ys with shape (T,) + y0.shape; ys[0] == y0. Pytree states are
    supported like ``odeint``'s: drift/diffusion receive (and return) the
    pytree, integration runs on the raveled vector ("scalar" noise shares
    one Brownian across the whole tree; "diagonal" draws per element).
    """
    if dt is not None:
        if noise_pack is not None:
            raise ValueError(
                "dt= refines the integration grid, so a precomputed "
                "noise_pack (leading axis T-1 on the OUTPUT grid) cannot "
                "apply; build the pack on the fine grid and pass dt=None")
        try:
            ts_c = np.asarray(ts, dtype=np.float64)
        except Exception as e:  # traced ts — substep count must be static
            raise ValueError(
                "dt= needs concrete ts (the substep count per interval is "
                "a static compile-time quantity)") from e
        # Reject decreasing grids loudly (advisor finding: |diff| used to
        # collapse k to 1 and silently skip refinement; the Brownian
        # construction needs increasing time anyway — sqrt(h) of a negative
        # interval is NaN, torchsde likewise requires ascending ts). A
        # single output time has no intervals to refine.
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
            ys = sdeint(drift, diffusion, y0, tfine, key, *args,
                        method=method, noise=noise, additive=additive,
                        sde_type=sde_type, remat=remat,
                        grad_free=grad_free, bm=bm)
            return jax.tree_util.tree_map(lambda a: a[::k], ys)

    leaves = jax.tree_util.tree_leaves(y0)
    if not (len(leaves) == 1 and y0 is leaves[0]):
        if noise == "general":
            raise ValueError(
                "noise='general' requires a flat 1-D array state "
                "(the diffusion returns a (d, m) matrix)")
        from jax.flatten_util import ravel_pytree

        flat_y0, unravel = ravel_pytree(y0)

        def flat_fn(fn):
            def g(t, y_flat, *a):
                return ravel_pytree(fn(t, unravel(y_flat), *a))[0]
            return g

        ys = sdeint(flat_fn(drift), flat_fn(diffusion), flat_y0, ts, key,
                    *args, method=method, noise=noise, additive=additive,
                    sde_type=sde_type, remat=remat, noise_pack=noise_pack,
                    grad_free=grad_free, bm=bm,
                    levy_area_approximation=levy_area_approximation)
        return jax.vmap(unravel)(ys)

    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    # Brownian increments are defined forward in time (sqrt(h) of a
    # negative interval is silently NaN); reject decreasing concrete
    # grids loudly, like torchsde. Zero-width intervals are ALLOWED (h=0
    # steps are exact no-ops — the padded-grid pattern the adaptive
    # engines rely on). Traced ts passes through (the usual jit case —
    # callers control the grid).
    try:
        ts_host = np.asarray(ts, dtype=np.float64)
        if ts_host.ndim == 1 and ts_host.size >= 2 \
                and bool(np.any(np.diff(ts_host) < 0)):
            raise ValueError(
                "sdeint requires non-decreasing ts (Brownian increments "
                "are defined forward in time)")
    except (TypeError, jax.errors.TracerArrayConversionError):
        pass
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

    if bm is not None:
        if noise_pack is not None:
            raise ValueError("pass bm or noise_pack, not both")
        if tuple(bm.shape) != tuple(noise_shape):
            raise ValueError(
                f"bm.shape {tuple(bm.shape)} does not match the "
                f"'{noise}' noise shape {tuple(noise_shape)}")
        if method == "log_ode":
            if bm.levy_area_approximation not in ("davie", "foster"):
                raise ValueError(
                    "method='log_ode' needs bm with "
                    "levy_area_approximation='davie' or 'foster' (torchsde "
                    "raises the same way when the level is too low)")
            noise_pack = bm.pack_levy(ts)
        else:
            if method == "srk" and bm.levy_area_approximation not in (
                    "space-time", "davie", "foster"):
                raise ValueError(
                    "method='srk' needs bm with "
                    "levy_area_approximation='space-time' (torchsde's own "
                    "requirement for its srk)")
            noise_pack = bm.pack(ts)

    if method == "log_ode":
        if sde_type != "stratonovich":
            raise ValueError(
                "log_ode is a Stratonovich method (torchsde registers it "
                "under sde_type='stratonovich' only)")
        if noise != "general":
            raise ValueError(
                "log_ode requires noise='general'; for scalar/diagonal "
                "noise use milstein (same strong order 1.0)")
        from .levy import levy_pack

        if noise_pack is None:
            if levy_area_approximation not in ("davie", "foster"):
                raise ValueError(
                    "method='log_ode' needs levy_area_approximation="
                    "'davie' or 'foster' (the scheme consumes space-space "
                    "Levy areas; 'space-time' carries none — torchsde "
                    "raises the same way)")
            hs, i1, _, a_levy = levy_pack(key, ts, noise_shape[0], y0.dtype,
                                          approximation=levy_area_approximation)
        else:
            i1, a_levy = noise_pack
            hs = (ts[1:] - ts[:-1]).astype(y0.dtype)

        def step(y, xs):
            t, h, w1, a1 = xs
            y1 = _log_ode_midpoint_step(drift, diffusion, t, y, h, w1, a1,
                                        args)
            return y1, y1

        if remat:
            step = jax.checkpoint(step)
        _, ys = jax.lax.scan(step, y0, (ts[:-1], hs, i1, a_levy))
        return jnp.concatenate([y0[None], ys], axis=0)

    if noise_pack is None:
        hs, i1, i10, i11, i111 = _brownian_pack(key, ts, noise_shape, y0.dtype)
    else:
        hs = (ts[1:] - ts[:-1]).astype(y0.dtype)
        i1, i10, i11, i111 = noise_pack
    t0s = ts[:-1]

    if sde_type not in ("ito", "stratonovich"):
        raise ValueError(f"unknown sde_type: {sde_type!r}")
    if (noise == "general" and sde_type == "ito"
            and method not in ("euler", "implicit_euler")):
        raise ValueError(
            "noise='general' with sde_type='ito' supports method='euler' "
            "and 'implicit_euler' only (milstein/srk need Levy areas — "
            "torchsde's restriction)")
    if sde_type == "stratonovich":
        strat_steps = {
            "euler_heun": _euler_heun_step,
            "heun": _heun_step,
            "midpoint": _midpoint_step,
            "milstein": _milstein_strat_step,
        }
        if method == "reversible_heun":
            def step(carry, xs):
                y, z, f, g = carry
                t, h, w1 = xs
                y1, z1, f1, g1 = reversible_heun_step(
                    drift, diffusion, t, t + h, y, z, f, g, h, w1, args,
                    mul=mul)
                return (y1, z1, f1, g1), y1

            if remat:
                step = jax.checkpoint(step)
            init = (y0, y0, drift(ts[0], y0, *args),
                    diffusion(ts[0], y0, *args))
            _, ys = jax.lax.scan(step, init, (t0s, hs, i1))
            return jnp.concatenate([y0[None], ys], axis=0)
        if method not in strat_steps:
            raise ValueError(
                f"unknown stratonovich method: {method!r} "
                f"(choose from {sorted([*strat_steps, 'reversible_heun'])})"
            )
        if noise == "general" and method == "milstein":
            raise ValueError(
                "noise='general' milstein needs Levy areas; use log_ode "
                "(strong 1.0) or euler_heun/heun/midpoint/reversible_heun")
        stepper = strat_steps[method]
        if method == "milstein" and grad_free:
            def stepper(drift_, diffusion_, t, y, h, w1, args_, mul=None):
                return _milstein_grad_free_step(drift_, diffusion_, t, y, h,
                                                w1, args_, ito=False)

        def step(y, xs):
            t, h, w1 = xs
            y1 = stepper(drift, diffusion, t, y, h, w1, args, mul=mul)
            return y1, y1
        xs = (t0s, hs, i1)
    elif method == "srk" and additive:
        def step(y, xs):
            t, h, w1, w10 = xs
            y1 = _sra1_step(drift, diffusion, t, y, h, w1, w10, args)
            return y1, y1
        xs = (t0s, hs, i1, i10)
    elif method == "srk":
        def step(y, xs):
            t, h, w1, w10, w11, w111 = xs
            y1 = _sriw1_step(drift, diffusion, t, y, h, w1, w10, w11, w111, args)
            return y1, y1
        xs = (t0s, hs, i1, i10, i11, i111)
    elif method == "milstein":
        mil = (_milstein_grad_free_step if grad_free else
               lambda *a: _milstein_step(*a))

        def step(y, xs):
            t, h, w1 = xs
            y1 = mil(drift, diffusion, t, y, h, w1, args)
            return y1, y1
        xs = (t0s, hs, i1)
    elif method == "euler":
        def step(y, xs):
            t, h, w1 = xs
            y1 = _euler_step(drift, diffusion, t, y, h, w1, args, mul=mul)
            return y1, y1
        xs = (t0s, hs, i1)
    elif method in ("implicit_euler", "implicit_milstein"):
        mil = method == "implicit_milstein"
        if mil and noise == "general":
            raise ValueError(
                "noise='general' implicit_milstein needs Levy areas; use "
                "implicit_euler (diffusion is explicit either way)")

        def step(y, xs):
            t, h, w1 = xs
            y1 = _drift_implicit_step(drift, diffusion, t, y, h, w1, args,
                                      mul=mul, milstein=mil)
            return y1, y1
        xs = (t0s, hs, i1)
    else:
        raise ValueError(f"unknown method: {method!r}")

    if remat:
        step = jax.checkpoint(step)
    _, ys = jax.lax.scan(step, y0, xs)
    return jnp.concatenate([y0[None], ys], axis=0)
