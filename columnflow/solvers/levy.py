"""Brownian increments with Levy areas, for the log-ODE scheme.

torchsde's ``BrownianInterval(levy_area_approximation=...)`` provides, per
query interval, the increment W, the space-time Levy area H, and (under the
'davie'/'foster' approximations) the space-space Levy area A — consumed by
its ``log_ode`` method for ``noise_type="general"`` SDEs (the one method
family torchsde offers general noise beyond Euler-type schemes; the
reference imports torchsde wholesale, scripts/parity_ode.py:11). This module
is the counter-based JAX equivalent: one ``jax.random`` key deterministically
yields every step's (W, H, A) triple.

Definitions over a step of width h (per Brownian channel):

    W = B(t+h) - B(t)                                ~ N(0, h)
    U = int_t^{t+h} (B(s) - B(t)) ds
    H = U/h - W/2                                    ~ N(0, h/12), indep of W
    A_jk = 0.5 * int (W_j dW_k - W_k dW_j)           (antisymmetric)

The three approximation levels (torchsde's ``levy_area_approximation``
surface, minus 'none' which carries no H either):

- ``"space-time"``: (W, H) only, A absent — enough for SRK-type schemes;
  the log-ODE scheme rejects it (torchsde raises the same way).
- ``"davie"``: A sampled conditionally on (W, H) as

      A_jk = H_j W_k - W_j H_k + lam_jk,
      lam antisymmetric, lam_jk ~ N(0, h^2/12)

  matching the exact conditional mean E[A | W, H] and the exact marginal
  variance Var(A_jk) = h^2/6 + h^2/12 = h^2/4.
- ``"foster"``: Davie's mean term with the tail variance additionally
  matched to its exact (W, H)-conditional law,

      lam_jk ~ N(0, h^2/20 + (h/5) (H_j^2 + H_k^2))   given H,

  (no W dependence). Derivation: Monte-Carlo regression of lam^2 on
  {1, H_j^2 + H_k^2, W_j^2 + W_k^2, cross} over 4e5 exact paths fits
  (0.0499, 0.2007, -0.0003, -0.0016) at h=1 — i.e. coefficients
  (h^2/20, h/5, 0, 0) — and the fit satisfies the total-variance identity
  exactly: E_H[h^2/20 + (h/5)(H_j^2+H_k^2)] = h^2/20 + h^2/30 = h^2/12,
  the Davie residual. Foster's refinement is what torchsde recommends for
  higher-order general-noise schemes; statistically it concentrates the
  tail where the path is unusually 'bowed' (large |H|).

``chen_combine`` aggregates consecutive steps with Chen's relation, so one
sampled fine path can be coarsened consistently — coarse-grid integrations
couple pathwise to fine-grid ones (the basis of the strong-order tests in
tests/test_sde_logode.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

APPROXIMATIONS = ("space-time", "davie", "foster")


def levy_pack(key, ts, m: int, dtype=jnp.float32,
              approximation: str = "davie"):
    """Per-step (W, H, A) for m Brownian channels on the grid ``ts``.

    Args:
        key: PRNG key; the whole pack is a pure function of it.
        ts: (T,) strictly increasing times; one entry per interval.
        m: number of independent Brownian channels.
        approximation: "space-time" (A is None), "davie" (default), or
            "foster" — see module docstring.

    Returns:
        (hs, w, h_st, a) with shapes (n,), (n, m), (n, m), (n, m, m) where
        n = T - 1; ``a`` is antisymmetric in its trailing two axes (``None``
        under "space-time"). For a fixed (key, ts, m) the (W, H) marginals
        are IDENTICAL across approximation levels — the level only changes
        how the A tail is drawn.
    """
    if approximation not in APPROXIMATIONS:
        raise ValueError(
            f"unknown levy_area_approximation {approximation!r} "
            f"(choose from {APPROXIMATIONS})")
    ts = jnp.asarray(ts, dtype)
    n = ts.shape[0] - 1
    hs = ts[1:] - ts[:-1]
    h_col = hs[:, None]
    kw, kh, ka = jax.random.split(key, 3)
    w = jnp.sqrt(h_col) * jax.random.normal(kw, (n, m), dtype)
    h_st = jnp.sqrt(h_col / 12.0) * jax.random.normal(kh, (n, m), dtype)
    if approximation == "space-time":
        return hs, w, h_st, None
    # Antisymmetrised iid normals: (b - b^T)/sqrt(2) entries are N(0, 1)
    # with the (j,k)/(k,j) pair perfectly anti-correlated, as A requires.
    b = jax.random.normal(ka, (n, m, m), dtype)
    lam0 = (b - jnp.swapaxes(b, -1, -2)) / jnp.sqrt(2.0)
    if approximation == "davie":
        std = jnp.broadcast_to(h_col[:, :, None] / jnp.sqrt(12.0),
                               (n, m, m))
    else:  # foster: conditional tail variance h^2/20 + (h/5)(H_j^2 + H_k^2)
        h2 = h_st * h_st                                   # (n, m)
        var = (h_col[:, :, None] * h_col[:, :, None] / 20.0
               + (h_col[:, :, None] / 5.0)
               * (h2[:, :, None] + h2[:, None, :]))        # symmetric in jk
        std = jnp.sqrt(var)
    lam = lam0 * std
    outer = h_st[:, :, None] * w[:, None, :]  # H_j W_k
    a = outer - jnp.swapaxes(outer, -1, -2) + lam
    return hs, w, h_st, a


def chen_combine(hs, w, h_st, a, factor: int):
    """Coarsen a sampled path: merge groups of ``factor`` consecutive steps.

    Chen's relation for concatenating [0,h1] then [h1,h1+h2]:

        W  = W1 + W2
        A  = A1 + A2 + (W1 (x) W2 - W2 (x) W1) / 2
        U  = U1 + U2 + h2 * W1          (U = h*(H + W/2))

    ``factor`` must divide the number of steps and be a power of two (the
    merge folds pairwise). Returns (hs, w, h_st, a) with n/factor steps —
    statistically identical to sampling the coarse grid directly, and
    pathwise consistent with the fine path (same underlying Brownian
    motion). ``a=None`` (the "space-time" level) combines (W, U) only and
    returns ``a=None``.
    """
    if factor & (factor - 1):
        raise ValueError(f"factor must be a power of two, got {factor}")
    n = hs.shape[0]
    if n % factor:
        raise ValueError(f"{factor} does not divide {n} steps")
    while factor > 1:
        h1, h2 = hs[0::2], hs[1::2]
        w1, w2 = w[0::2], w[1::2]
        u1 = h1[:, None] * (h_st[0::2] + 0.5 * w1)
        u2 = h2[:, None] * (h_st[1::2] + 0.5 * w2)
        if a is not None:
            cross = 0.5 * (w1[:, :, None] * w2[:, None, :]
                           - w2[:, :, None] * w1[:, None, :])
            a = a[0::2] + a[1::2] + cross
        hs = h1 + h2
        w = w1 + w2
        u = u1 + u2 + h2[:, None] * w1
        h_st = u / hs[:, None] - 0.5 * w
        factor //= 2
    return hs, w, h_st, a
