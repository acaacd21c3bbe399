"""Kernel-safe counter-based RNG and Brownian tree.

``jax.random`` cannot be traced into Pallas TPU kernels (its threefry
primitive has no Mosaic lowering), so the in-kernel adaptive-SDE selection
pass (solvers/fused.py) needs a noise construction expressible in plain
``jnp`` integer/float ops that lower both through XLA and through Mosaic.
This module provides exactly that:

- ``threefry2x32``: the Threefry-2x32 block cipher (20 rounds, the same
  algorithm ``jax.random`` uses) on four uint32 scalars — pure adds, xors
  and rotates, bit-identical everywhere.
- ``normal_from_bits``: uint32 -> standard normal via the Acklam inverse
  normal CDF (log/sqrt + rational polynomials only; |rel err| < 1.2e-9,
  far below f32 resolution).
- ``KernelBrownianTree``: the virtual-Brownian-tree construction of
  ``brownian.VirtualBrownianTree`` (fixed-depth Brownian-bridge bisection;
  any two queries are consistent samples of one path) built on the above,
  so the SAME path can be queried from XLA code (the differentiable
  replay) and from inside a Pallas kernel (the step-size selection pass).
  For a given key it is a *different* realization than
  ``VirtualBrownianTree`` (different bit-stream), with identical
  statistics.

Replaces the role of torchsde's C++ ``_brownian_lib`` for the in-kernel
path (reference: torchsde dependency, SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def _rotl(x, r: int):
    return (x << _u32(r)) | (x >> _u32(32 - r))


_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds — the jax.random algorithm on scalars.

    All operands uint32 (arrays broadcast elementwise). Returns (o0, o1).
    """
    k0, k1, x0, x1 = _u32(k0), _u32(k1), _u32(x0), _u32(x1)
    ks = (k0, k1, k0 ^ k1 ^ _u32(0x1BD11BDA))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for r in range(5):
        rots = _ROT_A if r % 2 == 0 else _ROT_B
        for rot in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, rot)
            x1 = x0 ^ x1
        x0 = x0 + ks[(r + 1) % 3]
        x1 = x1 + ks[(r + 2) % 3] + _u32(r + 1)
    return x0, x1


def key_pair(key):
    """Split a jax PRNG key into the (k0, k1) uint32 scalars threefry uses."""
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return data[0], data[1]


def fold2(k0, k1, a, b):
    """Derive a new key pair by hashing (a, b) under (k0, k1)."""
    return threefry2x32(k0, k1, a, b)


# Acklam's inverse-normal-CDF approximation (|relative error| < 1.15e-9):
# central rational polynomial for p in [0.02425, 0.97575], tail polynomials
# in q = sqrt(-2 ln p) outside. Only +, *, /, sqrt, log — all Mosaic-legal.
_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
_P_LOW = 0.02425


def ndtri(p):
    """Inverse standard-normal CDF (Acklam). p must lie in (0, 1)."""
    p = jnp.asarray(p, jnp.float32)
    # Tail branch value, computed on a log-safe argument.
    p_tail = jnp.where(p < 0.5, p, 1.0 - p)
    p_safe = jnp.maximum(p_tail, jnp.float32(1e-38))
    q = jnp.sqrt(-2.0 * jnp.log(p_safe))
    num = ((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q \
        + _C[5]
    den = (((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1.0
    x_tail = num / den
    x_tail = jnp.where(p < 0.5, x_tail, -x_tail)
    # Central branch.
    qc = p - 0.5
    r = qc * qc
    num = (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r
           + _A[5]) * qc
    den = ((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r \
        + 1.0
    x_central = num / den
    central = (p >= _P_LOW) & (p <= 1.0 - _P_LOW)
    return jnp.where(central, x_central, x_tail)


def uniform_from_bits(bits):
    """uint32 bits -> f32 uniform in (0, 1): top 23 bits scaled onto
    [2^-24, 1). Computed arithmetically (value-identical to the classic
    exponent-trick bitcast, which Mosaic cannot lower for scalars): the
    23-bit integer converts to f32 exactly, and the power-of-two scale is
    exact, so every output equals k * 2^-23 + 2^-24."""
    # Via int32: Mosaic legalizes u32->i32 and i32->f32 but not u32->f32.
    m = (_u32(bits) >> _u32(9)).astype(jnp.int32).astype(jnp.float32)
    return m * jnp.float32(2.0 ** -23) + jnp.float32(2.0 ** -24)


def normal_from_bits(bits):
    """uint32 bits -> f32 standard normal (inverse-CDF transform)."""
    return ndtri(uniform_from_bits(bits))


def normal2(k0, k1, a, b):
    """One standard-normal draw keyed by counter words (a, b)."""
    u0, _ = threefry2x32(k0, k1, a, b)
    return normal_from_bits(u0)


def _t_code(t, t0, t1):
    """30-bit fixed-point code of a time within [t0, t1] (interval-key
    material). Arithmetic only: Mosaic cannot bitcast scalars, so the
    float's raw bit pattern is unavailable in-kernel. Distinct f32 times
    collide only when closer than 2^-30 of the span — far below any step
    the adaptive controller can realize in f32 time arithmetic."""
    t = jnp.asarray(t, jnp.float32)
    t0 = jnp.asarray(t0, jnp.float32)
    span = jnp.maximum(jnp.asarray(t1, jnp.float32) - t0, jnp.float32(1e-38))
    x = (t - t0) / span
    return (x * jnp.float32(2.0 ** 30)).astype(jnp.int32).astype(jnp.uint32)


def interval_normal(k0, k1, ta, tb, t0, t1):
    """Standard normal keyed by an interval's endpoint positions within
    [t0, t1] — deterministic per (ta, tb), kernel-safe analog of
    ``sde_adaptive._interval_normal``."""
    return normal2(k0, k1, _t_code(ta, t0, t1), _t_code(tb, t0, t1))


@dataclasses.dataclass(frozen=True)
class KernelBrownianTree:
    """Scalar Brownian path W on [t0, t1], W(t0) = 0, queryable anywhere.

    Same construction as ``brownian.VirtualBrownianTree`` (depth-``depth``
    Brownian-bridge bisection; linear interpolation below the leaf
    resolution), with all randomness from :func:`threefry2x32` +
    :func:`normal_from_bits` so ``evaluate`` traces into Pallas kernels.
    Node draws are keyed by the bisection code exactly like the jax-random
    tree (code 0 = endpoint draw, midpoint of code c = 2c+1).
    """

    t0: object
    t1: object
    k0: jax.Array
    k1: jax.Array
    depth: int = 20
    dtype: object = jnp.float32

    def evaluate(self, t) -> jax.Array:
        t = jnp.clip(jnp.asarray(t, self.dtype), self.t0, self.t1)
        t0 = jnp.asarray(self.t0, self.dtype)
        t1 = jnp.asarray(self.t1, self.dtype)
        w_right = normal2(self.k0, self.k1, _u32(0), _u32(0)) * jnp.sqrt(
            jnp.maximum(t1 - t0, 0.0)
        )

        def bisect(_, carry):
            tl, tr, wl, wr, code = carry
            tm = 0.5 * (tl + tr)
            code_m = code * _u32(2) + _u32(1)
            z = normal2(self.k0, self.k1, code_m, _u32(0))
            wm = 0.5 * (wl + wr) + 0.5 * jnp.sqrt(tr - tl) * z
            go_left = t < tm
            return (
                jnp.where(go_left, tl, tm),
                jnp.where(go_left, tm, tr),
                jnp.where(go_left, wl, wm),
                jnp.where(go_left, wm, wr),
                jnp.where(go_left, code_m, code * _u32(2) + _u32(2)),
            )

        init = (t0, t1, jnp.zeros((), self.dtype), w_right, _u32(0))
        # fori_loop, not scan: this must trace into Pallas kernel bodies.
        tl, tr, wl, wr, _ = jax.lax.fori_loop(0, self.depth, bisect, init)
        frac = jnp.where(tr > tl, (t - tl) / jnp.where(tr > tl, tr - tl, 1.0),
                         0.0)
        return wl + frac * (wr - wl)

    def increment(self, ta, tb) -> jax.Array:
        return self.evaluate(tb) - self.evaluate(ta)
