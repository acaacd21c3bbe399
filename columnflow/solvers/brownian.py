"""Brownian-motion sampling for SDE solvers.

Replaces torchsde's Brownian-interval machinery (its C++ ``_brownian_lib``)
with counter-based constructions on ``jax.random`` (threefry): noise is a pure
function of (key, location), so trajectories are reproducible under jit, vmap,
grad replay, and sharding without any stored state.

Two constructions:

- ``step_increments``: per-step increments keyed by the step index — the fast
  path for fixed-grid solvers (one normal draw per step, fully parallelisable
  across steps/batch).
- ``VirtualBrownianTree``: W(t) evaluated at arbitrary query times via a
  fixed-depth Brownian-bridge bisection of [t0, t1]; any two queries are
  consistent samples of one underlying path, which is what adaptive solvers
  need (the step sequence may change, the path must not).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def normal(key, step: jax.Array | int, shape=(), dtype=jnp.float32):
    """Standard-normal draw keyed by a step counter (counter-based RNG)."""
    return jax.random.normal(jax.random.fold_in(key, step), shape, dtype)


def step_increments(key, num_steps: int, hs, shape=(), dtype=jnp.float32):
    """All Brownian increments dW_i ~ N(0, h_i) for a fixed-grid integration.

    hs: (num_steps,) step sizes. Returns (num_steps,) + shape increments.
    """
    z = jax.random.normal(key, (num_steps,) + shape, dtype)
    hs = jnp.reshape(hs, (num_steps,) + (1,) * len(shape))
    return jnp.sqrt(hs) * z


@dataclasses.dataclass(frozen=True)
class VirtualBrownianTree:
    """Reproducible Brownian path W on [t0, t1] with W(t0) = 0.

    ``depth`` bisections give a time resolution of (t1-t0)/2^depth below which
    queries are linearly interpolated (the standard virtual-Brownian-tree
    construction; resolution error is O(sqrt(dt_leaf))).
    """

    t0: float
    t1: float
    key: jax.Array
    shape: tuple = ()
    depth: int = 20
    dtype: object = jnp.float32

    def evaluate(self, t) -> jax.Array:
        """Sample W(t) for scalar t (vmap for batches of times)."""
        t = jnp.clip(t, self.t0, self.t1)
        w_right = jax.random.normal(
            jax.random.fold_in(self.key, 0), self.shape, self.dtype
        ) * jnp.sqrt(jnp.asarray(self.t1 - self.t0, self.dtype))

        def bisect(carry, _):
            tl, tr, wl, wr, code, lvl = carry
            tm = 0.5 * (tl + tr)
            # Brownian bridge midpoint: N(mean=(wl+wr)/2, var=(tr-tl)/4).
            code_m = code * 2 + 1
            z = jax.random.normal(
                jax.random.fold_in(self.key, code_m), self.shape, self.dtype
            )
            wm = 0.5 * (wl + wr) + 0.5 * jnp.sqrt(tr - tl) * z
            go_left = t < tm
            tl2 = jnp.where(go_left, tl, tm)
            tr2 = jnp.where(go_left, tm, tr)
            wl2 = jnp.where(go_left, wl, wm)
            wr2 = jnp.where(go_left, wm, wr)
            code2 = jnp.where(go_left, code * 2 + 1, code * 2 + 2)
            return (tl2, tr2, wl2, wr2, code2, lvl + 1), None

        t0 = jnp.asarray(self.t0, self.dtype)
        t1 = jnp.asarray(self.t1, self.dtype)
        init = (t0, t1, jnp.zeros(self.shape, self.dtype), w_right,
                jnp.zeros((), jnp.int32), 0)
        (tl, tr, wl, wr, _, _), _ = jax.lax.scan(bisect, init, None, length=self.depth)
        frac = jnp.where(tr > tl, (t - tl) / jnp.where(tr > tl, tr - tl, 1.0), 0.0)
        return wl + frac * (wr - wl)

    def increment(self, ta, tb) -> jax.Array:
        """W(tb) - W(ta)."""
        return self.evaluate(tb) - self.evaluate(ta)


def _fold_time(key, t):
    """Fold a float time into a key (counter-based, collision-free per bit
    pattern)."""
    bits = jax.lax.bitcast_convert_type(
        jnp.asarray(t, jnp.float32), jnp.int32)
    return jax.random.fold_in(key, bits)


@dataclasses.dataclass(frozen=True)
class BrownianInterval:
    """torchsde-style Brownian sample path over [t0, t1].

    The user-facing path object torchsde exposes as
    ``BrownianInterval(t0, t1, size, entropy, levy_area_approximation)``
    and passes to ``sdeint(..., bm=bm)`` (reference dependency surface;
    torchsde backs it with a C++ interval tree + LRU cache). Here the
    backing store is the counter-based ``VirtualBrownianTree``: every query
    is a pure function of (key, time), so the same object is valid under
    jit, vmap, grad and sharding with no cache state.

    - ``bm(t)`` -> W(t); ``bm(ta, tb)`` -> W(tb) - W(ta). Queries are
      mutually consistent samples of ONE path: bm(a,b) + bm(b,c) == bm(a,c)
      to float roundoff, at time resolution (t1-t0)/2^depth.
    - ``levy_area_approximation="space-time"`` enables ``space_time(ta, tb)``
      -> (W_inc, U) with U = int_ta^tb (W_s - W_ta) ds, sampled from its
      exact conditional law given the increment (U | dW ~ N(h dW / 2,
      h^3/12)), keyed per interval — consistent for a fixed partition (what
      a fixed-grid solve uses); for Chen-coupled refinement across
      partitions use ``solvers.levy``.
    - ``levy_area_approximation="davie"`` / ``"foster"`` additionally
      enable ``pack_levy(ts)`` -> (i1, a_levy), the space-space Levy-area
      pack the log-ODE scheme consumes (``sdeint(..., bm=bm,
      method="log_ode")`` calls it internally): Davie's conditional-mean
      construction with the tail at the marginal (davie) or exact
      (W, H)-conditional (foster) variance — see ``solvers.levy``.
      Requires a 1-D shape (m,) (general-noise channels).
    - ``entropy`` seeds the path (torchsde's argument); pass ``key`` to
      seed from an existing JAX PRNG key instead.
    """

    t0: float = 0.0
    t1: float = 1.0
    shape: tuple = ()
    entropy: int = 0
    key: jax.Array | None = None
    levy_area_approximation: str = "none"
    depth: int = 24
    dtype: object = jnp.float32

    def _keys(self):
        base = (self.key if self.key is not None
                else jax.random.PRNGKey(self.entropy))
        k_w, k_u = jax.random.split(base)
        return k_w, k_u

    def _key_a(self):
        base = (self.key if self.key is not None
                else jax.random.PRNGKey(self.entropy))
        return jax.random.fold_in(base, 0xA12EA)

    def _tree(self):
        k_w, _ = self._keys()
        return VirtualBrownianTree(t0=self.t0, t1=self.t1, key=k_w,
                                   shape=tuple(self.shape), depth=self.depth,
                                   dtype=self.dtype)

    def __call__(self, ta, tb=None):
        tree = self._tree()
        if tb is None:
            return tree.evaluate(ta)
        return tree.increment(ta, tb)

    def space_time(self, ta, tb):
        """(W increment, space-time integral U) over [ta, tb]."""
        if self.levy_area_approximation not in ("space-time", "davie", "foster"):
            raise ValueError(
                "space_time queries need "
                "levy_area_approximation='space-time' (torchsde raises the "
                "same way when the approximation level is too low)")
        _, k_u = self._keys()
        w = self(ta, tb)
        h = jnp.asarray(tb, self.dtype) - jnp.asarray(ta, self.dtype)
        z = jax.random.normal(_fold_time(_fold_time(k_u, ta), tb),
                              tuple(self.shape), self.dtype)
        u = h * (0.5 * w + jnp.sqrt(h / 12.0) * z)
        return w, u

    def pack(self, ts):
        """Per-step stochastic integrals (I1, I10, I11, I111) on grid ``ts``
        — the ``noise_pack`` consumed by ``sdeint(..., noise_pack=...)``;
        ``sdeint(..., bm=bm)`` calls this internally.

        I10 is exact-conditional when the approximation level allows it and
        zero otherwise (methods that never read it — euler/milstein/
        implicit/Stratonovich families — are unaffected; srk requires
        'space-time', matching torchsde's requirement).
        """
        ts = jnp.asarray(ts, self.dtype)
        n = ts.shape[0] - 1
        shape = tuple(self.shape)
        ws = jax.vmap(lambda t: self(t))(ts)
        i1 = ws[1:] - ws[:-1]
        hs = ts[1:] - ts[:-1]
        hs_b = jnp.reshape(hs, (n,) + (1,) * len(shape))
        if self.levy_area_approximation in ("space-time", "davie", "foster"):
            _, k_u = self._keys()
            z = jax.vmap(
                lambda ta, tb: jax.random.normal(
                    _fold_time(_fold_time(k_u, ta), tb), shape, self.dtype)
            )(ts[:-1], ts[1:])
            i10 = hs_b * (0.5 * i1 + jnp.sqrt(hs_b / 12.0) * z)
        else:
            i10 = jnp.zeros_like(i1)
        i11 = 0.5 * (i1 * i1 - hs_b)
        i111 = (i1 * i1 * i1 - 3.0 * hs_b * i1) / 6.0
        return i1, i10, i11, i111

    def pack_levy(self, ts):
        """(i1, a_levy) on grid ``ts`` — the pack ``sdeint(...,
        method="log_ode")`` consumes (``bm=`` route). Increments come from
        the same path as every other query; H from the per-interval
        space-time draws; the A tail per the approximation level ("davie"
        marginal h^2/12 | "foster" exact (W, H)-conditional variance
        h^2/20 + (h/5)(H_j^2 + H_k^2) — see ``solvers.levy``), keyed per
        interval so a fixed partition is reproducible."""
        if self.levy_area_approximation not in ("davie", "foster"):
            raise ValueError(
                "pack_levy needs levy_area_approximation='davie' or "
                "'foster' (torchsde raises the same way when the "
                "approximation level is too low)")
        if len(tuple(self.shape)) != 1:
            raise ValueError(
                "pack_levy needs a 1-D shape (m,): the log-ODE scheme is "
                "for general (matrix) noise over m channels")
        (m,) = tuple(self.shape)
        ts = jnp.asarray(ts, self.dtype)
        n = ts.shape[0] - 1
        ws = jax.vmap(lambda t: self(t))(ts)
        i1 = ws[1:] - ws[:-1]
        hs = ts[1:] - ts[:-1]
        _, k_u = self._keys()
        z = jax.vmap(
            lambda ta, tb: jax.random.normal(
                _fold_time(_fold_time(k_u, ta), tb), (m,), self.dtype)
        )(ts[:-1], ts[1:])
        h_st = jnp.sqrt(hs[:, None] / 12.0) * z  # U/h - W/2 | W draw
        b = jax.vmap(
            lambda ta, tb: jax.random.normal(
                _fold_time(_fold_time(self._key_a(), ta), tb), (m, m),
                self.dtype)
        )(ts[:-1], ts[1:])
        lam0 = (b - jnp.swapaxes(b, -1, -2)) / jnp.sqrt(2.0)
        h_col = hs[:, None, None]
        if self.levy_area_approximation == "davie":
            std = h_col / jnp.sqrt(12.0)
        else:
            h2 = h_st * h_st
            std = jnp.sqrt(h_col * h_col / 20.0
                           + (h_col / 5.0)
                           * (h2[:, :, None] + h2[:, None, :]))
        outer = h_st[:, :, None] * i1[:, None, :]
        a = outer - jnp.swapaxes(outer, -1, -2) + lam0 * std
        return i1, a


def brownian_path(t0, t1, shape=(), entropy=0, key=None, depth=24,
                  dtype=jnp.float32) -> BrownianInterval:
    """torchsde's ``BrownianPath``/``BrownianTree`` constructors (both are
    thin wrappers over the interval in current torchsde; same here)."""
    return BrownianInterval(t0=t0, t1=t1, shape=shape, entropy=entropy,
                            key=key, depth=depth, dtype=dtype,
                            levy_area_approximation="space-time")
