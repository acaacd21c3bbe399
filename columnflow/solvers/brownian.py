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
