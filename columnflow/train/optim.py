"""Optimizers, gradient masking, and weight clamping.

The reference trains with torch RMSprop + ExponentialLR and torch Adam,
multiplying gradients by binary masks before the step (reference:
scripts/wta_ode.py:182-184, scripts/xor_ode.py:179-184,
scripts/parity_ode.py:185-197) and clamping weights after it
(scripts/parity_ode.py:267-274). Here those are optax-style pure transforms.

``torch_rmsprop`` matches torch.optim.RMSprop exactly (eps OUTSIDE the
sqrt; optax's rmsprop differs) so the reference's tuned learning rates
(lr=10.0 for WTA!) transfer unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByTorchRMSState(NamedTuple):
    nu: optax.Updates


def scale_by_torch_rms(alpha: float = 0.99, eps: float = 1e-8):
    """torch RMSprop preconditioning: nu <- a*nu + (1-a)*g^2;
    update = g / (sqrt(nu) + eps)."""

    def init_fn(params):
        return ScaleByTorchRMSState(
            nu=jax.tree_util.tree_map(jnp.zeros_like, params)
        )

    def update_fn(updates, state, params=None):
        nu = jax.tree_util.tree_map(
            lambda n, g: alpha * n + (1.0 - alpha) * g * g, state.nu, updates
        )
        updates = jax.tree_util.tree_map(
            lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu
        )
        return updates, ScaleByTorchRMSState(nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def exponential_lr(init_lr: float, gamma: float):
    """torch ExponentialLR stepped once per update: lr_t = lr0 * gamma^t."""
    return optax.exponential_decay(
        init_value=init_lr, transition_steps=1, decay_rate=gamma
    )


def torch_rmsprop(learning_rate, alpha: float = 0.99, eps: float = 1e-8):
    """torch.optim.RMSprop-equivalent; learning_rate may be a schedule."""
    return optax.chain(
        scale_by_torch_rms(alpha=alpha, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def adam(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam-equivalent (optax.adam matches torch's update)."""
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


def mask_grads(grads, masks):
    """Elementwise-multiply gradient leaves by binary masks; leaves missing
    from ``masks`` (None) pass through unchanged."""

    def apply(g, m):
        return g if m is None else g * m

    return jax.tree_util.tree_map(
        apply, grads, masks, is_leaf=lambda x: x is None
    )


def global_norm(tree):
    """Global L2 norm of a pytree, overflow-robust via max-prescaling.

    The naive ``sqrt(sum(g**2))`` leaves f32 range once any entry exceeds
    ~1e19 — and on TPU the decomposed reduce then yields NaN, not inf
    (observed at the 104-column truncated-BPTT gradient scale, RESULTS.md).
    Dividing by the global max first keeps every intermediate in [0, 1]*n.
    Returns (norm, gmax, norm_scaled) where norm == gmax * norm_scaled so
    callers can form ``clip / norm`` as ``(clip / gmax) / norm_scaled``
    without overflow.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    gmax = jnp.maximum(
        jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in leaves])), 1e-30)
    norm_scaled = jnp.sqrt(sum(jnp.sum(jnp.square(g / gmax))
                               for g in leaves))
    return gmax * norm_scaled, gmax, norm_scaled


def clamp_params(params, clamps):
    """Clamp parameter leaves to (min, max) bounds; ``clamps`` mirrors the
    params pytree with (lo, hi) tuples or None."""

    def apply(p, c):
        if c is None:
            return p
        lo, hi = c
        return jnp.clip(p, lo, hi)

    return jax.tree_util.tree_map(
        apply, params, clamps, is_leaf=lambda x: x is None or isinstance(x, tuple)
    )
