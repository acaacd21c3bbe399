"""Wong-Wang-style firing-rate transfer function.

f(x) = (a*x - b) / (1 - exp(-d*(a*x - b))) with the exponent soft-clamped to
+-80 by a tanh (reference: src/utils.py:13-28, constants a=48, b=981,
d=0.0089). The function has a removable singularity at a*x = b with limit 1/d;
we guard the 0/0 explicitly so the TPU VPU never produces inf/nan there, while
matching the reference's values everywhere else bit-for-bit in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

GAIN_A = 48.0
THRESHOLD_B = 981.0
NOISE_D = 0.0089
_CLAMP = 80.0


def soft_clamp(x, max_val: float = _CLAMP):
    """Smoothly clamp x to (-max_val, max_val) (reference: src/utils.py:27-28)."""
    return max_val * jnp.tanh(x / max_val)


def compute_firing_rate(x):
    """Firing rate from (membrane potential - adaptation).

    Vectorized over any shape; used inside solver steps, so it must be
    jit/vmap/grad-safe. Reference: src/utils.py:13-25.
    """
    x_nom = GAIN_A * x - THRESHOLD_B
    exp_term = jnp.exp(soft_clamp(-NOISE_D * x_nom))
    denom = 1.0 - exp_term
    # Guard the removable singularity at x_nom == 0 (limit = 1/d). The guard
    # substitutes a safe denominator, then selects the limit value, so no
    # nan contaminates gradients.
    near_zero = jnp.abs(denom) < 1e-12
    safe_denom = jnp.where(near_zero, 1.0, denom)
    return jnp.where(near_zero, 1.0 / NOISE_D, x_nom / safe_denom)
