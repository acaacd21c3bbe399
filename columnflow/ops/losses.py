"""Loss and readout functions (reference: src/utils.py:51-88).

All functions are pure jnp and batch-friendly. The WTA trajectory loss
operates on batched solver outputs directly (the reference loops over samples;
here the batch axis is first-class so it can be vmapped/sharded).
"""

from __future__ import annotations

import jax.numpy as jnp

from columnflow.ops.transfer import compute_firing_rate


def min_max(firing_rates):
    """Min-max normalize final firing rates to [0, 1] (reference: src/utils.py:51-59)."""
    max_val = jnp.max(firing_rates)
    min_val = jnp.min(firing_rates)
    return (firing_rates - min_val) / (max_val - min_val)


def fr_to_binary(firing_rates, scaling_factor: float = 1.0):
    """Loose z-score followed by sigmoid (reference: src/utils.py:61-72)."""
    threshold = jnp.mean(firing_rates)
    sd_fr = jnp.std(firing_rates, ddof=1) / scaling_factor
    return jnp.asarray(1.0 / (1.0 + jnp.exp(-(firing_rates - threshold) / sd_fr)))


def smooth_l1(pred, true, beta: float = 1.0):
    """SmoothL1/Huber loss, mean-reduced (torch.nn.SmoothL1Loss semantics)."""
    diff = jnp.abs(pred - true)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def huber_trajectory_loss_wta(pred_states, true, output_weights, beta: float = 1.0):
    """WTA trajectory loss (reference: src/utils.py:74-88).

    Recomputes firing rates from the membrane/adaptation blocks of the solver
    output (the rate block of the state is a low-pass copy and is NOT used by
    the loss, matching the reference), projects each column's 8 populations
    through ``output_weights`` (selects L2/3e), and compares the two-column
    rate trajectories to the Wong-Wang targets with SmoothL1.

    Args:
        pred_states: (batch, T, 48) solver output for the 2-column WTA model.
        true: (batch, T, 2) target firing-rate trajectories.
        output_weights: (8,) readout weights over one column's populations.
    """
    mem = pred_states[..., :16]
    adap = pred_states[..., 16:32]
    fr = compute_firing_rate(mem - adap)
    fr_a = jnp.sum(fr[..., :8] * output_weights, axis=-1)
    fr_b = jnp.sum(fr[..., 8:16] * output_weights, axis=-1)
    pred = jnp.stack([fr_a, fr_b], axis=-1)
    return smooth_l1(pred, true, beta=beta)
