from columnflow.ops.transfer import compute_firing_rate, soft_clamp
from columnflow.ops.interp import interp, interp_at
from columnflow.ops.losses import (
    min_max,
    fr_to_binary,
    smooth_l1,
    huber_trajectory_loss_wta,
)

__all__ = [
    "compute_firing_rate",
    "soft_clamp",
    "interp",
    "interp_at",
    "min_max",
    "fr_to_binary",
    "smooth_l1",
    "huber_trajectory_loss_wta",
]
