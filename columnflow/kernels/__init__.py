from columnflow.kernels.column_step import (
    fused_drift,
    wta_rollout_fused,
    wta_rollout_reference,
)

__all__ = ["fused_drift", "wta_rollout_fused", "wta_rollout_reference"]
