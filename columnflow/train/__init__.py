from columnflow.train.optim import (
    torch_rmsprop,
    exponential_lr,
    mask_grads,
    clamp_params,
    adam,
    global_norm,
)
from columnflow.train.checkpoint import save_checkpoint, load_checkpoint
from columnflow.train.metrics import MetricsLogger, StepProfiler

__all__ = [
    "torch_rmsprop",
    "exponential_lr",
    "mask_grads",
    "clamp_params",
    "adam",
    "global_norm",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "StepProfiler",
]
