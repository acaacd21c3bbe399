from columnflow.train.optim import (
    torch_rmsprop,
    exponential_lr,
    mask_grads,
    clamp_params,
    adam,
)
from columnflow.train.checkpoint import save_checkpoint, load_checkpoint
from columnflow.train.metrics import MetricsLogger, StepProfiler

__all__ = [
    "torch_rmsprop",
    "exponential_lr",
    "mask_grads",
    "clamp_params",
    "adam",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "StepProfiler",
]
