"""Packaged trained-WTA demo checkpoint.

The reference's analysis script carries a hardcoded 16x16 trained weight
matrix so its figures run without retraining (reference:
scripts/plotting_results.py:36-101). The equivalent here is a real
checkpoint produced by this repo's stable WTA protocol
(``python -m columnflow.tasks.wta --lr 0.01 --noise-reps 4``), shipped in
``columnflow/assets/`` and loadable everywhere a ``--checkpoint`` is
accepted (pass ``--demo`` on the analysis/sweep CLIs).
"""

from __future__ import annotations

import os

import jax

DEMO_CHECKPOINT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "wta_trained_demo")


def load_demo_wta():
    """(params, area) with the packaged trained recurrent weights."""
    from columnflow.config import ColumnConfig
    from columnflow.models import build_wta
    from columnflow.train import load_checkpoint

    params, area = build_wta(ColumnConfig.load(), jax.random.PRNGKey(0))
    params = load_checkpoint(DEMO_CHECKPOINT, params_like=params)["params"]
    return params, area
