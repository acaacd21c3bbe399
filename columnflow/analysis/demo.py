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


PARITY_DEMO_CHECKPOINT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "parity_trained_demo")

XOR_DEMO_CHECKPOINT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "xor_trained_demo")


def load_demo_wta():
    """(params, area) with the packaged trained recurrent weights."""
    from columnflow.config import ColumnConfig
    from columnflow.models import build_wta
    from columnflow.train import load_checkpoint

    params, area = build_wta(ColumnConfig.load(), jax.random.PRNGKey(0))
    params = load_checkpoint(DEMO_CHECKPOINT, params_like=params)["params"]
    return params, area


def load_demo_parity():
    """A ParityTask whose params are the packaged best-loss checkpoint of a
    full reference-protocol training run (1600 iterations, --fused); it
    solves 4-bit parity (accuracy 1.0, asserted in tests/test_analysis.py).
    The build key only seeds trainable-weight inits, which the checkpoint
    replaces wholesale; the anatomy and default fixed fan-in masks are
    key-independent, so any build reproduces the trained network.
    """
    from columnflow.config import ColumnConfig
    from columnflow.tasks.parity import build_task
    from columnflow.train import load_checkpoint

    task = build_task(ColumnConfig.load(), jax.random.PRNGKey(0))
    params = load_checkpoint(PARITY_DEMO_CHECKPOINT,
                             params_like=task.params)["params"]
    return task._replace(params=params)


def load_demo_xor():
    """(params, net) with packaged trained XOR feedforward weights — the
    counterpart of the reference's hardcoded trained ff values in its
    xor_timecourse figure (scripts/plotting_results.py:570-579). Solves
    XOR (accuracy 1.0, asserted in tests/test_analysis.py)."""
    from columnflow.config import ColumnConfig
    from columnflow.models import build_xor_network
    from columnflow.train import load_checkpoint

    params, net = build_xor_network(ColumnConfig.load(), jax.random.PRNGKey(0))
    params = load_checkpoint(XOR_DEMO_CHECKPOINT,
                             params_like=params)["params"]
    return params, net


HOPF_DEMO_CHECKPOINT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "hopf_trained_demo")


def load_demo_hopf():
    """(params, task) with the packaged trained Hopf neural-ODE MLP
    (reference protocol, scripts/bifurcation_ode.py:179-226: 5000 samples,
    batch 32, RMSprop 1e-3 — trained with this repo's
    ``python -m columnflow.tasks.bifurcation``)."""
    from columnflow.tasks.bifurcation import build_task
    from columnflow.train import load_checkpoint

    task = build_task(jax.random.PRNGKey(0))
    params = load_checkpoint(HOPF_DEMO_CHECKPOINT,
                             params_like=task.params)["params"]
    return params, task
