"""Configuration layer: TOML loading and typed views.

Drop-in compatible with the reference's config format (reference:
src/utils.py:5-10 ``load_config`` and config/model.toml). ``load_config``
returns the plain dict the reference APIs expect; ``ColumnConfig`` is a typed,
hashable view used by the pure-functional model builders so configs can be
closed over by ``jax.jit`` as static data.
"""

from __future__ import annotations

import dataclasses
import os
import tomllib
from typing import Any, Mapping

import numpy as np

# Population order within one column, everywhere in this framework
# (reference: SURVEY.md section 2.4; e.g. stimulus targets indices 2,3 = L4e/L4i).
POPULATION_NAMES = ("L2/3e", "L2/3i", "L4e", "L4i", "L5e", "L5i", "L6e", "L6i")
POPS_PER_COLUMN = 8

_DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "model.toml"
)


def load_config(filepath: str | None = None) -> dict:
    """Load configuration from a TOML file (reference: src/utils.py:5-10).

    With no argument, loads the repo's bundled ``config/model.toml``.
    """
    path = filepath or _DEFAULT_CONFIG_PATH
    with open(path, "rb") as f:
        return tomllib.load(f)


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class ColumnConfig:
    """Typed, immutable view of the biophysical configuration.

    All fields are host-side numpy/float data: weight construction happens in
    numpy at build time (it is init-time-only math), and only the resulting
    parameter pytrees enter jitted computations.
    """

    background_drive: float
    capacitance: float
    adaptation_strength: tuple[float, ...]
    tau_synapse: float
    tau_membrane: float
    tau_adaptation: float
    connection_probabilities: tuple[tuple[float, ...], ...]
    background_synapse_counts: tuple[float, ...]
    feedforward_synapse_counts: tuple[float, ...]
    baseline_synaptic_strength: float
    population_sizes: Mapping[str, tuple[float, ...]]
    connection_masks: Mapping[str, Any]
    connection_inits: Mapping[str, Any]

    @property
    def resistance(self) -> float:
        # R = tau_mem / C  (reference: src/coupled_columns.py:36-37)
        return self.tau_membrane / self.capacitance

    @staticmethod
    def from_dict(cfg: Mapping[str, Any]) -> "ColumnConfig":
        tc = cfg["time_constants"]
        return ColumnConfig(
            background_drive=float(cfg["background_drive"]),
            capacitance=float(cfg["capacitance"]),
            adaptation_strength=tuple(float(x) for x in cfg["adaptation_strength"]),
            tau_synapse=float(tc["synapse"]),
            tau_membrane=float(tc["membrane"]),
            tau_adaptation=float(tc["adaptation"]),
            connection_probabilities=tuple(
                tuple(float(x) for x in row)
                for row in cfg["connection_probabilities"]["internal"]
            ),
            background_synapse_counts=tuple(
                float(x) for x in cfg["synapse_counts"]["background"]
            ),
            feedforward_synapse_counts=tuple(
                float(x) for x in cfg["synapse_counts"]["feedforward"]
            ),
            baseline_synaptic_strength=float(cfg["synaptic_strength"]["baseline"]),
            population_sizes={
                k: tuple(float(x) for x in v) for k, v in cfg["population_size"].items()
            },
            connection_masks={
                k: _np(v) for k, v in cfg.get("connection_masks", {}).items()
            },
            connection_inits={
                k: _np(v) for k, v in cfg.get("connection_inits", {}).items()
            },
        )

    @staticmethod
    def load(filepath: str | None = None) -> "ColumnConfig":
        return ColumnConfig.from_dict(load_config(filepath))


def legacy_wta_config(cfg: ColumnConfig, scale: float = 1e-3) -> ColumnConfig:
    """The config generation that produced the reference's shipped "trained"
    WTA matrix (reference: scripts/plotting_results.py:36-99).

    Config archaeology (verified by tests/test_legacy_scale.py): that matrix
    equals the CURRENT anatomy with (a) every baseline-derived weight scaled
    by 1e-3 — i.e. baseline synaptic strength 8.78e-5 instead of 0.0878 —
    and (b) the stale connection probability p[L2/3e <- L4e] = 0.0874, which
    the toml's own trailing comment "# 0.0874" records
    (config/model.toml:6); only the 4 trained entries differ beyond that.
    Scaling the baseline scales recurrent, background, and feedforward
    weights together (they are all ``counts * baseline``), which is the only
    self-consistent single-parameter generation of the shipped matrix.
    """
    probs = [list(r) for r in cfg.connection_probabilities]
    probs[0][2] = 0.0874
    return dataclasses.replace(
        cfg,
        baseline_synaptic_strength=cfg.baseline_synaptic_strength * scale,
        connection_probabilities=tuple(tuple(r) for r in probs),
    )
