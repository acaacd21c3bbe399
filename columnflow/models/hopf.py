"""Hopf-bifurcation task models (reference: scripts/bifurcation_ode.py).

- ``hopf_dynamics``: the supercritical Hopf normal form with time-varying
  input mu(t) (reference: scripts/bifurcation_ode.py:122-131) — the
  ground-truth system for dataset generation.
- ``build_hopf_mlp`` / ``hopf_mlp_drift``: the trainable neural-ODE drift, an
  MLP 3 -> 100 -> 100 -> 100 -> 2 with ReLU, weights N(0, 0.1), zero biases
  (reference: scripts/bifurcation_ode.py:78-99). Unlike the reference (which
  interpolates mu in numpy, detached from autodiff), the interpolation here is
  jnp — still constant w.r.t. trainable parameters, so gradients match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from columnflow.models.column import Stimulus
from columnflow.ops.interp import interp_at

MLP_SIZES = (3, 100, 100, 100, 2)


def hopf_dynamics(t, y, stim: Stimulus, omega=1.0):
    """Hopf normal form; y (..., 2), mu interpolated at t from stim (T, ...)."""
    mu_t = interp_at(t, stim.t0, stim.dt, stim.table)
    x, v = y[..., 0], y[..., 1]
    r2 = x * x + v * v
    dx = (mu_t - r2) * x - omega * v
    dv = (mu_t - r2) * v + omega * x
    return jnp.stack([dx, dv], axis=-1)


def build_hopf_mlp(key, sizes=MLP_SIZES, init_std=0.1):
    """MLP parameter pytree: [(w, b), ...] with w ~ N(0, 0.1), b = 0."""
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k = jax.random.split(key)
        w = init_std * jax.random.normal(k, (dout, din), dtype=jnp.float32)
        params.append({"w": w, "b": jnp.zeros(dout, dtype=jnp.float32)})
    return params


def mlp_apply(params, x):
    """ReLU MLP; x (..., sizes[0]) -> (..., sizes[-1])."""
    h = x
    for i, layer in enumerate(params):
        h = jnp.matmul(h, layer["w"].T, precision=jax.lax.Precision.HIGHEST)
        h = h + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def hopf_mlp_drift(t, y, params, stim: Stimulus, interp_fn=interp_at):
    """Neural-ODE drift: y (B, 2), stim table (T, B) of mu values -> (B, 2).

    Mirrors the reference's forward (scripts/bifurcation_ode.py:101-106):
    the net sees (x, y, mu(t)).
    """
    mu_t = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B,)
    inp = jnp.concatenate([y, mu_t[..., None]], axis=-1)
    return mlp_apply(params, inp)
