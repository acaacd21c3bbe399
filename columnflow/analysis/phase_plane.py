"""Phase-plane analysis of the Wong-Wang decision-making model.

The reference's DM docstring promises ``phase_plane: perform phase plane
analysis given mu and coherence`` (src/ww_model.py:48) but never implements
it — this module supplies that capability for the deterministic reduced
model in the 2-D synaptic-gating space (s_A, s_B):

    ds_i/dt = -s_i / tau_s + (1 - s_i) * gamma * f(x_i)
    x_i     = (W s)_i + J_ext * mu_i + I_0

where I_0 is the noiseless steady state of the AMPA noise current
(src/ww_model.py:91-101 with sigma_noise = 0, its dI/dt relaxes to I_0) and
W, f, and all constants are the reference's (src/ww_model.py:54-89), shared
with columnflow.models.ww.

Outputs are plain numpy (this is host-side analysis, not a training path):
the vector field on a grid, both nullclines as point sets, and the fixed
points with linear-stability classification — enough to reproduce the
classic Wong & Wang (2006) phase portraits (bistable decision attractors at
high mu, winner attractors under coherence bias).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from columnflow.models.ww import GAMMA, I_0, J_EXT, TAU_S

_W = np.array([[0.2609, -0.0497], [-0.0497, 0.2609]])  # src/ww_model.py:82-83


def _f(x):
    """Reference f-I curve (src/ww_model.py:88-89), singularity guarded."""
    num = 270.0 * np.asarray(x, dtype=np.float64) - 108.0
    den = 1.0 - np.exp(-0.154 * num)
    near = np.abs(den) < 1e-12
    return np.where(near, 1.0 / 0.154, num / np.where(near, 1.0, den))


def _df(x):
    """d f(x) / dx, with the removable singularity at 270x = 108 guarded
    (limit of the derivative there is 270/2)."""
    x = np.asarray(x, dtype=np.float64)
    u = 270.0 * x - 108.0
    e = np.exp(-0.154 * u)
    den = 1.0 - e
    near = np.abs(den) < 1e-9
    den_s = np.where(near, 1.0, den)
    # d/du [u / (1 - e^{-0.154 u})] = (1 - e - 0.154 u e) / (1 - e)^2
    dfdu = (den - 0.154 * u * e) / (den_s * den_s)
    return np.where(near, 0.5, dfdu) * 270.0


def ww_drift(s, mu):
    """Deterministic DM drift at gating state(s) ``s``.

    Args:
        s: (..., 2) synaptic gating variables.
        mu: (2,) external drives (muA, muB), as set_mu would
            (src/ww_model.py:130-132).
    Returns (..., 2) ds/dt.
    """
    s = np.asarray(s, dtype=np.float64)
    mu = np.asarray(mu, dtype=np.float64)
    x = s @ _W.T + J_EXT * mu + I_0
    return -s / TAU_S + (1.0 - s) * GAMMA * _f(x)


def _jacobian(s, mu):
    """Analytic 2x2 Jacobian of ww_drift at a single state ``s``."""
    s = np.asarray(s, dtype=np.float64)
    x = _W @ s + J_EXT * np.asarray(mu, dtype=np.float64) + I_0
    fr, dfr = _f(x), _df(x)
    jac = (1.0 - s)[:, None] * GAMMA * dfr[:, None] * _W
    jac[np.diag_indices(2)] += -1.0 / TAU_S - GAMMA * fr
    return jac


class PhasePlane(NamedTuple):
    """Result of :func:`wong_wang_phase_plane` (all numpy arrays)."""

    grid: np.ndarray         # (n,) the s-axis used for both dimensions
    ds: np.ndarray           # (n, n, 2) drift; ds[i, j] is at s=(grid[j], grid[i])
    nullcline_a: np.ndarray  # (k_a, 2) points with ds_A = 0
    nullcline_b: np.ndarray  # (k_b, 2) points with ds_B = 0
    fixed_points: np.ndarray  # (m, 2) drift roots, deduplicated
    stability: list          # m labels: "stable" | "saddle" | "unstable"


def _nullcline(grid, field_along, field_across):
    """Zero crossings of one drift component.

    Scans the component along its own axis for each fixed value of the other
    coordinate and linearly interpolates each sign change — robust to
    multiple roots per line (the bistable regime has three).
    """
    pts = []
    for j, other in enumerate(grid):
        vals = field_along(grid, other)
        sign = np.sign(vals)
        (idx,) = np.nonzero(sign[:-1] * sign[1:] < 0)
        for i in idx:
            w = vals[i] / (vals[i] - vals[i + 1])
            root = grid[i] + w * (grid[i + 1] - grid[i])
            pts.append(field_across(root, other))
    return np.asarray(pts).reshape(-1, 2)


def wong_wang_phase_plane(mu_a=0.0, mu_b=0.0, coherence=None, n_grid=201,
                          s_max=0.8):
    """Phase-plane analysis of the DM model at external drive (muA, muB).

    ``coherence`` (in [-1, 1]), if given, biases the drives the standard
    Wong-Wang way around the mean mu0 = (mu_a + mu_b) / 2:
    muA = mu0 (1 + c), muB = mu0 (1 - c) — the knob the reference's
    set_coherence stores but never wires up (src/ww_model.py:127-128).

    Returns a :class:`PhasePlane`; the fixed points are found by Newton
    iteration seeded from every vector-field grid cell where the drift
    magnitude is locally minimal, then classified by the eigenvalues of the
    analytic Jacobian.
    """
    if coherence is not None:
        mu0 = 0.5 * (mu_a + mu_b)
        mu_a, mu_b = mu0 * (1.0 + coherence), mu0 * (1.0 - coherence)
    mu = np.array([mu_a, mu_b], dtype=np.float64)

    grid = np.linspace(0.0, s_max, n_grid)
    sa, sb = np.meshgrid(grid, grid)            # sa varies along axis 1
    states = np.stack([sa, sb], axis=-1)        # (n, n, 2)
    ds = ww_drift(states, mu)

    nullcline_a = _nullcline(
        grid,
        lambda s_line, other: ww_drift(
            np.stack([s_line, np.full_like(s_line, other)], -1), mu)[:, 0],
        lambda root, other: (root, other))
    nullcline_b = _nullcline(
        grid,
        lambda s_line, other: ww_drift(
            np.stack([np.full_like(s_line, other), s_line], -1), mu)[:, 1],
        lambda root, other: (other, root))

    # Newton from coarse seeds; the system is smooth and the basin structure
    # benign, so a fixed iteration count converges or diverges cleanly.
    seeds = np.stack(np.meshgrid(grid[::20], grid[::20]), -1).reshape(-1, 2)
    roots = []
    for s0 in seeds:
        s = s0.copy()
        ok = True
        for _ in range(50):
            d = ww_drift(s, mu)
            try:
                step = np.linalg.solve(_jacobian(s, mu), d)
            except np.linalg.LinAlgError:
                ok = False
                break
            s = s - step
            if not np.all(np.isfinite(s)) or np.any(np.abs(s) > 10.0):
                ok = False
                break
        if ok and np.linalg.norm(ww_drift(s, mu)) < 1e-9 \
                and np.all(s >= -1e-6) and np.all(s <= 1.0):
            roots.append(s)

    fixed, labels = [], []
    for s in roots:
        if any(np.linalg.norm(s - f) < 1e-6 for f in fixed):
            continue
        fixed.append(s)
        eig = np.linalg.eigvals(_jacobian(s, mu))
        re = np.real(eig)
        labels.append("stable" if np.all(re < 0)
                      else "unstable" if np.all(re > 0) else "saddle")
    order = np.lexsort(tuple(np.asarray(fixed).T)) if fixed else []
    fixed = np.asarray(fixed).reshape(-1, 2)[order]
    labels = [labels[i] for i in order]

    return PhasePlane(grid=grid, ds=ds, nullcline_a=nullcline_a,
                      nullcline_b=nullcline_b, fixed_points=fixed,
                      stability=labels)
