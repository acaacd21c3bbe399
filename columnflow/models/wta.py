"""Winner-take-all two-column model (reference: ColumnAreaWTA,
src/coupled_columns.py:143-249).

Two cortical columns with trainable lateral-inhibition (L2/3e -> other
column's L2/3i) and self-excitation (L2/3e -> L2/3e) entries in the recurrent
matrix; everything else is fixed anatomy. State layout (48,):
[membrane(16), adaptation(16), rate(16)] (SURVEY.md section 2.4).

Drift equations (reference: src/coupled_columns.py:204-237):
    fr      = f(V - a)
    I_total = (w_ff * stim(t) + I_bg + W_rec @ fr) * tau_syn
    dV/dt   = (-V + R * I_total) / tau_mem
    da/dt   = (-a + g_adapt * fr) / tau_adapt
    dr/dt   = (-r + fr) / tau_syn
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.models.column import AreaParams, Stimulus, build_area_params
from columnflow.ops.interp import interp_at
from columnflow.ops.transfer import compute_firing_rate

NUM_COLUMNS = 2
NUM_POPS = 16
WTA_STATE_DIM = 48
WTA_NOISE_STD = 100.0  # reference: src/coupled_columns.py:244


def wta_lat_in_mask() -> np.ndarray:
    """Trainable-entry mask: lateral inhibition + self-excitation
    (reference: src/coupled_columns.py:163-170)."""
    m = np.zeros((NUM_POPS, NUM_POPS), dtype=np.float32)
    m[1, 8] = m[9, 0] = 1.0  # L2/3e -> other column's L2/3i
    m[0, 0] = m[8, 8] = 1.0  # L2/3e self-excitation
    return m


def build_wta(cfg: ColumnConfig, key, area: str = "mt", init_std: float = 1e-4):
    """Build WTA parameters: (params dict, area constants).

    The recurrent matrix starts at anatomy plus |N(w, init_std)| perturbations
    on the cross-column trainable entries (reference:
    src/coupled_columns.py:172-183).
    """
    area_p: AreaParams = build_area_params(cfg, area, NUM_COLUMNS, small_network=True)
    mask = wta_lat_in_mask()
    orig = area_p.recurrent_weights
    rand = jnp.abs(
        orig + init_std * jax.random.normal(key, orig.shape, dtype=jnp.float32)
    )
    recurrent = rand * (mask * area_p.external_mask) + orig

    output_weights = np.zeros(8, dtype=np.float32)
    output_weights[0] = 1.0  # readout = L2/3e (src/coupled_columns.py:185-188)

    params = {
        "recurrent_weights": jnp.asarray(recurrent),
        "output_weights": jnp.asarray(output_weights),
    }
    return params, area_p


def wta_drift(t, y, params, area: AreaParams, stim: Stimulus,
              interp_fn=interp_at):
    """dy/dt for the 48-dim WTA state; pure function of its inputs."""
    v, a, r = y[:NUM_POPS], y[NUM_POPS : 2 * NUM_POPS], y[2 * NUM_POPS :]
    fr = compute_firing_rate(v - a)

    ff_rate = interp_fn(t, stim.t0, stim.dt, stim.table)
    ff_current = area.feedforward_weights * ff_rate
    recurrent_current = jnp.matmul(
        params["recurrent_weights"], fr, precision=jax.lax.Precision.HIGHEST
    )
    total = (ff_current + area.background_current + recurrent_current) * area.tau_syn

    dv = (-v + total * area.resistance) / area.tau_mem
    da = (-a + area.adaptation_strength * fr) / area.tau_adapt
    dr = (-r + fr) / area.tau_syn
    return jnp.concatenate([dv, da, dr])


def wta_diffusion(t, y, params, area: AreaParams, stim: Stimulus,
                  membrane_only: bool = False):
    """Constant diffusion, sigma = 100.

    The reference's docstring says membrane-only, but its row-indexing applies
    sigma to the WHOLE state (src/coupled_columns.py:244-248; SURVEY.md
    section 2.4 quirk). Default reproduces the actual behavior;
    ``membrane_only=True`` gives the documented one.
    """
    if membrane_only:
        g = jnp.zeros_like(y).at[:NUM_POPS].set(WTA_NOISE_STD)
    else:
        g = jnp.full_like(y, WTA_NOISE_STD)
    return g
