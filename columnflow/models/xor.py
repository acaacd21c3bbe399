"""XOR column network (reference: ColumnNetworkXOR, src/coupled_columns.py:254-454).

Two areas — area 0 with two input columns (A, B), area 1 with one output
column (C) — with per-source trainable feedforward target-weight vectors.
Lateral connectivity is removed; feedforward source is L2/3e, target L4e/L4i;
the previous area's source rate is summed and scaled x10
(src/coupled_columns.py:390-395).

State layout (72,): [membrane(24), adaptation(24), rate(24)], columns ordered
[A(8), B(8), C(8)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.models.column import AreaParams, Stimulus, build_area_params
from columnflow.ops.interp import interp_at
from columnflow.ops.transfer import compute_firing_rate

NUM_POPS = 24
XOR_STATE_DIM = 72
XOR_NOISE_STD = 10.0  # reference: src/coupled_columns.py:449
FF_GAIN = 10.0  # "pump up firing rates", src/coupled_columns.py:394

FF_SOURCE_MASK = np.array([1.0, 0, 0, 0, 0, 0, 0, 0], dtype=np.float32)
FF_TARGET_MASK = np.array([0.0, 0, 1.0, 1.0, 0, 0, 0, 0], dtype=np.float32)


class XORNetwork(NamedTuple):
    """Static structure: per-area anatomy plus shared constants."""

    area0: AreaParams  # 2 columns, small_network
    area1: AreaParams  # 1 column, small_network
    consts: AreaParams  # whole-network constants (3 columns, full size)
    ff_source_mask: np.ndarray
    ff_target_mask: np.ndarray


def build_xor_network(cfg: ColumnConfig, key, areas=("mt", "mt"), init_std=0.1):
    """Build (params, net): trainable ff vectors + static structure.

    Feedforward weights start at |N(anatomical ff weights, 0.1)| masked to
    L4e/L4i targets (reference: src/coupled_columns.py:314-341).
    """
    area0 = build_area_params(cfg, areas[0], 2, small_network=True)
    area1 = build_area_params(cfg, areas[1], 1, small_network=True)
    consts = build_area_params(cfg, "mt", 3, small_network=False)

    # Lateral connectivity removed (src/coupled_columns.py:292-299).
    area0 = area0._replace(
        recurrent_weights=area0.recurrent_weights * area0.internal_mask
    )

    k0, k1 = jax.random.split(key)

    def init_ff(k, area: AreaParams, n_sources):
        base = jnp.asarray(area.feedforward_weights)
        mask = jnp.asarray(
            np.tile(FF_TARGET_MASK, base.shape[0] // 8), dtype=jnp.float32
        )
        noise = init_std * jax.random.normal(
            k, (n_sources,) + base.shape, dtype=jnp.float32
        )
        return jnp.abs(base[None] + noise) * mask[None]

    params = {
        "ff_w0": init_ff(k0, area0, 2),  # (2, 16): input i -> area-0 pops
        "ff_w1": init_ff(k1, area1, 2),  # (2, 8): column A/B -> column C
    }
    net = XORNetwork(
        area0=area0, area1=area1, consts=consts,
        ff_source_mask=FF_SOURCE_MASK, ff_target_mask=FF_TARGET_MASK,
    )
    return params, net


def xor_drift(t, y, params, net: XORNetwork, stim: Stimulus,
              interp_fn=interp_at):
    """dy/dt for the 72-dim XOR state (reference: src/coupled_columns.py:407-442)."""
    P = NUM_POPS
    v, a, r = y[:P], y[P : 2 * P], y[2 * P :]
    fr = compute_firing_rate(v - a)
    fr0, fr1 = fr[:16], fr[16:]

    # stim table (T, 2, 16): both orderings of the two inputs.
    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (2, 16)

    hi = jax.lax.Precision.HIGHEST
    # Area 0: elementwise input vectors (src/coupled_columns.py:385-388).
    ff0 = jnp.einsum("ip,ip->p", ext, params["ff_w0"], precision=hi)
    # Area 1: summed L2/3e rate of each source column, x10
    # (src/coupled_columns.py:390-395).
    src = FF_GAIN * jnp.matmul(
        fr0.reshape(2, 8), jnp.asarray(net.ff_source_mask), precision=hi
    )  # (2,)
    ff1 = jnp.einsum("i,ip->p", src, params["ff_w1"], precision=hi)

    rec0 = jnp.matmul(net.area0.recurrent_weights, fr0, precision=hi)
    rec1 = jnp.matmul(net.area1.recurrent_weights, fr1, precision=hi)

    cur0 = (ff0 + net.area0.background_current + rec0) * net.area0.tau_syn
    cur1 = (ff1 + net.area1.background_current + rec1) * net.area1.tau_syn
    total = jnp.concatenate([cur0, cur1])

    c = net.consts
    dv = (-v + total * c.resistance) / c.tau_mem
    da = (-a + c.adaptation_strength * fr) / c.tau_adapt
    dr = (-r + fr) / c.tau_syn
    return jnp.concatenate([dv, da, dr])


def xor_diffusion(t, y, params, net: XORNetwork, stim: Stimulus):
    """Membrane-only noise, sigma = 10 (reference: src/coupled_columns.py:444-454;
    this is the one diffusion in the reference whose indexing matches its
    docstring — SURVEY.md section 2.4)."""
    return jnp.zeros_like(y).at[:NUM_POPS].set(XOR_NOISE_STD)


def build_xor_fused_consts(net: XORNetwork) -> dict:
    """Kernel-friendly constants for ``xor_drift_batched``: the two areas
    unified into one 24-pop network (block-diag recurrent matrix, matmul
    embeddings P0/P1 placing per-area feedforward currents) so the drift is
    pure equal-width 2Dx2D math — unequal-width lane concats are an
    unimplemented Mosaic pattern."""
    w24 = np.zeros((24, 24), dtype=np.float32)
    w24[:16, :16] = np.asarray(net.area0.recurrent_weights)
    w24[16:, 16:] = np.asarray(net.area1.recurrent_weights)
    bg24 = np.concatenate([np.asarray(net.area0.background_current),
                           np.asarray(net.area1.background_current)])
    p0 = np.zeros((16, 24), dtype=np.float32)
    p0[:, :16] = np.eye(16)
    p1 = np.zeros((8, 24), dtype=np.float32)
    p1[:, 16:] = np.eye(8)
    return {
        "w24": w24, "bg24": bg24.astype(np.float32), "p0": p0, "p1": p1,
        "src_mask": np.asarray(net.ff_source_mask, np.float32)[:, None],
        "adapt": np.asarray(net.consts.adaptation_strength, np.float32),
        "tau_syn": float(net.consts.tau_syn),
        "tau_mem": float(net.consts.tau_mem),
        "tau_adapt": float(net.consts.tau_adapt),
        "resistance": float(net.consts.resistance),
    }


def split_xor_params(params: dict) -> dict:
    """Split the (2, ...) per-source ff weights into (1, ...) rows OUTSIDE
    the kernel: the VJP of in-kernel row indexing is a pad, another
    unimplemented Mosaic pattern. Differentiable, so gradients flow back
    into the original ``params`` structure."""
    return {"w00": params["ff_w0"][0:1], "w01": params["ff_w0"][1:2],
            "w10": params["ff_w1"][0:1], "w11": params["ff_w1"][1:2]}


def xor_drift_batched(t, y, pf, fc: dict, stim: Stimulus,
                      interp_fn=interp_at):
    """Batched ``xor_drift``: y (B, 72) -> (B, 72), stim table (T, B, 32) —
    the two 16-pop stimulus slots flattened along the last axis (4-D tables
    lane-pad to ~16 MB in VMEM inside fused kernels). ``pf`` comes from
    ``split_xor_params``, ``fc`` from ``build_xor_fused_consts``.

    Strictly equal-width 2Dx2D contractions for the fused Pallas solver
    kernels (Mosaic cannot lower 1-D dot shapes, their VJP outer products,
    unequal-width lane concats, or the pad transpose of row indexing).
    Semantics identical to ``xor_drift`` per row.
    """
    P = NUM_POPS
    v, a, r = y[:, :P], y[:, P : 2 * P], y[:, 2 * P :]
    fr = compute_firing_rate(v - a)
    fr0 = fr[:, :16]

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B, 32)

    hi = jax.lax.Precision.HIGHEST
    # Area 0: sum_i ext_slot_i * ff_w0[i], unrolled over the two inputs.
    ff0 = ext[:, :16] * pf["w00"] + ext[:, 16:] * pf["w01"]  # (B, 16)
    # Area 1: summed L2/3e rate of each source column x10 through its ff
    # vector, via (B,1)x(1,8) broadcasts.
    src_a = jnp.matmul(fr0[:, :8], fc["src_mask"], precision=hi)  # (B, 1)
    src_b = jnp.matmul(fr0[:, 8:], fc["src_mask"], precision=hi)
    ff1 = FF_GAIN * (src_a * pf["w10"] + src_b * pf["w11"])  # (B, 8)

    ff24 = (jnp.matmul(ff0, fc["p0"], precision=hi)
            + jnp.matmul(ff1, fc["p1"], precision=hi))  # (B, 24)
    rec24 = jnp.matmul(fr, fc["w24"].T, precision=hi)

    # Both areas share tau_syn (same TOML constants).
    total = (ff24 + fc["bg24"][None] + rec24) * fc["tau_syn"]

    dv = (-v + total * fc["resistance"]) / fc["tau_mem"]
    da = (-a + fc["adapt"][None] * fr) / fc["tau_adapt"]
    dr = (-r + fr) / fc["tau_syn"]
    return jnp.concatenate([dv, da, dr], axis=1)
