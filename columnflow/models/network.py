"""General hierarchical column network (reference: ColumnNetwork,
src/coupled_columns.py:458-801) — the parity-task model family.

Areas are stacked feedforwardly (area k-1 -> k only); within an area, columns
interact through structurally-masked lateral inhibition; trainable groups are
input weights (first area), feedforward matrices (between areas), lateral
matrices (within areas), and an output readout vector.

TPU-first design: the reference loops over areas per drift evaluation
(src/coupled_columns.py:717-751). Here every per-area matrix is embedded into
one full (P, P) matrix at build time, so a drift evaluation is ONE matvec
with W_inner + W_lateral + W_ff — the per-area decomposition is an
implementation artifact of the reference, not semantics (the block-banded
structure lives in the masks).

State layout (3P,): [membrane(P), adaptation(P), rate(P)], P = 8 * total
columns; columns ordered area-major.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import POPS_PER_COLUMN, ColumnConfig
from columnflow.models.column import Stimulus, build_area_params
from columnflow.ops.interp import interp_at
from columnflow.ops.transfer import compute_firing_rate

NETWORK_NOISE_STD = 10.0  # reference: src/coupled_columns.py:795


class NetworkStatic(NamedTuple):
    """Static structure of the hierarchical network."""

    inner_weights: np.ndarray  # (P, P) fixed within-column anatomy, block-diag
    background_current: np.ndarray  # (P,)
    adaptation_strength: np.ndarray  # (P,)
    input_mask: np.ndarray  # (P, n_inputs)
    feedforward_mask: np.ndarray  # (P, P)
    lateral_mask: np.ndarray  # (P, P)
    output_mask: np.ndarray  # (8,)
    columns_per_area: tuple
    num_pops: int
    tau_syn: float
    tau_mem: float
    tau_adapt: float
    resistance: float


def make_mask_fan_in(mask: np.ndarray, num_target_blocks: int, num_source_blocks: int):
    """Keep only diagonal (target-block, source-block) pairs
    (reference: src/coupled_columns.py:513-527)."""
    size_t, size_s = mask.shape
    fan = np.zeros_like(mask)
    ft = size_t // num_target_blocks
    fs = size_s // num_source_blocks
    for i, j in zip(range(0, size_t, ft), range(0, size_s, fs)):
        fan[i : i + ft, j : j + fs] = 1.0
    return mask * fan


def make_mask_fan_in_random(
    mask: np.ndarray, rng, source_is_input: bool = False
):
    """Random fan-in assignment of source columns to target columns
    (reference: src/coupled_columns.py:529-575). Each target column ends up
    receiving from ``nr_sources`` source columns.

    ``rng`` is a ``jax.random`` PRNG key: all draws come from the
    framework's single counter-based Threefry contract (fold-in by draw
    site, so the assignment and each target column's fill-permutation are
    independent pure functions of the key). A ``np.random.Generator`` is
    also accepted for the pre-round-4 host-RNG regime
    (``legacy_host_rng=True`` on :func:`build_column_network`); mask
    STRUCTURE is identical either way — only which equally-distributed
    pattern a given seed selects differs. The structure is what the golden
    drift tests pin (tests/test_golden_drift.py copies our weights into
    the reference class, so parity holds under any draw regime).
    """
    size_t, size_s = mask.shape
    pops_per_src = 1 if source_is_input else 8
    nr_sources = 2 if source_is_input else 3
    n_t = size_t // 8
    n_s = size_s // pops_per_src
    fan = np.zeros_like(mask)

    legacy = isinstance(rng, np.random.Generator)
    if legacy:
        assignments = rng.integers(0, n_t, size=n_s)
    else:
        k_assign = jax.random.fold_in(rng, 0)
        assignments = np.asarray(
            jax.random.randint(k_assign, (n_s,), 0, n_t))
    for scol, tcol in enumerate(assignments):
        fan[tcol * 8 : (tcol + 1) * 8,
            scol * pops_per_src : (scol + 1) * pops_per_src] = 1.0

    for tcol in range(n_t):
        block = fan[tcol * 8 : (tcol + 1) * 8]
        already = np.flatnonzero(
            block.sum(0).reshape(n_s, pops_per_src).sum(1) > 0
        )
        need = nr_sources - len(already)
        if need > 0:
            choices = np.setdiff1d(np.arange(n_s), already)
            if legacy:
                chosen = rng.permutation(choices)[:need]
            else:
                k_fill = jax.random.fold_in(rng, 1 + tcol)
                chosen = np.asarray(
                    jax.random.permutation(k_fill, choices))[:need]
            for scol in chosen:
                fan[tcol * 8 : (tcol + 1) * 8,
                    scol * pops_per_src : (scol + 1) * pops_per_src] = 1.0
    return mask * fan


def _block_offsets(columns_per_area: Sequence[int]):
    pops = [c * POPS_PER_COLUMN for c in columns_per_area]
    offs = np.concatenate([[0], np.cumsum(pops)])
    return pops, offs


def build_column_network(
    cfg: ColumnConfig,
    key,
    areas: Sequence[str] = ("mt", "mt", "mt"),
    columns_per_area: Sequence[int] = (8, 4, 1),
    n_inputs: int = 4,
    random_fan_in: bool = False,
    legacy_host_rng: bool = False,
):
    """Build (params, static) for the hierarchical network.

    Trainable params (each stored full-size, masked by the static masks):
        input_weights  (P0, n_inputs)  |N(init, 3)| * 0.8, fan-in masked with
                                       the reference's row-swap
                                       (src/coupled_columns.py:577-601)
        feedforward    (P, P)          |N(init, 1)| * 4, block-banded
                                       (src/coupled_columns.py:603-631)
        lateral        (P, P)          N(init, 0.01) * 0.01, block-diag
                                       cross-column (src/coupled_columns.py:633-668)
        output_weights (8,)            w = |N(init, 1e-3)|^2 * mask
                                       (the reference squares via `*= rand*mask`,
                                       src/coupled_columns.py:684-685)

    All randomness (weight inits AND ``random_fan_in`` mask draws) comes
    from ``key`` via the counter-based ``jax.random`` contract.
    ``legacy_host_rng=True`` reinstates the pre-round-4 regime where the
    fan-in mask draws used a host ``np.random.Generator`` seeded from the
    key — the structure is identical, only which equally-likely pattern a
    seed selects differs (for reproducing masks built by older runs).
    """
    columns_per_area = tuple(columns_per_area)
    area_ps = [
        build_area_params(cfg, a, c) for a, c in zip(areas, columns_per_area)
    ]
    pops, offs = _block_offsets(columns_per_area)
    P = int(offs[-1])
    total_cols = sum(columns_per_area)
    consts = build_area_params(cfg, "mt", total_cols)

    masks = cfg.connection_masks
    inits = cfg.connection_inits

    # Fixed within-column anatomy, block-diag over the whole network.
    inner = np.zeros((P, P), dtype=np.float32)
    bg = np.zeros(P, dtype=np.float32)
    for k, ap in enumerate(area_ps):
        sl = slice(int(offs[k]), int(offs[k + 1]))
        inner[sl, sl] = ap.recurrent_weights * ap.internal_mask
        bg[sl] = ap.background_current

    key, k_in, k_ff, k_lat, k_out = jax.random.split(key, 5)
    # Single RNG regime (round-4 advisor/verdict): fan-in mask draws ride
    # the same counter-based key as the weight inits; the host-numpy
    # Generator remains available behind legacy_host_rng for masks built
    # by pre-round-4 runs.
    if legacy_host_rng:
        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2**31 - 1)))
    else:
        rng = jax.random.fold_in(key, 0xFA21)

    # --- input weights (first area) ---
    P0 = pops[0]
    in_init = np.tile(np.asarray(inits["input"]), (columns_per_area[0], n_inputs))
    in_rand = np.abs(
        in_init + 3.0 * np.asarray(jax.random.normal(k_in, in_init.shape))
    ) * 0.8
    in_mask = np.tile(np.asarray(masks["input"]), (columns_per_area[0], n_inputs))
    if random_fan_in:
        in_mask = make_mask_fan_in_random(in_mask, rng, source_is_input=True)
    else:
        in_mask = make_mask_fan_in(in_mask, 2, 2)
        if P0 >= 48:
            # Reference's hand-rolled permutation of the fan-in pattern
            # (src/coupled_columns.py:595-596).
            in_mask[0:16, :] = in_mask[32:48, :]
            in_mask[32:48, :] = in_mask[16:32, :]
    input_weights = (in_rand * in_mask).astype(np.float32)
    input_mask_full = np.zeros((P, n_inputs), dtype=np.float32)
    input_mask_full[:P0] = in_mask
    input_weights_full = np.zeros((P, n_inputs), dtype=np.float32)
    input_weights_full[:P0] = input_weights

    # --- feedforward (area k-1 -> k), embedded at block (k, k-1) ---
    ff_full = np.zeros((P, P), dtype=np.float32)
    ff_mask_full = np.zeros((P, P), dtype=np.float32)
    ff_keys = jax.random.split(k_ff, len(area_ps))
    for k in range(1, len(area_ps)):
        tc, sc = columns_per_area[k], columns_per_area[k - 1]
        ff_init = np.tile(np.asarray(inits["feedforward"]), (tc, sc))
        rand = np.abs(
            ff_init + 1.0 * np.asarray(jax.random.normal(ff_keys[k], ff_init.shape))
        ) * 4.0
        m = np.tile(np.asarray(masks["feedforward"]), (tc, sc))
        if tc > 1:
            m = make_mask_fan_in(m, 2, 2)
        rows = slice(int(offs[k]), int(offs[k + 1]))
        cols = slice(int(offs[k - 1]), int(offs[k]))
        ff_full[rows, cols] = rand * m
        ff_mask_full[rows, cols] = m

    # --- lateral (within-area, cross-column), embedded at block (k, k) ---
    lat_full = np.zeros((P, P), dtype=np.float32)
    lat_mask_full = np.zeros((P, P), dtype=np.float32)
    lat_keys = jax.random.split(k_lat, len(area_ps))
    for k, ap in enumerate(area_ps):
        c = columns_per_area[k]
        lat_init = np.tile(np.asarray(inits["lateral"]), (c, c))
        rand = (
            lat_init + 0.01 * np.asarray(jax.random.normal(lat_keys[k], lat_init.shape))
        ) * 0.01
        m = np.tile(np.asarray(masks["lateral"]), (c, c)) * np.asarray(
            ap.external_mask
        )
        sl = slice(int(offs[k]), int(offs[k + 1]))
        lat_full[sl, sl] = rand * m
        if c > 1:  # single-column areas have no trainable laterals
            lat_mask_full[sl, sl] = m

    # --- output readout over the last column's populations ---
    out_init = np.asarray(inits["output"], dtype=np.float32)
    out_mask = np.asarray(masks["output"], dtype=np.float32)
    out_rand = np.abs(
        out_init + 1e-3 * np.asarray(jax.random.normal(k_out, out_init.shape))
    )
    output_weights = (out_rand * out_rand * out_mask).astype(np.float32)

    params = {
        "input_weights": jnp.asarray(input_weights_full),
        "feedforward": jnp.asarray(ff_full),
        "lateral": jnp.asarray(lat_full),
        "output_weights": jnp.asarray(output_weights),
    }
    static = NetworkStatic(
        inner_weights=inner,
        background_current=bg,
        adaptation_strength=np.asarray(consts.adaptation_strength, np.float32),
        input_mask=input_mask_full,
        feedforward_mask=ff_mask_full,
        lateral_mask=lat_mask_full,
        output_mask=out_mask,
        columns_per_area=columns_per_area,
        num_pops=P,
        tau_syn=consts.tau_syn,
        tau_mem=consts.tau_mem,
        tau_adapt=consts.tau_adapt,
        resistance=consts.resistance,
    )
    return params, static


def network_drift(t, y, params, net: NetworkStatic, stim: Stimulus,
                  interp_fn=interp_at):
    """dy/dt for the (3P,) state — a single fused matvec over the whole
    network (reference semantics: src/coupled_columns.py:753-788)."""
    P = net.num_pops
    v, a, r = y[:P], y[P : 2 * P], y[2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (n_inputs,)

    hi = jax.lax.Precision.HIGHEST
    w = jnp.asarray(net.inner_weights) + params["lateral"] + params["feedforward"]
    current = (
        jnp.matmul(w, fr, precision=hi)
        + jnp.matmul(params["input_weights"], ext, precision=hi)
        + jnp.asarray(net.background_current)
    )
    total = current * net.tau_syn

    dv = (-v + total * net.resistance) / net.tau_mem
    da = (-a + jnp.asarray(net.adaptation_strength) * fr) / net.tau_adapt
    dr = (-r + fr) / net.tau_syn
    return jnp.concatenate([dv, da, dr])


def network_diffusion(t, y, params, net: NetworkStatic, stim: Stimulus,
                      membrane_only: bool = False):
    """Constant diffusion, sigma = 10. As with WTA, the reference's indexing
    applies it to the WHOLE state despite the docstring
    (src/coupled_columns.py:790-800); default reproduces actual behavior."""
    if membrane_only:
        return jnp.zeros_like(y).at[: net.num_pops].set(NETWORK_NOISE_STD)
    return jnp.full_like(y, NETWORK_NOISE_STD)


def select_weights_bf16(params: dict, net: NetworkStatic):
    """bfloat16 copies of the network's weight matrices for adaptive
    step-size SELECTION (``sdeint_adaptive(select_drift=...)``): the
    adaptive pass is HBM-bandwidth-bound on the (P, P) f32 recurrent
    matrix (RESULTS.md's 104-column accounting — ~150 MB re-read per
    controller step), and a bf16-resident copy used only to pick step
    sizes halves that traffic while the replay still integrates f32 on
    the frozen sequence."""
    w16 = (jnp.asarray(net.inner_weights) + params["lateral"]
           + params["feedforward"]).astype(jnp.bfloat16)
    iw16 = params["input_weights"].astype(jnp.bfloat16)
    return w16, iw16


def network_drift_select16(t, y, w16, iw16, net: NetworkStatic,
                           stim: Stimulus, interp_fn=interp_at):
    """``network_drift`` with bf16 weight matmuls (f32 accumulation, single
    native MXU pass) — the step-size-selection drift for
    ``select_weights_bf16``. State, transfer function, and all elementwise
    math stay f32; only the matrix reads are bf16, perturbing the drift by
    ~2^-9 relative. Step doubling compares two integrations of this SAME
    perturbed drift, so the local-error estimate remains meaningful (the
    O(h) rounding term cancels exactly between the full- and half-step
    solutions)."""
    P = net.num_pops
    v, a, r = y[:P], y[P : 2 * P], y[2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (n_inputs,)

    f32 = jnp.float32
    current = (
        jnp.matmul(w16, fr.astype(jnp.bfloat16), preferred_element_type=f32)
        + jnp.matmul(iw16, ext.astype(jnp.bfloat16),
                     preferred_element_type=f32)
        + jnp.asarray(net.background_current)
    )
    total = current * net.tau_syn

    dv = (-v + total * net.resistance) / net.tau_mem
    da = (-a + jnp.asarray(net.adaptation_strength) * fr) / net.tau_adapt
    dr = (-r + fr) / net.tau_syn
    return jnp.concatenate([dv, da, dr])


def premix_select16(pw: dict) -> dict:
    """bf16 copy of ``premix_network_weights`` output, for the fused-replay
    adaptive path's selection pass (see ``select_weights_bf16``)."""
    return {"wT16": pw["wT"].astype(jnp.bfloat16),
            "iwT16": pw["iwT"].astype(jnp.bfloat16)}


def network_drift_premixed_select16(t, y, pw16: dict, fc: dict,
                                    stim: Stimulus, interp_fn=interp_at):
    """``network_drift_premixed`` with bf16 weight matmuls — the batched
    selection drift matching ``premix_select16`` (see
    ``network_drift_select16`` for the precision contract)."""
    P = fc["bg"].shape[0]
    v, a, r = y[:, :P], y[:, P : 2 * P], y[:, 2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B, n_inputs)

    f32 = jnp.float32
    current = (
        jnp.matmul(fr.astype(jnp.bfloat16), pw16["wT16"],
                   preferred_element_type=f32)
        + jnp.matmul(ext.astype(jnp.bfloat16), pw16["iwT16"],
                     preferred_element_type=f32)
        + fc["bg"][None, :]
    )
    total = current * fc["tau_syn"]

    dv = (-v + total * fc["resistance"]) / fc["tau_mem"]
    da = (-a + fc["adapt"][None, :] * fr) / fc["tau_adapt"]
    dr = (-r + fr) / fc["tau_syn"]
    return jnp.concatenate([dv, da, dr], axis=1)


def network_drift_batched(t, y, params, net: NetworkStatic, stim: Stimulus,
                          interp_fn=interp_at):
    """Batched ``network_drift``: y (B, 3P) -> (B, 3P), stim table
    (T, B, n_inputs) — per-sample stimulus, one shared solve.

    Every contraction is strictly 2Dx2D — required inside fused Pallas
    solver kernels, where Mosaic cannot lower 1-D matvec/outer-product
    dot shapes (and their VJPs). Semantics identical to ``network_drift``
    per row.
    """
    P = net.num_pops
    v, a, r = y[:, :P], y[:, P : 2 * P], y[:, 2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B, n_inputs)

    hi = jax.lax.Precision.HIGHEST
    w = jnp.asarray(net.inner_weights) + params["lateral"] + params["feedforward"]
    current = (
        jnp.matmul(fr, w.T, precision=hi)
        + jnp.matmul(ext, params["input_weights"].T, precision=hi)
        + jnp.asarray(net.background_current)[None, :]
    )
    total = current * net.tau_syn

    dv = (-v + total * net.resistance) / net.tau_mem
    da = (-a + jnp.asarray(net.adaptation_strength)[None, :] * fr) / net.tau_adapt
    dr = (-r + fr) / net.tau_syn
    return jnp.concatenate([dv, da, dr], axis=1)


def build_network_fused_consts(net: NetworkStatic) -> dict:
    """Lean kernel constants for the fused solver path: just the arrays the
    drift reads (passing the full NetworkStatic would haul its (P, P)
    structural masks into VMEM for nothing)."""
    return {
        "bg": np.asarray(net.background_current, np.float32),
        "adapt": np.asarray(net.adaptation_strength, np.float32),
        "tau_syn": float(net.tau_syn),
        "tau_mem": float(net.tau_mem),
        "tau_adapt": float(net.tau_adapt),
        "resistance": float(net.resistance),
    }


def premix_network_weights(params: dict, net: NetworkStatic) -> dict:
    """Combine inner + lateral + feedforward into one effective matrix at
    the XLA level (differentiable: the lateral/feedforward cotangents flow
    back through the sum), so the kernel holds ONE (P, P) operand and skips
    two matrix adds per stage. Stored pre-TRANSPOSED: the drift right-
    multiplies by W^T, and transposing outside the kernel keeps Mosaic from
    materializing a second (P, P) copy in VMEM (2.8 MB at 832 pops)."""
    return {
        "wT": (jnp.asarray(net.inner_weights) + params["lateral"]
               + params["feedforward"]).T,
        "iwT": params["input_weights"].T,
    }


def split_f32(w):
    """3-term bf16 decomposition of an f32 array: w ≈ hi + mid + lo to f32
    rounding (each bf16 term holds ~8 mantissa bits). Used to run
    f32-accurate matmuls as six native bf16 MXU passes — the same scheme
    XLA's f32 ``HIGHEST`` emulation uses — with the decomposition hoisted
    OUT of the solver's stage loop via the fused solvers' ``prepare`` hook:
    leaving it to the compiler allocates per-stage decomposition buffers,
    which OOMs the 16 MB VMEM at large pop counts (832² f32 = 2.8 MB ×
    ~6 RK stages)."""
    f32 = jnp.float32
    w_hi = w.astype(jnp.bfloat16)
    r = w - w_hi.astype(f32)
    w_mid = r.astype(jnp.bfloat16)
    w_lo = (r - w_mid.astype(f32)).astype(jnp.bfloat16)
    return w_hi, w_mid, w_lo


def matmul_split(x, w_hi, w_mid, w_lo):
    """f32-accurate x @ W from a pre-split W (see ``split_f32``): six bf16
    passes keeping every product term down to ~2^-24 relative."""
    f32 = jnp.float32
    x_hi = x.astype(jnp.bfloat16)
    r = x - x_hi.astype(f32)
    x_mid = r.astype(jnp.bfloat16)
    x_lo = (r - x_mid.astype(f32)).astype(jnp.bfloat16)
    mm = functools.partial(jnp.matmul, preferred_element_type=f32)
    return (mm(x_hi, w_lo) + mm(x_mid, w_mid) + mm(x_lo, w_hi)
            + mm(x_hi, w_mid) + mm(x_mid, w_hi)
            + mm(x_hi, w_hi))


def prepare_premixed_split(pw, fc, *rest):
    """``prepare`` hook for the fused solvers: split the premixed recurrent
    matrix once per kernel invocation (args layout of the parity fused
    path: (pw, fc, stim-values...))."""
    hi, mid, lo = split_f32(pw["wT"])
    return ({"wT_hi": hi, "wT_mid": mid, "wT_lo": lo,
             "iwT": pw["iwT"]}, fc) + rest


def matmul_split2(x, w_hi, w_mid):
    """x @ W from TWO-term bf16 splits of both operands (~16 mantissa
    bits each): three native bf16 MXU passes (hi*hi + hi*mid + mid*hi)
    instead of the 6-pass :func:`matmul_split`. Dropped terms (mid*mid
    and both residuals-beyond-16-bits) are each ~2^-16 |x||W| worst case;
    with roundoff-like signs they average down by sqrt(K). Measured
    (round-4 RESULTS "208-column scale tier"): ~4e-6 max-relative per
    matmul at K=256; 7.7e-8 over a 200-step contracting rollout at
    P=1664; ~1e-4 end-to-end on the stiff parity readout — f32-grade in
    practice, documented not exact. The scale tier for >=208-column
    fused solves, where the step is MXU-pass-bound and half the passes
    is half the time."""
    f32 = jnp.float32
    x_hi = x.astype(jnp.bfloat16)
    x_mid = (x - x_hi.astype(f32)).astype(jnp.bfloat16)
    mm = functools.partial(jnp.matmul, preferred_element_type=f32)
    return mm(x_hi, w_hi) + mm(x_hi, w_mid) + mm(x_mid, w_hi)


def prepare_premixed_split2(pw, fc, *rest):
    """Two-term variant of :func:`prepare_premixed_split` (the ``--fused
    --split2`` scale tier): the kernels hold 2 bf16 matrices instead of
    f32 + 3 bf16 and run 5 MXU passes per matmul instead of 6."""
    f32 = jnp.float32
    w = pw["wT"]
    hi = w.astype(jnp.bfloat16)
    mid = (w - hi.astype(f32)).astype(jnp.bfloat16)
    return ({"wT_hi": hi, "wT_mid": mid, "iwT": pw["iwT"]}, fc) + rest


def network_drift_premixed_gradbf16(t, y, pw, fc: dict, stim: Stimulus,
                                    interp_fn=interp_at):
    """``network_drift_premixed`` with the weight matmuls cast to bf16
    IN-FUNCTION (f32 accumulation, single native MXU pass) — the
    ``vjp_drift`` substitute for the fused solvers' outer arg-gradient
    sweep. Gradients flow to the ORIGINAL f32 ``pw`` leaves through the
    casts, so the weight-gradient GEMMs run at bf16 matmul precision
    (standard mixed-precision training practice) instead of the
    f32-emulating 6-pass split — the dominant term of the 104-column
    backward (RESULTS.md). Values/state-cotangents elsewhere stay exact.
    """
    P = fc["bg"].shape[0]
    v, a, r = y[:, :P], y[:, P : 2 * P], y[:, 2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B, n_inputs)

    f32 = jnp.float32
    current = (
        jnp.matmul(fr.astype(jnp.bfloat16), pw["wT"].astype(jnp.bfloat16),
                   preferred_element_type=f32)
        + jnp.matmul(ext.astype(jnp.bfloat16),
                     pw["iwT"].astype(jnp.bfloat16),
                     preferred_element_type=f32)
        + fc["bg"][None, :]
    )
    total = current * fc["tau_syn"]

    dv = (-v + total * fc["resistance"]) / fc["tau_mem"]
    da = (-a + fc["adapt"][None, :] * fr) / fc["tau_adapt"]
    dr = (-r + fr) / fc["tau_syn"]
    return jnp.concatenate([dv, da, dr], axis=1)


def network_drift_premixed(t, y, pw, fc: dict, stim: Stimulus,
                           interp_fn=interp_at):
    """``network_drift_batched`` with pre-mixed weights: y (B, 3P),
    pw from ``premix_network_weights`` (optionally passed through
    ``prepare_premixed_split``), fc from
    ``build_network_fused_consts``, stim table (T, B, n_inputs)."""
    P = fc["bg"].shape[0]
    v, a, r = y[:, :P], y[:, P : 2 * P], y[:, 2 * P :]
    fr = compute_firing_rate(v - a)

    ext = interp_fn(t, stim.t0, stim.dt, stim.table)  # (B, n_inputs)

    hi = jax.lax.Precision.HIGHEST
    if "wT_lo" in pw:
        rec = matmul_split(fr, pw["wT_hi"], pw["wT_mid"],
                           pw["wT_lo"])
    elif "wT_hi" in pw:
        rec = matmul_split2(fr, pw["wT_hi"], pw["wT_mid"])
    else:
        rec = jnp.matmul(fr, pw["wT"], precision=hi)
    current = (
        rec
        + jnp.matmul(ext, pw["iwT"], precision=hi)
        + fc["bg"][None, :]
    )
    total = current * fc["tau_syn"]

    dv = (-v + total * fc["resistance"]) / fc["tau_mem"]
    da = (-a + fc["adapt"][None, :] * fr) / fc["tau_adapt"]
    dr = (-r + fr) / fc["tau_syn"]
    return jnp.concatenate([dv, da, dr], axis=1)
