"""4-bit parity classification task (reference: scripts/parity_ode.py).

Trains a 3-area hierarchical column network (8/4/1 columns, 312-dim state) to
output ~20 Hz for even parity and ~0 for odd: readout = output-weighted mean
L2/3e-family rate of the final column over the last 100 steps
(scripts/parity_ode.py:239-249). Adam(lr=0.1), gradients masked to structural
masks, post-step clamps (lateral <= 0, others >= 0, output in [0, 1])
(scripts/parity_ode.py:185-197, 263-274).

The reference integrates each of the 4 batch samples sequentially through
adaptive torchdiffeq; here the batch is one vmapped jitted solve. NaN/grad
explosion checks (scripts/parity_ode.py:255-261) become structured metrics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.data import make_parity_batch, parity_combinations, parity_stim_table
from columnflow.models import Stimulus, build_column_network, network_drift
from columnflow.ops.transfer import compute_firing_rate
from columnflow.train import (
    MetricsLogger,
    StepProfiler,
    adam,
    clamp_params,
    global_norm,
    mask_grads,
)

DT = 1e-3
STIM_DURATION = 0.5
TIME_STEPS = int(STIM_DURATION * 2 / DT)  # scripts/parity_ode.py:169-172
OUTPUT_SCALE = 1.0
TARGET_EVEN = 20.0  # Hz (scripts/parity_ode.py:245-246)


class ParityTask(NamedTuple):
    params: dict
    net: object
    ts: jax.Array
    dt: float
    grad_mask: dict
    clamps: dict
    optimizer: object
    max_steps: int
    # Deterministic-solve settings. The reference is pinned to torchdiffeq's
    # dopri5 at its default tolerances (scripts/parity_ode.py:233); the
    # stiff tau_syn/tau_adapt split (config/model.toml:33-36) makes the
    # implicit "kvaerno3" the economical choice at loose tolerances
    # (RESULTS.md: 99 vs 644 attempted steps at rtol=atol=1e-3 on the
    # 104-column drift).
    ode_method: str = "dopri5"
    rtol: float = 1e-7
    atol: float = 1e-9


def build_task(cfg: ColumnConfig, key, lr: float = 0.1,
               columns_per_area=(8, 4, 1), n_inputs: int = 4,
               time_steps: int = TIME_STEPS, dt: float = DT,
               max_steps: int = 3072,
               random_fan_in: bool = False,
               legacy_host_rng: bool = False,
               ode_method: str = "dopri5",
               rtol: float = 1e-7, atol: float = 1e-9) -> ParityTask:
    params, net = build_column_network(
        cfg, key, columns_per_area=columns_per_area, n_inputs=n_inputs,
        random_fan_in=random_fan_in, legacy_host_rng=legacy_host_rng,
    )
    ts = jnp.linspace(0.0, time_steps * dt, time_steps)
    grad_mask = {
        "input_weights": jnp.asarray(net.input_mask),
        "feedforward": jnp.asarray(net.feedforward_mask),
        "lateral": jnp.asarray(net.lateral_mask),
        "output_weights": jnp.asarray(net.output_mask),
    }
    clamps = {
        "input_weights": (0.0, None),
        "feedforward": (0.0, None),
        "lateral": (None, 0.0),  # lateral inhibition cannot be positive
        "output_weights": (0.0, OUTPUT_SCALE),
    }
    return ParityTask(params, net, ts, float(ts[1] - ts[0]), grad_mask,
                      clamps, adam(lr), max_steps,
                      ode_method=ode_method, rtol=rtol, atol=atol)


def batched_rollout(params, task: ParityTask, stims_raw, method=None,
                    differentiable=True, use_fused: bool = False,
                    stochastic: bool = False, key=None,
                    adaptive: bool = False, adaptive_rtol: float = 1e-3,
                    adaptive_atol: float = 1e-3,
                    adaptive_max_steps: int | None = None,
                    adaptive_bptt_every: int | None = None,
                    select_bf16: bool = False,
                    fused_pass: bool = False,
                    grad_bf16: bool = False,
                    split2: bool = False):
    """Integrate a batch of input patterns: (B, n_inputs) -> (B, T, 3P).

    ``adaptive_max_steps=None`` uses ``task.max_steps`` — ONE solver step
    budget per task; at the 104-column scale the adaptive controller
    needs ~7000 accepted + ~3500 rejected steps over the 1 s horizon
    (RESULTS.md), so build the task with ``max_steps=16384`` there.

    ``use_fused=True`` runs the whole batch through the Pallas fused dopri5
    (solvers.fused) with ONE shared step controller — torchdiffeq's batched
    semantics rather than the reference's per-sample sequential solves
    (scripts/parity_ode.py:227-236), so trajectories differ within solver
    tolerance; ~2-3x faster on TPU. Default keeps per-sample controllers.

    ``stochastic=True`` integrates the Ito SDE instead (drift + the
    constant sigma=10 diffusion, one shared Brownian per sample) on the
    fixed dt grid — the reference's commented-in sdeint alternative
    (scripts/parity_ode.py:234); requires ``key``. ``use_fused`` selects
    the Pallas fused SDE rollout (sdeint_fused); otherwise SRA1 over
    ``lax.scan`` per sample.

    ``adaptive=True`` (with ``stochastic``) integrates with adaptive
    step-doubling SRA1 on a virtual-Brownian-tree path and replay
    gradients — torchsde's ``adaptive=True`` with gradients, the option
    the reference holds commented-in (scripts/parity_ode.py:234) and its
    README recommends against fixed-grid firing-rate artefacts
    (README.md:27-29). The late stiff regime that destabilizes the fixed
    grid (RESULTS.md) is handled by the controller shrinking steps.
    With ``use_fused`` the replay sweep and its backward run as Pallas
    kernels over the frozen step sequence (premixed/knot drift — the same
    kernel-safe formulation as the fixed-grid fused path, so trajectories
    legitimately differ from the plain-drift XLA path within formulation
    tolerance amplified by the noisy dynamics; the engines themselves are
    parity-tested on identical drifts in tests/test_sde_adaptive.py).

    ``select_bf16=True`` (with ``adaptive``) runs the step-size-selection
    pass with bfloat16 weight matrices (models.network.select_weights_bf16)
    — the adaptive pass is HBM-bandwidth-bound on the f32 recurrent matrix
    at large pop counts (RESULTS.md), and bf16 reads halve that traffic.
    The replay (values AND gradients) still integrates the full-precision
    drift over the frozen accepted-step grid.

    ``grad_bf16=True`` (with ``adaptive`` and ``use_fused``) computes the
    replay's WEIGHT-gradient VJPs through a bf16-matmul drift (f32
    accumulation, one native MXU pass instead of the f32-emulating 6-pass
    split) — the dominant term of the 104-column backward (RESULTS.md).
    Values, the step grids, and the state-cotangent sweep stay exact f32;
    only d loss/d weights is at bf16 matmul precision (standard
    mixed-precision practice). Composes with ``select_bf16``/``fused_pass``.

    ``fused_pass=True`` (with ``adaptive`` and ``use_fused``) runs the
    step-size-selection pass itself as one Pallas kernel per sample
    (``sdeint_adaptive(fused_pass=True)``): the selection drift's weight
    matrices stay VMEM-resident across every controller attempt instead of
    being re-read from HBM ~5x per attempt — the bandwidth roofline that
    dominates the adaptive pass at the 104-column scale (RESULTS.md).
    Composes with ``select_bf16`` (bf16 matrices in VMEM). Uses the
    ``brownian="kernel"`` noise backend, so trajectories are a different
    (equally distributed) realization per key than the default backend.
    """
    from columnflow.solvers import odeint

    if method is None:  # deterministic solver settings ride on the task
        method = task.ode_method
    time_steps = task.ts.shape[0]
    state_dim = 3 * task.net.num_pops
    if adaptive_max_steps is None:
        adaptive_max_steps = task.max_steps
    if fused_pass and not (stochastic and adaptive and use_fused):
        raise ValueError("fused_pass requires stochastic=True, "
                         "adaptive=True and use_fused=True (the in-kernel "
                         "selection pass needs the kernel-safe premixed "
                         "drift formulation)")
    if grad_bf16 and not (stochastic and adaptive and use_fused):
        raise ValueError("grad_bf16 requires stochastic=True, adaptive=True "
                         "and use_fused=True (it substitutes the outer "
                         "arg-gradient sweep of the fused replay)")
    if split2 and not (use_fused and
                       (not stochastic or (stochastic and adaptive))):
        raise ValueError("split2 is the fused engines' scale tier (3-pass "
                         "bf16 weight matmuls); it requires use_fused=True "
                         "and either the deterministic path or "
                         "stochastic=True adaptive=True")

    if stochastic:
        if key is None:
            raise ValueError("stochastic rollout needs a PRNG key")
        B = stims_raw.shape[0]
        # NOTE: the adaptive branch must win over the fixed-grid fused
        # branch — with ``use_fused and adaptive`` the fused engine is the
        # REPLAY inside sdeint_adaptive below, not this fixed-grid solve
        # (which is exactly the dt=1e-3 instability --adaptive exists to
        # cure, RESULTS.md).
        if use_fused and not adaptive:
            from columnflow.models.network import (
                NETWORK_NOISE_STD,
                build_network_fused_consts,
                network_drift_premixed,
                premix_network_weights,
                prepare_premixed_split,
            )
            from columnflow.ops.interp import interp_knots, step_table_knots
            from columnflow.solvers import sdeint_fused

            dt = task.dt
            fc = build_network_fused_consts(task.net)
            kts, kvals = step_table_knots(time_steps, dt,
                                          jnp.zeros_like(stims_raw),
                                          stims_raw)

            def drift(t, y, pw, fc, kv):
                return network_drift_premixed(
                    t, y, pw, fc, Stimulus(0.0, dt, kv),
                    interp_fn=lambda t_, t0_, dt_, v:
                        interp_knots(t_, kts, v),
                )

            def diffusion(t, y, pw, fc, kv):
                return jnp.full_like(y, NETWORK_NOISE_STD)

            y0 = jnp.zeros((B, state_dim))
            ys = sdeint_fused(
                drift, diffusion, y0, task.ts, key,
                premix_network_weights(params, task.net), fc, kvals,
                method="srk", noise_shape=(B, 1), nondiff_args=(1, 2),
                prepare=prepare_premixed_split,
                interpret=jax.default_backend() == "cpu",
            )  # (T, B, 3P)
            return jnp.transpose(ys, (1, 0, 2))

        from columnflow.models.network import network_diffusion
        from columnflow.solvers import sdeint

        keys = jax.random.split(key, B)

        if adaptive:
            from columnflow.solvers import sdeint_adaptive

            if use_fused:
                # Kernel-safe drift for the fused replay: premixed weights,
                # gather-free knot stimulus (same formulation as the fused
                # fixed-grid path above); weights passed as explicit args so
                # the Pallas backward differentiates them.
                from columnflow.models.network import (
                    NETWORK_NOISE_STD,
                    build_network_fused_consts,
                    network_drift_premixed,
                    premix_network_weights,
                    prepare_premixed_split,
                    prepare_premixed_split2,
                )
                from columnflow.ops.interp import interp_knots, step_table_knots

                dt = task.dt
                fc = build_network_fused_consts(task.net)
                n_in = task.net.input_mask.shape[1]
                kts, _ = step_table_knots(time_steps, dt, jnp.zeros(n_in),
                                          jnp.zeros(n_in))
                pw = premix_network_weights(params, task.net)

                def a_drift(t, y, pw, fc, kv):
                    return network_drift_premixed(
                        t, y, pw, fc, Stimulus(0.0, dt, kv),
                        interp_fn=lambda t_, t0_, dt_, v:
                            interp_knots(t_, kts, v),
                    )

                def a_diff(t, y, pw, fc, kv):
                    return jnp.full_like(y, NETWORK_NOISE_STD)

                if select_bf16:
                    from columnflow.models.network import (
                        network_drift_premixed_select16,
                        premix_select16,
                    )

                    pw16 = premix_select16(pw)

                    def s_drift(t, y, pw16, fc, kv):
                        return network_drift_premixed_select16(
                            t, y, pw16, fc, Stimulus(0.0, dt, kv),
                            interp_fn=lambda t_, t0_, dt_, v:
                                interp_knots(t_, kts, v),
                        )

                from columnflow.solvers import sdeint_adaptive_batch

                # Per-lane selection (each sample its own controller on a
                # (1, P) singleton-batch state) + ONE lane-batched kernel
                # replay over all frozen grids: the weight matrices are
                # read from HBM once per chunk for the whole batch, where
                # the earlier vmap-of-per-sample form ran the replay
                # kernels once per lane (equality with that form is
                # CI-pinned at the solver level,
                # tests/test_sde_adaptive.py::TestBatchedFusedReplay).
                kvals_all = jax.vmap(
                    lambda s: step_table_knots(time_steps, dt,
                                               jnp.zeros_like(s), s)[1]
                )(stims_raw)                            # (B, 4, n_in)
                if grad_bf16:
                    from columnflow.models.network import (
                        network_drift_premixed_gradbf16,
                    )

                    def g_drift(t, y, pw, fc, kv):
                        return network_drift_premixed_gradbf16(
                            t, y, pw, fc, Stimulus(0.0, dt, kv),
                            interp_fn=lambda t_, t0_, dt_, v:
                                interp_knots(t_, kts, v),
                        )

                ys = sdeint_adaptive_batch(
                    a_drift, a_diff, jnp.zeros((B, 1, state_dim)), task.ts,
                    keys, pw, fc,
                    batch_args=(kvals_all[:, :, None, :],),
                    method="sra1", rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    bptt_every=adaptive_bptt_every,
                    select_drift=s_drift if select_bf16 else None,
                    select_args=(pw16, fc) if select_bf16 else None,
                    # In-kernel f32 selection needs the same hoisted
                    # hi/mid/lo weight split as the replay kernels; the
                    # bf16 selection drift takes pw16 unsplit.
                    select_prepare=(None if select_bf16
                                    else prepare_premixed_split)
                    if fused_pass else None,
                    fused_pass=fused_pass,
                    fused=True, fused_drift=a_drift, fused_diffusion=a_diff,
                    fused_args=(pw, fc, jnp.moveaxis(kvals_all, 0, 1)),
                    fused_y0=jnp.zeros((B, state_dim)),
                    nondiff_args=(1, 2),
                    # split2: the replay's values and state-cotangent
                    # sweeps run the 3-pass bf16 tier (matmul_split2) —
                    # well inside the rtol=1e-3 regime this path
                    # integrates at; selection/grad precision unchanged.
                    prepare=(prepare_premixed_split2 if split2
                             else prepare_premixed_split),
                    vjp_drift=g_drift if grad_bf16 else None,
                    vjp_diffusion=a_diff if grad_bf16 else None,
                )                                       # (B, T, 3P)
                return ys if differentiable else jax.lax.stop_gradient(ys)

            if select_bf16:
                from columnflow.models.network import (
                    network_drift_select16,
                    select_weights_bf16,
                )

                w16, iw16 = select_weights_bf16(params, task.net)

            if differentiable:
                # Batched replay (sdeint_adaptive_batch): per-sample
                # controllers and noise identical to the vmapped per-sample
                # path, but the replay sweep is chunk-gated on the batch-max
                # accepted count — under vmap a per-sample skip degrades to
                # select, so the vmapped replay pays ALL max_steps scan
                # iterations of drift matmuls even when most are h=0 padding
                # (naccept ~7k of a 16384 budget at the 104-column scale).
                from columnflow.solvers import sdeint_adaptive_batch

                tables = jax.vmap(
                    lambda s: parity_stim_table(s, time_steps))(stims_raw)

                def b_drift(t, y, tab):
                    return network_drift(t, y, params, task.net,
                                         Stimulus(0.0, task.dt, tab))

                def b_diff(t, y, tab):
                    return network_diffusion(t, y, params, task.net,
                                             Stimulus(0.0, task.dt, tab))

                sel = (
                    (lambda t, y, tab: network_drift_select16(
                        t, y, w16, iw16, task.net,
                        Stimulus(0.0, task.dt, tab)))
                    if select_bf16 else None
                )
                return sdeint_adaptive_batch(
                    b_drift, b_diff, jnp.zeros((B, state_dim)), task.ts,
                    keys, batch_args=(tables,), method="sra1",
                    rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    bptt_every=adaptive_bptt_every, select_drift=sel,
                )

            def one_adaptive(stim_raw, k):
                table = parity_stim_table(stim_raw, time_steps)
                stim = Stimulus(0.0, task.dt, table)
                sel = (
                    (lambda t, y: network_drift_select16(
                        t, y, w16, iw16, task.net, stim))
                    if select_bf16 else None
                )
                return sdeint_adaptive(
                    lambda t, y: network_drift(t, y, params, task.net, stim),
                    lambda t, y: network_diffusion(t, y, params, task.net,
                                                   stim),
                    jnp.zeros(state_dim), task.ts, k,
                    method="sra1", rtol=adaptive_rtol, atol=adaptive_atol,
                    max_steps=adaptive_max_steps,
                    differentiable=differentiable,
                    bptt_every=adaptive_bptt_every,
                    select_drift=sel,
                )

            return jax.vmap(one_adaptive)(stims_raw, keys)

        def one_sde(stim_raw, k):
            table = parity_stim_table(stim_raw, time_steps)
            stim = Stimulus(0.0, task.dt, table)
            return sdeint(
                lambda t, y: network_drift(t, y, params, task.net, stim),
                lambda t, y: network_diffusion(t, y, params, task.net,
                                               stim),
                jnp.zeros(state_dim), task.ts, k,
                method="srk", noise="scalar", additive=True,
            )

        return jax.vmap(one_sde)(stims_raw, keys)

    if use_fused and method == "dopri5":
        from columnflow.models.network import (
            build_network_fused_consts,
            network_drift_premixed,
            premix_network_weights,
            prepare_premixed_split,
            prepare_premixed_split2,
        )
        from columnflow.ops.interp import interp_knots, step_table_knots
        from columnflow.solvers import odeint_dopri5_fused

        dt = task.dt
        fc = build_network_fused_consts(task.net)
        # 4-knot piecewise-linear stimulus (exactly the dense step table,
        # tests/test_fused.py) — a dense (T, B, n) table lane-pads to MBs
        # of VMEM inside the kernels.
        kts, kvals = step_table_knots(time_steps, dt,
                                      jnp.zeros_like(stims_raw), stims_raw)

        def drift(t, y, pw, fc, kv):
            return network_drift_premixed(
                t, y, pw, fc, Stimulus(0.0, dt, kv),
                interp_fn=lambda t_, t0_, dt_, v: interp_knots(t_, kts, v),
            )

        y0 = jnp.zeros((stims_raw.shape[0], state_dim))
        pw = premix_network_weights(params, task.net)
        sel_kw = {}
        if split2:
            # Scale tier (round 4): values and gradient sweeps run the
            # 3-pass bf16 weight matmuls (matmul_split2, f32-grade in
            # practice — measured ~1e-4 end-to-end), while the step-size
            # SELECTION keeps the exact 6-pass drift so the frozen
            # accepted grid is IDENTICAL to the full-precision engine's
            # (a bf16-noisy selection drift at the reference rtol=1e-7
            # would be noise-floor-limited and livelock). The selection
            # split is computed OUTSIDE the kernel (numerically identical
            # — same cast/subtract ops at the XLA level) so the
            # gradient-free selection kernel holds 3 bf16 matrices
            # instead of f32 + 3 bf16: that kernel was the 416-column
            # compile blocker (value kernels with the in-kernel 2-term
            # prepare fit the budget to 416; presplitting the VALUE args
            # instead would force bf16 cotangent accumulators and degrade
            # weight gradients to bf16-grade — measured, rejected). The
            # split is THE SAME prepare hook the in-kernel path runs, so
            # the identical-grid guarantee holds by construction.
            pw3 = prepare_premixed_split(pw, fc)[0]
            sel_kw = dict(select_func=drift,
                          select_args=(pw3, fc, kvals))
        # prepare=prepare_premixed_split: bf16 hi/lo weight split hoisted out
        # of the RK stage loop — at large pop counts the compiler's own f32
        # HIGHEST decomposition buffers otherwise OOM VMEM (solvers/fused.py).
        ys = odeint_dopri5_fused(
            drift, y0, task.ts, pw,
            fc, kvals, max_steps=task.max_steps,
            nondiff_args=(1, 2),  # anatomy + stimulus are data
            prepare=(prepare_premixed_split2 if split2
                     else prepare_premixed_split),
            **sel_kw,
            interpret=jax.default_backend() == "cpu",
        )  # (T, B, 3P)
        return jnp.transpose(ys, (1, 0, 2))

    def drift(t, y, p, table):
        return network_drift(t, y, p, task.net, Stimulus(0.0, task.dt, table))

    def one(stim_raw):
        table = parity_stim_table(stim_raw, time_steps)
        return odeint(
            drift, jnp.zeros(state_dim), task.ts, params, table,
            method=method, rtol=task.rtol, atol=task.atol,
            max_steps=task.max_steps,
            adjoint="replay" if differentiable else "none",
            remat=False,  # activations fit in HBM; ~1/3 faster backward
        )

    return jax.vmap(one)(stims_raw)


def readout(ys, params, net):
    """Mean rate of the final column over the last 100 steps, weighted by the
    output vector (reference: scripts/parity_ode.py:239-243)."""
    P = net.num_pops
    fr = compute_firing_rate(ys[..., :P] - ys[..., P : 2 * P])
    final = fr[:, -100:, -8:]  # (B, 100, 8): last column
    mean_final = jnp.mean(final, axis=1)
    return jnp.sum(mean_final * params["output_weights"] / OUTPUT_SCALE, axis=-1)


def parity_targets(stims_raw, level: float = 15.0):
    """20 Hz if the input sum is even parity (sum %% (2*level) == 0), else 0
    (reference: scripts/parity_ode.py:245)."""
    even = jnp.mod(jnp.sum(stims_raw, axis=1), 2.0 * level) == 0.0
    return even.astype(jnp.float32) * TARGET_EVEN


def _step_core(task: ParityTask, use_fused: bool = False,
               stochastic: bool = False, adaptive: bool = False,
               reference_rails: bool = False, loss_scale: float = 1.0,
               bptt_every: int | None = None,
               clip_grad_norm: float | None = None,
               select_bf16: bool = False, fused_pass: bool = False,
               grad_bf16: bool = False, split2: bool = False):
    """``loss_scale`` scales the loss before backprop and unscales the
    gradients after — mathematically a no-op, but it keeps intermediate
    cotangents inside the f32 range. Needed at the 104-column adaptive
    stochastic scale on TPU, where the reverse sweep's intermediates
    overflow under the TPU's matmul rounding while the final gradients are
    O(1e6) (measured; CPU f32 stays finite). 1e-6 is a good value there.

    ``clip_grad_norm`` rescales the masked gradient to at most that global
    norm before the optimizer — the standard companion to ``bptt_every``:
    truncated windows on chaotic dynamics still yield window-to-window
    gradient magnitudes spanning many decades (4e2..1e15 measured at the
    104-column scale), and clipping turns every window into a bounded,
    usable descent direction. When set, the exploding-gradient skip rail
    is unnecessary (clipped updates are bounded) and only non-finite
    gradients skip."""

    def train_step(params, opt_state, stims_raw, noise_key=None):
        def loss_fn(p):
            ys = batched_rollout(p, task, stims_raw, use_fused=use_fused,
                                 stochastic=stochastic, key=noise_key,
                                 adaptive=adaptive,
                                 adaptive_bptt_every=bptt_every,
                                 select_bf16=select_bf16,
                                 fused_pass=fused_pass,
                                 grad_bf16=grad_bf16, split2=split2)
            out = readout(ys, p, task.net)
            loss = jnp.mean(jnp.abs(out - parity_targets(stims_raw)))
            return loss * loss_scale, (out, loss)

        (_, (out, loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if loss_scale != 1.0:
            grads = jax.tree_util.tree_map(lambda g: g / loss_scale, grads)
        grads = mask_grads(grads, task.grad_mask)
        gnorm, gmax, norm_scaled = global_norm(grads)
        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g))
                         for g in jax.tree_util.tree_leaves(grads)]))
        # Stiff excursions make the discrete backprop explode (finite loss,
        # gradient norms jumping ~0.2 -> 9e4 in one step) and then go NaN;
        # the reference merely warns at norm > 1e4 and steps anyway
        # (scripts/parity_ode.py:255-261), permanently corrupting the
        # params. Skip such updates instead so training survives;
        # ``reference_rails`` restores the faithful warn-and-step behavior
        # (warnings still surface through the gnorm/update metrics).
        if clip_grad_norm is not None:
            # (clip/gmax)/norm_scaled never overflows even when gnorm
            # itself would not fit in f32.
            scale = jnp.minimum(
                1.0, (clip_grad_norm / gmax)
                / jnp.maximum(norm_scaled, 1e-30))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        if reference_rails:
            ok = jnp.asarray(True)
        elif clip_grad_norm is not None:
            ok = grads_finite
        else:
            ok = grads_finite & (gnorm < 1e4)
        new_updates, new_opt_state = task.optimizer.update(grads, opt_state,
                                                           params)
        new_params = clamp_params(
            jax.tree_util.tree_map(lambda p, u: p + u, params, new_updates),
            task.clamps,
        )
        pick = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        return (pick(new_params, params), pick(new_opt_state, opt_state),
                loss, out, gnorm, ok)

    return train_step


def make_train_step(task: ParityTask, use_fused: bool = False,
                    stochastic: bool = False, adaptive: bool = False,
                    reference_rails: bool = False, loss_scale: float = 1.0,
                    bptt_every: int | None = None,
                    clip_grad_norm: float | None = None,
                    select_bf16: bool = False, fused_pass: bool = False,
                    grad_bf16: bool = False, split2: bool = False):
    return jax.jit(_step_core(task, use_fused, stochastic, adaptive,
                              reference_rails, loss_scale, bptt_every,
                              clip_grad_norm, select_bf16, fused_pass,
                              grad_bf16, split2),
                   donate_argnums=(0, 1))


def make_train_scan(task: ParityTask, use_fused: bool = False,
                    n_inputs: int = 4, batch_size: int = 4,
                    fixed_position: bool = True,
                    stochastic: bool = False, adaptive: bool = False,
                    reference_rails: bool = False, loss_scale: float = 1.0,
                    bptt_every: int | None = None,
                    clip_grad_norm: float | None = None,
                    select_bf16: bool = False, fused_pass: bool = False,
                    grad_bf16: bool = False, split2: bool = False):
    """K training iterations per dispatch: batch generation, rollout,
    loss, rails, update and best-params tracking all inside one
    jitted ``lax.scan``. On the TPU tunnel every host round-trip
    costs ~30 ms - more than the fused train step itself - so
    per-iteration host loops are dispatch-bound; scanning blocks
    removes that entirely.

    Returns ``scan_fn(params, opt_state, best, keys (K,)) ->
    (params, opt_state, best, losses, gnorms, oks)`` where ``best``
    is a (best_loss, best_params) pair carried across calls.
    """
    core = _step_core(task, use_fused, stochastic, adaptive,
                      reference_rails, loss_scale, bptt_every,
                      clip_grad_norm, select_bf16, fused_pass, grad_bf16,
                      split2)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_scan(params, opt_state, best, keys):
        def body(carry, key):
            params, opt_state, (best_loss, best_params) = carry
            k_batch, k_noise = jax.random.split(key)
            stims = make_parity_batch(k_batch, n_inputs, batch_size,
                                      fixed_position=fixed_position)
            params, opt_state, loss, out, gnorm, ok = core(
                params, opt_state, stims,
                k_noise if stochastic else None
            )
            improved = loss < best_loss
            best_loss = jnp.where(improved, loss, best_loss)
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old),
                params, best_params,
            )
            return ((params, opt_state, (best_loss, best_params)),
                    (loss, gnorm, ok))

        (params, opt_state, best), (losses, gnorms, oks) = jax.lax.scan(
            body, (params, opt_state, best), keys
        )
        return params, opt_state, best, losses, gnorms, oks

    return train_scan


def make_dp_train_step(task: ParityTask, mesh, use_fused: bool = False,
                       stochastic: bool = False, adaptive: bool = False,
                       bptt_every: int | None = None,
                       select_bf16: bool = False,
                       fused_pass: bool = False,
                       grad_bf16: bool = False):
    """Data-parallel training step: the sample batch is sharded across the
    device mesh, gradients pmean-ed over ICI (columnflow.parallel). Batch
    arg: stims_raw (B, n_inputs), B divisible by mesh size. The
    reference-matching post-step weight clamps (scripts/parity_ode.py:
    267-274) are fused into the sharded step, so the mesh path applies the
    same semantics as the single-device trainer."""
    from columnflow.parallel import make_dp_train_step as _mk

    if stochastic:
        # Stochastic/adaptive DP: the flagship large-scale configuration
        # (adaptive SRA1 + truncated BPTT, RESULTS.md) sharded over the
        # mesh. Per-device Brownian keys ride as a second batch arg with
        # leading axis == mesh size, so each shard integrates independent
        # noise; call as step(params, opt_state, stims (B, n),
        # dev_keys (n_devices, 2)).
        def local_loss(params, stims_raw, dev_keys):
            ys = batched_rollout(params, task, stims_raw,
                                 use_fused=use_fused, stochastic=True,
                                 adaptive=adaptive, key=dev_keys[0],
                                 adaptive_bptt_every=bptt_every,
                                 select_bf16=select_bf16,
                                 fused_pass=fused_pass,
                                 grad_bf16=grad_bf16)
            out = readout(ys, params, task.net)
            return jnp.mean(jnp.abs(out - parity_targets(stims_raw)))

        return _mk(local_loss, task.optimizer, task.grad_mask, mesh,
                   num_batch_args=2,
                   post_update=lambda p: clamp_params(p, task.clamps))

    def local_loss(params, stims_raw):
        ys = batched_rollout(params, task, stims_raw, use_fused=use_fused)
        out = readout(ys, params, task.net)
        return jnp.mean(jnp.abs(out - parity_targets(stims_raw)))

    return _mk(local_loss, task.optimizer, task.grad_mask, mesh,
               num_batch_args=1,
               post_update=lambda p: clamp_params(p, task.clamps))


# Measured engine crossover bands (RESULTS.md "The 104-column fused
# ceiling, broken"; deterministic batch-4 train step, real v5e chip,
# ms/step):   columns:   13    104    208    312    416
#             xla:      150    461   1419   3554   6138
#             fused:     25    346   1774     --   compile-fail
#             split2:    --    241    994   2957   compile-fail
# -> fused f32-exact below 104 columns (keeps the XLA-parity contract at
#    the reference scale, where it also wins 6x), the split2 3-pass bf16
#    tier from 104 through 312 columns, XLA past the 416-column fused
#    compile ceiling. The stochastic-adaptive flagship additionally takes
#    the bf16 selection/weight-gradient tiers at >= 104 columns (0.571 vs
#    3.4 s/iter, BENCH_r04).
_SPLIT2_MIN_COLUMNS = 104
_FUSED_MAX_COLUMNS = 312


def resolve_engine(engine: str | None, total_columns: int,
                   stochastic: bool = False, adaptive: bool = False,
                   batch_size: int | None = None):
    """Scale-aware engine dispatch (round-4 VERDICT #3): map a network
    size onto the measured-best engine so ``--engine auto`` gives
    torchdiffeq's ``method=``-only usability (SURVEY.md section 2 C10)
    instead of flag archaeology. Returns ``(flags, reason)`` where
    ``flags`` has use_fused/split2/select_bf16/grad_bf16 and ``reason``
    is the one-line log. ``engine`` in {"auto", "xla", "fused",
    "fused-split2"}; explicit names pin the engine without scale logic.

    ``batch_size`` feeds the round-5 LANE ceiling (RESULTS.md
    "Throughput mode", measured at the 104-column scale): the fused
    lane-batched replay's compile dies past 8 lanes on this toolchain
    (8 measured working, 16 measured failing), so the stochastic-adaptive
    auto policy picks XLA directly at > 8 lanes instead of paying a
    ~2 min failed fused compile before the fallback fires.
    """
    base = dict(use_fused=False, split2=False, select_bf16=False,
                grad_bf16=False)
    if engine == "xla":
        return base, "pinned: XLA lax-while engine"
    if engine == "fused":
        return dict(base, use_fused=True), "pinned: fused f32-exact engine"
    if engine == "fused-split2":
        return (dict(base, use_fused=True, split2=True),
                "pinned: fused split2 (3-pass bf16) tier")
    if engine != "auto":
        raise ValueError(
            f"unknown engine {engine!r}: use auto|xla|fused|fused-split2")
    if (stochastic and adaptive and batch_size is not None
            and batch_size > 8
            and total_columns >= _SPLIT2_MIN_COLUMNS):
        return dict(base, select_bf16=True), (
            f"batch {batch_size} > 8 lanes at {total_columns} columns: "
            "past the fused replay's measured lane ceiling (8 lanes, "
            "RESULTS.md 'Throughput mode') — XLA engine with bf16 "
            "selection")
    if total_columns > _FUSED_MAX_COLUMNS:
        return base, (
            f"{total_columns} columns > {_FUSED_MAX_COLUMNS}: past the "
            "fused compile ceiling, XLA engine (measured-best, RESULTS.md)")
    if total_columns >= _SPLIT2_MIN_COLUMNS:
        # split2 is a tier of the deterministic fused engine and the
        # stochastic-ADAPTIVE replay; the stochastic fixed-grid engine
        # has no split2 variant (batched_rollout rejects it).
        has_split2 = not stochastic or adaptive
        flags = dict(base, use_fused=True, split2=has_split2)
        why = (f"{total_columns} columns in "
               f"[{_SPLIT2_MIN_COLUMNS}, {_FUSED_MAX_COLUMNS}]: fused "
               + ("split2 tier (beats XLA 1.2-1.9x, RESULTS.md)"
                  if has_split2 else "engine (fixed-grid SDE)"))
        if stochastic and adaptive:
            flags.update(select_bf16=True, grad_bf16=True)
            why += " + bf16 selection/weight-grad tiers (flagship config)"
        return flags, why
    return (dict(base, use_fused=True),
            f"{total_columns} columns < {_SPLIT2_MIN_COLUMNS}: fused "
            "f32-exact engine (6x vs XLA at reference scale, keeps the "
            "XLA-parity contract)")


def anatomy_record(net, columns_per_area, n_inputs,
                   random_fan_in: bool, legacy_host_rng: bool) -> dict:
    """Fingerprint of the static network anatomy a checkpoint was trained
    on: topology, fan-in regime, and a hash of the structural masks. Stored
    in every parity checkpoint's ``extra`` and verified on ``--resume`` /
    ``--eval`` so trained params can never silently load onto a network
    whose masks a different RNG regime rebuilt (round-4 advisor: the
    fan-in RNG unification changed which mask a seed produces under
    ``random_fan_in``; ``legacy_host_rng`` reinstates the old draws)."""
    import hashlib

    h = hashlib.sha256()
    for m in (net.input_mask, net.feedforward_mask, net.lateral_mask,
              net.output_mask):
        h.update(np.ascontiguousarray(
            np.asarray(m, dtype=np.float32)).tobytes())
    return {
        "columns_per_area": [int(c) for c in columns_per_area],
        "n_inputs": int(n_inputs),
        "random_fan_in": bool(random_fan_in),
        "legacy_host_rng": bool(legacy_host_rng),
        "mask_sha256": h.hexdigest(),
    }


def verify_anatomy(ck_extra: dict | None, anatomy: dict, path: str,
                   random_fan_in: bool):
    """Fail loudly when a checkpoint's recorded anatomy does not match the
    rebuilt network; warn when an old checkpoint has no record to check."""
    import warnings

    stored = (ck_extra or {}).get("anatomy")
    if stored is None:
        if random_fan_in:
            warnings.warn(
                f"checkpoint {path!r} predates anatomy records; cannot "
                "verify the --random-fan-in mask matches this rebuild. "
                "Checkpoints trained before round 4 need "
                "--legacy-host-rng to reproduce their masks.",
                RuntimeWarning, stacklevel=2)
        return
    if stored != anatomy:
        diffs = {k: (stored.get(k), anatomy.get(k))
                 for k in set(stored) | set(anatomy)
                 if stored.get(k) != anatomy.get(k)}
        raise ValueError(
            f"checkpoint {path!r} was trained on a DIFFERENT network "
            f"anatomy than this run rebuilds (mismatched fields: {diffs}). "
            "Loading its params would silently place trained weights onto "
            "mismatched masks. Rebuild with the recorded settings "
            f"(columns-per-area={stored['columns_per_area']}, "
            f"n-inputs={stored['n_inputs']}, "
            f"random-fan-in={stored['random_fan_in']}, "
            f"legacy-host-rng={stored['legacy_host_rng']}) and the same "
            "seed.")


def train_parity(
    nr_samples: int = 6400,
    batch_size: int = 4,
    seed: int = 0,
    columns_per_area=(8, 4, 1),
    n_inputs: int = 4,
    time_steps: int = TIME_STEPS,
    max_steps: int = 3072,
    metrics_path: str | None = None,
    profile_dir: str | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
    plot_dir: str | None = None,
    plot_every: int = 5,
    use_fused: bool = False,
    random_fan_in: bool = False,
    legacy_host_rng: bool = False,
    fixed_position: bool = True,
    resume_from: str | None = None,
    stochastic: bool = False,
    adaptive: bool = False,
    reference_rails: bool = False,
    loss_scale: float = 1.0,
    bptt_every: int | None = None,
    clip_grad_norm: float | None = None,
    select_bf16: bool = False,
    fused_pass: bool = False,
    grad_bf16: bool = False,
    split2: bool = False,
    engine: str | None = None,
    ode_method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
):
    """Reference defaults: 6400 samples / batch 4 -> 1600 iterations,
    fixed-position patterns (scripts/parity_ode.py:286-294).
    ``fixed_position=False`` trains on all 2^n binary patterns
    (scripts/parity_ode.py:134-137); ``random_fan_in`` uses the reference's
    randomized fan-in masks (src/coupled_columns.py:529-575).
    ``resume_from`` restores params/optimizer/RNG/step from a checkpoint
    written by an earlier run's ``--checkpoint-out`` and continues
    (the reference can only reload whole-object pickles for analysis,
    scripts/plotting_results.py:28-30 — not resume training).

    ``engine`` ("auto" | "xla" | "fused" | "fused-split2") selects the
    solver engine from the network scale via :func:`resolve_engine`
    (round-4 VERDICT #3); ``None`` keeps the explicit use_fused/split2/
    select_bf16/grad_bf16 flags as given (programmatic callers, CLI
    overrides)."""
    if engine is not None:
        flags, why = resolve_engine(engine, sum(columns_per_area),
                                    stochastic=stochastic,
                                    adaptive=adaptive,
                                    batch_size=batch_size)
        use_fused, split2 = flags["use_fused"], flags["split2"]
        select_bf16 = select_bf16 or flags["select_bf16"]
        grad_bf16 = grad_bf16 or flags["grad_bf16"]
        print(f"engine {engine} -> "
              f"{'fused' if use_fused else 'xla'}"
              f"{'-split2' if split2 else ''}: {why}")
    cfg = ColumnConfig.load()
    key = jax.random.PRNGKey(seed)
    key, k_build = jax.random.split(key)
    task = build_task(cfg, k_build, columns_per_area=columns_per_area,
                      n_inputs=n_inputs, time_steps=time_steps,
                      max_steps=max_steps, random_fan_in=random_fan_in,
                      legacy_host_rng=legacy_host_rng,
                      ode_method=ode_method, rtol=rtol, atol=atol)
    anatomy = anatomy_record(task.net, columns_per_area, n_inputs,
                             random_fan_in, legacy_host_rng)

    if checkpoint_path:  # pre-training snapshot (scripts/parity_ode.py:210-211)
        from columnflow.train import save_checkpoint

        save_checkpoint(checkpoint_path + ".pre", params=task.params, step=0,
                        extra={"anatomy": anatomy})

    scan_fn = make_train_scan(task, use_fused=use_fused,
                              n_inputs=n_inputs, batch_size=batch_size,
                              fixed_position=fixed_position,
                              stochastic=stochastic, adaptive=adaptive,
                              reference_rails=reference_rails,
                              loss_scale=loss_scale, bptt_every=bptt_every,
                              clip_grad_norm=clip_grad_norm,
                              select_bf16=select_bf16,
                              fused_pass=fused_pass,
                              grad_bf16=grad_bf16, split2=split2)

    # Solver observability (SURVEY.md section 5): adaptive-step statistics
    # every stats_every iterations - naccept growth flags the approaching
    # stiff regime before gradients explode. The probe integrates in the
    # TRAINING mode: a deterministic dopri5 probe at default tolerances
    # exhausts its budget at stiff scales where the adaptive SDE trains
    # fine, and would report success=0 for a healthy run.
    @jax.jit
    def solver_stats(params, stim_raw):
        table = parity_stim_table(stim_raw, time_steps)
        stim = Stimulus(0.0, task.dt, table)
        y0 = jnp.zeros(3 * task.net.num_pops)
        if stochastic and adaptive:
            from columnflow.models.network import network_diffusion
            from columnflow.solvers import sdeint_adaptive

            sel = None
            if select_bf16:
                # Probe with the SAME selection drift the training pass
                # uses, so the reported step counts are the training ones.
                from columnflow.models.network import (
                    network_drift_select16,
                    select_weights_bf16,
                )

                w16, iw16 = select_weights_bf16(params, task.net)
                sel = lambda t, y: network_drift_select16(
                    t, y, w16, iw16, task.net, stim)
            _, st = sdeint_adaptive(
                lambda t, y: network_drift(t, y, params, task.net, stim),
                lambda t, y: network_diffusion(t, y, params, task.net,
                                               stim),
                y0, task.ts, jax.random.PRNGKey(99), method="sra1",
                rtol=1e-3, atol=1e-3, max_steps=task.max_steps,
                return_stats=True, select_drift=sel,
                # fused_pass training selects steps on the kernel Brownian
                # backend; probe the same path family so the reported step
                # counts are the training ones.
                brownian="kernel" if fused_pass else "jax")
            # SDESolverStats has no nfev; mirror the odeint stats shape.
            return st
        from columnflow.solvers import odeint_stats

        return odeint_stats(
            lambda t, y: network_drift(t, y, params, task.net, stim),
            y0, task.ts, method=task.ode_method,
            rtol=task.rtol, atol=task.atol, max_steps=task.max_steps,
        )

    stats_every = 50
    opt_state = task.optimizer.init(task.params)
    params = task.params
    start_iter = 0
    if resume_from:
        from columnflow.train import load_checkpoint

        ck = load_checkpoint(resume_from, params_like=params,
                             opt_state_like=opt_state, key_like=key)
        verify_anatomy(ck.get("extra"), anatomy, resume_from, random_fan_in)
        params = ck["params"]
        if ck["opt_state"] is not None:
            opt_state = ck["opt_state"]
        if ck["key"] is not None:
            key = jnp.asarray(ck["key"])
        start_iter = int(ck["step"])
        print(f"resumed from {resume_from} at iteration {start_iter}")
    # Best-loss tracking lives on-device inside the scan (the late regime
    # is stiff; keep the best).
    best = (jnp.asarray(jnp.inf, jnp.float32),
            jax.tree_util.tree_map(jnp.array, params))
    logger = MetricsLogger(metrics_path)
    profiler = StepProfiler(profile_dir)
    history = []

    # Blocked dispatch: every host round-trip on the TPU tunnel costs
    # ~30 ms (more than the fused train step), so `block` iterations run
    # as one jitted scan per dispatch, with one bulk metrics transfer.
    n_iters = nr_samples // batch_size
    # Block size = the finest host-side cadence actually requested.
    block = max(1, min(
        checkpoint_every if checkpoint_path else 25,
        plot_every if plot_dir else 25,
    ))
    if use_fused:
        # Graceful scale fallback (BASELINE.md "Single-chip scale
        # ceiling"): past the fused engine's VMEM ceiling Mosaic refuses
        # the kernels; probe-compile the EXACT scan program the loop
        # dispatches (the probe's AOT executable is reused for the
        # matching-shape calls) and auto-route to the XLA engine with a
        # warning instead of surfacing a raw backend error. The
        # fused-ONLY flags (grad_bf16/fused_pass/split2) must be dropped
        # from the rebuilt XLA scan AND from the final evaluation —
        # batched_rollout rejects them without use_fused.
        from columnflow.solvers.fused import compile_or_fallback

        scan_fn, use_fused = compile_or_fallback(
            scan_fn,
            lambda: make_train_scan(
                task, use_fused=False, n_inputs=n_inputs,
                batch_size=batch_size, fixed_position=fixed_position,
                stochastic=stochastic, adaptive=adaptive,
                reference_rails=reference_rails, loss_scale=loss_scale,
                bptt_every=bptt_every, clip_grad_norm=clip_grad_norm,
                select_bf16=select_bf16),
            (params, opt_state, best,
             jax.random.split(jax.random.PRNGKey(0), block)),
            what="parity --fused")
        if not use_fused:
            grad_bf16 = False
            fused_pass = False
            split2 = False
    for it0 in range(start_iter, n_iters, block):
        profiler.step(it0)
        k = block if it0 + block <= n_iters else n_iters - it0
        key, k_keys = jax.random.split(key)
        keys = jax.random.split(k_keys, k)
        params, opt_state, best, losses, gnorms, oks = scan_fn(
            params, opt_state, best, keys
        )
        if it0 % stats_every < block:
            st = solver_stats(
                params, jnp.full((n_inputs,), 15.0, jnp.float32)
            )
            losses, gnorms, oks, st = jax.device_get(
                (losses, gnorms, oks, st)
            )
        else:
            st = None
            losses, gnorms, oks = jax.device_get((losses, gnorms, oks))
        for j in range(k):
            it = it0 + j
            rec = {"loss": float(losses[j]), "grad_norm": float(gnorms[j]),
                   "update_applied": int(oks[j])}
            if st is not None and j == 0:
                rec.update(naccept=int(st.naccept), nreject=int(st.nreject),
                           solver_success=int(st.success))
            logger.log(it, **rec)
            history.append({"loss": float(losses[j]),
                            "grad_norm": float(gnorms[j])})
            if not bool(oks[j]):
                print(f"WARNING: skipped update at iter {it} "
                      f"(non-finite or exploding gradients, "
                      f"norm {float(gnorms[j]):.3g})")
        if checkpoint_path:
            from columnflow.train import save_checkpoint

            save_checkpoint(checkpoint_path, params=params,
                            opt_state=opt_state, key=key, step=it0 + k,
                            extra={"anatomy": anatomy})
        if plot_dir and it0 % plot_every < block:
            # Weight-group heatmaps (reference: scripts/parity_ode.py:87-114).
            from columnflow.analysis.plots import plot_weight_matrices

            plot_weight_matrices(params, f"{plot_dir}/parity_{it0:04d}")

    # Final classification check over the fixed patterns: even-parity
    # patterns must read out above TARGET_EVEN/2 (reference evaluates by
    # eye from the printed losses; this makes it a number).
    eval_stims = jnp.asarray(
        parity_combinations(n_inputs, fixed_position=fixed_position)
    )
    targets = parity_targets(eval_stims)

    def evaluate(p):
        # Evaluate in the TRAINING rollout mode: at stiff scales the
        # deterministic dopri5 path can exhaust its step budget where the
        # adaptive-SDE path trains fine, so a mode mismatch here would
        # report garbage readouts for a healthy run.
        ys = batched_rollout(p, task, eval_stims, differentiable=False,
                             use_fused=use_fused, stochastic=stochastic,
                             adaptive=adaptive, select_bf16=select_bf16,
                             fused_pass=fused_pass, split2=split2,
                             key=jax.random.PRNGKey(1234)
                             if stochastic else None)
        out = readout(ys, p, task.net)
        return float(jnp.mean((out > TARGET_EVEN / 2) == (targets > 0))), out

    acc, out = evaluate(params)
    best_loss = float(jax.device_get(best[0]))
    best_acc, _ = evaluate(best[1])
    print(f"final parity accuracy over {eval_stims.shape[0]} patterns: "
          f"{acc:.2f} (readouts {np.asarray(out).round(2).tolist()}); "
          f"best-loss params (loss {best_loss:.3f}): acc {best_acc:.2f}")
    history.append({"acc": acc, "best_acc": best_acc,
                    "best_loss": best_loss})
    if checkpoint_path:
        from columnflow.train import save_checkpoint

        save_checkpoint(checkpoint_path + ".best", params=best[1],
                        step=len(history), extra={"anatomy": anatomy})
    profiler.close()
    logger.close()
    return params, history


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=6400)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--random-fan-in", action="store_true",
                   help="randomized fan-in masks (src/coupled_columns.py:529-575)")
    p.add_argument("--legacy-host-rng", action="store_true",
                   help="with --random-fan-in: draw fan-in masks with the "
                        "pre-round-4 host numpy Generator so a seed "
                        "reproduces masks built by older checkpoints "
                        "(checkpoints now record their anatomy; resume "
                        "verifies it and fails loudly on mismatch)")
    p.add_argument("--position-invariant", action="store_true",
                   help="train on all 2^n patterns, not just fixed-position")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "xla", "fused", "fused-split2"],
                   help="solver-engine selection (default auto: pick the "
                        "measured-best engine for the network scale — "
                        "fused f32-exact < 104 columns, fused split2 "
                        "104-312, XLA past the fused compile ceiling; "
                        "RESULTS.md crossover table). Any explicit engine "
                        "flag (--fused/--split2/--select-bf16/--grad-bf16/"
                        "--fused-pass) switches to manual flag mode")
    p.add_argument("--fused", action="store_true",
                   help="shared-controller Pallas fused dopri5 (faster; "
                        "torchdiffeq-batched semantics)")
    p.add_argument("--stochastic", action="store_true",
                   help="train through the Ito SDE (sigma=10, SRA1 on the "
                        "fixed grid) — the reference's commented-in sdeint "
                        "alternative (scripts/parity_ode.py:234)")
    p.add_argument("--reference-rails", action="store_true",
                   help="faithful reference behavior on exploding/NaN "
                        "gradients: warn and step anyway "
                        "(scripts/parity_ode.py:255-261) instead of "
                        "skipping the update")
    p.add_argument("--adaptive", action="store_true",
                   help="with --stochastic: adaptive step-doubling SRA1 on "
                        "a virtual Brownian tree with replay gradients "
                        "(torchsde adaptive=True; cures fixed-grid "
                        "firing-rate artefacts, reference README.md:27-29)")
    p.add_argument("--bptt-every", type=int, default=None,
                   help="truncate adaptive-replay gradients every N accepted "
                        "steps (truncated BPTT) — required at scales where "
                        "the chaotic late regime makes full-horizon pathwise "
                        "cotangents overflow f32 (RESULTS.md); 16-64 works "
                        "at the 104-column scale")
    p.add_argument("--max-steps", type=int, default=None,
                   help="solver step budget per solve (default 3072; the "
                        "104-column adaptive run needs ~10500 controller "
                        "steps over the 1 s horizon — use 16384 there)")
    p.add_argument("--clip-grad-norm", type=float, default=None,
                   help="rescale the masked gradient to at most this global "
                        "norm before the update — the standard companion to "
                        "--bptt-every (truncated-window gradients on chaotic "
                        "dynamics span many decades in magnitude); with it "
                        "set, only non-finite gradients skip updates")
    p.add_argument("--columns-per-area", default=None, metavar="N,N,...",
                   help="comma-separated columns per area (default 8,4,1 — "
                        "the reference's [8,4,1] parity topology, "
                        "scripts/parity_ode.py:162-165); e.g. 64,32,8 for "
                        "the 104-column scaling experiments in RESULTS.md")
    p.add_argument("--fused-pass", action="store_true",
                   help="with --adaptive --fused: run the step-size-"
                        "selection pass itself as one Pallas kernel per "
                        "sample — weight matrices stay VMEM-resident "
                        "across every controller attempt instead of ~5 HBM "
                        "re-reads per attempt (the adaptive pass's "
                        "bandwidth roofline at the 104-column scale, "
                        "RESULTS.md); composes with --select-bf16")
    p.add_argument("--grad-bf16", action="store_true",
                   help="with --adaptive --fused: compute the replay's "
                        "weight-gradient VJPs through a bf16-matmul drift "
                        "(one native MXU pass instead of the f32-emulating "
                        "6-pass split -- the dominant term of the "
                        "104-column backward, RESULTS.md); values and "
                        "state cotangents stay exact f32")
    p.add_argument("--select-bf16", action="store_true",
                   help="with --adaptive: pick step sizes with bfloat16 "
                        "weight matrices (halves the HBM traffic of the "
                        "bandwidth-bound adaptive pass at large scale, "
                        "RESULTS.md); values and gradients still come from "
                        "the f32 replay over the frozen step grid")
    p.add_argument("--split2", action="store_true",
                   help="with --fused (deterministic): the 208-column "
                        "scale tier -- values/gradient matmuls as 3-pass "
                        "two-term bf16 splits (f32-grade in practice, "
                        "measured 7.7e-8 rel at P=1664), step-size "
                        "selection stays exact 6-pass so the accepted "
                        "grid equals the full-precision engine's "
                        "(RESULTS.md round 4)")
    p.add_argument("--loss-scale", type=float, default=1.0,
                   help="scale the loss before backprop, unscale gradients "
                        "after (a mathematical no-op that keeps reverse-"
                        "sweep intermediates in f32 range; use 1e-6 for "
                        "--stochastic --adaptive at >=64-column scale on "
                        "TPU)")
    p.add_argument("--method", default="dopri5", dest="ode_method",
                   help="deterministic ODE method (any columnflow.solvers "
                        "odeint method; default dopri5 = the reference's "
                        "torchdiffeq pin, scripts/parity_ode.py:233). "
                        "'kvaerno3' (implicit, L-stable) is the economical "
                        "choice at loose tolerances on this stiff physics "
                        "(RESULTS.md)")
    p.add_argument("--rtol", type=float, default=1e-7,
                   help="deterministic-solve relative tolerance "
                        "(torchdiffeq default 1e-7)")
    p.add_argument("--atol", type=float, default=1e-9,
                   help="deterministic-solve absolute tolerance "
                        "(torchdiffeq default 1e-9)")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="dump a jax.profiler trace of steps 2-4 here")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume training from a --checkpoint-out checkpoint")
    p.add_argument("--eval", default=None, metavar="CKPT", dest="eval_ckpt",
                   help="evaluate a checkpoint's parity accuracy and exit")
    p.add_argument("--eval-demo", action="store_true",
                   help="evaluate the packaged trained demo checkpoint")
    args = p.parse_args()
    cpa = ((8, 4, 1) if args.columns_per_area is None else
           tuple(int(x) for x in args.columns_per_area.split(",")))
    # Explicit engine flags are overrides: they switch dispatch to manual
    # flag mode (engine=None) so a user-assembled configuration is never
    # silently second-guessed by the auto policy.
    manual_flags = (args.fused or args.split2 or args.select_bf16
                    or args.grad_bf16 or args.fused_pass
                    # a non-default deterministic method pins the XLA
                    # engine family (the fused engine is dopri5)
                    or args.ode_method != "dopri5")
    engine = None if manual_flags else args.engine

    if args.eval_ckpt or args.eval_demo:
        if args.eval_demo:
            from columnflow.analysis.demo import load_demo_parity

            task = load_demo_parity()
        else:
            cfg = ColumnConfig.load()
            task = build_task(cfg, jax.random.PRNGKey(args.seed),
                              columns_per_area=cpa,
                              max_steps=args.max_steps or 3072,
                              random_fan_in=args.random_fan_in,
                              legacy_host_rng=args.legacy_host_rng,
                              ode_method=args.ode_method,
                              rtol=args.rtol, atol=args.atol)
            from columnflow.train import load_checkpoint

            ck = load_checkpoint(args.eval_ckpt, params_like=task.params)
            verify_anatomy(
                ck.get("extra"),
                anatomy_record(task.net, cpa, 4, args.random_fan_in,
                               args.legacy_host_rng),
                args.eval_ckpt, args.random_fan_in)
            task = task._replace(params=ck["params"])
        stims = jnp.asarray(parity_combinations(
            4, fixed_position=not args.position_invariant))
        use_fused, split2 = args.fused, args.split2
        if engine is not None:
            flags, why = resolve_engine(engine, sum(cpa),
                                        stochastic=args.stochastic,
                                        adaptive=args.adaptive)
            use_fused, split2 = flags["use_fused"], flags["split2"]
            print(f"engine {engine} -> "
                  f"{'fused' if use_fused else 'xla'}"
                  f"{'-split2' if split2 else ''}: {why}")
        ys = batched_rollout(task.params, task, stims, differentiable=False,
                             use_fused=use_fused,
                             stochastic=args.stochastic,
                             adaptive=args.adaptive,
                             select_bf16=args.select_bf16,
                             fused_pass=args.fused_pass,
                             split2=split2,
                             key=jax.random.PRNGKey(1234)
                             if args.stochastic else None)
        out = readout(ys, task.params, task.net)
        targets = parity_targets(stims)
        acc = float(jnp.mean((out > TARGET_EVEN / 2) == (targets > 0)))
        print(f"parity accuracy over {stims.shape[0]} patterns: {acc:.2f} "
              f"(readouts {np.asarray(out).round(2).tolist()})")
        return

    if args.smoke:
        params, hist = train_parity(
            nr_samples=8, batch_size=4, seed=args.seed, time_steps=200,
            max_steps=args.max_steps or 1024, columns_per_area=cpa,
            use_fused=args.fused,
            random_fan_in=args.random_fan_in,
            legacy_host_rng=args.legacy_host_rng,
            fixed_position=not args.position_invariant,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir,
            stochastic=args.stochastic,
            adaptive=args.adaptive,
            reference_rails=args.reference_rails,
            loss_scale=args.loss_scale,
            bptt_every=args.bptt_every,
            clip_grad_norm=args.clip_grad_norm,
            select_bf16=args.select_bf16,
            fused_pass=args.fused_pass,
            grad_bf16=args.grad_bf16,
            split2=args.split2,
            engine=engine,
            ode_method=args.ode_method,
            rtol=args.rtol, atol=args.atol,
        )
    else:
        params, hist = train_parity(
            nr_samples=args.samples, batch_size=args.batch_size,
            seed=args.seed, columns_per_area=cpa,
            max_steps=args.max_steps or 3072, use_fused=args.fused,
            random_fan_in=args.random_fan_in,
            legacy_host_rng=args.legacy_host_rng,
            fixed_position=not args.position_invariant,
            metrics_path=args.metrics_out,
            profile_dir=args.profile_dir,
            checkpoint_path=args.checkpoint_out,
            resume_from=args.resume,
            stochastic=args.stochastic,
            adaptive=args.adaptive,
            reference_rails=args.reference_rails,
            loss_scale=args.loss_scale,
            bptt_every=args.bptt_every,
            clip_grad_norm=args.clip_grad_norm,
            select_bf16=args.select_bf16,
            fused_pass=args.fused_pass,
            grad_bf16=args.grad_bf16,
            split2=args.split2,
            engine=engine,
            ode_method=args.ode_method,
            rtol=args.rtol, atol=args.atol,
        )
    final = next(h for h in reversed(hist) if "loss" in h)
    print(f"final loss {final['loss']:.5f} | "
          f"acc {hist[-1].get('acc', float('nan')):.2f} | "
          f"best acc {hist[-1].get('best_acc', float('nan')):.2f}")


if __name__ == "__main__":
    main()
