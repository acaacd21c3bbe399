"""Fused solvers: whole ODE/SDE solves as a handful of Pallas TPU kernels.

The XLA paths (dopri.py, sde.py) pay per-op dispatch inside their
``while_loop``/``scan`` — ~10 us per solver step for small states. Here
every hot sweep runs INSIDE a Pallas kernel, with the user's drift (and
diffusion) traced directly into the kernel body and reverse-mode
derivatives obtained by calling ``jax.vjp`` in-kernel (Mosaic lowers the
transposed ops like any other traced code). Works for any pure-jnp
functions whose operands fit VMEM — the whole reference model family.

- ``odeint_dopri5_fused``: adaptive pass, differentiable replay, and the
  replay's backward sweep each one kernel. Semantics identical to
  dopri.py: torchdiffeq-default tolerances, one shared controller across
  the batch state (the reference's batched-Hopf behavior,
  scripts/bifurcation_ode.py:210), dense output at the requested ``ts``,
  gradients = discrete backprop through the frozen accepted-step sequence.
- ``sdeint_fused``: fixed-grid SRA1/Euler-Maruyama with chunked forward
  and backward kernels, same Brownian key convention as the scan path.

Both are parity-tested against the XLA paths for values and gradients.
Stage math is unrolled with Python-float tableau coefficients (Pallas
kernels cannot capture array constants; unrolling also removes the
``tensordot`` over stages). Kernel-visible drifts must avoid 1-D dots,
tiled reshapes, unequal lane concats, and row-index transposes — see the
batched drift variants in ``models/``.

Both composition orders differentiate: ``jit(grad(f))`` (what every
train step here does) AND ``grad(jit(f))``. The latter used to trip a
tracer-constant error in partial-eval ("No constant handler for
DynamicJaxprTracer") because the replay custom_vjp closed over the
traced ``step_times``/``naccept`` from the adaptive pass — a
closed-over tracer becomes a constant of the staged-out backward jaxpr
under an outer-jit transpose. Fixed (round 5) by threading them through
the custom_vjp as formal zero-cotangent arguments;
tests/test_fused.py::TestGradOfJit pins both orders for every engine.

Known limitation: ``vmap`` over a COMPILED fused solve requires >= 2-D
states (the ``(1, S)`` layout every kernel-safe batched drift already
uses). Mosaic batches each kernel ref by prepending a squeezed grid dim,
and the batched block satisfies the trailing-dims rule only when the
unbatched ref's trailing dims equal the array's — which is also why the
SMEM scalar refs (step offset/times) are shaped ``(1, n)``. 1-D states
work unvmapped and in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from columnflow.solvers.dopri import _error_ratio, _rms_norm
from columnflow.solvers.rk import DOPRI5, DOPRI5_DENSE_D

_SAFETY, _IFACTOR, _DFACTOR, _ORDER = 0.9, 10.0, 0.2, 5


def compile_or_fallback(fused_fn, fallback_thunk, example_args,
                        what="fused engine"):
    """AOT-compile a jitted fused-engine program; on backend compile
    failure, warn and return the fallback instead.

    Past the fused engine's VMEM ceiling (e.g. the deterministic parity
    step at >= 208 columns, BASELINE.md "Single-chip scale ceiling"),
    Mosaic refuses the kernel — previously surfaced to the user as a raw
    backend error (an opaque remote-compile HTTP 500 on the axon tunnel).
    Callers wrap their fused program here: on success the returned
    callable dispatches the probe's AOT-compiled executable for calls
    whose input shapes/dtypes match ``example_args`` (``lower().
    compile()`` does NOT populate the jit call cache — verified — so
    returning the bare jit function would compile the whole program
    twice) and falls through to the jit function for other shapes (e.g.
    a shorter tail block, which compiles once as before). A failed probe
    routes to ``fallback_thunk()`` (built lazily — typically the XLA
    engine) with a ``RuntimeWarning`` naming the likely ceiling.

    Only BACKEND failures fall back (advisor, round 4): Mosaic/XLA
    compile errors arrive as ``XlaRuntimeError``/``RuntimeError`` (or
    tunnel-transport ``OSError``s), which ``_is_backend_compile_error``
    accepts, plus anything whose message carries a Mosaic/XLA resource
    marker. Genuine programming errors (TypeError from a bad pytree,
    tracer shape errors, ...) re-raise unchanged instead of being
    misreported as the VMEM ceiling.

    Returns ``(fn, used_fused)``.
    """
    import warnings

    def _sig(tree):
        return jax.tree_util.tree_map(
            lambda x: (jnp.shape(x), str(jnp.result_type(x))), tree)

    try:
        compiled = fused_fn.lower(*example_args).compile()
    except Exception as e:
        if not _is_backend_compile_error(e):
            raise
        warnings.warn(
            f"{what}: fused kernel compilation failed "
            f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
            "XLA engine. At large model scales this is the fused VMEM "
            "ceiling (BASELINE.md 'Single-chip scale ceiling').",
            RuntimeWarning, stacklevel=2)
        return fallback_thunk(), False

    probe_sig = _sig(example_args)

    def run(*call_args):
        try:
            match = _sig(call_args) == probe_sig
        except Exception:
            match = False
        return compiled(*call_args) if match else fused_fn(*call_args)

    return run, True


_BACKEND_ERROR_MARKERS = (
    "RESOURCE_EXHAUSTED", "Mosaic", "mosaic", "vmem", "VMEM",
    "scoped", "XLA", "INTERNAL", "UNIMPLEMENTED", "HTTP",
)


def _is_backend_compile_error(e: Exception) -> bool:
    """Classify a ``lower().compile()`` failure: True for backend/XLA
    compile errors (XlaRuntimeError subclasses RuntimeError; the axon
    tunnel can surface remote-compile failures as OSError), False for
    Python-level programming errors unless their message carries an
    explicit Mosaic/XLA marker. ``NotImplementedError`` subclasses
    ``RuntimeError`` but is how JAX reports a MISSING RULE (batching,
    transpose, ...) for a primitive in the caller's own drift — a
    programming error that must re-raise, not a backend refusal."""
    if isinstance(e, NotImplementedError):
        msg = f"{type(e).__name__}: {e}"
        return any(m in msg for m in _BACKEND_ERROR_MARKERS)
    if isinstance(e, (RuntimeError, OSError, MemoryError)):
        return True
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _BACKEND_ERROR_MARKERS)


def _pow(x, p: float):
    """x**p for positive x via exp/log (Mosaic does not legalize powf)."""
    return jnp.exp(p * jnp.log(x))


def _next_step_size_k(h, error_ratio):
    # log(0) -> -inf -> exp(+inf) -> clipped to IFACTOR: same result as the
    # XLA path's explicit ratio<=0 branch.
    factor = jnp.clip(_SAFETY * _pow(error_ratio, -1.0 / _ORDER),
                      _DFACTOR, _IFACTOR)
    return h * factor


def _initial_step_size_k(func, t0, y0, f0, rtol, atol, *args):
    """Hairer's starting-step heuristic (kernel-safe pow)."""
    scale = atol + rtol * jnp.abs(y0)
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = func(t0 + h0, y1, *args)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        _pow(0.01 / jnp.maximum(d1, d2), 1.0 / _ORDER),
    )
    return jnp.minimum(100.0 * h0, h1)

# Tableau as Python floats (kernel-safe scalar constants).
_C = [float(x) for x in np.asarray(DOPRI5.c)]
_A = [[float(x) for x in row] for row in np.asarray(DOPRI5.a)]
_B = [float(x) for x in np.asarray(DOPRI5.b)]
_BE = [float(x) for x in np.asarray(DOPRI5.b_err)]
_D = [float(x) for x in np.asarray(DOPRI5_DENSE_D)]
_N_STAGES = len(_C)


def _rk_step_u(func, t, y, h, f0, args):
    """One dopri5 step, stages unrolled with scalar coefficients.

    Returns (y1, f_last, ks list). FSAL: f0 is stage 0; ks[-1] == f(t+h, y1).
    """
    ks = [f0]
    for i in range(1, _N_STAGES):
        yi = y
        for j, aij in enumerate(_A[i]):
            if aij != 0.0:
                yi = yi + (h * aij) * ks[j]
        ks.append(func(t + _C[i] * h, yi, *args))
    y1 = y
    for j, bj in enumerate(_B):
        if bj != 0.0:
            y1 = y1 + (h * bj) * ks[j]
    return y1, ks[-1], ks


def _err_u(h, ks):
    e = None
    for j, bej in enumerate(_BE):
        if bej != 0.0:
            term = (h * bej) * ks[j]
            e = term if e is None else e + term
    return e


def _dense_coeffs_u(y0, y1, h, ks):
    """Hairer CONTD5 coefficients, unrolled (see dopri.dense_coeffs)."""
    dy = y1 - y0
    r3 = h * ks[0] - dy
    r4 = dy - h * ks[-1] - r3
    r5 = None
    for j, dj in enumerate(_D):
        if dj != 0.0:
            term = (h * dj) * ks[j]
            r5 = term if r5 is None else r5 + term
    return (y0, dy, r3, r4, r5)


def _step_with_coeffs(func, t0, h, y, args):
    """Replay step: recompute FSAL stage 0, step, return (y1, coeffs(5,S))."""
    f0 = func(t0, y, *args)
    y1, _, ks = _rk_step_u(func, t0, y, h, f0, args)
    return y1, jnp.stack(_dense_coeffs_u(y, y1, h, ks))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _make_adaptive_kernel(func, prep, n_args, t_start, t_end, rtol, atol,
                          dt0, max_steps):
    def kernel(y0_ref, *refs):
        arg_refs = refs[:n_args]
        st_ref, stats_ref = refs[n_args], refs[n_args + 1]
        args = prep(tuple(r[:] for r in arg_refs))
        y0 = y0_ref[:]

        f0 = func(t_start, y0, *args)
        if dt0 is None:
            h0 = _initial_step_size_k(func, t_start, y0, f0, rtol, atol, *args)
        else:
            h0 = jnp.asarray(dt0, y0.dtype)
        h0 = jnp.minimum(h0, t_end - t_start)

        # Record accepted step times by scalar stores into the SMEM output
        # (Mosaic lowers neither `scatter` nor 1-D dynamic_update_slice on
        # register values; stateful ref stores at a dynamic index work).
        def fill(i, _):
            st_ref[i] = jnp.asarray(t_end, y0.dtype)
            return 0

        jax.lax.fori_loop(0, max_steps + 1, fill, 0)
        st_ref[0] = jnp.asarray(t_start, y0.dtype)

        def cond(s):
            t, y, f, h, na, nr = s
            return (t < t_end) & (na < max_steps) & (nr < 4 * max_steps + 64)

        def body(s):
            t, y, f, h, na, nr = s
            h = jnp.minimum(h, t_end - t)
            y1, f1, ks = _rk_step_u(func, t, y, h, f, args)
            ratio = _error_ratio(_err_u(h, ks), rtol, atol, y, y1)
            accept = ratio <= 1.0
            t_new = jnp.where(accept, t + h, t)
            y_new = jnp.where(accept, y1, y)
            f_new = jnp.where(accept, f1, f)
            na_new = na + accept.astype(jnp.int32)
            nr_new = nr + (1 - accept.astype(jnp.int32))
            # On reject this rewrites st_ref[na] with the unchanged t — a
            # no-op, so the store can be unconditional.
            st_ref[na_new] = t_new
            return (t_new, y_new, f_new, _next_step_size_k(h, ratio),
                    na_new, nr_new)

        init = (jnp.asarray(t_start, y0.dtype), y0, f0, h0,
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        t, _, _, _, na, nr = jax.lax.while_loop(cond, body, init)
        stats_ref[0] = na
        stats_ref[1] = nr
        stats_ref[2] = (t >= t_end).astype(jnp.int32)

    return kernel


def _make_replay_chunk_kernel(func, prep, n_args, chunk):
    """Forward replay over one chunk of the step sequence.

    Inputs: st (chunk+1,) step times, n (1,) iteration count (0 for chunks
    made entirely of max_steps padding — the loop body never runs, the
    carried state passes through, and the untouched ys/coeffs outputs are
    never read downstream; the count must otherwise be ``chunk``), y_in
    (state), arg refs. Keeping the kernel call itself unconditional matters:
    wrapping it in ``lax.cond`` moves its outputs onto XLA's scoped-vmem
    stack, which blows the 16 MB scoped limit for lane-padded small states.
    Outputs: y_out (state), ys_steps (chunk,)+state step-START states,
    coeffs (chunk, 5)+state dense coefficients.
    """

    def kernel(st_ref, n_ref, y_ref, *refs):
        arg_refs = refs[:n_args]
        yout_ref, ys_ref, co_ref = refs[n_args:]
        args = prep(tuple(r[:] for r in arg_refs))

        def body(k, y):
            t0 = st_ref[k]
            h = st_ref[k + 1] - t0
            ys_ref[k] = y
            y1, coeffs = _step_with_coeffs(func, t0, h, y, args)
            co_ref[k] = coeffs
            return y1

        y = jax.lax.fori_loop(0, n_ref[0], body, y_ref[:])
        yout_ref[:] = y

    return kernel


def _make_bwd_chunk_kernel(func, prep, n_args, chunk, diff_idx,
                          emit_steps=False):
    """Reverse sweep over one chunk: VJP of the replay steps via in-kernel
    ``jax.vjp`` of the full 6-stage step (drift included).

    Only args at positions ``diff_idx`` are differentiated — data args
    (stimulus tables, model anatomy) stay out of the vjp, which kills their
    per-stage cotangent temporaries (lane-padded small-trailing-dim tables
    would otherwise blow the VMEM budget 30x).

    ``emit_steps=True`` is the large-model variant (``arg_grads="outer"``):
    the kernel differentiates wrt the state only (pass ``diff_idx=()``) and
    additionally writes, per step, the cotangent entering from later steps
    (the cotangent on the step's OUTPUT state) so arg gradients can be
    recovered outside the kernel as step-batched VJPs — the per-stage arg
    cotangent temporaries never touch VMEM.

    Inputs: st (chunk+1,), n (1,) iteration count (0 skips a pure-padding
    chunk: ybar passes through, arg accumulators stay zero), ys_steps
    (chunk,)+S, coeffs_bar (chunk, 5)+S, ybar_in (S cotangent entering
    from the later chunk), arg refs.
    Outputs: ybar_out (S), [ybar_steps (chunk,)+S if emit_steps],
    cotangent accumulators for the diff args.
    """

    def kernel(st_ref, n_ref, ys_ref, cobar_ref, ybar_ref, *refs):
        arg_refs = refs[:n_args]
        ybarout_ref = refs[n_args]
        rest = refs[n_args + 1:]
        if emit_steps:
            ybarsteps_ref, abar_refs = rest[0], rest[1:]
        else:
            abar_refs = rest
        raw = tuple(r[:] for r in arg_refs)
        # emit mode differentiates wrt the state only, so ``prep`` can be
        # hoisted out of the loop; kernel mode needs it inside the vjp so
        # arg cotangents chain through the prepare transform.
        pargs = prep(raw) if emit_steps else None

        abar0 = tuple(jnp.zeros(r.shape, r.dtype) for r in abar_refs)

        def body(kk, carry):
            ybar, abars = carry
            k = chunk - 1 - kk
            t0 = st_ref[k]
            h = st_ref[k + 1] - t0
            y = ys_ref[k]
            if emit_steps:
                ybarsteps_ref[k] = ybar

            def stepfn(y, *diff_vals):
                if emit_steps:
                    return _step_with_coeffs(func, t0, h, y, pargs)
                full = list(raw)
                for i, v in zip(diff_idx, diff_vals):
                    full[i] = v
                return _step_with_coeffs(func, t0, h, y, prep(tuple(full)))

            _, vjp = jax.vjp(stepfn, y, *(raw[i] for i in diff_idx))
            grads = vjp((ybar, cobar_ref[k]))
            ybar_new = grads[0]
            abars_new = tuple(a + g for a, g in zip(abars, grads[1:]))
            return (ybar_new, abars_new)

        ybar, abars = jax.lax.fori_loop(0, n_ref[0], body,
                                        (ybar_ref[:], abar0))
        ybarout_ref[:] = ybar
        for r, a in zip(abar_refs, abars):
            r[:] = a

    return kernel


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

_VMEM = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

# The TPU v5e has 128 MiB of physical VMEM per core; Mosaic's DEFAULT
# scoped-vmem budget is a conservative 16 MiB, and THAT default — not the
# hardware — was the fused engine's 104-column scale ceiling (round-3
# BASELINE.md: the (P, P) operand plus its in-kernel hi/mid/lo split
# exceeds 16 MiB at 208 columns). Raising the budget extends VMEM-resident
# weights to ~312 columns (measured, round 4); genuinely over-budget
# programs still fail at compile time and route through
# ``compile_or_fallback``. Override with COLUMNFLOW_VMEM_LIMIT_MB.
import os as _os

_VMEM_LIMIT_BYTES = int(_os.environ.get("COLUMNFLOW_VMEM_LIMIT_MB",
                                        "100")) << 20


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _flatten_for_kernel(user_func, args, nondiff_args, prepare=None):
    """Flatten pytree ``args`` into kernel-ready array operands.

    args may be arbitrary pytrees (a params dict, a model-constants
    NamedTuple); kernels take flat array operands, so flatten here and
    rebuild inside the traced drift. Host scalars (python/numpy numbers)
    stay baked into the kernel as constants — Pallas allows scalar captures
    but rejects captured array constants, so every array leaf becomes a
    kernel input; 0-d array leaves ride along as (1,) inputs.

    ``prepare``, if given, maps the original user args to the tuple of args
    the drift actually consumes (``func(t, y, *prepare(*args))``). Kernels
    run it ONCE per invocation, outside their step loops — the place to
    hoist loop-invariant transforms of the args (e.g. bf16 hi/lo weight
    splits) that would otherwise be rematerialized every stage. Gradients
    still target the ORIGINAL args; autodiff chains through ``prepare``.

    Returns (call(t, y, *prepared), prep(dyn_leaf_tuple)->prepared,
    dyn_leaf_tuple, diff_idx) where diff_idx indexes the dyn leaves
    belonging to differentiable original args (ownership is positional in
    tree_flatten order).
    """
    nondiff = set(nondiff_args)
    flat_args, args_treedef = jax.tree_util.tree_flatten(args)
    owners = []
    for ai, a in enumerate(args):
        owners.extend([ai] * len(jax.tree_util.tree_leaves(a)))
    is_static = [isinstance(l, (int, float, bool, np.floating, np.integer))
                 for l in flat_args]
    dyn_in, dyn_diff = [], []
    for leaf, st, owner in zip(flat_args, is_static, owners):
        if not st:
            a = jnp.asarray(leaf)
            dyn_in.append(a.reshape(1) if a.ndim == 0 else a)
            dyn_diff.append(owner not in nondiff
                            and jnp.issubdtype(a.dtype, jnp.inexact))
    diff_idx = tuple(i for i, d in enumerate(dyn_diff) if d)
    dyn_shapes = [jnp.ndim(l) == 0
                  for l, st in zip(flat_args, is_static) if not st]

    def prep(dyn_leaves):
        leaves, it = [], iter(zip(dyn_leaves, dyn_shapes))
        for leaf, st in zip(flat_args, is_static):
            if st:
                leaves.append(leaf)
            else:
                a, was_scalar = next(it)
                leaves.append(a[0] if was_scalar else a)
        args_u = jax.tree_util.tree_unflatten(args_treedef, leaves)
        return tuple(prepare(*args_u)) if prepare is not None else tuple(args_u)

    def call(t, y, *prepared):
        return user_func(t, y, *prepared)

    return call, prep, tuple(dyn_in), diff_idx


def odeint_dopri5_fused(
    func: Callable,
    y0: jax.Array,
    ts,
    *args,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    dt0: float | None = None,
    max_steps: int = 2048,
    chunk: int | None = None,
    nondiff_args: tuple = (),
    arg_grads: str = "auto",
    prepare: Callable | None = None,
    select_func: Callable | None = None,
    select_args: tuple | None = None,
    select_prepare: Callable | None = None,
    interpret: bool = False,
):
    """Adaptive dopri5 with every hot loop inside a Pallas kernel.

    Drop-in for ``odeint(..., method="dopri5", adjoint="replay")`` when
    ``ts`` is concrete, the state and ``args`` fit VMEM, and ``func`` is
    pure jnp. Gradients flow to ``y0`` and every entry of ``args`` except
    positions listed in ``nondiff_args`` (mark data args — stimulus tables,
    model anatomy — both for speed and because their per-stage cotangent
    temporaries can blow the VMEM budget when lane-padded).

    ``chunk`` is the replay-kernel step-chunk length (``max_steps`` is
    rounded up to a multiple); ``None`` sizes it so the per-chunk blocks
    (~6x state per step forward, ~11x with the backward cotangents) stay
    well under the VMEM budget.

    ``arg_grads`` picks where gradients wrt ``args`` are computed:

    - ``"kernel"``: inside the backward Pallas kernel via in-kernel
      ``jax.vjp`` of the whole step (best for small params — no extra
      memory traffic, one kernel does everything);
    - ``"outer"``: the backward kernel sweeps only the state cotangent and
      emits it per step; arg gradients are then recovered OUTSIDE the
      kernel as step-batched VJPs (big MXU matmuls streaming from HBM).
      Removes the in-kernel per-stage arg-cotangent temporaries entirely —
      required for large models whose weight matrices would blow VMEM
      (the ~6 RK stages each materialize a full arg-sized cotangent);
    - ``"auto"``: "outer" when the differentiable args exceed ~1 MB.

    ``prepare(*args) -> new_args_tuple``, if given, is run ONCE per kernel
    invocation (outside the step loops) and the drift is called on its
    result: ``func(t, y, *prepare(*args))``. Use it to hoist loop-invariant
    arg transforms — e.g. bf16 hi/lo weight splits for f32-accurate bf16
    matmuls — that would otherwise be rematerialized every RK stage (or, for
    f32 ``HIGHEST`` matmuls, allocated as per-stage decomposition buffers by
    the compiler, which OOMs VMEM for large weight matrices). Gradients
    still flow to the ORIGINAL args, chained through ``prepare``.

    ``select_func``/``select_args``/``select_prepare`` override the drift
    the step-size SELECTION pass uses (e.g. a single-pass bf16 drift at
    large pop counts, where selection is ~30% of the MXU passes) — the
    same design as the stochastic engine's ``select_drift``
    (solvers/sde_adaptive.py): only the frozen accepted grid changes;
    values and gradients always come from the full-precision ``func``.
    Selection takes no gradients, so ``select_args`` needs no diff
    bookkeeping.
    """
    # ts must be concrete (the integration span is baked into the kernels);
    # np.asarray fails loudly on a traced ts.
    ts_host = np.asarray(ts)
    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    ts = jnp.asarray(ts_host, y0.dtype)
    user_args = args  # pre-flatten pytrees (the select_func default below)
    func, prep, args, diff_idx = _flatten_for_kernel(func, args,
                                                      nondiff_args, prepare)
    n_args = len(args)
    t_start = float(ts_host[0])
    t_end = float(ts_host[-1])
    if chunk is None:
        # Per chunk step: ys (1x) + coeffs (5x) fwd; bwd adds coeffs_bar (5x)
        # plus per-step vjp temporaries. Budget ~2 MB for the 11x blocks.
        # Floor of 4 (not 16): at very large states (e.g. 832-pop parity,
        # 40 KB per batched state) a 16-step chunk's coeffs block alone is
        # 3.2 MB and the replay kernel blows the 16 MB VMEM budget.
        state_bytes = 4 * int(np.prod(y0.shape))
        chunk = int(max(4, min(256, (2 << 20) // (11 * state_bytes))))
    n_chunks = -(-max_steps // chunk)
    max_steps = n_chunks * chunk
    S = y0.shape

    if arg_grads not in ("auto", "kernel", "outer"):
        raise ValueError(f"unknown arg_grads mode: {arg_grads!r}")
    if arg_grads == "auto":
        diff_bytes = sum(args[i].dtype.itemsize * int(np.prod(args[i].shape))
                         for i in diff_idx)
        arg_grads = "outer" if diff_bytes > (1 << 20) else "kernel"
    if not diff_idx:
        arg_grads = "kernel"  # nothing to lift out of the kernel

    # --- adaptive pass (defines the frozen step sequence; no gradients) ---
    if select_func is not None:
        # Default select_args = the ORIGINAL (pre-flatten) user args, so a
        # selection drift with the same signature as ``func`` works for
        # pytree args too.
        s_args_in = user_args if select_args is None else tuple(select_args)
        s_func, s_prep, s_dyn, _ = _flatten_for_kernel(
            select_func, s_args_in,
            tuple(range(len(s_args_in))),  # selection takes no gradients
            select_prepare)
    else:
        s_func, s_prep, s_dyn = func, prep, args
    adaptive = pl.pallas_call(
        _make_adaptive_kernel(s_func, s_prep, len(s_dyn), t_start, t_end,
                              rtol, atol, dt0, max_steps),
        out_shape=(jax.ShapeDtypeStruct((max_steps + 1,), y0.dtype),
                   jax.ShapeDtypeStruct((3,), jnp.int32)),
        in_specs=[_VMEM()] * (1 + len(s_dyn)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=_cparams(),
        interpret=interpret,
    )
    step_times, stats = adaptive(jax.lax.stop_gradient(y0),
                                 *jax.lax.stop_gradient(s_dyn))
    step_times = jax.lax.stop_gradient(step_times)
    naccept = jax.lax.stop_gradient(stats[0])

    replay_call = pl.pallas_call(
        _make_replay_chunk_kernel(func, prep, n_args, chunk),
        out_shape=(jax.ShapeDtypeStruct(S, y0.dtype),
                   jax.ShapeDtypeStruct((chunk,) + S, y0.dtype),
                   jax.ShapeDtypeStruct((chunk, 5) + S, y0.dtype)),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                  + [_VMEM()] * (1 + n_args)),
        out_specs=(_VMEM(),) * 3,
        compiler_params=_cparams(),
        interpret=interpret,
    )
    if arg_grads == "outer":
        # State-only backward sweep; per-step output cotangents are emitted
        # so arg gradients can be recovered outside the kernel.
        bwd_call = pl.pallas_call(
            _make_bwd_chunk_kernel(func, prep, n_args, chunk, (),
                                   emit_steps=True),
            out_shape=(jax.ShapeDtypeStruct(S, y0.dtype),
                       jax.ShapeDtypeStruct((chunk,) + S, y0.dtype)),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                      + [_VMEM()] * (3 + n_args)),
            out_specs=(_VMEM(), _VMEM()),
            compiler_params=_cparams(),
            interpret=interpret,
        )
    else:
        bwd_call = pl.pallas_call(
            _make_bwd_chunk_kernel(func, prep, n_args, chunk, diff_idx),
            out_shape=((jax.ShapeDtypeStruct(S, y0.dtype),)
                       + tuple(jax.ShapeDtypeStruct(args[i].shape,
                                                    args[i].dtype)
                               for i in diff_idx)),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                      + [_VMEM()] * (3 + n_args)),
            out_specs=(_VMEM(),) * (1 + len(diff_idx)),
            compiler_params=_cparams(),
            interpret=interpret,
        )

    def _outer_arg_grads(ys_flat, ybar_steps, cobar_flat, args,
                         step_times, naccept):
        """Arg gradients as step-batched VJPs in XLA (MXU-friendly).

        For each accepted step k: args cotangent += vjp of the replay step
        at (y_k, t_k, h_k) evaluated on (ybar on y_{k+1} from later steps,
        cobar on the step's dense coefficients) — exactly the pair the
        in-kernel path feeds its vjp, so gradients match up to fp
        reassociation. Padded steps (k >= naccept) have h = 0 and zero
        cotangents, contributing exact zeros. Blocked `scan` of `vmap`
        bounds the temporary (block, *arg) cotangent stacks.
        """
        st0 = step_times[:max_steps]
        st1 = step_times[1:max_steps + 1]

        def one(st0k, st1k, yk, ybark, cobark):
            def stepfn(*diff_vals):
                full = list(args)
                for i, v in zip(diff_idx, diff_vals):
                    full[i] = v
                return _step_with_coeffs(func, st0k, st1k - st0k, yk,
                                         prep(tuple(full)))

            _, vjp = jax.vjp(stepfn, *(args[i] for i in diff_idx))
            return vjp((ybark, cobark))

        def blk(acc, b):
            def run(acc):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * chunk,
                                                            chunk)
                g = jax.vmap(one)(sl(st0), sl(st1), sl(ys_flat),
                                  sl(ybar_steps), sl(cobar_flat))
                return jax.tree_util.tree_map(
                    lambda a, gg: a + jnp.sum(gg, 0), acc, g)

            return jax.lax.cond(b * chunk < naccept, run, lambda a: a,
                                acc), None

        init = tuple(jnp.zeros(args[i].shape, args[i].dtype)
                     for i in diff_idx)
        acc, _ = jax.lax.scan(blk, init, jnp.arange(n_chunks))
        return acc

    # ``step_times``/``naccept`` ride as EXPLICIT custom_vjp arguments
    # (zero cotangents), not closures: a closed-over traced array becomes
    # a constant of the staged-out backward jaxpr under an outer-jit
    # transpose, which is exactly the ``grad(jit(f))`` "No constant
    # handler for DynamicJaxprTracer" trap (round-4 VERDICT #5, now
    # fixed — both composition orders work; tests/test_fused.py
    # TestGradOfJit).
    @jax.custom_vjp
    def replay(y0, step_times, naccept, *args):
        coeffs, _ = _replay_fwd_impl(y0, step_times, naccept, *args)
        return coeffs

    def _chunk_iters(c, naccept):
        # Chunks whose first step is already past the accepted range are
        # pure padding (h = 0 throughout, y unchanged, coefficients never
        # read downstream): the kernels run 0 loop iterations for them.
        # With the default max_steps safety margin this skips a third or
        # more of the replay/backward sweeps.
        return jnp.where(c * chunk < naccept, chunk, 0).astype(
            jnp.int32).reshape(1)

    def _replay_fwd_impl(y0, step_times, naccept, *args):
        def body(y, c):
            st_c = jax.lax.dynamic_slice(step_times, (c * chunk,),
                                         (chunk + 1,))
            y1, ys_c, co_c = replay_call(st_c, _chunk_iters(c, naccept),
                                         y, *args)
            return y1, (ys_c, co_c)

        _, (ys_steps, coeffs) = jax.lax.scan(
            body, y0, jnp.arange(n_chunks)
        )  # (n_chunks, chunk, ...) each
        return (coeffs.reshape((max_steps, 5) + S),
                ys_steps.reshape((max_steps,) + S))

    def replay_fwd(y0, step_times, naccept, *args):
        coeffs, ys_steps = _replay_fwd_impl(y0, step_times, naccept, *args)
        return coeffs, (ys_steps, step_times, naccept, args)

    def replay_bwd(res, coeffs_bar):
        ys_steps, step_times, naccept, args = res

        def _zero_cots():
            # step_times is float (zero cotangent); naccept is int32
            # (tangent dtype float0 per the custom_vjp contract).
            return (jnp.zeros_like(step_times),
                    np.zeros(np.shape(naccept), dtype=jax.dtypes.float0))

        if arg_grads == "outer":
            ys_c = ys_steps.reshape((n_chunks, chunk) + S)
            cobar_c = coeffs_bar.reshape((n_chunks, chunk, 5) + S)

            def body_outer(ybar, c):
                ci = n_chunks - 1 - c
                st_c = jax.lax.dynamic_slice(step_times, (ci * chunk,),
                                             (chunk + 1,))
                ybar_new, ybar_steps_c = bwd_call(
                    st_c, _chunk_iters(ci, naccept), ys_c[ci], cobar_c[ci],
                    ybar, *args)
                return ybar_new, ybar_steps_c

            ybar, ybar_steps_rev = jax.lax.scan(
                body_outer, jnp.zeros(S, y0.dtype), jnp.arange(n_chunks)
            )  # chunks stacked in reverse order
            ybar_steps = ybar_steps_rev[::-1].reshape((max_steps,) + S)
            abars = _outer_arg_grads(
                ys_steps.reshape((max_steps,) + S), ybar_steps,
                coeffs_bar.reshape((max_steps, 5) + S), args,
                step_times, naccept,
            )
            full = [jnp.zeros(a.shape, a.dtype) for a in args]
            for i, g in zip(diff_idx, abars):
                full[i] = g
            return (ybar,) + _zero_cots() + tuple(full)

        ys_steps = ys_steps.reshape((n_chunks, chunk) + S)
        coeffs_bar = coeffs_bar.reshape((n_chunks, chunk, 5) + S)

        def body(carry, c):
            ybar, abars = carry
            ci = n_chunks - 1 - c
            st_c = jax.lax.dynamic_slice(step_times, (ci * chunk,),
                                         (chunk + 1,))
            out = bwd_call(st_c, _chunk_iters(ci, naccept), ys_steps[ci],
                           coeffs_bar[ci], ybar, *args)
            ybar_new = out[0]
            abars_new = tuple(a + g for a, g in zip(abars, out[1:]))
            return (ybar_new, abars_new), None

        init = (jnp.zeros(S, y0.dtype),
                tuple(jnp.zeros(args[i].shape, args[i].dtype)
                      for i in diff_idx))
        (ybar, abars), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        full = [jnp.zeros(a.shape, a.dtype) for a in args]
        for i, g in zip(diff_idx, abars):
            full[i] = g
        return (ybar,) + _zero_cots() + tuple(full)

    replay.defvjp(replay_fwd, replay_bwd)

    all_coeffs = replay(y0, step_times, naccept, *args)  # (max_steps,5)+S

    # --- dense-output interpolation (XLA; differentiable wrt coeffs) ---
    idx = jnp.clip(
        jnp.searchsorted(step_times, ts, side="right") - 1, 0, naccept - 1
    ).astype(jnp.int32)
    t0s = step_times[idx]
    hs = step_times[idx + 1] - t0s
    theta = jnp.where(hs > 0, (ts - t0s) / jnp.where(hs > 0, hs, 1.0), 0.0)
    r1, r2, r3, r4, r5 = jnp.moveaxis(all_coeffs[idx], 1, 0)
    th = theta.reshape(theta.shape + (1,) * y0.ndim)
    s1 = 1.0 - th
    ys = r1 + th * (r2 + s1 * (r3 + th * (r4 + s1 * r5)))
    return ys.at[0].set(y0)


# ---------------------------------------------------------------------------
# Fused fixed-step SDE solver
# ---------------------------------------------------------------------------


def _make_sde_step(drift, diffusion, method, safe_h):
    """One fixed-or-variable step ``step(t0, h, y, i1, i10, args)``.

    ``safe_h=True`` (variable-step mode) guards the SRA1 ``i10 / h``
    against h == 0 padding steps (which carry i1 = i10 = 0 and must be
    exact no-ops); the uniform-grid path keeps the plain division so its
    kernels are unchanged bit-for-bit.
    """

    def step(t0, h, y, i1, i10, args):
        if method == "euler":
            g = diffusion(t0, y, *args)
            return y + h * drift(t0, y, *args) + g * i1
        if method == "milstein":
            # In-kernel jax.jvp for the diffusion-derivative term, matching
            # sde._milstein_step (diagonal/scalar Ito noise).
            g, dg_g = jax.jvp(
                lambda y_: diffusion(t0, y_, *args), (y,),
                (diffusion(t0, y, *args),),
            )
            return (y + h * drift(t0, y, *args) + g * i1
                    + 0.5 * dg_g * (i1 * i1 - h))
        # SRA1 (strong order 1.5, additive noise), matching sde._sra1_step.
        h_div = jnp.where(h > 0, h, 1.0) if safe_h else h
        i10_h = i10 / h_div
        f1 = drift(t0, y, *args)
        g_end = diffusion(t0 + h, y, *args)
        h2 = y + 0.75 * h * f1 + 1.5 * i10_h * g_end
        f2 = drift(t0 + 0.75 * h, h2, *args)
        g_start = diffusion(t0, y, *args)
        return (y + h * (f1 / 3.0 + 2.0 * f2 / 3.0)
                + (i1 - i10_h) * g_end + i10_h * g_start)

    return step


def _make_sde_chunk_kernel(drift, diffusion, prep, n_args, chunk, h,
                           t_base, method, variable_h=False):
    """Forward SDE chunk: fixed-grid steps with everything VMEM-resident.

    Inputs: offs (SMEM (1, 1) i32 global step offset), [n (SMEM (1, 1)
    iteration count) + st (1, chunk+1) step times when ``variable_h`` is
    True, or + t0s/hs ((chunk,) + TB VMEM per-lane step times/sizes) when
    ``"lanes"``], y_in (S), i1/i10 chunk ((chunk,) + noise shape), arg
    refs. Outputs: y_out (S), ys (chunk,)+S (states AFTER each step).

    With ``variable_h`` the per-step t0/h come from the st ref (h == 0
    steps are exact no-ops), enabling the adaptive replay to run its
    frozen non-uniform accepted-step sequence inside the kernel. The n
    count must be 0 (pure-padding chunk: the loop never runs, the carried
    state passes through, the untouched ys rows are never read
    downstream) or ``chunk``.

    ``variable_h="lanes"`` is the lane-batched variant: the state S packs
    B independent lanes on its LEADING axis, and each step reads a
    per-lane time/size block TB = (B,) + (1,)*(S.ndim-1) that broadcasts
    against S — B frozen accepted-step grids advance in one kernel, the
    weight matrices read from HBM once per chunk instead of once per
    lane per chunk.
    """
    step = _make_sde_step(drift, diffusion, method, safe_h=bool(variable_h))

    def kernel(off_ref, *in_refs):
        st_ref = t0s_ref = hs_ref = None
        if variable_h == "lanes":
            n_ref, t0s_ref, hs_ref, y_ref, i1_ref, i10_ref = in_refs[:6]
            refs = in_refs[6:]
        elif variable_h:
            n_ref, st_ref, y_ref, i1_ref, i10_ref = in_refs[:5]
            refs = in_refs[5:]
        else:
            n_ref = None
            y_ref, i1_ref, i10_ref = in_refs[:3]
            refs = in_refs[3:]
        arg_refs = refs[:n_args]
        yout_ref, ys_ref = refs[n_args:]
        args = prep(tuple(r[:] for r in arg_refs))
        if not variable_h:
            t_off = off_ref[0, 0].astype(jnp.float32) * h + t_base

        def body(k, y):
            if variable_h == "lanes":
                t0 = t0s_ref[k]
                hk = hs_ref[k]
            elif variable_h:
                t0 = st_ref[0, k]
                hk = st_ref[0, k + 1] - t0
            else:
                t0 = t_off + k.astype(jnp.float32) * h
                hk = h
            y1 = step(t0, hk, y, i1_ref[k], i10_ref[k], args)
            ys_ref[k] = y1
            return y1

        n_iter = chunk if n_ref is None else n_ref[0, 0]
        y_fin = jax.lax.fori_loop(0, n_iter, body, y_ref[:])
        yout_ref[:] = y_fin
        if n_ref is not None:
            # Skipped-chunk rows (n == 0) hold the carried state — exactly
            # the h == 0 no-op semantics — so downstream reads (the outer
            # arg-grad sweep linearizes at these states) see finite,
            # correct padding values instead of uninitialized memory.
            def fill(k, _):
                ys_ref[k] = y_fin
                return 0

            jax.lax.fori_loop(n_iter, chunk, fill, 0)

    return kernel, step


def _make_sde_bwd_chunk_kernel(step, prep, n_args, chunk, h, t_base,
                               diff_idx, emit_steps=False,
                               variable_h=False):
    """Reverse SDE chunk: in-kernel ``jax.vjp`` of the step.

    Inputs: offs (SMEM (1, 1)), [st (1, chunk+1) step times when
    ``variable_h``], ys_prev (chunk,)+S (states BEFORE each step),
    ysbar (chunk,)+S (cotangents on states AFTER each step), ybar_in (S),
    i1/i10 chunks, arg refs. Outputs: ybar_out, diff-arg accumulators.

    ``emit_steps=True`` is the large-model variant (``arg_grads="outer"``,
    same idea as the ODE backward kernel): differentiate wrt the state only
    (pass ``diff_idx=()``) and write, per step, the TOTAL cotangent on the
    step's output (downstream + direct) so arg gradients can be recovered
    outside the kernel as step-batched VJPs.
    """

    def kernel(off_ref, *in_refs):
        st_ref = t0s_ref = hs_ref = None
        if variable_h == "lanes":
            n_ref, t0s_ref, hs_ref = in_refs[:3]
            in_refs = in_refs[3:]
        elif variable_h:
            n_ref, st_ref = in_refs[:2]
            in_refs = in_refs[2:]
        else:
            n_ref = None
        ysprev_ref, ysbar_ref, ybar_ref, i1_ref, i10_ref = in_refs[:5]
        refs = in_refs[5:]
        arg_refs = refs[:n_args]
        ybarout_ref = refs[n_args]
        rest = refs[n_args + 1:]
        if emit_steps:
            ybarsteps_ref, abar_refs = rest[0], rest[1:]
        else:
            abar_refs = rest
        raw = tuple(r[:] for r in arg_refs)
        pargs = prep(raw) if emit_steps else None
        if not variable_h:
            t_off = off_ref[0, 0].astype(jnp.float32) * h + t_base

        abar0 = tuple(jnp.zeros(r.shape, r.dtype) for r in abar_refs)

        def body(kk, carry):
            ybar, abars = carry
            k = chunk - 1 - kk
            if variable_h == "lanes":
                t0 = t0s_ref[k]
                hk = hs_ref[k]
            elif variable_h:
                t0 = st_ref[0, k]
                hk = st_ref[0, k + 1] - t0
            else:
                t0 = t_off + k.astype(jnp.float32) * h
                hk = h
            y = ysprev_ref[k]
            i1 = i1_ref[k]
            i10 = i10_ref[k]
            seed = ybar + ysbar_ref[k]
            if emit_steps:
                ybarsteps_ref[k] = seed

            def stepfn(y, *diff_vals):
                if emit_steps:
                    return step(t0, hk, y, i1, i10, pargs)
                full = list(raw)
                for i, v in zip(diff_idx, diff_vals):
                    full[i] = v
                return step(t0, hk, y, i1, i10, prep(tuple(full)))

            _, vjp = jax.vjp(stepfn, y, *(raw[i] for i in diff_idx))
            grads = vjp(seed)
            abars = tuple(a + g for a, g in zip(abars, grads[1:]))
            return (grads[0], abars)

        # n == 0 (pure-padding chunk, n is 0 or chunk): ybar passes
        # through, arg accumulators stay zero, emit rows untouched (never
        # read — the outer arg-grad sweep is linear in the seeds and the
        # padded rows carry zero seeds). The count skips the TOP of the
        # chunk, which is why partial counts are not supported.
        n_iter = chunk if n_ref is None else n_ref[0, 0]
        if emit_steps:
            # Padded emit rows ARE read by the outer step-batched arg-grad
            # sweep (it is gated per BLOCK, not per solver chunk, and the
            # two grids differ) — zero-fill so skipped chunks contribute
            # exact zeros rather than garbage.
            def zfill(k, _):
                ybarsteps_ref[k] = jnp.zeros_like(ybar_ref[:])
                return 0

            jax.lax.fori_loop(n_iter, chunk, zfill, 0)
        ybar, abars = jax.lax.fori_loop(0, n_iter, body,
                                        (ybar_ref[:], abar0))
        ybarout_ref[:] = ybar
        for r, a in zip(abar_refs, abars):
            r[:] = a

    return kernel


def sdeint_fused(
    drift: Callable,
    diffusion: Callable,
    y0: jax.Array,
    ts,
    key,
    *args,
    method: str = "srk",
    noise_shape: tuple = (),
    noise_pack=None,
    nondiff_args: tuple = (),
    chunk: int | None = None,
    prepare: Callable | None = None,
    arg_grads: str = "auto",
    interpret: bool = False,
    ts_steps=None,
    bptt_every: int | None = None,
    n_real=None,
    vjp_drift: Callable | None = None,
    vjp_diffusion: Callable | None = None,
    vjp_prepare: Callable | None = None,
):
    """Fixed-grid Ito SDE integration, every step loop a Pallas kernel.

    Generic counterpart of ``kernels.column_step``'s hand-written WTA
    rollout: any pure-jnp drift/diffusion pair whose operands fit VMEM.
    ``method``: "srk" (SRA1, strong 1.5, ADDITIVE noise — diffusion must not
    depend on y, the reference regime), "milstein" (strong 1.0,
    multiplicative diagonal/scalar noise; diffusion derivative via
    in-kernel ``jax.jvp``) or "euler" (Euler-Maruyama, general).
    Brownian increments come from ``solvers.sde._brownian_pack`` on ``key``
    (identical convention to the ``lax.scan`` path, so trajectories match
    pathwise), or from an explicit ``noise_pack`` (i1, i10) with leading
    axis len(ts)-1. Gradients flow to y0 and diff args; noise is data.

    ``arg_grads`` as in ``odeint_dopri5_fused``: "kernel" computes arg
    gradients inside the backward kernel; "outer" sweeps only the state
    cotangent in-kernel and recovers arg gradients outside as step-batched
    VJPs (required for models whose per-step arg-cotangent temporaries
    would blow VMEM); "auto" picks "outer" above ~1 MB of diff args.

    ``ts_steps`` switches to VARIABLE-step mode (the adaptive replay's
    engine): a traced ``(n_steps + 1,)`` array of step times consumed
    inside the kernels (per-step t0/h; h == 0 padding steps are exact
    no-ops). ``ts``/``key`` are ignored and an explicit ``noise_pack``
    (per-interval i1/i10, leading axis n_steps) is required. Returns the
    state at every ts_steps point.

    A 2-D ``ts_steps`` of shape (B, n_steps + 1) selects LANE-BATCHED
    variable-step mode: ``y0``'s leading axis packs B independent lanes,
    each advancing its OWN step grid row — one kernel sweep for the whole
    batch, reading the weight matrices from HBM once per chunk instead of
    once per lane per chunk (the batched adaptive replay's engine). The
    per-step t0/h enter the step functions shaped (B,) + (1,)*(y0.ndim-1),
    so drift/diffusion must broadcast a per-lane time against the state
    (true of any model whose time dependence is elementwise/interpolation,
    e.g. ``network_drift_premixed`` + ``interp_knots``). ``noise_pack``
    i1/i10 are per-lane, shape (n_steps, B) (or broadcastable to
    (n_steps,) + y0.shape); padded rows must carry h == 0 AND zero noise.
    ``ys[i, b]`` is lane b's state at ITS OWN ``ts_steps[b, i]``.

    ``n_real`` (variable-step modes only): traced count of leading REAL
    steps — everything beyond it must be h == 0 padding. Solver chunks
    past it are skipped at runtime inside the kernels (loop count 0; with
    the default max_steps safety margin that is a third or more of the
    sweep). Per-sample replays pass 2*naccept (per-lane under vmap);
    the lane-batched replay passes the batch max. Skipped rows still
    return the carried state (the h == 0 no-op semantics), so the
    solution values are identical with or without ``n_real``.

    ``vjp_drift``/``vjp_diffusion`` (+ optional ``vjp_prepare``), with
    ``arg_grads="outer"``: a cheaper drift formulation used ONLY inside
    the outer step-batched ARG-gradient VJPs. Values, the in-kernel
    state-cotangent sweep, and the seeds all stay on the exact drift;
    only the (d step / d args)^T contraction evaluates the substitute —
    e.g. a bf16-matmul variant whose weight-gradient GEMMs run in one
    native MXU pass instead of the f32-emulating 6-pass split (the
    dominant term of the 104-column backward, RESULTS.md). Must consume
    the SAME ``args`` (gradients flow to the original leaves, chaining
    through any in-function casts).

    ``bptt_every=W`` truncates reverse-mode gradient chains every ~W steps
    (the solver chunk is capped at W and truncation lands on chunk
    boundaries): the state cotangent is zeroed there in the backward
    sweep. Use for long-horizon chaotic dynamics whose pathwise cotangents
    grow exponentially past f32 range (see solvers/sde_adaptive.py).

    Returns ys with ys[0] == y0, shape (len(ts),) + y0.shape.
    """
    from columnflow.solvers.sde import _brownian_pack

    if method not in ("srk", "euler", "milstein"):
        raise ValueError(f"unknown fused SDE method: {method!r}")
    if arg_grads not in ("auto", "kernel", "outer"):
        raise ValueError(f"unknown arg_grads mode: {arg_grads!r}")
    y0 = jnp.asarray(y0)
    if not jnp.issubdtype(y0.dtype, jnp.inexact):
        y0 = y0.astype(jnp.float32)
    variable_h = ts_steps is not None
    if variable_h:
        if noise_pack is None:
            raise ValueError("ts_steps mode requires an explicit noise_pack")
        ts_steps = jnp.asarray(ts_steps, y0.dtype)
        if ts_steps.ndim == 2:
            variable_h = "lanes"
            if int(ts_steps.shape[0]) != int(y0.shape[0]):
                raise ValueError(
                    f"lane-batched ts_steps rows ({ts_steps.shape[0]}) must "
                    f"match y0's leading lane axis ({y0.shape[0]})")
            n_steps = int(ts_steps.shape[1]) - 1
        else:
            n_steps = int(ts_steps.shape[0]) - 1
        h = None
        t_base = None
    else:
        ts_host = np.asarray(ts)
        n_steps = int(ts_host.shape[0]) - 1
        h = float(ts_host[1] - ts_host[0])
        t_base = float(ts_host[0])

    if noise_pack is None:
        _, i1, i10, _, _ = _brownian_pack(
            key, jnp.asarray(ts_host, y0.dtype), noise_shape, y0.dtype
        )
    else:
        i1, i10 = noise_pack
    # Broadcast noise against the state once, outside the kernels, so the
    # kernel step math is shape-stable (scalar noise -> (T-1,) + S).
    i1 = jnp.broadcast_to(
        jnp.reshape(i1, i1.shape + (1,) * (y0.ndim - (i1.ndim - 1))),
        (n_steps,) + y0.shape,
    ).astype(y0.dtype)
    i10 = jnp.broadcast_to(
        jnp.reshape(i10, i10.shape + (1,) * (y0.ndim - (i10.ndim - 1))),
        (n_steps,) + y0.shape,
    ).astype(y0.dtype)

    wrapped_drift, prep, dyn, diff_idx = _flatten_for_kernel(
        drift, args, nondiff_args, prepare)
    wrapped_diff, _, _, _ = _flatten_for_kernel(diffusion, args,
                                                nondiff_args, prepare)
    vjp_step = vjp_prep = None
    if vjp_drift is not None:
        if vjp_diffusion is None:
            # The step evaluates drift and diffusion on ONE prepared-args
            # tuple; a fallback to the exact diffusion would hand it
            # vjp_prepare'd args. Require the pair.
            raise ValueError("vjp_drift requires vjp_diffusion (both "
                             "consume the vjp_prepare'd args)")
        v_drift, vjp_prep, _, _ = _flatten_for_kernel(
            vjp_drift, args, nondiff_args, vjp_prepare)
        v_diff, _, _, _ = _flatten_for_kernel(
            vjp_diffusion, args, nondiff_args, vjp_prepare)
        vjp_step = _make_sde_step(v_drift, v_diff, method,
                                  safe_h=bool(variable_h))
    n_args = len(dyn)
    S = y0.shape

    # Lane-batched per-step times/sizes: (n_steps,) + TB where
    # TB = (B,) + (1,)*(y0.ndim-1) broadcasts against the state inside the
    # step functions. Per-sample variable mode keeps its scalar st track.
    if variable_h == "lanes":
        tb = (S[0],) + (1,) * (y0.ndim - 1)
        t0s_all = jnp.reshape(ts_steps[:, :-1].T, (n_steps,) + tb)
        hs_all = jnp.reshape((ts_steps[:, 1:] - ts_steps[:, :-1]).T,
                             (n_steps,) + tb)
    if variable_h:
        n_real_arr = jnp.asarray(n_steps if n_real is None else n_real,
                                 jnp.int32)
    elif n_real is not None:
        raise ValueError("n_real applies to variable-step modes only")

    if arg_grads == "auto":
        diff_bytes = sum(dyn[i].dtype.itemsize * int(np.prod(dyn[i].shape))
                         for i in diff_idx)
        # "outer" for big args (VMEM) and for ANY 1-D diff arg: a 1-D
        # cotangent output batches to a (B, n) block under vmap, which
        # fails Mosaic's trailing-dims rule — the outer path emits only
        # >=2-D step cotangents, so vmapped compiled solves keep working.
        # A vjp substitute also forces "outer" (it is where it applies).
        arg_grads = ("outer"
                     if (diff_bytes > (1 << 20)
                         or vjp_drift is not None
                         or any(dyn[i].ndim < 2 for i in diff_idx))
                     else "kernel")
    if not diff_idx:
        arg_grads = "kernel"
    if vjp_drift is not None and arg_grads != "outer":
        raise ValueError("vjp_drift applies to the outer arg-gradient "
                         f"sweep only (arg_grads resolved to {arg_grads!r})")

    if bptt_every is not None and bptt_every < 1:
        raise ValueError(f"bptt_every must be >= 1, got {bptt_every}")
    if chunk is None:
        state_bytes = 4 * int(np.prod(y0.shape))
        # Floor 4 (not 16) for large states — same reasoning as the
        # odeint fused chunk floor: the lane-batched 104-column replay at
        # B >= 16 lanes carries 160+ KB states, and a 16-step chunk's
        # backward blocks (~11x per step) alone blow the VMEM budget.
        # Measured (round-5 throughput sweep): the floor-16 default
        # capped the fused engine at 8 lanes; floor 4 extends it to 32+.
        # bptt truncation is unaffected (kc rounds bptt_every/chunk).
        floor = 4 if state_bytes > (32 << 10) else 16
        chunk = int(max(floor, min(1024, (2 << 20) // (6 * state_bytes))))
    if bptt_every is not None:
        # Truncation lands on chunk boundaries, so the chunk must not
        # exceed the requested window — otherwise small windows on small
        # states (auto-chunk up to 1024) would silently truncate nothing.
        chunk = min(chunk, max(1, bptt_every))
    chunk = min(chunk, n_steps)

    # Truncated BPTT (``bptt_every`` steps, rounded to chunk granularity):
    # zero the state cotangent crossing out of every kc-th chunk boundary
    # in the backward sweep — bounds exponential pathwise cotangent growth
    # on chaotic dynamics to one window (see sde_adaptive._replay_pass).
    kc = None if bptt_every is None else max(1, round(bptt_every / chunk))

    def _trunc(ci, ybar):
        if kc is None:
            return ybar
        return jnp.where(ci % kc == 0, jnp.zeros_like(ybar), ybar)
    n_full = n_steps // chunk
    rem = n_steps - n_full * chunk

    step_fns = {}

    # st (1, chunk+1) travels in SMEM: the kernels read it only at dynamic
    # scalar indices (st_ref[0, k]), which Mosaic rejects for VMEM vectors
    # ("cannot statically prove that index ... is a multiple of 1024").
    # offs/n/st are 2-D so their SMEM blocks survive vmap batching (the
    # per-sample adaptive replay vmaps this whole solver; Mosaic requires
    # a batched block's trailing dims to equal the array's). Lane-batched
    # per-step t0/h blocks are VMEM (read at dynamic LEADING indices,
    # which is fine) — SMEM would need scalar-assembled vectors.
    if variable_h == "lanes":
        n_smem, n_vmem_extra = 2, 2
    elif variable_h:
        n_smem, n_vmem_extra = 3, 0
    else:
        n_smem, n_vmem_extra = 1, 0

    def make_calls(c):
        fwd_kernel, step = _make_sde_chunk_kernel(
            wrapped_drift, wrapped_diff, prep, n_args, c, h, t_base, method,
            variable_h=variable_h,
        )
        step_fns[c] = step
        fwd = pl.pallas_call(
            fwd_kernel,
            out_shape=(jax.ShapeDtypeStruct(S, y0.dtype),
                       jax.ShapeDtypeStruct((c,) + S, y0.dtype)),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
                      + [_VMEM()] * (n_vmem_extra + 3 + n_args)),
            out_specs=(_VMEM(), _VMEM()),
            compiler_params=_cparams(),
            interpret=interpret,
        )
        if arg_grads == "outer":
            bwd = pl.pallas_call(
                _make_sde_bwd_chunk_kernel(step, prep, n_args, c, h, t_base,
                                           (), emit_steps=True,
                                           variable_h=variable_h),
                out_shape=(jax.ShapeDtypeStruct(S, y0.dtype),
                           jax.ShapeDtypeStruct((c,) + S, y0.dtype)),
                in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
                          + [_VMEM()] * (n_vmem_extra + 5 + n_args)),
                out_specs=(_VMEM(), _VMEM()),
                compiler_params=_cparams(),
                interpret=interpret,
            )
        else:
            bwd = pl.pallas_call(
                _make_sde_bwd_chunk_kernel(step, prep, n_args, c, h, t_base,
                                           diff_idx,
                                           variable_h=variable_h),
                out_shape=((jax.ShapeDtypeStruct(S, y0.dtype),)
                           + tuple(jax.ShapeDtypeStruct(dyn[i].shape,
                                                        dyn[i].dtype)
                                   for i in diff_idx)),
                in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
                          + [_VMEM()] * (n_vmem_extra + 5 + n_args)),
                out_specs=(_VMEM(),) * (1 + len(diff_idx)),
                compiler_params=_cparams(),
                interpret=interpret,
            )
        return fwd, bwd

    def var_extras(noise, start, c):
        """The variable-mode kernel inputs after offs: the (1, 1) SMEM
        iteration count (0 for chunks whose first step is already past the
        real range — pure h = 0 padding, skipped at runtime) and the
        per-chunk step-time blocks."""
        if not variable_h:
            return ()
        n_r = noise[-1]
        n_c = jnp.where(jnp.asarray(start) < n_r, c, 0).astype(
            jnp.int32).reshape(1, 1)
        if variable_h == "lanes":
            t0s, hs = noise[2], noise[3]
            return (n_c,
                    jax.lax.dynamic_slice_in_dim(t0s, start, c),
                    jax.lax.dynamic_slice_in_dim(hs, start, c))
        # (1, c+1): 2-D so the SMEM block survives vmap batching —
        # the batched block's trailing dims must equal the array's
        # (Mosaic's last-two-dims rule; same reason offs is (1, 1)).
        st = noise[2]
        return (n_c,
                jax.lax.dynamic_slice(st, (start,), (c + 1,))[None, :])

    fwd_call, bwd_call = make_calls(chunk)
    if rem:
        fwd_rem, bwd_rem = make_calls(rem)

    # The noise pack (and variable-step times + real-step count) travel
    # through the custom_vjp as a formal argument, NOT a closure: a
    # closed-over tracer in the bwd rule leaks under vmap (per-sample
    # adaptive replays vmap this whole solver).
    if variable_h == "lanes":
        noise_res = (i1, i10, t0s_all, hs_all, n_real_arr)
    elif variable_h:
        noise_res = (i1, i10, ts_steps, n_real_arr)
    else:
        noise_res = (i1, i10)

    @jax.custom_vjp
    def rollout(y0, noise, *dyn):
        return _fwd_impl(y0, noise, *dyn)

    def _fwd_impl(y0, noise, *dyn):
        i1, i10 = noise[0], noise[1]

        def body(y, c):
            off = (c * chunk).reshape(1, 1).astype(jnp.int32)
            i1_c = jax.lax.dynamic_slice_in_dim(i1, c * chunk, chunk)
            i10_c = jax.lax.dynamic_slice_in_dim(i10, c * chunk, chunk)
            y1, ys_c = fwd_call(off, *var_extras(noise, c * chunk, chunk),
                                y, i1_c, i10_c, *dyn)
            return y1, ys_c

        y_last, chunks = jax.lax.scan(body, y0, jnp.arange(n_full))
        ys = chunks.reshape((n_full * chunk,) + S)
        if rem:
            off = jnp.asarray([[n_full * chunk]], jnp.int32)
            _, ys_r = fwd_rem(off, *var_extras(noise, n_full * chunk, rem),
                              y_last, i1[n_full * chunk:],
                              i10[n_full * chunk:], *dyn)
            ys = jnp.concatenate([ys, ys_r], axis=0)
        return jnp.concatenate([y0[None], ys], axis=0)  # (T,) + S

    def fwd(y0, noise, *dyn):
        ys = _fwd_impl(y0, noise, *dyn)
        return ys, (ys, noise, dyn)

    def _outer_sde_arg_grads(ys_prev, seeds, dyn_args, i1, i10, noise):
        """Arg gradients as step-batched VJPs outside the kernels.

        ``seeds`` are the total per-step output cotangents emitted by the
        state-only backward kernel — the same seed the in-kernel path feeds
        its vjp, so gradients match up to fp reassociation. The vjp is
        linear in the seed, so zero-padded steps contribute exact zeros
        (skipped-chunk rows carry kernel-zero-filled seeds), and blocks
        fully past ``n_real`` are skipped at runtime. With ``vjp_drift``
        set, the contraction evaluates the substitute formulation (the
        seeds and states are still the exact solve's).
        """
        step = step_fns[chunk] if vjp_step is None else vjp_step
        prep_a = prep if vjp_prep is None else vjp_prep
        n_r = noise[-1] if variable_h else None
        if variable_h == "lanes":
            t0s, hs = noise[2], noise[3]
        elif variable_h:
            st = noise[2]
            t0s = st[:-1]
            hs = st[1:] - st[:-1]
        else:
            t0s = (t_base + h * jnp.arange(n_steps)).astype(y0.dtype)
            hs = jnp.full((n_steps,), h, y0.dtype)

        def one(t0k, hk, yk, i1k, i10k, seedk):
            def stepfn(*diff_vals):
                full = list(dyn_args)
                for i, v in zip(diff_idx, diff_vals):
                    full[i] = v
                return step(t0k, hk, yk, i1k, i10k, prep_a(tuple(full)))

            _, vjp = jax.vjp(stepfn, *(dyn_args[i] for i in diff_idx))
            return vjp(seedk)

        blk_n = min(256, n_steps)
        nb = -(-n_steps // blk_n)
        pad = nb * blk_n - n_steps

        def padz(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        t0p, hp, ysp, i1p, i10p, sdp = (padz(t0s), padz(hs), padz(ys_prev),
                                        padz(i1), padz(i10), padz(seeds))

        def blk(acc, b):
            def run(acc):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * blk_n,
                                                            blk_n)
                g = jax.vmap(one)(sl(t0p), sl(hp), sl(ysp), sl(i1p),
                                  sl(i10p), sl(sdp))
                return jax.tree_util.tree_map(
                    lambda a, gg: a + jnp.sum(gg, 0), acc, g)

            if n_r is None:
                return run(acc), None
            # Blocks fully past the real-step range carry zero seeds —
            # skip them at runtime (scalar predicate -> real branch).
            return jax.lax.cond(b * blk_n < n_r, run, lambda a: a,
                                acc), None

        init = tuple(jnp.zeros(dyn_args[i].shape, dyn_args[i].dtype)
                     for i in diff_idx)
        acc, _ = jax.lax.scan(blk, init, jnp.arange(nb))
        return acc

    def bwd(res, ys_bar):
        ys, noise, dyn = res
        i1, i10 = noise[0], noise[1]
        noise_zeros = jax.tree_util.tree_map(jnp.zeros_like, noise)
        ys_prev = ys[:-1]  # state BEFORE each step
        ysbar_steps = ys_bar[1:]
        ybar = jnp.zeros(S, y0.dtype)

        if arg_grads == "outer":
            seeds_rem = None
            if rem:
                off = jnp.asarray([[n_full * chunk]], jnp.int32)
                ybar, seeds_rem = bwd_rem(
                    off, *var_extras(noise, n_full * chunk, rem),
                    ys_prev[n_full * chunk:],
                    ysbar_steps[n_full * chunk:], ybar,
                    i1[n_full * chunk:], i10[n_full * chunk:], *dyn)
                ybar = _trunc(n_full, ybar)

            def body(ybar, c):
                ci = n_full - 1 - c
                off = (ci * chunk).reshape(1, 1).astype(jnp.int32)
                i1_c = jax.lax.dynamic_slice_in_dim(i1, ci * chunk, chunk)
                i10_c = jax.lax.dynamic_slice_in_dim(i10, ci * chunk, chunk)
                ysp = jax.lax.dynamic_slice_in_dim(ys_prev, ci * chunk,
                                                   chunk)
                ysb = jax.lax.dynamic_slice_in_dim(ysbar_steps, ci * chunk,
                                                   chunk)
                ybar_new, seeds_c = bwd_call(
                    off, *var_extras(noise, ci * chunk, chunk),
                    ysp, ysb, ybar, i1_c, i10_c, *dyn)
                return _trunc(ci, ybar_new), seeds_c

            ybar, seeds_rev = jax.lax.scan(body, ybar, jnp.arange(n_full))
            seeds = jnp.flip(seeds_rev, 0).reshape((n_full * chunk,) + S)
            if rem:
                seeds = jnp.concatenate([seeds, seeds_rem], axis=0)
            abars = _outer_sde_arg_grads(ys_prev, seeds, dyn, i1, i10,
                                         noise)
            ybar = ybar + ys_bar[0]
            full = [jnp.zeros(a.shape, a.dtype) for a in dyn]
            for i, g in zip(diff_idx, abars):
                full[i] = g
            return (ybar, noise_zeros) + tuple(full)

        abars = tuple(jnp.zeros(dyn[i].shape, dyn[i].dtype) for i in diff_idx)
        if rem:
            off = jnp.asarray([[n_full * chunk]], jnp.int32)
            out = bwd_rem(off, *var_extras(noise, n_full * chunk, rem),
                          ys_prev[n_full * chunk:],
                          ysbar_steps[n_full * chunk:], ybar,
                          i1[n_full * chunk:], i10[n_full * chunk:], *dyn)
            ybar = _trunc(n_full, out[0])
            abars = tuple(a + g for a, g in zip(abars, out[1:]))

        def body(carry, c):
            ybar, abars = carry
            ci = n_full - 1 - c
            off = (ci * chunk).reshape(1, 1).astype(jnp.int32)
            i1_c = jax.lax.dynamic_slice_in_dim(i1, ci * chunk, chunk)
            i10_c = jax.lax.dynamic_slice_in_dim(i10, ci * chunk, chunk)
            ysp = jax.lax.dynamic_slice_in_dim(ys_prev, ci * chunk, chunk)
            ysb = jax.lax.dynamic_slice_in_dim(ysbar_steps, ci * chunk, chunk)
            out = bwd_call(off, *var_extras(noise, ci * chunk, chunk), ysp,
                           ysb, ybar, i1_c, i10_c, *dyn)
            abars = tuple(a + g for a, g in zip(abars, out[1:]))
            return (_trunc(ci, out[0]), abars), None

        (ybar, abars), _ = jax.lax.scan(body, (ybar, abars),
                                        jnp.arange(n_full))
        ybar = ybar + ys_bar[0]
        full = [jnp.zeros(a.shape, a.dtype) for a in dyn]
        for i, g in zip(diff_idx, abars):
            full[i] = g
        return (ybar, noise_zeros) + tuple(full)

    rollout.defvjp(fwd, bwd)
    return rollout(y0, noise_res, *dyn)
