"""Adaptive-step SDE integration (torchsde's ``adaptive=True`` capability;
reference: the commented-in option at scripts/parity_ode.py:234 and the
README note that adaptive stepping avoids firing-rate artefacts at high cost,
README.md:27-29).

Method: step doubling — one full Euler-Maruyama/Milstein step vs two half
steps driven by the SAME Brownian path (increments drawn from a
``VirtualBrownianTree``, so W(t) is consistent no matter how the step
sequence evolves), local extrapolation from the half-step solution, and an
I-controller on the scaled error. Outputs at ``ts`` by linear interpolation
between accepted points (the correct interpolation order for an SDE path).

This path is for inference/simulation: the while_loop is not
reverse-differentiable (training uses the fixed-step ``sdeint``, like the
reference's actual training runs).

Caveat (applies to any naive step-doubling on a FIXED Brownian path,
torchsde's included): with MULTIPLICATIVE noise, Euler's step-doubling
estimate is dominated by the Milstein term, so steps are accepted exactly
where the local increments happen to be small — adverse selection that stalls
pathwise convergence. Use method="milstein" (default) for multiplicative
noise; "euler" is fine for additive noise (the reference's column models all
have constant diffusion).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from columnflow.solvers.brownian import VirtualBrownianTree

_SAFETY = 0.9
_IFACTOR = 5.0
_DFACTOR = 0.2


def _em_step(drift, diffusion, t, y, h, dw, args):
    return y + h * drift(t, y, *args) + diffusion(t, y, *args) * dw


def _milstein_step(drift, diffusion, t, y, h, dw, args):
    g, dg_g = jax.jvp(
        lambda y_: diffusion(t, y_, *args), (y,), (diffusion(t, y, *args),)
    )
    return y + h * drift(t, y, *args) + g * dw + 0.5 * dg_g * (dw * dw - h)


class _Carry(NamedTuple):
    t0: jax.Array
    y0: jax.Array
    t1: jax.Array
    y1: jax.Array
    h: jax.Array
    naccept: jax.Array
    nreject: jax.Array


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
    max_steps: int = 16384,
    levy_depth: int = 20,
):
    """Adaptive Ito SDE integration with scalar noise on [ts[0], ts[-1]].

    Returns ys (len(ts),) + y0.shape; ys[0] == y0. The trajectory is a pure
    function of ``key`` (one underlying Brownian path).
    """
    if method == "euler":
        stepper, err_exp = _em_step, 1.0
    elif method == "milstein":
        stepper, err_exp = _milstein_step, 1.0 / 1.5
    else:
        raise ValueError(f"unknown adaptive SDE method: {method!r}")

    ts = jnp.asarray(ts, dtype=y0.dtype)
    t_start, t_end = ts[0], ts[-1]
    # t0/t1 may be tracers (sdeint_adaptive called under jit with traced ts);
    # VirtualBrownianTree only uses them in jnp ops.
    tree = VirtualBrownianTree(
        t0=t_start, t1=t_end, key=key, depth=levy_depth, dtype=y0.dtype,
    )

    h0 = jnp.asarray(dt0 if dt0 is not None
                     else (t_end - t_start) / (4.0 * ts.shape[0]), y0.dtype)

    def attempt(t, y, h):
        w0 = tree.evaluate(t)
        wm = tree.evaluate(t + 0.5 * h)
        w1 = tree.evaluate(t + h)
        y_full = stepper(drift, diffusion, t, y, h, w1 - w0, args)
        y_half = stepper(drift, diffusion, t, y, 0.5 * h, wm - w0, args)
        y_half2 = stepper(drift, diffusion, t + 0.5 * h, y_half, 0.5 * h,
                          w1 - wm, args)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_half2))
        err = jnp.sqrt(jnp.mean(jnp.square((y_half2 - y_full) / scale)))
        return y_half2, err

    def body(c: _Carry):
        h = jnp.minimum(c.h, t_end - c.t1)
        y_new, err = attempt(c.t1, c.y1, h)
        accept = err <= 1.0
        factor = jnp.where(
            err <= 0.0, _IFACTOR,
            jnp.clip(_SAFETY * err ** (-err_exp), _DFACTOR, _IFACTOR),
        )
        return _Carry(
            t0=jnp.where(accept, c.t1, c.t0),
            y0=jnp.where(accept, c.y1, c.y0),
            t1=jnp.where(accept, c.t1 + h, c.t1),
            y1=jnp.where(accept, y_new, c.y1),
            h=h * factor,
            naccept=c.naccept + accept.astype(jnp.int32),
            nreject=c.nreject + 1 - accept.astype(jnp.int32),
        )

    def advance_until(c: _Carry, t_target):
        return jax.lax.while_loop(
            lambda s: (s.t1 < t_target)
            & (s.naccept + s.nreject < max_steps),
            body, c,
        )

    init = _Carry(t0=t_start, y0=y0, t1=t_start, y1=y0, h=h0,
                  naccept=jnp.zeros((), jnp.int32),
                  nreject=jnp.zeros((), jnp.int32))

    def scan_fn(c, t_out):
        c = advance_until(c, t_out)
        span = jnp.where(c.t1 > c.t0, c.t1 - c.t0, 1.0)
        theta = jnp.clip((t_out - c.t0) / span, 0.0, 1.0)
        y_out = c.y0 + theta * (c.y1 - c.y0)
        return c, y_out

    _, ys = jax.lax.scan(scan_fn, init, ts[1:])
    return jnp.concatenate([y0[None], ys], axis=0)
