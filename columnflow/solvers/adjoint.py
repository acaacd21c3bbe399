"""Continuous-adjoint gradients for the adaptive ODE solver.

Implements the augmented backward ODE (Pontryagin adjoint) as a
``jax.custom_vjp``: memory is O(|state|) instead of O(steps x |state|),
the scalable path for long horizons. This provides what the reference
imported but never used (``odeint_adjoint``, reference:
scripts/wta_ode.py:10, scripts/xor_ode.py:3) as a first-class, working
feature.

The backward pass integrates, per output interval, the augmented state
(y, a_y, a_args) with dynamics (f, -a^T df/dy, -a^T df/dargs), seeding
a_y with the incoming cotangent at each output time; output-time gradients
are g_i . f(t_i, y_i).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from columnflow.solvers.dopri import _rms_norm, odeint_dopri5


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def odeint_backsolve(
    func: Callable, rtol: float, atol: float, dt0, max_steps: int,
    seminorm: bool, y0, ts, args
):
    """Adaptive dopri5 whose reverse-mode gradient is the continuous adjoint.

    ``args`` is a tuple pytree of parameters passed as ``func(t, y, *args)``.
    ``seminorm=True`` (torchdiffeq's ``adjoint_options=dict(norm='seminorm')``)
    makes the BACKWARD solve's error controller ignore the parameter-adjoint
    block of the augmented state: parameter adjoints are integrals (no
    feedback into the dynamics), so controlling their local error buys
    nothing and inflates the backward step count.
    """
    return odeint_dopri5(
        lambda t, y: func(t, y, *args), y0, ts,
        rtol=rtol, atol=atol, dt0=dt0, max_steps=max_steps, differentiable=False,
    )


def _fwd(func, rtol, atol, dt0, max_steps, seminorm, y0, ts, args):
    ys = odeint_backsolve(func, rtol, atol, dt0, max_steps, seminorm,
                          y0, ts, args)
    return ys, (ys, ts, args)


def _bwd(func, rtol, atol, dt0, max_steps, seminorm, res, g):
    ys, ts, args = res
    # Augmented raveled layout is (y, a_y, a_args): the first 2*ny entries
    # are the state + state-adjoint block the seminorm controller tracks.
    ny = ys[0].size
    norm = (lambda e: _rms_norm(e[: 2 * ny])) if seminorm else None

    def f_eval(t, y):
        return func(t, y, *args)

    def back_interval(carry, idx):
        """Integrate the augmented system from ts[idx] down to ts[idx-1]."""
        y_bar, args_bar, t0_bar = carry
        # Seed the adjoint with the cotangent at this output time.
        y_bar = y_bar + g[idx]
        t_bar_i = jnp.vdot(g[idx], f_eval(ts[idx], ys[idx]))
        t0_bar = t0_bar - t_bar_i

        aug0, unravel = ravel_pytree((ys[idx], y_bar, args_bar))

        def back_dyn(s, z):
            # Substitution t = -s turns the decreasing-time integration into
            # an increasing-time one: dz/ds = -aug_dot(-s, z).
            t = -s
            y, a, _ = unravel(z)
            f, vjp_fn = jax.vjp(lambda y_, args_: func(t, y_, *args_), y, args)
            a_y, a_args = vjp_fn(a)
            flat, _ = ravel_pytree((-f, a_y, a_args))
            return flat

        span = jnp.stack([-ts[idx], -ts[idx - 1]])
        z1 = odeint_dopri5(
            back_dyn, aug0, span,
            rtol=rtol, atol=atol, dt0=None, max_steps=max_steps,
            differentiable=False, norm=norm,
        )[-1]
        _, y_bar, args_bar = unravel(z1)
        return (y_bar, args_bar, t0_bar), t_bar_i

    n = ts.shape[0]
    zero_args = jax.tree_util.tree_map(jnp.zeros_like, args)
    init = (jnp.zeros_like(ys[0]), zero_args, jnp.zeros((), ys.dtype))
    (y0_bar, args_bar, t0_bar), t_bars = jax.lax.scan(
        back_interval, init, jnp.arange(n - 1, 0, -1)
    )
    # t_bars was produced for idx = n-1 .. 1; assemble ts_bar in forward order.
    ts_bar = jnp.concatenate([t0_bar[None], t_bars[::-1]])
    return (y0_bar, ts_bar, args_bar)


odeint_backsolve.defvjp(_fwd, _bwd)
