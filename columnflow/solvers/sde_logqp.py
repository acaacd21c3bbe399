"""KL-divergence (log q/p ratio) path alongside SDE integration.

torchsde's ``sdeint(..., logqp=True)`` — the training signal of latent SDEs
(Li et al. 2020, "Scalable Gradients for SDEs"; torchsde's flagship
application). Given a posterior drift f, a PRIOR drift h, and shared
diffusion g, Girsanov's theorem gives the pathwise KL integrand

    d(log q/p) = 1/2 ||u(t, y)||^2 dt,      u = g(t, y)^+ (f(t, y) - h(t, y))

(g^+ the pseudo-inverse; for diagonal noise u = (f - h) / g elementwise, for
scalar noise u = g.(f-h) / ||g||^2 — absolute continuity requires f - h in
range(g), the caller's modeling obligation, same as torchsde).

Implementation: the KL channel is appended to the state as one extra pytree
leaf with zero diffusion, and the ENTIRE augmented system integrates through
``sdeint`` — so every method (euler/milstein/srk, both calculi), noise kind,
and gradient path (replay, reversible, adjoint-by-augmentation) applies
unchanged; higher-order steppers quadrature the KL integral with their own
stage evaluations. torchsde does the same augmentation internally.

The reference never trains latent SDEs, but it imports torchsde wholesale
(scripts/parity_ode.py:11); this completes that engine surface.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from columnflow.solvers.sde import sdeint


def _kl_integrand(drift, prior_drift, diffusion, noise, t, y, args):
    f = drift(t, y, *args)
    h = prior_drift(t, y, *args)
    g = diffusion(t, y, *args)
    d = f - h
    if noise == "diagonal":
        u = d / g
        return 0.5 * jnp.sum(u * u)
    if noise == "scalar":
        # one Brownian channel whose column is g: least-squares u
        gg = jnp.sum(g * g)
        u = jnp.sum(g * d) / jnp.maximum(gg, jnp.finfo(d.dtype).tiny)
        return 0.5 * u * u
    if noise == "general":
        u = jnp.linalg.pinv(g) @ d
        return 0.5 * jnp.sum(u * u)
    raise ValueError(f"unknown noise kind: {noise!r}")


def sdeint_logqp(
    drift: Callable,
    diffusion: Callable,
    prior_drift: Callable,
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    *args,
    noise: str = "diagonal",
    **kwargs,
):
    """Integrate dy = f dt + g dW and the KL path against the prior drift h.

    Args:
        drift: posterior drift f(t, y, *args) — generates the trajectory.
        diffusion: shared diffusion g(t, y, *args).
        prior_drift: prior drift h(t, y, *args) — the KL reference measure.
        noise: "diagonal" | "scalar" | "general" (see ``sdeint``). With
            "general", u solves g u = f - h by pseudo-inverse (flat 1-D
            state only, like sdeint's general noise).
        **kwargs: forwarded to ``sdeint`` (method, sde_type, additive,
            remat, noise_pack, grad_free, dt — the KL integrates on the
            dt-refined internal grid, increments still reported between
            consecutive OUTPUT times).

    Returns:
        (ys, log_ratio_increments): ys as ``sdeint`` returns, plus the
        (T-1,) KL increments between consecutive output times —
        ``log_ratio_increments.sum()`` is the Monte-Carlo KL(q || p)
        contribution of this path (torchsde's logqp=True return).
    """
    if noise == "general":
        # flat state (sdeint's own general-noise restriction); augment by
        # one extra Brownian-channel-free dimension via a (d+1, m) diffusion.
        y0 = jnp.asarray(y0)
        d = y0.shape[0]

        def drift_aug(t, ya, *a):
            y = ya[:d]
            kl = _kl_integrand(drift, prior_drift, diffusion, noise, t, y, a)
            return jnp.concatenate([drift(t, y, *a), kl[None]])

        def diffusion_aug(t, ya, *a):
            g = diffusion(t, ya[:d], *a)
            return jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])

        ya0 = jnp.concatenate([y0.astype(jnp.result_type(y0, jnp.float32)),
                               jnp.zeros(1, y0.dtype)])
        ys_aug = sdeint(drift_aug, diffusion_aug, ya0, ts, key, *args,
                        noise=noise, **kwargs)
        ys, kl_path = ys_aug[:, :d], ys_aug[:, d]
        return ys, kl_path[1:] - kl_path[:-1]

    def drift_aug(t, ya, *a):
        y = ya["y"]
        return {
            "y": drift(t, y, *a),
            "kl": _kl_integrand(drift, prior_drift, diffusion, noise, t, y,
                                a),
        }

    def diffusion_aug(t, ya, *a):
        g = diffusion(t, ya["y"], *a)
        return {"y": g, "kl": jnp.zeros((), g.dtype)}

    kl0 = jnp.zeros((), jnp.result_type(jax.tree_util.tree_leaves(y0)[0],
                                        jnp.float32))
    ys_aug = sdeint(drift_aug, diffusion_aug, {"y": y0, "kl": kl0}, ts, key,
                    *args, noise=noise, **kwargs)
    kl_path = ys_aug["kl"]
    return ys_aug["y"], kl_path[1:] - kl_path[:-1]
