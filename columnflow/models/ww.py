"""Wong-Wang (2006) two-pool decision-making model — WTA training-target
generator (reference: src/ww_model.py:52-143).

The reference steps this model in a Python/numpy loop (15,001 steps x 3,010
samples, its hot loop #0). Here one ``lax.scan`` covers the full three-phase
protocol and ``vmap`` batches samples — the whole dataset generates in one
jitted call.

Faithfulness note: the reference *constructs* exponential-Euler propagator
factors but its ``update`` uses plain explicit Euler on s and I_noise
(src/ww_model.py:91-101; the ``prop`` dict at :70-75 is never read). We
reproduce the plain-Euler update. Default ``sigma_noise=0.0`` matches the
reference's parameters (src/ww_model.py:66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAMMA = 0.641
TAU_S = 0.1
TAU_AMPA = 0.002
J_WITHIN = 0.2609
J_BETWEEN = 0.0497
J_EXT = 5.2e-4
I_0 = 0.3255
DT = 1e-3

_W = jnp.asarray([[J_WITHIN, -J_BETWEEN], [-J_BETWEEN, J_WITHIN]])


def _f(x):
    """Wong-Wang f-I curve, a=270, b=108, d=0.154 (src/ww_model.py:88-89),
    with the removable singularity at a*x = b guarded (limit 1/d)."""
    num = 270.0 * x - 108.0
    den = 1.0 - jnp.exp(-0.154 * num)
    near = jnp.abs(den) < 1e-12
    return jnp.where(near, 1.0 / 0.154, num / jnp.where(near, 1.0, den))


def wong_wang_sim(key, mus, num_steps_per_phase, dt=DT, sigma_noise=0.0):
    """Simulate the DM model over phases with per-phase external drives.

    Args:
        key: PRNG key for the AMPA noise (irrelevant when sigma_noise == 0).
        mus: (num_phases, 2) external drive (muA, muB) per phase.
        num_steps_per_phase: steps per phase (reference: int(5/dt) + 1).

    Returns firing rates with shape (num_phases * num_steps_per_phase, 2),
    recorded after each update (src/ww_model.py:103-109).
    """
    n_phases = mus.shape[0]
    total = n_phases * num_steps_per_phase
    phase_of_step = jnp.repeat(jnp.arange(n_phases), num_steps_per_phase)
    mu_of_step = mus[phase_of_step]  # (total, 2)
    dsig = jnp.sqrt(dt / TAU_AMPA) * sigma_noise
    noise = dsig * jax.random.normal(key, (total, 2), dtype=jnp.float32)

    def step(carry, xs):
        s, i_noise = carry
        mu, xi = xs
        i_ext = J_EXT * mu
        i_rec = jnp.matmul(_W, s, precision=jax.lax.Precision.HIGHEST)
        i_noise = i_noise + dt * (I_0 - i_noise) / TAU_AMPA + xi
        x = i_rec + i_ext + i_noise
        r = _f(x)
        s = s + dt * (-s / TAU_S + (1.0 - s) * GAMMA * r)
        return (s, i_noise), r

    k_init, _ = jax.random.split(key)
    init = (0.1 * jnp.ones(2),
            sigma_noise * jax.random.normal(k_init, (2,), dtype=jnp.float32))
    _, rates = jax.lax.scan(step, init, (mu_of_step, noise))
    return rates


def wong_wang_three_phase(key, mu_a, mu_b, phase_time=5.0, dt=DT,
                          sigma_noise=0.0):
    """The reference's run_sim protocol (src/ww_model.py:111-125): pre-stimulus
    (0, 0), stimulus (muA, muB), post-stimulus (0, 0), 5 s each."""
    steps = int(phase_time / dt) + 1
    mus = jnp.stack([
        jnp.zeros(2),
        jnp.stack([mu_a, mu_b]),
        jnp.zeros(2),
    ])
    return wong_wang_sim(key, mus, steps, dt=dt, sigma_noise=sigma_noise)
