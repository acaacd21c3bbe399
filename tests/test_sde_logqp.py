"""sdeint_logqp: the Girsanov KL path (torchsde's ``logqp=True``, the latent
SDE training signal of Li et al. 2020; torchsde imported wholesale at
scripts/parity_ode.py:11).

Oracles: u = 0 when prior == posterior (increments exactly zero); constant
drift mismatch over constant diffusion gives the closed-form increments
1/2 (c/sigma)^2 h for every method/calculus; an Euler manual-scan equality
for state-dependent u; the analytic expected KL between two OU laws
(Girsanov + the OU variance integral) hit by Monte Carlo; gradients flow and
match finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers.sde_logqp import sdeint_logqp


class TestClosedForm:
    def test_zero_when_prior_equals_posterior(self):
        drift = lambda t, y: -y + 0.3
        diff = lambda t, y: 0.5 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 101)
        ys, inc = sdeint_logqp(drift, diff, drift, jnp.ones(3), ts,
                               jax.random.PRNGKey(0), method="euler")
        assert np.asarray(jnp.abs(inc)).max() == 0.0
        assert ys.shape == (101, 3)

    @pytest.mark.parametrize("method,sde_type,additive", [
        ("euler", "ito", False),
        ("milstein", "ito", False),
        ("srk", "ito", True),
        ("srk", "ito", False),
        ("heun", "stratonovich", False),
        ("midpoint", "stratonovich", False),
    ])
    def test_constant_mismatch_exact(self, method, sde_type, additive):
        """f - h = c, g = sigma constants -> increments = 0.5 (c/sigma)^2 h
        exactly, for every stepper (stage quadrature of a constant)."""
        c, sigma = 0.8, 0.5
        drift = lambda t, y: -y + c
        prior = lambda t, y: -y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 51)
        _, inc = sdeint_logqp(drift, diff, prior, jnp.ones(2), ts,
                              jax.random.PRNGKey(1), method=method,
                              sde_type=sde_type, additive=additive,
                              noise="diagonal")
        h = float(ts[1] - ts[0])
        # u has 2 identical components -> integrand = 2 * 0.5 (c/sigma)^2
        want = (c / sigma) ** 2 * h
        np.testing.assert_allclose(np.asarray(inc), want, rtol=1e-5)

    def test_scalar_noise_least_squares_u(self):
        """Scalar noise: u = g.(f-h)/||g||^2. With f - h = alpha * g the
        projection is exact: integrand = alpha^2 / 2."""
        alpha = 0.7
        g_vec = jnp.asarray([0.5, -0.2, 0.3])
        prior = lambda t, y: -y
        drift = lambda t, y: -y + alpha * g_vec
        diff = lambda t, y: jnp.broadcast_to(g_vec, y.shape)
        ts = jnp.linspace(0.0, 1.0, 41)
        _, inc = sdeint_logqp(drift, diff, prior, jnp.zeros(3), ts,
                              jax.random.PRNGKey(2), method="euler",
                              noise="scalar")
        h = float(ts[1] - ts[0])
        np.testing.assert_allclose(np.asarray(inc), 0.5 * alpha ** 2 * h,
                                   rtol=1e-5)

    def test_general_noise_pinv_u(self):
        """General noise: u = pinv(g)(f - h); with f - h = g @ v, u == v."""
        g_mat = jnp.asarray([[0.5, 0.1], [0.0, 0.4], [0.2, 0.0]])
        v = jnp.asarray([0.3, -0.6])
        prior = lambda t, y: -y
        drift = lambda t, y: -y + g_mat @ v
        diff = lambda t, y: g_mat
        ts = jnp.linspace(0.0, 1.0, 21)
        ys, inc = sdeint_logqp(drift, diff, prior, jnp.zeros(3), ts,
                               jax.random.PRNGKey(3), method="euler",
                               noise="general")
        h = float(ts[1] - ts[0])
        np.testing.assert_allclose(np.asarray(inc),
                                   0.5 * float(v @ v) * h, rtol=1e-5)
        assert ys.shape == (21, 3)


class TestStateDependent:
    def test_matches_manual_euler_scan(self):
        theta_q, theta_p, sigma = 1.0, 2.5, 0.5
        drift = lambda t, y: -theta_q * y
        prior = lambda t, y: -theta_p * y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 101)
        key = jax.random.PRNGKey(4)
        y0 = jnp.ones(2)
        ys, inc = sdeint_logqp(drift, diff, prior, y0, ts, key,
                               method="euler", noise="diagonal")
        h = np.asarray(ts[1:] - ts[:-1])
        u = (theta_p - theta_q) * np.asarray(ys[:-1]) / sigma
        want = 0.5 * (u ** 2).sum(axis=1) * h
        np.testing.assert_allclose(np.asarray(inc), want, rtol=2e-4,
                                   atol=1e-8)

    def test_ou_expected_kl_monte_carlo(self):
        """KL(q||p) for OU(theta_q) vs OU(theta_p), shared sigma, y0 = 0:
        E[int 1/2 ((theta_p-theta_q) y_t / sigma)^2 dt] with
        Var y_t = sigma^2 (1 - exp(-2 theta_q t)) / (2 theta_q)."""
        theta_q, theta_p, sigma, T = 1.0, 2.0, 0.5, 1.0
        drift = lambda t, y: -theta_q * y
        prior = lambda t, y: -theta_p * y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, T, 201)
        keys = jax.random.split(jax.random.PRNGKey(5), 3000)
        _, incs = jax.jit(jax.vmap(
            lambda k: sdeint_logqp(drift, diff, prior, jnp.zeros(1), ts, k,
                                   method="srk", additive=True)))(keys)
        kl_mc = float(np.asarray(incs.sum(axis=1)).mean())
        dth = theta_p - theta_q
        var_int = sigma ** 2 / (2 * theta_q) * (
            T - (1 - np.exp(-2 * theta_q * T)) / (2 * theta_q))
        want = 0.5 * dth ** 2 / sigma ** 2 * var_int
        np.testing.assert_allclose(kl_mc, want, rtol=0.06)


class TestGradients:
    def test_grad_matches_fd(self):
        sigma = 0.5
        prior = lambda t, y: -2.0 * y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 101)
        key = jax.random.PRNGKey(6)

        def kl_sum(theta):
            _, inc = sdeint_logqp(lambda t, y: -theta * y, diff, prior,
                                  jnp.ones(2), ts, key, method="euler")
            return inc.sum()

        g = jax.grad(kl_sum)(jnp.float32(1.0))
        eps = 1e-2
        fd = (kl_sum(jnp.float32(1.0 + eps))
              - kl_sum(jnp.float32(1.0 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)

    def test_latent_sde_style_objective_trains(self):
        """One optimization step on ELBO-style loss = recon + KL decreases
        it — the latent-SDE training pattern end-to-end under jit."""
        sigma = 0.4
        prior = lambda t, y: -y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 51)
        keys = jax.random.split(jax.random.PRNGKey(7), 16)
        target = 0.8

        @jax.jit
        def loss(theta):
            def one(k):
                ys, inc = sdeint_logqp(
                    lambda t, y: theta[0] * (theta[1] - y), diff, prior,
                    jnp.zeros(1), ts, k, method="euler")
                return (ys[-1, 0] - target) ** 2 + 0.1 * inc.sum()
            return jax.vmap(one)(keys).mean()

        th = jnp.asarray([1.0, 0.0])
        l0 = float(loss(th))
        for _ in range(25):
            th = th - 0.3 * jax.grad(loss)(th)
        assert float(loss(th)) < 0.5 * l0


class TestDtSubstep:
    def test_constant_mismatch_exact_under_refinement(self):
        """dt-substeps integrate the KL on the fine grid; increments are
        still reported between OUTPUT times and stay exact for constant
        mismatch (the quadrature of a constant is dt-invariant)."""
        c, sigma = 0.8, 0.5
        drift = lambda t, y: -y + c
        prior = lambda t, y: -y
        diff = lambda t, y: sigma * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 6)
        _, inc = sdeint_logqp(drift, diff, prior, jnp.ones(2), ts,
                              jax.random.PRNGKey(1), method="euler",
                              noise="diagonal", dt=0.01)
        h = float(ts[1] - ts[0])
        want = (c / sigma) ** 2 * h
        assert inc.shape == (5,)
        np.testing.assert_allclose(np.asarray(inc), want, rtol=1e-5)
