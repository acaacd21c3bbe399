"""noise='general': full-matrix diffusion against m Brownian channels.

torchsde's noise_type='general' (the reference imports torchsde wholesale,
scripts/parity_ode.py:11). Oracles: consistency embeddings (a diagonal
matrix diffusion must reproduce noise='diagonal'; an (d,1) column must
reproduce noise='scalar' on the same increments), the OU stationary
covariance Sigma Sigma^T / (2 theta), and reversible-adjoint gradient
equality with autodiff through the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import sdeint, sdeint_reversible
from columnflow.solvers.sde import _brownian_pack


class TestGeneralNoiseConsistency:
    def test_diagonal_embedding_matches(self):
        key = jax.random.PRNGKey(0)
        ts = jnp.linspace(0.0, 1.0, 201)
        y0 = jnp.asarray([1.0, 2.0, 0.5])
        drift = lambda t, y: -y

        def g_diag(t, y):
            return 0.2 * y + 0.1

        def g_gen(t, y):
            return jnp.diag(0.2 * y + 0.1)

        pack = _brownian_pack(key, ts, y0.shape, jnp.float32)[1:]
        ys_d = sdeint(drift, g_diag, y0, ts, key, method="euler",
                      noise="diagonal", noise_pack=pack)
        ys_g = sdeint(drift, g_gen, y0, ts, key, method="euler",
                      noise="general", noise_pack=pack)
        np.testing.assert_allclose(np.asarray(ys_g), np.asarray(ys_d),
                                   rtol=1e-6, atol=1e-7)

    def test_scalar_embedding_matches(self):
        key = jax.random.PRNGKey(1)
        ts = jnp.linspace(0.0, 1.0, 201)
        y0 = jnp.ones(3)
        a, b = 0.3, 0.4
        drift = lambda t, y: a * y
        g_scalar = lambda t, y: b * y
        g_gen = lambda t, y: (b * y)[:, None]  # (d, 1)

        _, i1, i10, i11, i111 = _brownian_pack(key, ts, (), jnp.float32)
        ys_s = sdeint(drift, g_scalar, y0, ts, key, method="heun",
                      sde_type="stratonovich",
                      noise_pack=(i1, i10, i11, i111))
        ys_g = sdeint(drift, g_gen, y0, ts, key, method="heun",
                      sde_type="stratonovich", noise="general",
                      noise_pack=(i1[:, None], None, None, None))
        np.testing.assert_allclose(np.asarray(ys_g), np.asarray(ys_s),
                                   rtol=1e-6, atol=1e-7)

    def test_ou_stationary_covariance(self):
        """dy = -theta y dt + Sigma dW -> Cov_inf = Sigma Sigma^T/(2 theta)."""
        theta = 1.0
        sigma = jnp.asarray([[0.5, 0.2], [0.0, 0.4], [0.1, 0.0]])  # (3, 2)
        drift = lambda t, y: -theta * y
        diff = lambda t, y: sigma
        ts = jnp.linspace(0.0, 6.0, 601)
        keys = jax.random.split(jax.random.PRNGKey(2), 4000)
        finals = jax.jit(jax.vmap(
            lambda k: sdeint(drift, diff, jnp.zeros(3), ts, k,
                             method="euler", noise="general")[-1]
        ))(keys)
        cov = np.cov(np.asarray(finals).T)
        want = np.asarray(sigma @ sigma.T) / (2 * theta)
        np.testing.assert_allclose(cov, want, atol=6e-3)


class TestGeneralNoiseGradients:
    def test_reversible_matches_autodiff(self):
        key = jax.random.PRNGKey(3)
        ts = jnp.linspace(0.0, 1.0, 301)
        y0 = jnp.ones(3)
        sigma = jnp.asarray([[0.3, 0.1], [0.0, 0.2], [0.1, 0.1]])
        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: sigma * (1.0 + 0.1 * jnp.tanh(y)[:, None])

        ys_rev = sdeint_reversible(drift, diff, y0, ts, key,
                                   jnp.float32(0.7), noise="general")
        ys_pl = sdeint(drift, diff, y0, ts, key, jnp.float32(0.7),
                       method="reversible_heun", sde_type="stratonovich",
                       noise="general")
        np.testing.assert_allclose(np.asarray(ys_rev), np.asarray(ys_pl),
                                   rtol=1e-6, atol=1e-7)

        g_rev = jax.grad(lambda th: jnp.sum(sdeint_reversible(
            drift, diff, y0, ts, key, th, noise="general")[-1]))(
                jnp.float32(0.7))
        g_auto = jax.grad(lambda th: jnp.sum(sdeint(
            drift, diff, y0, ts, key, th, method="reversible_heun",
            sde_type="stratonovich", noise="general")[-1]))(jnp.float32(0.7))
        np.testing.assert_allclose(float(g_rev), float(g_auto), rtol=2e-4)


class TestGeneralNoiseErrors:
    def setup_method(self):
        self.key = jax.random.PRNGKey(0)
        self.ts = jnp.linspace(0.0, 1.0, 5)
        self.y0 = jnp.ones(2)
        self.drift = lambda t, y: -y
        self.diff = lambda t, y: jnp.ones((2, 3))

    def test_srk_rejected(self):
        with pytest.raises(ValueError, match="euler"):
            sdeint(self.drift, self.diff, self.y0, self.ts, self.key,
                   method="srk", noise="general")

    def test_strat_milstein_rejected(self):
        with pytest.raises(ValueError, match="Levy"):
            sdeint(self.drift, self.diff, self.y0, self.ts, self.key,
                   method="milstein", sde_type="stratonovich",
                   noise="general")

    def test_pytree_state_rejected(self):
        with pytest.raises(ValueError, match="1-D|flat"):
            sdeint(lambda t, y: {"a": -y["a"]},
                   lambda t, y: {"a": jnp.ones((2, 3))},
                   {"a": jnp.ones(2)}, self.ts, self.key, noise="general")

    def test_bad_diffusion_shape_rejected(self):
        with pytest.raises(ValueError, match=r"\(d, m\)"):
            sdeint(self.drift, lambda t, y: jnp.ones(2), self.y0, self.ts,
                   self.key, method="euler", noise="general")
