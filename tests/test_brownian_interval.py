"""BrownianInterval: torchsde's public path object, counter-based here.

Parity target: ``torchsde.BrownianInterval(t0, t1, size, entropy,
levy_area_approximation)`` + ``sdeint(..., bm=bm)`` (the reference's
dependency exposes these; the reference itself lets torchsde construct the
path implicitly). Oracles: path self-consistency (Chen additivity of
increments), increment moments, exact-conditional space-time integral law,
and sdeint(bm=) == sdeint(noise_pack=bm.pack(ts)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import BrownianInterval, brownian_path, sdeint


class TestPathConsistency:
    def test_additivity(self):
        bm = BrownianInterval(t0=0.0, t1=2.0, entropy=42)
        a, b, c = 0.3, 0.9, 1.7
        lhs = float(bm(a, b)) + float(bm(b, c))
        rhs = float(bm(a, c))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_w_at_t0_is_zero(self):
        bm = BrownianInterval(t0=0.5, t1=1.5, entropy=3)
        assert abs(float(bm(0.5))) < 1e-7

    def test_entropy_changes_path(self):
        b1 = BrownianInterval(entropy=1)
        b2 = BrownianInterval(entropy=2)
        assert float(b1(0.7)) != float(b2(0.7))

    def test_key_seeding(self):
        bk = BrownianInterval(key=jax.random.PRNGKey(9))
        assert np.isfinite(float(bk(0.5)))

    def test_shaped(self):
        bm = BrownianInterval(shape=(4,), entropy=0)
        w = bm(0.25, 0.75)
        assert w.shape == (4,)

    def test_increment_moments(self):
        """W(t+h) - W(t) ~ N(0, h) across many independent paths."""
        h = 0.37

        def inc(e):
            return BrownianInterval(key=jax.random.fold_in(
                jax.random.PRNGKey(0), e))(0.2, 0.2 + h)

        ws = jax.vmap(inc)(jnp.arange(4096))
        assert abs(float(jnp.mean(ws))) < 0.05
        np.testing.assert_allclose(float(jnp.var(ws)), h, rtol=0.1)


class TestSpaceTime:
    def test_conditional_law(self):
        """U | dW ~ N(h dW / 2, h^3 / 12): check the residual's moments."""
        h = 0.5

        def query(e):
            bm = BrownianInterval(
                key=jax.random.fold_in(jax.random.PRNGKey(1), e),
                levy_area_approximation="space-time")
            w, u = bm.space_time(0.0, h)
            return u - 0.5 * h * w

        r = jax.vmap(query)(jnp.arange(4096))
        assert abs(float(jnp.mean(r))) < 0.01
        np.testing.assert_allclose(float(jnp.var(r)), h**3 / 12.0, rtol=0.15)

    def test_requires_approximation_level(self):
        bm = BrownianInterval(entropy=0)  # "none"
        with pytest.raises(ValueError):
            bm.space_time(0.0, 0.5)

    def test_brownian_path_constructor(self):
        bm = brownian_path(0.0, 1.0, entropy=5)
        w, u = bm.space_time(0.1, 0.6)
        assert np.isfinite(float(w)) and np.isfinite(float(u))


class TestSdeintBm:
    def test_bm_equals_pack(self):
        """sdeint(bm=) must integrate exactly the path bm describes."""
        ts = jnp.linspace(0.0, 1.0, 33)
        bm = brownian_path(0.0, 1.0, entropy=7)
        drift = lambda t, y: -y
        diff = lambda t, y: 0.5 * jnp.ones_like(y)
        y_bm = sdeint(drift, diff, jnp.ones(()), ts, jax.random.PRNGKey(0),
                      method="euler", bm=bm)
        y_pack = sdeint(drift, diff, jnp.ones(()), ts, jax.random.PRNGKey(0),
                        method="euler", noise_pack=bm.pack(ts))
        np.testing.assert_array_equal(np.asarray(y_bm), np.asarray(y_pack))

    def test_bm_reproducible_and_key_independent(self):
        ts = jnp.linspace(0.0, 1.0, 17)
        bm = brownian_path(0.0, 1.0, entropy=11)
        drift = lambda t, y: -y
        diff = lambda t, y: 0.3 * jnp.ones_like(y)
        y1 = sdeint(drift, diff, jnp.ones(()), ts, jax.random.PRNGKey(0),
                    method="srk", additive=True, bm=bm)
        y2 = sdeint(drift, diff, jnp.ones(()), ts, jax.random.PRNGKey(99),
                    method="srk", additive=True, bm=bm)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_gbm_pathwise_exact_limit(self):
        """Milstein on bm converges to the GBM closed form on bm's own
        terminal W."""
        mu, sig, T = 0.3, 0.7, 1.0
        bm = brownian_path(0.0, T, entropy=13)
        ts = jnp.linspace(0.0, T, 513)
        y = sdeint(lambda t, y: mu * y, lambda t, y: sig * y,
                   jnp.float32(1.0), ts, jax.random.PRNGKey(0),
                   method="milstein", bm=bm)
        w_T = float(bm(0.0, T))
        exact = np.exp((mu - sig**2 / 2) * T + sig * w_T)
        np.testing.assert_allclose(float(y[-1]), exact, rtol=2e-2)

    def test_srk_requires_space_time(self):
        bm = BrownianInterval(entropy=0)  # "none"
        with pytest.raises(ValueError):
            sdeint(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                   jnp.ones(()), jnp.linspace(0.0, 1.0, 9),
                   jax.random.PRNGKey(0), method="srk", additive=True,
                   bm=bm)

    def test_shape_mismatch_raises(self):
        bm = brownian_path(0.0, 1.0, shape=(3,))
        with pytest.raises(ValueError):
            sdeint(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                   jnp.ones(2), jnp.linspace(0.0, 1.0, 9),
                   jax.random.PRNGKey(0), method="euler", noise="scalar",
                   bm=bm)

    def test_general_noise_bm(self):
        bm = brownian_path(0.0, 1.0, shape=(2,), entropy=4)
        g = jnp.asarray([[0.1, 0.0], [0.05, 0.2]])
        y = sdeint(lambda t, y: -y, lambda t, y: g, jnp.ones(2),
                   jnp.linspace(0.0, 1.0, 17), jax.random.PRNGKey(0),
                   method="euler", noise="general", bm=bm)
        assert y.shape == (17, 2)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_gradient_through_bm(self):
        ts = jnp.linspace(0.0, 1.0, 17)
        bm = brownian_path(0.0, 1.0, entropy=21)

        def loss(th):
            return sdeint(lambda t, y, th: -th * y,
                          lambda t, y, th: 0.2 * jnp.ones_like(y),
                          jnp.ones(()), ts, jax.random.PRNGKey(0), th,
                          method="euler", bm=bm)[-1]

        g = jax.grad(loss)(jnp.float32(1.5))
        eps = 1e-2
        fd = (loss(1.5 + eps) - loss(1.5 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
