"""Drift-implicit (semi-implicit) SDE methods: stiff stability + accuracy.

No torchsde analog (its method surface is fully explicit); motivation is
the column physics' stiff tau_syn = 0.5 ms drift mode (reference
config/model.toml:33-36) that bounds every explicit fixed grid at
h ~ tau_syn. Oracles: the closed-form one-step solution for linear drift,
explicit-vs-implicit stability at lam*h >> 2, GBM strong order with pinned
Brownian paths, OU stationary moments with the method's known finite-h
bias, and FD gradient checks through the Newton solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import sdeint


def _pack_euler(i1, h):
    """noise_pack with only I1 meaningful (euler-type methods)."""
    z = jnp.zeros_like(jnp.asarray(i1, dtype=jnp.float32))
    return (jnp.asarray(i1, dtype=jnp.float32), z, z, z)


class TestLinearClosedForm:
    def test_one_step_matches_backward_euler_formula(self):
        """Linear drift: Newton is exact, so one implicit_euler step IS
        y1 = (y0 + sigma dW) / (1 + a h)."""
        a, sig, h = 3.0, 0.5, 0.25
        dw = 0.37
        ts = jnp.asarray([0.0, h])
        pack = _pack_euler(np.asarray([dw]), h)
        y = sdeint(lambda t, y: -a * y,
                   lambda t, y: jnp.full_like(y, sig),
                   jnp.ones(()), ts, jax.random.PRNGKey(0),
                   method="implicit_euler", noise_pack=pack)
        want = (1.0 + sig * dw) / (1.0 + a * h)
        np.testing.assert_allclose(float(y[-1]), want, rtol=1e-6)

    def test_matches_explicit_in_smooth_limit(self):
        """Non-stiff drift, fine grid: implicit and explicit Euler converge
        to the same path (same pinned noise)."""
        ts = jnp.linspace(0.0, 1.0, 513)
        h = float(ts[1] - ts[0])
        rng = np.random.default_rng(3)
        i1 = np.sqrt(h) * rng.normal(size=(512,))
        pack = _pack_euler(i1, h)
        drift = lambda t, y: jnp.sin(y) - y
        diff = lambda t, y: 0.3 * jnp.cos(y)
        args = (drift, diff, jnp.ones(()), ts, jax.random.PRNGKey(0))
        y_imp = sdeint(*args, method="implicit_euler", noise_pack=pack)
        y_exp = sdeint(*args, method="euler", noise_pack=pack)
        np.testing.assert_allclose(np.asarray(y_imp), np.asarray(y_exp),
                                   atol=5e-3)


class TestStiffStability:
    def test_implicit_stable_where_explicit_diverges(self):
        """lam = 1e4 at h = 1e-2 (lam*h = 100): explicit EM multiplies the
        error by |1 - lam h| = 99 per step; implicit_euler contracts by
        1/(1 + lam h) and tracks the slow solution."""
        lam, sig = 1e4, 0.05
        drift = lambda t, y: -lam * (y - jnp.cos(t))
        diff = lambda t, y: jnp.full_like(y, sig)
        ts = jnp.linspace(0.0, 1.0, 101)
        key = jax.random.PRNGKey(0)
        y_imp = sdeint(drift, diff, jnp.ones(()), ts, key,
                       method="implicit_euler")
        y_exp = np.asarray(
            sdeint(drift, diff, jnp.ones(()), ts, key, method="euler"))
        # explicit EM blows up through overflow into NaN
        assert (not np.all(np.isfinite(y_exp))
                or np.abs(y_exp).max() > 1e10)
        err = np.abs(np.asarray(y_imp[1:]) - np.cos(np.asarray(ts[1:])))
        assert err.max() < 0.1, err.max()

    def test_implicit_milstein_stable_multiplicative(self):
        """Stiff drift + multiplicative noise stays bounded."""
        lam = 1e4
        drift = lambda t, y: -lam * (y - 1.0)
        diff = lambda t, y: 0.1 * y
        ts = jnp.linspace(0.0, 1.0, 101)
        y = sdeint(drift, diff, jnp.full((), 2.0), ts,
                   jax.random.PRNGKey(1), method="implicit_milstein")
        y = np.asarray(y)
        assert np.all(np.isfinite(y))
        assert np.abs(y[10:] - 1.0).max() < 0.5


class TestStrongAccuracy:
    @pytest.fixture(scope="class")
    def gbm_errors(self):
        """GBM with pinned paths: exact terminal value
        y0 exp((mu - sig^2/2) T + sig W_T)."""
        mu, sig, T = 0.3, 0.7, 1.0
        drift = lambda t, y: mu * y
        diff = lambda t, y: sig * y
        B, nf = 256, 512
        rng = np.random.default_rng(0)
        hf = T / nf
        i1f = np.sqrt(hf) * rng.normal(size=(B, nf))
        exact = np.exp((mu - sig**2 / 2) * T + sig * i1f.sum(-1))
        errors = {}
        for n in (32, 128):
            h = T / n
            i1 = i1f.reshape(B, n, nf // n).sum(-1)
            ts = jnp.linspace(0.0, T, n + 1)
            for method in ("implicit_euler", "implicit_milstein"):
                solve = jax.vmap(
                    lambda p: sdeint(drift, diff, jnp.float32(1.0), ts,
                                     jax.random.PRNGKey(0), method=method,
                                     noise_pack=p)[-1])
                finals = np.asarray(solve(_pack_euler(i1, h)))
                errors[(method, n)] = float(
                    np.sqrt(np.mean((finals - exact) ** 2)))
        return errors

    def test_milstein_beats_euler(self, gbm_errors):
        for n in (32, 128):
            assert (gbm_errors[("implicit_milstein", n)]
                    < 0.5 * gbm_errors[("implicit_euler", n)])

    def test_implicit_milstein_strong_order(self, gbm_errors):
        # order 1.0 predicts 4x across the 4x refinement; demand >= 2x.
        assert (gbm_errors[("implicit_milstein", 32)]
                / gbm_errors[("implicit_milstein", 128)] > 2.0)


class TestMoments:
    def test_ou_stationary_variance_with_known_bias(self):
        """OU by implicit Euler: the scheme's exact stationary variance is
        sigma^2 / (2 theta + theta^2 h) (backward-Euler AR(1) with
        phi = 1/(1 + theta h)) — assert THAT, not just the continuum
        limit, so the test pins the discretization itself."""
        theta, s = 1.0, 0.5
        h = 0.05
        n = 400
        ts = jnp.linspace(0.0, n * h, n + 1)

        def solve(key):
            return sdeint(lambda t, y: -theta * y,
                          lambda t, y: jnp.full_like(y, s),
                          jnp.zeros(()), ts, key,
                          method="implicit_euler")[-1]

        finals = jax.vmap(solve)(
            jax.random.split(jax.random.PRNGKey(7), 4096))
        var = float(jnp.var(finals))
        want = s * s / (2 * theta + theta**2 * h)
        assert abs(var - want) / want < 0.12, (var, want)


class TestGradsAndShapes:
    def test_gradient_matches_fd(self):
        ts = jnp.linspace(0.0, 1.0, 33)

        def loss(theta):
            y = sdeint(lambda t, y, th: -th * y,
                       lambda t, y, th: 0.2 * jnp.ones_like(y),
                       jnp.ones(()), ts, jax.random.PRNGKey(5), theta,
                       method="implicit_euler")
            return y[-1]

        th0 = jnp.float32(2.0)
        g = jax.grad(loss)(th0)
        eps = 1e-2
        fd = (loss(th0 + eps) - loss(th0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)

    def test_general_noise_implicit_euler(self):
        """(d, m) matrix diffusion against m channels, stiff drift."""
        a = jnp.asarray([[-50.0, 0.0], [1.0, -2.0]])
        g = jnp.asarray([[0.1, 0.0], [0.05, 0.2]])
        ts = jnp.linspace(0.0, 1.0, 51)
        y = sdeint(lambda t, y: a @ y, lambda t, y: g,
                   jnp.ones(2), ts, jax.random.PRNGKey(2),
                   method="implicit_euler", noise="general")
        assert y.shape == (51, 2)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_matrix_state_and_vmap(self):
        ts = jnp.linspace(0.0, 0.5, 26)
        y0 = jnp.ones((3, 2))

        def solve(key):
            return sdeint(lambda t, y: -4.0 * y,
                          lambda t, y: 0.1 * jnp.ones_like(y),
                          y0, ts, key, method="implicit_euler",
                          noise="diagonal")[-1]

        ys = jax.vmap(solve)(jax.random.split(jax.random.PRNGKey(0), 4))
        assert ys.shape == (4, 3, 2)
        assert bool(jnp.all(jnp.isfinite(ys)))

    def test_implicit_milstein_general_raises(self):
        with pytest.raises(ValueError):
            sdeint(lambda t, y: -y, lambda t, y: jnp.eye(2),
                   jnp.ones(2), jnp.linspace(0.0, 1.0, 5),
                   jax.random.PRNGKey(0), method="implicit_milstein",
                   noise="general")
