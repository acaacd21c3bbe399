"""Adaptive SDE stepping tests: pathwise accuracy against the exact GBM
solution evaluated on the SAME virtual-Brownian-tree path."""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers import VirtualBrownianTree, sdeint_adaptive


def _gbm_err(key, rtol, method):
    mu, sig = 0.3, 0.7
    drift = lambda t, y: mu * y
    diff = lambda t, y: sig * y
    ts = jnp.linspace(0.0, 1.0, 21)
    ys = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                         method=method, rtol=rtol, atol=rtol)
    tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=key, depth=20)
    exact = jnp.exp((mu - sig**2 / 2) + sig * tree.evaluate(1.0))
    return float(jnp.abs(ys[-1] - exact) / exact)


class TestAdaptiveSDE:
    def test_tolerance_controls_error(self):
        errs = {}
        for rtol in (1e-2, 1e-4):
            errs[rtol] = np.mean(
                [_gbm_err(jax.random.PRNGKey(k), rtol, "milstein")
                 for k in range(15)]
            )
        assert errs[1e-4] < errs[1e-2] * 0.5
        assert errs[1e-4] < 1e-2

    def test_euler_additive_noise(self):
        # On ADDITIVE noise (the reference's regime) adaptive Euler converges
        # pathwise; reference = fine fixed Euler on the same VBT path.
        # (On multiplicative noise naive step-doubling Euler suffers adverse
        # selection — documented in sde_adaptive.py — use milstein there.)
        th, s = 1.0, 0.5
        drift = lambda t, y: -th * y
        diff = lambda t, y: jnp.full_like(y, s)
        ts = jnp.linspace(0.0, 1.0, 11)

        def ref_path(key, N=8192):
            tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=key, depth=20)
            tt = np.linspace(0, 1, N + 1)
            W = np.asarray(jax.vmap(tree.evaluate)(jnp.asarray(tt)))
            dW = np.diff(W)
            h = 1.0 / N
            y = 1.0
            for i in range(N):
                y = y + h * (-th * y) + s * dW[i]
            return y

        errs = {}
        for rtol in (1e-2, 1e-4):
            errs[rtol] = np.mean([
                abs(float(sdeint_adaptive(drift, diff, jnp.float32(1.0), ts,
                                          jax.random.PRNGKey(k),
                                          method="euler", rtol=rtol,
                                          atol=rtol)[-1])
                    - ref_path(jax.random.PRNGKey(k)))
                for k in range(6)
            ])
        assert errs[1e-4] < 0.5 * errs[1e-2]
        assert errs[1e-4] < 0.01

    def test_reproducible(self):
        drift = lambda t, y: -y
        diff = lambda t, y: 0.5 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 11)
        a = sdeint_adaptive(drift, diff, jnp.ones(3), ts, jax.random.PRNGKey(0))
        b = sdeint_adaptive(drift, diff, jnp.ones(3), ts, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (11, 3)
        np.testing.assert_array_equal(np.asarray(a[0]), np.ones(3))

    def test_deterministic_limit_matches_ode(self):
        # Zero diffusion: the adaptive SDE must recover the ODE solution.
        drift = lambda t, y: -y
        diff = lambda t, y: jnp.zeros_like(y)
        ts = jnp.linspace(0.0, 2.0, 9)
        ys = sdeint_adaptive(drift, diff, jnp.ones(1), ts,
                             jax.random.PRNGKey(1), rtol=1e-5, atol=1e-7)
        want = np.exp(-np.asarray(ts))[:, None]
        np.testing.assert_allclose(np.asarray(ys), want, atol=2e-3)
