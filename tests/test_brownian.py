"""Virtual Brownian tree tests: path consistency and distributional checks."""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.solvers import VirtualBrownianTree


class TestVBT:
    def test_deterministic_queries(self):
        tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=jax.random.PRNGKey(0))
        a = float(tree.evaluate(0.3))
        b = float(tree.evaluate(0.3))
        assert a == b

    def test_endpoints(self):
        tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=jax.random.PRNGKey(1))
        assert abs(float(tree.evaluate(0.0))) < 1e-5

    def test_marginal_variance(self):
        # Across keys, W(t) ~ N(0, t).
        def w_at(key, t):
            return VirtualBrownianTree(t0=0.0, t1=1.0, key=key).evaluate(t)

        keys = jax.random.split(jax.random.PRNGKey(2), 4096)
        for t, in [(0.25,), (0.5,), (1.0,)]:
            ws = jax.vmap(lambda k: w_at(k, t))(keys)
            var = float(jnp.var(ws))
            assert abs(var - t) / t < 0.15, (t, var)

    def test_increment_variance_and_independence(self):
        # Non-overlapping increments: Var[W(b)-W(a)] = b-a, corr ~ 0.
        def incs(key):
            tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=key)
            return tree.increment(0.1, 0.35), tree.increment(0.5, 0.9)

        keys = jax.random.split(jax.random.PRNGKey(3), 4096)
        d1, d2 = jax.vmap(incs)(keys)
        assert abs(float(jnp.var(d1)) - 0.25) < 0.05
        assert abs(float(jnp.var(d2)) - 0.4) < 0.07
        corr = float(jnp.corrcoef(jnp.stack([d1, d2]))[0, 1])
        assert abs(corr) < 0.1

    def test_path_monotone_consistency(self):
        # Queries refine one underlying path: W is continuous-ish across
        # neighbouring leaves (increment over dt has O(sqrt(dt)) scale).
        tree = VirtualBrownianTree(t0=0.0, t1=1.0, key=jax.random.PRNGKey(4),
                                   depth=16)
        ts = jnp.linspace(0.0, 1.0, 257)
        ws = jax.vmap(tree.evaluate)(ts)
        diffs = np.abs(np.diff(np.asarray(ws)))
        assert np.max(diffs) < 0.5  # ~6 sigma of sqrt(1/256)
