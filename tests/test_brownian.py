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


class TestNoiseRegimePin:
    """The production package pins jax_threefry_partitionable at import
    (columnflow/__init__.py), so bench.py / task-CLI Brownian paths share the
    test suite's key-derivation regime. A subprocess WITHOUT the conftest
    must see the pinned regime and reproduce a golden draw."""

    def test_production_default_matches_test_regime(self):
        import subprocess
        import sys

        code = (
            "import columnflow, jax, jax.numpy as jnp\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert jax.config.jax_threefry_partitionable, "
            "'package must pin the threefry regime'\n"
            "from columnflow.solvers.brownian import VirtualBrownianTree\n"
            "t = VirtualBrownianTree(t0=0.0, t1=1.0,"
            " key=jax.random.PRNGKey(7), depth=10)\n"
            "print(float(t.evaluate(jnp.asarray(0.37))))\n"
        )
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             env={"PATH": "/usr/local/bin:/usr/bin:/bin",
                                  "HOME": "/root"})
        assert out.returncode == 0, out.stderr
        sub_val = float(out.stdout.strip().splitlines()[-1])
        here_val = float(VirtualBrownianTree(
            t0=0.0, t1=1.0, key=jax.random.PRNGKey(7), depth=10
        ).evaluate(jnp.asarray(0.37)))
        np.testing.assert_allclose(sub_val, here_val, rtol=0, atol=0)

    def test_host_opt_out_respected_with_warning(self):
        """Advisor round 3: importing columnflow must not OVERRIDE a host
        application's explicit legacy-regime opt-out — it warns instead
        (columnflow/__init__.py)."""
        import subprocess
        import sys

        code = (
            "import warnings\n"
            "with warnings.catch_warnings(record=True) as rec:\n"
            "    warnings.simplefilter('always')\n"
            "    import columnflow, jax\n"
            "assert not jax.config.jax_threefry_partitionable, "
            "'host opt-out must be respected'\n"
            "assert any('threefry' in str(w.message) for w in rec), "
            "'import must warn about the unsupported regime'\n"
            "print('ok')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True,
            env={"PATH": "/usr/local/bin:/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu",
                 "JAX_THREEFRY_PARTITIONABLE": "0"})
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip().splitlines()[-1] == "ok"

    def test_old_jax_default_still_pinned(self):
        """Advisor round 4: when False merely reflects an OLD JAX library
        default (version < 0.4.30, no env opt-out), the guard must keep
        pinning True — same seed, same Brownian path as modern JAX.
        Simulated by spoofing jax.__version__ before importing
        columnflow (the flag default cannot be changed on this JAX)."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "jax.config.update('jax_threefry_partitionable', False)\n"
            "jax.__version__ = '0.4.20'  # spoof: pre-flip library default\n"
            "import columnflow\n"
            "assert jax.config.jax_threefry_partitionable, "
            "'old-default False must be re-pinned True'\n"
            "print('ok')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True,
            env={"PATH": "/usr/local/bin:/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu"})
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip().splitlines()[-1] == "ok"
