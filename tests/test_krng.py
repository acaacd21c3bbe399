"""Kernel-safe RNG (solvers/krng.py): threefry correctness vs jax.random's
own implementation, inverse-CDF normal accuracy vs scipy, Brownian-tree
statistics, and XLA-vs-Pallas(interpret) bit identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import krng


class TestThreefry:
    def test_matches_jax_threefry(self):
        # Same 20-round Threefry-2x32 as jax.random: compare against the
        # library's own kernel on random (key, counter) pairs.
        from jax._src import prng as jax_prng

        rng = np.random.default_rng(0)
        for _ in range(20):
            k = rng.integers(0, 2**32, size=2, dtype=np.uint32)
            x = rng.integers(0, 2**32, size=2, dtype=np.uint32)
            ref = jax_prng.threefry_2x32(jnp.asarray(k), jnp.asarray(x))
            o0, o1 = krng.threefry2x32(k[0], k[1], x[0], x[1])
            assert int(o0) == int(ref[0]) and int(o1) == int(ref[1])

    def test_elementwise_broadcast(self):
        xs = jnp.arange(64, dtype=jnp.uint32)
        o0, o1 = krng.threefry2x32(jnp.uint32(1), jnp.uint32(2), xs, 0)
        assert o0.shape == (64,)
        assert len(set(np.asarray(o0).tolist())) == 64  # injective-ish

    def test_key_pair_roundtrip(self):
        k0, k1 = krng.key_pair(jax.random.PRNGKey(42))
        data = jax.random.key_data(jax.random.PRNGKey(42)).reshape(-1)
        assert int(k0) == int(data[0]) and int(k1) == int(data[1])


class TestNdtri:
    def test_matches_scipy(self):
        from scipy.special import ndtri as scipy_ndtri

        p = np.concatenate([
            np.linspace(1e-7, 0.02, 50),
            np.linspace(0.03, 0.97, 200),
            np.linspace(0.98, 1 - 1e-7, 50),
        ]).astype(np.float32)
        ours = np.asarray(krng.ndtri(jnp.asarray(p)))
        ref = scipy_ndtri(p.astype(np.float64))
        # Acklam is 1.15e-9 in f64; evaluated in f32 the rational polys
        # round to ~4e-5 RELATIVE at the branch edges — far below the
        # sampling noise any Brownian draw feeds.
        rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1.0)
        assert np.max(rel) < 1e-4

    def test_normal_from_bits_moments(self):
        bits, _ = krng.threefry2x32(
            jnp.uint32(7), jnp.uint32(9),
            jnp.arange(200_000, dtype=jnp.uint32), 0)
        z = np.asarray(krng.normal_from_bits(bits))
        assert np.all(np.isfinite(z))
        assert abs(z.mean()) < 0.01
        assert abs(z.var() - 1.0) < 0.02
        assert abs((z**3).mean()) < 0.03          # skewness
        assert abs((z**4).mean() - 3.0) < 0.1     # kurtosis

    def test_uniform_never_zero_or_one(self):
        u = krng.uniform_from_bits(jnp.asarray([0, 2**32 - 1, 1, 511],
                                               dtype=jnp.uint32))
        u = np.asarray(u)
        assert np.all(u > 0.0) and np.all(u < 1.0)


class TestKernelBrownianTree:
    def _tree(self, seed=0, **kw):
        k0, k1 = krng.key_pair(jax.random.PRNGKey(seed))
        return krng.KernelBrownianTree(t0=0.0, t1=1.0, k0=k0, k1=k1, **kw)

    def test_deterministic_and_endpoint(self):
        tree = self._tree(0)
        assert float(tree.evaluate(0.3)) == float(tree.evaluate(0.3))
        assert abs(float(tree.evaluate(0.0))) < 1e-5

    def test_marginal_and_increment_variance(self):
        def w_at(key, t):
            k0, k1 = krng.key_pair(key)
            return krng.KernelBrownianTree(
                t0=0.0, t1=1.0, k0=k0, k1=k1).evaluate(t)

        keys = jax.random.split(jax.random.PRNGKey(2), 4096)
        for t in (0.25, 0.5, 1.0):
            ws = jax.vmap(lambda k: w_at(k, t))(keys)
            var = float(jnp.var(ws))
            assert abs(var - t) / t < 0.15, (t, var)

        def incs(key):
            k0, k1 = krng.key_pair(key)
            tree = krng.KernelBrownianTree(t0=0.0, t1=1.0, k0=k0, k1=k1)
            return tree.increment(0.1, 0.35), tree.increment(0.5, 0.9)

        d1, d2 = jax.vmap(incs)(keys)
        assert abs(float(jnp.var(d1)) - 0.25) < 0.05
        assert abs(float(jnp.var(d2)) - 0.4) < 0.07
        corr = float(jnp.corrcoef(jnp.stack([d1, d2]))[0, 1])
        assert abs(corr) < 0.1

    def test_path_continuity(self):
        tree = self._tree(4, depth=16)
        ws = jax.vmap(tree.evaluate)(jnp.linspace(0.0, 1.0, 257))
        assert np.max(np.abs(np.diff(np.asarray(ws)))) < 0.5

    def test_interval_normal_deterministic_and_distinct(self):
        k0, k1 = krng.key_pair(jax.random.PRNGKey(5))
        a = float(krng.interval_normal(k0, k1, 0.125, 0.25, 0.0, 1.0))
        b = float(krng.interval_normal(k0, k1, 0.125, 0.25, 0.0, 1.0))
        c = float(krng.interval_normal(k0, k1, 0.125, 0.5, 0.0, 1.0))
        assert a == b and a != c


class TestInKernelParity:
    """The same krng code traced into a Pallas kernel (interpret mode)
    must reproduce the XLA values to FMA-contraction ULPs: the integer
    hash chain is bit-exact everywhere; only the float normal transform
    picks up fusion-order differences (~1e-7). This near-identity is the
    property the in-kernel adaptive-SDE selection pass stands on — the
    pass only SELECTS the step grid, so ULP-level path perturbation is
    inconsequential (the same argument as bf16 selection)."""

    @pytest.mark.parametrize("t", [0.0, 0.11, 0.5, 0.73, 1.0])
    def test_tree_evaluate_in_kernel(self, t):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        k0, k1 = krng.key_pair(jax.random.PRNGKey(9))
        tree = krng.KernelBrownianTree(t0=0.0, t1=1.0, k0=jnp.uint32(k0),
                                       k1=jnp.uint32(k1))

        def kernel(key_ref, t_ref, out_ref):
            tr = krng.KernelBrownianTree(
                t0=0.0, t1=1.0,
                k0=key_ref[0, 0], k1=key_ref[0, 1])
            out_ref[0] = tr.evaluate(t_ref[0, 0])

        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=True,
        )(jnp.asarray([[k0, k1]], jnp.uint32),
          jnp.asarray([[t]], jnp.float32))
        assert abs(float(got[0]) - float(tree.evaluate(t))) < 5e-6

    def test_interval_normal_in_kernel(self):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        k0, k1 = krng.key_pair(jax.random.PRNGKey(11))

        def kernel(key_ref, t_ref, out_ref):
            out_ref[0] = krng.interval_normal(
                key_ref[0, 0], key_ref[0, 1], t_ref[0, 0], t_ref[0, 1],
                0.0, 1.0)

        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=True,
        )(jnp.asarray([[k0, k1]], jnp.uint32),
          jnp.asarray([[0.125, 0.375]], jnp.float32))
        assert abs(float(got[0]) - float(
            krng.interval_normal(k0, k1, 0.125, 0.375, 0.0, 1.0))) < 5e-6
