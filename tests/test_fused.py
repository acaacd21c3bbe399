"""Fused Pallas dopri5 engine tests (interpret mode on CPU; compiled TPU
behavior exercised by the verify drive and the task benchmarks).

The bar: value and gradient parity with the XLA adaptive path (dopri.py) —
same controller, same accepted-step sequence, same dense output.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.ops.interp import interp_at, interp_at_onehot
from columnflow.solvers import odeint
from columnflow.solvers.fused import odeint_dopri5_fused

CFG = ColumnConfig.load()


def _exp_drift(t, y, k):
    return -k * y + jnp.sin(3.0 * t) * jnp.ones_like(y)


class TestFusedSolver:
    def _setup(self):
        ts = jnp.linspace(0.0, 5.0, 80)
        y0 = jnp.arange(1.0, 9.0).reshape(2, 4)
        k = jnp.full((2, 4), 0.7)
        return ts, y0, k

    def test_trajectory_parity(self):
        ts, y0, k = self._setup()
        ys_x = odeint(_exp_drift, y0, ts, k, method="dopri5")
        ys_f = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=256,
                                   chunk=64, interpret=True)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_x),
                                   rtol=1e-5, atol=1e-6)

    def test_gradient_parity_args_and_y0(self):
        ts, y0, k = self._setup()

        def loss(solver):
            def f(y0, k):
                return jnp.sum(solver(y0, k) ** 2)
            return f

        solve_x = lambda y0, k: odeint(_exp_drift, y0, ts, k, method="dopri5")
        solve_f = lambda y0, k: odeint_dopri5_fused(
            _exp_drift, y0, ts, k, max_steps=256, chunk=64, interpret=True
        )
        gx = jax.grad(loss(solve_x), argnums=(0, 1))(y0, k)
        gf = jax.grad(loss(solve_f), argnums=(0, 1))(y0, k)
        for a, b in zip(gx, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-6)

    def test_arg_grads_outer_parity(self):
        """arg_grads="outer" (state-only kernel sweep + step-batched XLA arg
        VJPs) must match the in-kernel path and the XLA path for values and
        gradients — it is the same math, reassociated."""
        ts, y0, k = self._setup()

        def loss(solver):
            return lambda y0, k: jnp.sum(solver(y0, k) ** 2)

        solve_x = lambda y0, k: odeint(_exp_drift, y0, ts, k, method="dopri5")
        solve_o = lambda y0, k: odeint_dopri5_fused(
            _exp_drift, y0, ts, k, max_steps=256, chunk=64,
            arg_grads="outer", interpret=True
        )
        np.testing.assert_allclose(np.asarray(solve_o(y0, k)),
                                   np.asarray(solve_x(y0, k)),
                                   rtol=1e-5, atol=1e-6)
        gx = jax.grad(loss(solve_x), argnums=(0, 1))(y0, k)
        go = jax.grad(loss(solve_o), argnums=(0, 1))(y0, k)
        for a, b in zip(gx, go):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-6)

    def test_arg_grads_auto_picks_outer_for_big_args(self):
        """A >1 MB differentiable arg flips auto mode to "outer"; gradients
        still flow (pinned against the kernel-mode result)."""
        ts = jnp.linspace(0.0, 1.0, 20)
        y0 = jnp.ones((2, 4))
        k_big = jnp.full((512, 640), 0.7)  # 1.25 MB > auto threshold

        def f(t, y, kb):
            return -jnp.mean(kb) * y

        def g(mode):
            return jax.grad(lambda kb: jnp.sum(odeint_dopri5_fused(
                f, y0, ts, kb, max_steps=64, chunk=16, arg_grads=mode,
                interpret=True)))(k_big)

        np.testing.assert_allclose(np.asarray(g("auto")),
                                   np.asarray(g("kernel")),
                                   rtol=1e-4, atol=1e-8)

    def test_pytree_args(self):
        ts, y0, _ = self._setup()
        params = {"k": jnp.full((2, 4), 0.5), "c": 0.3}

        def f(t, y, p):
            return -p["k"] * y + p["c"]

        ys_x = odeint(f, y0, ts, params, method="dopri5")
        ys_f = odeint_dopri5_fused(f, y0, ts, params, max_steps=256,
                                   chunk=64, interpret=True)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_x),
                                   rtol=1e-5, atol=1e-6)
        g = jax.grad(lambda p: jnp.sum(odeint_dopri5_fused(
            f, y0, ts, p, max_steps=256, chunk=64, interpret=True)))(params)
        assert float(jnp.max(jnp.abs(g["k"]))) > 0.0


class TestPrepareHook:
    """``prepare`` runs once per kernel invocation; gradients chain through
    it to the ORIGINAL args in both arg_grads modes."""

    def _solvers(self):
        ts = jnp.linspace(0.0, 3.0, 40)
        y0 = jnp.arange(1.0, 9.0).reshape(2, 4)
        k = jnp.full((2, 4), 0.7)

        def f_plain(t, y, k):
            return -k * y

        def f_prep(t, y, ka, kb):
            return -(ka + kb) * y

        prepare = lambda k: (0.5 * k, 0.5 * k)
        solve_x = lambda y0, k: odeint(f_plain, y0, ts, k, method="dopri5")

        def solve_p(mode):
            return lambda y0, k: odeint_dopri5_fused(
                f_prep, y0, ts, k, max_steps=128, chunk=32,
                prepare=prepare, arg_grads=mode, interpret=True)

        return y0, k, solve_x, solve_p

    def test_values_and_grads_through_prepare(self):
        y0, k, solve_x, solve_p = self._solvers()
        for mode in ("kernel", "outer"):
            sp = solve_p(mode)
            np.testing.assert_allclose(np.asarray(sp(y0, k)),
                                       np.asarray(solve_x(y0, k)),
                                       rtol=1e-5, atol=1e-6)
            gx = jax.grad(lambda y0, k: jnp.sum(solve_x(y0, k) ** 2),
                          argnums=(0, 1))(y0, k)
            gp = jax.grad(lambda y0, k: jnp.sum(sp(y0, k) ** 2),
                          argnums=(0, 1))(y0, k)
            for a, b in zip(gx, gp):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-3, atol=1e-6)


class TestSplitMatmul:
    """3-term bf16 split matmul must be f32-accurate (the fused parity
    path's replacement for Precision.HIGHEST, whose compiler-allocated
    decomposition buffers OOM VMEM at large pop counts)."""

    def test_matches_f32_highest(self):
        from columnflow.models.network import matmul_split, split_f32

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 832)).astype(np.float32)) * 30.0
        w = jnp.asarray(rng.normal(size=(832, 832)).astype(np.float32)) * 0.3
        want = jnp.matmul(x, w, precision=jax.lax.Precision.HIGHEST)
        got = matmul_split(x, *split_f32(w))
        # atol absorbs cancellation in near-zero 832-term dots; the scale of
        # the summands is ~10, so 1e-3 absolute is ~1e-4 relative to them.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-3)

    def test_premixed_split_drift_matches_reference_drift(self):
        from columnflow.data import parity_stim_table
        from columnflow.models import Stimulus, build_column_network
        from columnflow.models.network import (
            build_network_fused_consts,
            network_drift,
            network_drift_premixed,
            premix_network_weights,
            prepare_premixed_split,
        )

        params, net = build_column_network(
            CFG, jax.random.PRNGKey(0), columns_per_area=(2, 1), n_inputs=2
        )
        S = 3 * net.num_pops
        B, T = 3, 50
        stims = jnp.asarray([[15.0, 0.0], [0.0, 15.0], [15.0, 15.0]])
        tables = jax.vmap(lambda s: parity_stim_table(s, T))(stims)
        y = jax.random.normal(jax.random.PRNGKey(1), (B, S))
        t, dt = 0.033, 1e-3

        want = jax.vmap(
            lambda yy, tab: network_drift(t, yy, params, net,
                                          Stimulus(0.0, dt, tab))
        )(y, tables)
        pw, fc, tbl = prepare_premixed_split(
            premix_network_weights(params, net),
            build_network_fused_consts(net),
            jnp.transpose(tables, (1, 0, 2)),
        )
        got = network_drift_premixed(t, y, pw, fc, Stimulus(0.0, dt, tbl))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-3)


class TestBatchedDrifts:
    """The 2Dx2D drift variants must match the per-sample drifts row-wise."""

    def test_network_drift_batched(self):
        from columnflow.data import parity_stim_table
        from columnflow.models import Stimulus, build_column_network
        from columnflow.models.network import network_drift, network_drift_batched

        params, net = build_column_network(
            CFG, jax.random.PRNGKey(0), columns_per_area=(2, 1), n_inputs=2
        )
        S = 3 * net.num_pops
        B, T = 3, 50
        stims = jnp.asarray([[15.0, 0.0], [0.0, 15.0], [15.0, 15.0]])
        tables = jax.vmap(lambda s: parity_stim_table(s, T))(stims)
        y = jax.random.normal(jax.random.PRNGKey(1), (B, S))
        t = 0.033
        dt = 1e-3

        want = jax.vmap(
            lambda yy, tab: network_drift(t, yy, params, net,
                                          Stimulus(0.0, dt, tab))
        )(y, tables)
        got = network_drift_batched(
            t, y, params, net,
            Stimulus(0.0, dt, jnp.transpose(tables, (1, 0, 2))),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-4)

    def test_xor_drift_batched(self):
        from columnflow.data import prep_xor_stim, xor_conditions
        from columnflow.models import Stimulus, build_xor_network
        from columnflow.models.xor import (
            XOR_STATE_DIM,
            build_xor_fused_consts,
            split_xor_params,
            xor_drift,
            xor_drift_batched,
        )

        params, net = build_xor_network(CFG, jax.random.PRNGKey(0))
        B, T = 4, 50
        conds = jnp.asarray(xor_conditions())
        tables = jax.vmap(lambda c: prep_xor_stim(c, T))(conds)
        y = jax.random.normal(jax.random.PRNGKey(1), (B, XOR_STATE_DIM))
        t, dt = 0.033, 1e-3

        want = jax.vmap(
            lambda yy, tab: xor_drift(t, yy, params, net,
                                      Stimulus(0.0, dt, tab))
        )(y, tables)
        got = xor_drift_batched(
            t, y, split_xor_params(params), build_xor_fused_consts(net),
            Stimulus(0.0, dt,
                     jnp.transpose(tables, (1, 0, 2, 3)).reshape(T, B, 32)),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-4)


class TestInterpOneHot:
    def test_matches_interp_at(self):
        fp = jnp.asarray(np.random.default_rng(0).normal(size=(40, 3, 5))
                         .astype(np.float32))
        for x in [0.0, 0.004, 0.0151, 0.039, 0.05, -1.0]:
            a = interp_at(jnp.asarray(x), 0.0, 1e-3, fp)
            b = interp_at_onehot(jnp.asarray(x), 0.0, 1e-3, fp)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)


class TestFusedSDE:
    """Generic fused fixed-grid SDE solver vs the lax.scan sdeint with a
    pinned noise pack: pathwise value and gradient parity."""

    def _setup(self):
        from columnflow.solvers.sde import _brownian_pack

        ts = jnp.linspace(0.0, 2.0, 120)
        y0 = jnp.arange(12.0).reshape(3, 4) / 6.0
        p = {"k": jnp.full((3, 4), 0.8), "b": jnp.full((3, 4), 0.1)}
        key = jax.random.PRNGKey(3)
        _, i1, i10, i11, i111 = _brownian_pack(key, ts, (), jnp.float32)
        return ts, y0, p, key, (i1, i10, i11, i111)

    @staticmethod
    def _drift(t, y, p):
        return -p["k"] * y + p["b"] + 0.2 * jnp.sin(t)

    @staticmethod
    def _diff(t, y, p):
        return 0.5 * jnp.ones_like(y)

    def _paths(self, method):
        from columnflow.solvers import sdeint
        from columnflow.solvers.fused import sdeint_fused

        ts, y0, p, key, (i1, i10, i11, i111) = self._setup()
        ones = jnp.ones((1, 3, 4))
        scan_pack = tuple(x[:, None, None] * ones for x in (i1, i10, i11, i111))

        def scan_path(p):
            return sdeint(self._drift, self._diff, y0, ts, key, p,
                          method=method, additive=True, noise_pack=scan_pack)

        def fused_path(p):
            return sdeint_fused(self._drift, self._diff, y0, ts, key, p,
                                method=method, noise_pack=(i1, i10),
                                interpret=True)

        return p, scan_path, fused_path

    def test_srk_pathwise_and_grads(self):
        p, scan_path, fused_path = self._paths("srk")
        np.testing.assert_allclose(np.asarray(fused_path(p)),
                                   np.asarray(scan_path(p)),
                                   rtol=1e-5, atol=1e-5)
        gs = jax.grad(lambda p: jnp.sum(scan_path(p) ** 2))(p)
        gf = jax.grad(lambda p: jnp.sum(fused_path(p) ** 2))(p)
        for k in gs:
            np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gs[k]),
                                       rtol=1e-3, atol=1e-5)

    def test_euler_pathwise(self):
        p, scan_path, fused_path = self._paths("euler")
        np.testing.assert_allclose(np.asarray(fused_path(p)),
                                   np.asarray(scan_path(p)),
                                   rtol=1e-5, atol=1e-5)

    def test_prepare_hook_values_and_grads(self):
        """sdeint_fused's prepare hook: same trajectory and gradients as
        formulating the drift on the raw args."""
        from columnflow.solvers.fused import sdeint_fused

        ts, y0, p, key, (i1, i10, _, _) = self._setup()

        def drift_prep(t, y, ka, kb, b):
            return -(ka + kb) * y + b + 0.2 * jnp.sin(t)

        def diff_prep(t, y, ka, kb, b):
            return 0.5 * jnp.ones_like(y)

        prepare = lambda p: (0.5 * p["k"], 0.5 * p["k"], p["b"])

        def plain(p):
            return sdeint_fused(self._drift, self._diff, y0, ts, key, p,
                                method="srk", noise_pack=(i1, i10),
                                interpret=True)

        def prepped(p):
            return sdeint_fused(drift_prep, diff_prep, y0, ts, key, p,
                                method="srk", noise_pack=(i1, i10),
                                prepare=prepare, interpret=True)

        np.testing.assert_allclose(np.asarray(prepped(p)),
                                   np.asarray(plain(p)),
                                   rtol=1e-5, atol=1e-6)
        gs = jax.grad(lambda p: jnp.sum(plain(p) ** 2))(p)
        gp = jax.grad(lambda p: jnp.sum(prepped(p) ** 2))(p)
        for kk in gs:
            np.testing.assert_allclose(np.asarray(gp[kk]), np.asarray(gs[kk]),
                                       rtol=1e-4, atol=1e-6)

    def test_key_convention_matches_scan(self):
        """Without an explicit noise_pack, the same key must give the same
        path as the scan sdeint (same _brownian_pack convention)."""
        from columnflow.solvers import sdeint
        from columnflow.solvers.fused import sdeint_fused

        ts, y0, p, key, _ = self._setup()
        ys_s = sdeint(self._drift, self._diff, y0, ts, key, p, method="srk",
                      additive=True, noise="scalar")
        ys_f = sdeint_fused(self._drift, self._diff, y0, ts, key, p,
                            method="srk", interpret=True)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_s),
                                   rtol=1e-5, atol=1e-5)


class TestInterpKnots:
    def test_exactly_matches_dense_step_table(self):
        from columnflow.data import parity_stim_table
        from columnflow.ops.interp import interp_knots, step_table_knots

        T, dt = 100, 1e-3
        stim = jnp.asarray([15.0, 0.0, 15.0])
        table = parity_stim_table(stim, T)  # (T, 3)
        kts, kvals = step_table_knots(T, dt, jnp.zeros(3), stim)
        for t in [0.0, 0.0123, 0.0485, 0.0489, 0.04931, 0.0495, 0.07, 0.0991]:
            dense = interp_at(jnp.asarray(t), 0.0, dt, table)
            knots = interp_knots(jnp.asarray(t), kts, kvals)
            # fp32 frac rounding differs between formulations mid-ramp
            np.testing.assert_allclose(np.asarray(knots), np.asarray(dense),
                                       rtol=1e-4, atol=1e-5)


class TestFusedSDEOuterArgGrads:
    """arg_grads="outer" (state-only backward kernel + step-batched outer
    VJPs) must match the in-kernel mode exactly, including with a partial
    trailing chunk."""

    def test_outer_matches_kernel_grads(self):
        from columnflow.solvers.fused import sdeint_fused
        from columnflow.solvers.sde import _brownian_pack

        ts = jnp.linspace(0.0, 1.0, 41)  # 40 steps; chunk 16 -> 2 full + 8
        y0 = jnp.arange(12.0).reshape(3, 4) / 6.0
        p = {"k": jnp.full((3, 4), 0.8), "b": jnp.full((3, 4), 0.1)}
        key = jax.random.PRNGKey(5)
        _, i1, i10, _, _ = _brownian_pack(key, ts, (), jnp.float32)

        def drift(t, y, p):
            return -p["k"] * y + p["b"]

        def diff(t, y, p):
            return 0.3 * jnp.ones_like(y)

        def run(mode):
            def loss(p):
                ys = sdeint_fused(drift, diff, y0, ts, key, p,
                                  method="srk", noise_pack=(i1, i10),
                                  chunk=16, arg_grads=mode, interpret=True)
                return jnp.sum(ys ** 2)

            return loss(p), jax.grad(loss)(p)

        v_k, g_k = run("kernel")
        v_o, g_o = run("outer")
        np.testing.assert_allclose(float(v_o), float(v_k), rtol=1e-6)
        for k in g_k:
            np.testing.assert_allclose(np.asarray(g_o[k]),
                                       np.asarray(g_k[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    def test_bad_arg_grads_raises(self):
        import pytest

        from columnflow.solvers.fused import sdeint_fused

        ts = jnp.linspace(0.0, 1.0, 5)
        with pytest.raises(ValueError, match="arg_grads"):
            sdeint_fused(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                         jnp.ones((2, 4)), ts, jax.random.PRNGKey(0),
                         arg_grads="nope", interpret=True)


class TestFusedRandomSystems:
    """Property-style check: on random stable linear systems y' = y A^T the
    fused solver must match the XLA path pathwise (same batched state ->
    same shared controller -> same step sequence) in values and gradients,
    across shapes and seeds."""

    @pytest.mark.parametrize("seed,B,S", [(0, 2, 8), (1, 4, 16), (2, 3, 24)])
    def test_values_and_grads_match_xla(self, seed, B, S):
        from columnflow.solvers import odeint
        from columnflow.solvers.fused import odeint_dopri5_fused

        rng = np.random.default_rng(seed)
        m = rng.normal(size=(S, S)) / np.sqrt(S)
        a = jnp.asarray(-(m @ m.T) - 0.5 * np.eye(S), jnp.float32)
        y0 = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
        ts = jnp.linspace(0.0, 2.0, 17)

        def drift(t, y, a):
            return jnp.matmul(y, a.T, precision=jax.lax.Precision.HIGHEST)

        ys_f = odeint_dopri5_fused(drift, y0, ts, a, max_steps=512,
                                   interpret=True)
        ys_x = odeint(drift, y0, ts, a, method="dopri5", adjoint="replay",
                      max_steps=512)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_x),
                                   rtol=2e-5, atol=2e-6)

        gf = jax.grad(lambda a: jnp.sum(odeint_dopri5_fused(
            drift, y0, ts, a, max_steps=512, interpret=True) ** 2))(a)
        gx = jax.grad(lambda a: jnp.sum(odeint(
            drift, y0, ts, a, method="dopri5", adjoint="replay",
            max_steps=512) ** 2))(a)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=5e-4, atol=1e-5)


class TestFusedMilstein:
    """Fused Milstein (in-kernel jvp diffusion derivative) vs the lax.scan
    path, pathwise on GBM with a pinned noise pack; plus gradients."""

    def test_milstein_pathwise_and_grads(self):
        from columnflow.solvers import sdeint
        from columnflow.solvers.fused import sdeint_fused
        from columnflow.solvers.sde import _brownian_pack

        ts = jnp.linspace(0.0, 1.0, 80)
        y0 = jnp.full((2, 4), 1.0)
        p = {"mu": jnp.full((2, 4), 0.3), "sig": jnp.full((2, 4), 0.5)}
        key = jax.random.PRNGKey(7)
        _, i1, i10, i11, i111 = _brownian_pack(key, ts, (), jnp.float32)

        def drift(t, y, p):
            return p["mu"] * y

        def diff(t, y, p):
            return p["sig"] * y

        ones = jnp.ones((1, 2, 4))
        scan_pack = tuple(x[:, None, None] * ones
                          for x in (i1, i10, i11, i111))

        def scan_path(p):
            return sdeint(drift, diff, y0, ts, key, p, method="milstein",
                          noise_pack=scan_pack)

        def fused_path(p):
            return sdeint_fused(drift, diff, y0, ts, key, p,
                                method="milstein", noise_pack=(i1, i10),
                                interpret=True)

        np.testing.assert_allclose(np.asarray(fused_path(p)),
                                   np.asarray(scan_path(p)),
                                   rtol=1e-5, atol=1e-5)
        gs = jax.grad(lambda p: jnp.sum(scan_path(p) ** 2))(p)
        gf = jax.grad(lambda p: jnp.sum(fused_path(p) ** 2))(p)
        for k in gs:
            np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gs[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)


class TestLaneBatchedVariableStep:
    """2-D ``ts_steps`` (B, n+1): B independent frozen step grids advance
    in ONE kernel sweep (the batched adaptive replay's engine). Must equal
    the per-sample variable-step solves lane for lane — values and
    gradients — and ``n_real`` tail skipping must not change either."""

    B, n, S = 3, 12, 4
    reals = (12, 7, 4)  # real steps per lane; rest is h == 0 padding

    def _setup(self, with_i10):
        key = jax.random.PRNGKey(0)
        # Lane b covers [0, 1] in reals[b] equal steps, then h = 0 padding.
        st = jnp.stack([
            jnp.minimum(jnp.arange(self.n + 1, dtype=jnp.float32), k) / k
            for k in self.reals
        ])                                                    # (B, n+1)
        mask = (st[:, 1:] > st[:, :-1]).astype(jnp.float32).T  # (n, B)
        i1 = 0.2 * jax.random.normal(key, (self.n, self.B)) * mask
        if with_i10:
            hs = (st[:, 1:] - st[:, :-1]).T
            i10 = hs * (0.5 * i1 + 0.1 * jax.random.normal(
                jax.random.fold_in(key, 1), (self.n, self.B)) * mask)
        else:
            i10 = jnp.zeros_like(i1)
        y0 = jnp.linspace(0.5, 1.5, self.B * self.S).reshape(self.B, self.S)
        th = jnp.full((self.S,), 1.1)
        return st, i1, i10, y0, th

    # Time enters the drift so per-lane t broadcasting (B, 1) is exercised.
    drift = staticmethod(lambda t, y, th: -th * y + 0.3 * t)
    diff = staticmethod(lambda t, y, th: 0.5 * jnp.ones_like(y))

    def _lanes(self, method, st, i1, i10, y0, th, **kw):
        from columnflow.solvers.fused import sdeint_fused

        return sdeint_fused(self.drift, self.diff, y0, None, None, th,
                            method=method, noise_pack=(i1, i10),
                            ts_steps=st, interpret=True, **kw)

    def _per_sample(self, method, st, i1, i10, y0, th, **kw):
        from columnflow.solvers.fused import sdeint_fused

        def one(st_b, i1_b, i10_b, y0_b):
            return sdeint_fused(self.drift, self.diff, y0_b, None, None, th,
                                method=method, noise_pack=(i1_b, i10_b),
                                ts_steps=st_b, interpret=True, **kw)

        return jax.vmap(one, in_axes=(0, 1, 1, 0), out_axes=1)(
            st, i1, i10, y0)

    @pytest.mark.parametrize("method", ["euler", "srk"])
    def test_matches_per_sample_solves(self, method):
        st, i1, i10, y0, th = self._setup(with_i10=(method == "srk"))
        ys_l = self._lanes(method, st, i1, i10, y0, th)
        ys_p = self._per_sample(method, st, i1, i10, y0, th)
        assert ys_l.shape == (self.n + 1, self.B, self.S)
        np.testing.assert_allclose(np.asarray(ys_l), np.asarray(ys_p),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("method", ["euler", "srk"])
    def test_gradients_match_per_sample(self, method):
        st, i1, i10, y0, th = self._setup(with_i10=(method == "srk"))

        def loss_l(y0, th):
            return jnp.sum(self._lanes(method, st, i1, i10, y0, th) ** 2)

        def loss_p(y0, th):
            return jnp.sum(self._per_sample(method, st, i1, i10, y0,
                                            th) ** 2)

        gl = jax.grad(loss_l, argnums=(0, 1))(y0, th)
        gp = jax.grad(loss_p, argnums=(0, 1))(y0, th)
        for a, b in zip(gl, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("chunk", [5, None])
    def test_n_real_skip_is_transparent(self, chunk):
        # Chunks past n_real are skipped at runtime; values, padded-row
        # states (carried state) and gradients are identical.
        st, i1, i10, y0, th = self._setup(with_i10=True)
        kw = dict(chunk=chunk)

        def loss(y0, th, n_real):
            ys = self._lanes("srk", st, i1, i10, y0, th,
                             n_real=n_real, **kw)
            return jnp.sum(ys ** 2), ys

        (l_all, ys_all), g_all = jax.value_and_grad(
            lambda a, b: loss(a, b, None), argnums=(0, 1),
            has_aux=True)(y0, th)
        (l_sk, ys_sk), g_sk = jax.value_and_grad(
            lambda a, b: loss(a, b, jnp.int32(max(self.reals))),
            argnums=(0, 1), has_aux=True)(y0, th)
        np.testing.assert_allclose(np.asarray(ys_sk), np.asarray(ys_all),
                                   rtol=1e-6, atol=1e-7)
        assert l_all == l_sk
        for a, b in zip(g_sk, g_all):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_n_real_per_sample_vmapped(self):
        # Per-sample variable mode under vmap: each lane skips ITS OWN
        # tail (n_real batches like the other scalars).
        from columnflow.solvers.fused import sdeint_fused

        st, i1, i10, y0, th = self._setup(with_i10=False)

        def one(st_b, i1_b, i10_b, y0_b, n_b):
            return sdeint_fused(self.drift, self.diff, y0_b, None, None,
                                th, method="euler",
                                noise_pack=(i1_b, i10_b), ts_steps=st_b,
                                interpret=True, chunk=4, n_real=n_b)

        n_bs = jnp.asarray(self.reals, jnp.int32)
        ys_sk = jax.vmap(one, in_axes=(0, 1, 1, 0, 0), out_axes=1)(
            st, i1, i10, y0, n_bs)
        ys_all = self._per_sample("euler", st, i1, i10, y0, th)
        np.testing.assert_allclose(np.asarray(ys_sk), np.asarray(ys_all),
                                   rtol=1e-6, atol=1e-7)

    def test_shape_validation(self):
        from columnflow.solvers.fused import sdeint_fused

        st, i1, i10, y0, th = self._setup(with_i10=False)
        with pytest.raises(ValueError, match="lane"):
            sdeint_fused(self.drift, self.diff, y0[:2], None, None, th,
                         method="euler", noise_pack=(i1, i10), ts_steps=st,
                         interpret=True)
        with pytest.raises(ValueError, match="n_real"):
            sdeint_fused(self.drift, self.diff, y0, jnp.linspace(0, 1, 5),
                         jax.random.PRNGKey(0), th, method="euler",
                         n_real=4, interpret=True)


class TestVjpDriftSubstitute:
    """``vjp_drift``/``vjp_diffusion``: a substitute formulation used ONLY
    for the outer step-batched arg-gradient VJPs. Values must be bitwise
    the exact drift's; with an identical substitute the gradients match
    exactly; with a bf16-cast substitute they match at bf16 tolerance."""

    def _setup(self):
        n, B, S = 16, 2, 8
        st = jnp.stack([jnp.linspace(0.0, 1.0, n + 1)] * B)
        key = jax.random.PRNGKey(0)
        i1 = 0.1 * jax.random.normal(key, (n, B))
        i10 = jnp.zeros((n, B))
        y0 = jnp.ones((B, S))
        w = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (S, S))
        return st, i1, i10, y0, w

    @staticmethod
    def drift(t, y, w):
        return jnp.matmul(y, w, precision=jax.lax.Precision.HIGHEST) - y

    @staticmethod
    def drift16(t, y, w):
        return jnp.matmul(y.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) - y

    diff = staticmethod(lambda t, y, w: 0.3 * jnp.ones_like(y))

    def _run(self, vjp_drift, big_arg=True):
        from columnflow.solvers.fused import sdeint_fused

        st, i1, i10, y0, w = self._setup()
        # Force arg_grads="outer" (vjp_drift applies to the outer sweep).
        def loss(w):
            ys = sdeint_fused(self.drift, self.diff, y0, None, None, w,
                              method="euler", noise_pack=(i1, i10),
                              ts_steps=st, interpret=True,
                              arg_grads="outer",
                              vjp_drift=vjp_drift,
                              vjp_diffusion=self.diff
                              if vjp_drift is not None else None)
            return jnp.sum(ys ** 2), ys

        (l, ys), g = jax.value_and_grad(loss, has_aux=True)(w)
        return np.asarray(ys), np.asarray(g)

    def test_identical_substitute_matches_exactly(self):
        ys0, g0 = self._run(None)
        ys1, g1 = self._run(self.drift)
        np.testing.assert_array_equal(ys1, ys0)
        np.testing.assert_array_equal(g1, g0)

    def test_bf16_substitute_values_exact_grads_close(self):
        ys0, g0 = self._run(None)
        ys1, g1 = self._run(self.drift16)
        np.testing.assert_array_equal(ys1, ys0)   # values untouched
        assert not np.array_equal(g1, g0)          # gradients DO change
        np.testing.assert_allclose(g1, g0, rtol=0.05, atol=1e-4)

    def test_requires_outer_and_diffusion(self):
        from columnflow.solvers.fused import sdeint_fused

        st, i1, i10, y0, w = self._setup()
        with pytest.raises(ValueError, match="vjp_diffusion"):
            sdeint_fused(self.drift, self.diff, y0, None, None, w,
                         method="euler", noise_pack=(i1, i10), ts_steps=st,
                         interpret=True, arg_grads="outer",
                         vjp_drift=self.drift16)
        with pytest.raises(ValueError, match="outer"):
            sdeint_fused(self.drift, self.diff, y0, None, None, w,
                         method="euler", noise_pack=(i1, i10), ts_steps=st,
                         interpret=True, arg_grads="kernel",
                         vjp_drift=self.drift16, vjp_diffusion=self.diff)


class TestCompileOrFallback:
    """Graceful scale fallback (round-4 VERDICT #1): past the fused VMEM
    ceiling, ``compile_or_fallback`` routes to the XLA engine with a
    RuntimeWarning instead of surfacing a raw Mosaic/backend error
    (BASELINE.md "Single-chip scale ceiling")."""

    def test_success_path_runs_compiled_and_handles_new_shapes(self):
        from columnflow.solvers.fused import compile_or_fallback

        fused = jax.jit(lambda x: x * 2.0)
        fn, used = compile_or_fallback(
            fused, lambda: (_ for _ in ()).throw(AssertionError(
                "fallback must not be built on success")),
            (jnp.ones(3),))
        assert used
        # Matching shape dispatches the probe's AOT executable; a new
        # shape (the trainer's tail block) falls through to the jit fn.
        np.testing.assert_allclose(np.asarray(fn(jnp.ones(3))), 2.0)
        np.testing.assert_allclose(np.asarray(fn(jnp.ones(5))), 2.0)

    def test_failure_routes_to_fallback_with_warning(self):
        from columnflow.solvers.fused import compile_or_fallback

        class BoomProgram:
            def lower(self, *a):
                raise RuntimeError("RESOURCE_EXHAUSTED: vmem limit")

        fallback = jax.jit(lambda x: x + 1.0)
        with pytest.warns(RuntimeWarning, match="falling back to the XLA"):
            fn, used = compile_or_fallback(BoomProgram(), lambda: fallback,
                                           (jnp.ones(3),))
        assert not used and fn is fallback
        np.testing.assert_allclose(np.asarray(fn(jnp.ones(3))), 2.0)

    def test_programming_errors_reraise(self):
        """Python-level errors (a bad pytree, a tracer shape bug) must NOT
        be misreported as the VMEM ceiling (round-4 advisor): only
        backend/XLA compile errors fall back."""
        from columnflow.solvers.fused import compile_or_fallback

        class TypeBoom:
            def lower(self, *a):
                raise TypeError("unhashable static arg in drift closure")

        with pytest.raises(TypeError, match="unhashable"):
            compile_or_fallback(TypeBoom(), lambda: None, (jnp.ones(3),))

        # A real tracing error through jit also re-raises (jax raises
        # TypeError for shape mismatches at trace time).
        bad = jax.jit(lambda x: x + jnp.ones((2, 7)))
        with pytest.raises(Exception) as ei:
            compile_or_fallback(bad, lambda: None, (jnp.ones(3),))
        assert not isinstance(ei.value, RuntimeWarning)

    def test_marked_nonruntime_errors_still_fall_back(self):
        """Errors that are not RuntimeError but carry an explicit Mosaic/
        XLA marker (remote-compile wrappers) still route to the
        fallback."""
        from columnflow.solvers.fused import compile_or_fallback

        class MarkedBoom:
            def lower(self, *a):
                raise ValueError("Mosaic failed to legalize op")

        fallback = object()
        with pytest.warns(RuntimeWarning, match="falling back"):
            fn, used = compile_or_fallback(MarkedBoom(), lambda: fallback,
                                           (jnp.ones(3),))
        assert not used and fn is fallback

    def test_not_implemented_error_reraises(self):
        """NotImplementedError subclasses RuntimeError but is JAX's
        missing-rule report (e.g. a primitive in the caller's drift with
        no batching/transpose rule) — a programming error that must
        re-raise, not be misreported as the VMEM ceiling. A marked one
        (backend UNIMPLEMENTED) still falls back."""
        from columnflow.solvers.fused import compile_or_fallback

        class RuleBoom:
            def lower(self, *a):
                raise NotImplementedError(
                    "Batching rule for 'my_prim' not implemented")

        with pytest.raises(NotImplementedError, match="Batching rule"):
            compile_or_fallback(RuleBoom(), lambda: None, (jnp.ones(3),))

        class MarkedRuleBoom:
            def lower(self, *a):
                raise NotImplementedError("UNIMPLEMENTED: backend refusal")

        fallback = object()
        with pytest.warns(RuntimeWarning, match="falling back"):
            fn, used = compile_or_fallback(MarkedRuleBoom(),
                                           lambda: fallback,
                                           (jnp.ones(3),))
        assert not used and fn is fallback


class TestGradOfJit:
    """Round-4 VERDICT #5: ``grad(jit(f))`` used to die with an opaque
    upstream tracer-constant error ("No constant handler for
    DynamicJaxprTracer") because the replay custom_vjp closed over the
    adaptive pass's traced step grid. Fixed by passing step_times/naccept
    as formal zero-cotangent custom_vjp arguments — both composition
    orders now produce identical gradients."""

    @staticmethod
    def _k():
        return jnp.full((1, 8), 0.5)

    def _check(self, loss, k):
        g_inner = jax.jit(jax.grad(loss))(k)   # the supported form
        g_outer = jax.grad(jax.jit(loss))(k)   # the previously-broken form
        np.testing.assert_allclose(np.asarray(g_outer), np.asarray(g_inner),
                                   rtol=1e-6)

    def test_odeint_fused_kernel_arg_grads(self):
        from columnflow.solvers.fused import odeint_dopri5_fused

        ts = jnp.linspace(0.0, 1.0, 10)
        y0 = jnp.ones((1, 8))

        def loss(k):
            ys = odeint_dopri5_fused(lambda t, y, kk: -kk * y, y0, ts, k,
                                     max_steps=64, chunk=16, interpret=True)
            return jnp.sum(ys[-1])

        self._check(loss, self._k())

    def test_odeint_fused_outer_arg_grads(self):
        from columnflow.solvers.fused import odeint_dopri5_fused

        ts = jnp.linspace(0.0, 1.0, 10)
        y0 = jnp.ones((1, 8))

        def loss(k):
            ys = odeint_dopri5_fused(lambda t, y, kk: -kk * y, y0, ts, k,
                                     max_steps=64, chunk=16, interpret=True,
                                     arg_grads="outer")
            return jnp.sum(ys[-1])

        self._check(loss, self._k())

    def test_sdeint_fused(self):
        from columnflow.solvers.fused import sdeint_fused

        ts = jnp.linspace(0.0, 1.0, 10)

        def loss(k):
            ys = sdeint_fused(lambda t, y, kk: -kk * y,
                              lambda t, y, kk: 0.1 * jnp.ones_like(y),
                              jnp.ones((1, 8)), ts, jax.random.PRNGKey(0),
                              k, method="srk", interpret=True)
            return jnp.sum(ys[-1])

        self._check(loss, self._k())

    def test_sdeint_adaptive_fused_replay(self):
        from columnflow.solvers import sdeint_adaptive

        ts = jnp.linspace(0.0, 1.0, 10)

        def loss(k):
            ys = sdeint_adaptive(lambda t, y, kk: -kk * y,
                                 lambda t, y, kk: 0.1 * jnp.ones_like(y),
                                 jnp.ones((1, 8)), ts, jax.random.PRNGKey(0),
                                 k, method="sra1", rtol=1e-3, atol=1e-3,
                                 max_steps=128, differentiable=True,
                                 fused=True, interpret=True)
            return jnp.sum(ys[-1])

        self._check(loss, self._k())


class TestSelectFuncAndSplit2:
    """Round-4 scale tier: ``odeint_dopri5_fused(select_func=...)``
    (selection-drift override, deterministic analog of the stochastic
    engine's select_drift) and the parity trainer's ``split2`` 3-pass
    bf16 value/gradient tier (models.network.matmul_split2)."""

    def test_select_func_same_drift_is_identity(self):
        from columnflow.solvers.fused import odeint_dopri5_fused

        ts = jnp.linspace(0.0, 3.0, 40)
        y0 = jnp.arange(1.0, 9.0).reshape(2, 4)
        k = jnp.full((2, 4), 0.7)
        base = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=256,
                                   chunk=32, interpret=True)
        same = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=256,
                                   chunk=32, select_func=_exp_drift,
                                   select_args=(k,), interpret=True)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(base))

    def test_select_func_default_args_pytree(self):
        """select_func with select_args omitted gets the ORIGINAL
        (pre-flatten) user args — including pytree args (round-4 review
        fix: the default used to receive the flattened leaf tuple)."""
        from columnflow.solvers.fused import odeint_dopri5_fused

        def drift(t, y, p):
            return -p["k"] * y + p["b"]

        ts = jnp.linspace(0.0, 2.0, 20)
        y0 = jnp.ones((2, 4))
        p = {"k": jnp.full((2, 4), 0.5), "b": jnp.full((2, 4), 0.1)}
        base = odeint_dopri5_fused(drift, y0, ts, p, max_steps=256,
                                   chunk=32, interpret=True)
        same = odeint_dopri5_fused(drift, y0, ts, p, max_steps=256,
                                   chunk=32, select_func=drift,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(base))

    def test_select_func_steers_grid_not_values(self):
        """A stiffer selection drift forces a denser grid; values still
        come from the true drift, so the result matches the base solve to
        solver tolerance (a denser grid can only help)."""
        from columnflow.solvers.fused import odeint_dopri5_fused

        ts = jnp.linspace(0.0, 3.0, 40)
        y0 = jnp.arange(1.0, 9.0).reshape(2, 4)
        k = jnp.full((2, 4), 0.7)
        stiff = lambda t, y, kk: _exp_drift(t, y, 30.0 * kk)
        base = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=1024,
                                   chunk=32, interpret=True)
        dense = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=1024,
                                    chunk=32, select_func=stiff,
                                    select_args=(k,), interpret=True)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(base),
                                   rtol=1e-5, atol=1e-7)

    def test_matmul_split2_accuracy(self):
        from columnflow.models.network import matmul_split2

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 256))
        w = jax.random.normal(jax.random.fold_in(key, 1), (256, 256))
        want = jnp.matmul(x, w, precision=jax.lax.Precision.HIGHEST)
        f32 = jnp.float32
        w_hi = w.astype(jnp.bfloat16)
        w_mid = (w - w_hi.astype(f32)).astype(jnp.bfloat16)
        got = matmul_split2(x, w_hi, w_mid)
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 1e-5, rel  # 2^-16-class terms average down by sqrt(K)
        # (measured 3.9e-6 max-rel at K=256 with N(0,1) operands)

    def test_parity_split2_values_and_grads_near_exact(self):
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as par

        cfg = ColumnConfig.load()
        task = par.build_task(cfg, jax.random.PRNGKey(0),
                              columns_per_area=(2, 1), n_inputs=2,
                              time_steps=80, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)

        def loss(p, split2):
            ys = par.batched_rollout(p, task, stims, use_fused=True,
                                     split2=split2)
            return jnp.sum(par.readout(ys, p, task.net) ** 2)

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(task.params)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(task.params)
        # Measured tier error: 1.2e-4 relative on this stiff 80-step
        # workload's squared readout (the exact engine's XLA-parity
        # contract stays with split2=False).
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-3)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            assert np.all(np.isfinite(b)), k
            scale = max(1e-6, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3 * scale,
                                       err_msg=k)

    def test_split2_requires_deterministic_fused(self):
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as par

        cfg = ColumnConfig.load()
        task = par.build_task(cfg, jax.random.PRNGKey(0),
                              columns_per_area=(2, 1), n_inputs=2,
                              time_steps=60, max_steps=256)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        with pytest.raises(ValueError, match="split2"):
            par.batched_rollout(task.params, task, stims, split2=True)

    def test_stochastic_adaptive_split2(self):
        """The flagship stochastic-adaptive fused path with split2: the
        selection pass is untouched (identical frozen grids), so values/
        gradients differ from the exact tier only by the 3-pass replay —
        close at tier tolerance, and the step is jit/grad-safe."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as par

        cfg = ColumnConfig.load()
        task = par.build_task(cfg, jax.random.PRNGKey(0),
                              columns_per_area=(2, 1), n_inputs=2,
                              time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        key = jax.random.PRNGKey(3)

        def loss(p, split2):
            ys = par.batched_rollout(p, task, stims, use_fused=True,
                                     stochastic=True, adaptive=True,
                                     key=key, split2=split2)
            return jnp.sum(par.readout(ys, p, task.net) ** 2)

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(task.params)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(task.params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=5e-3)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            assert np.all(np.isfinite(b)), k
            scale = max(1e-6, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, rtol=2e-2, atol=1e-2 * scale,
                                       err_msg=k)
