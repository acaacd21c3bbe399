"""Pallas kernel parity tests (interpret mode on CPU; compiled on real TPU
via the verify drive).

The fused kernels must match the XLA lax.scan solver path bit-for-bit up to
float32 reassociation (tolerances ~1e-4 relative on trajectories).
"""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.data import wta_stim_three_phases
from columnflow.kernels import (
    fused_drift,
    wta_rollout_fused,
    wta_rollout_reference,
)
from columnflow.models import Stimulus, build_wta, wta_drift

CFG = ColumnConfig.load()


def _setup(B=4, T=120):
    params, area = build_wta(CFG, jax.random.PRNGKey(0))
    dt = 1e-4
    ts = jnp.linspace(0.0, T * dt, T)
    stims = jnp.asarray([[20.0, 5.0 + i] for i in range(B)])
    tables = jax.vmap(lambda s: wta_stim_three_phases(s, T))(stims)
    return params, area, tables, ts


class TestFusedDrift:
    def test_matches_xla_drift(self):
        params, area, tables, ts = _setup()
        B = tables.shape[0]
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(B, 48)).astype(np.float32))
        stim_t = tables[:, 40, :]

        got = fused_drift(y, stim_t, params, area, interpret=True)

        # Oracle: vmapped model drift with a constant-in-time stimulus table.
        def one(y_i, s_i):
            table = jnp.tile(s_i, (2, 1))
            return wta_drift(0.0, y_i, params, area, Stimulus(0.0, 1.0, table))

        want = jax.vmap(one)(y, stim_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-3)


class TestFusedRollout:
    def test_matches_scan_solver(self):
        params, area, tables, ts = _setup(B=3, T=100)
        B, T = 3, 100
        key = jax.random.PRNGKey(7)
        h = float(ts[1] - ts[0])
        z1, z2 = jax.random.normal(key, (2, T - 1, B))
        i1 = np.sqrt(h) * z1
        i10 = h * (0.5 * i1 + np.sqrt(h / 12) * z2)

        got = wta_rollout_fused(params, area, tables, ts, i1, i10,
                                interpret=True)
        want = wta_rollout_reference(params, area, tables, ts, i1, i10)
        assert got.shape == want.shape == (B, T, 48)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3
        )

    def test_membrane_only_variant(self):
        params, area, tables, ts = _setup(B=2, T=50)
        i1 = jnp.zeros((49, 2))
        i10 = jnp.zeros((49, 2))
        a = wta_rollout_fused(params, area, tables, ts, i1, i10,
                              membrane_only=True, interpret=True)
        b = wta_rollout_fused(params, area, tables, ts, i1, i10,
                              membrane_only=False, interpret=True)
        # With zero noise the variants coincide (deterministic path).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDifferentiableFusedRollout:
    """The custom-VJP fused rollout: value AND gradient parity vs the
    differentiable lax.scan solver path (the WTA training fast path)."""

    def _losses(self, B=3, T=80):
        from columnflow.kernels.column_step import make_wta_rollout_diff
        from columnflow.ops.losses import huber_trajectory_loss_wta

        params, area, tables, ts = _setup(B=B, T=T)
        tables = tables[:B]
        h = float(ts[1] - ts[0])
        z1, z2 = jax.random.normal(jax.random.PRNGKey(3), (2, T - 1, B))
        i1 = jnp.sqrt(h) * z1
        i10 = h * (0.5 * i1 + jnp.sqrt(h / 12.0) * z2)
        true = 0.5 * jnp.ones((B, T, 2))
        ow = params["output_weights"]
        rollout = make_wta_rollout_diff(area, ts, interpret=True)

        def loss_fused(w):
            return huber_trajectory_loss_wta(
                rollout(w, tables, i1, i10), true, ow
            )

        def loss_scan(w):
            ys = wta_rollout_reference(
                dict(params, recurrent_weights=w), area, tables, ts, i1, i10
            )
            return huber_trajectory_loss_wta(ys, true, ow)

        return params["recurrent_weights"], loss_fused, loss_scan

    def test_value_parity(self):
        w, loss_fused, loss_scan = self._losses()
        lf, ls = float(loss_fused(w)), float(loss_scan(w))
        np.testing.assert_allclose(lf, ls, rtol=1e-4)

    def test_gradient_parity(self):
        w, loss_fused, loss_scan = self._losses()
        gf = jax.grad(loss_fused)(w)
        gs = jax.grad(loss_scan)(w)
        # fp32 SDE gradients are ill-conditioned; both paths sit ~ the same
        # distance from the f64 truth (verified offline), so compare in
        # relative L2, not elementwise.
        num = float(jnp.linalg.norm(gf - gs))
        den = float(jnp.linalg.norm(gs))
        assert num < 0.05 * den, (num, den)

    def test_zero_cotangent_for_data_inputs(self):
        from columnflow.kernels.column_step import make_wta_rollout_diff

        params, area, tables, ts = _setup(B=2, T=40)
        T, B = 40, 2
        tables = tables[:B]
        h = float(ts[1] - ts[0])
        i1 = jnp.sqrt(h) * jax.random.normal(jax.random.PRNGKey(5), (T - 1, B))
        i10 = h * 0.5 * i1
        rollout = make_wta_rollout_diff(area, ts, interpret=True)
        g_tab = jax.grad(
            lambda tab: jnp.sum(
                rollout(params["recurrent_weights"], tab, i1, i10)
            )
        )(tables)
        assert float(jnp.max(jnp.abs(g_tab))) == 0.0


class TestChunkedFusedRollout:
    def test_matches_unchunked_exactly(self):
        """Chunking (incl. a remainder chunk) must be bit-identical: same
        step math, same stimulus overlap rows."""
        from columnflow.kernels.column_step import (
            wta_rollout_fused,
            wta_rollout_fused_chunked,
        )

        params, area, tables, ts = _setup(B=2, T=101)
        tables, B, T = tables[:2], 2, 101
        h = float(ts[1] - ts[0])
        z1, z2 = jax.random.normal(jax.random.PRNGKey(2), (2, T - 1, B))
        i1 = jnp.sqrt(h) * z1
        i10 = h * (0.5 * i1 + jnp.sqrt(h / 12.0) * z2)
        y0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, 48))
        full = wta_rollout_fused(params, area, tables, ts, i1, i10,
                                 interpret=True, y0=y0)
        chunked = wta_rollout_fused_chunked(params, area, y0, tables, ts,
                                            i1, i10, chunk=24, interpret=True)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


class TestChunkedBackward:
    def test_chunked_matches_unchunked(self):
        """Splitting both sweeps into VMEM chunks must not change values or
        gradients (same step order; only the wbar accumulation regroups)."""
        from columnflow.kernels.column_step import make_wta_rollout_diff
        from columnflow.ops.losses import huber_trajectory_loss_wta

        B, T = 6, 100
        params, area, tables, _ = _setup(B=B, T=T)
        ts = jnp.linspace(0.0, T * 1e-4, T)
        h = float(ts[1] - ts[0])
        z1, z2 = jax.random.normal(jax.random.PRNGKey(3), (2, T - 1, B))
        i1 = jnp.sqrt(h) * z1
        i10 = h * (0.5 * i1 + jnp.sqrt(h / 12.0) * z2)
        true = 0.5 * jnp.ones((B, T, 2))
        ow = params["output_weights"]
        w = params["recurrent_weights"]

        def loss(rollout):
            return lambda w: huber_trajectory_loss_wta(
                rollout(w, tables, i1, i10), true, ow
            )

        # 99 steps = 5 chunks of 17 + a remainder of 14.
        r_un = make_wta_rollout_diff(area, ts, interpret=True, chunk=T - 1)
        r_ch = make_wta_rollout_diff(area, ts, interpret=True, chunk=17)
        np.testing.assert_allclose(float(loss(r_ch)(w)),
                                   float(loss(r_un)(w)), rtol=0, atol=0)
        g_un = jax.grad(loss(r_un))(w)
        g_ch = jax.grad(loss(r_ch))(w)
        np.testing.assert_allclose(np.asarray(g_ch), np.asarray(g_un),
                                   rtol=1e-5, atol=1e-9)
