"""Compiled-TPU kernel tier (round-1 VERDICT Missing #4 / Next #5).

Every Pallas kernel in the framework, compiled for real through Mosaic on
the bench chip and asserted against the XLA path on-device — the interpret-
mode CPU tests (test_fused.py, test_kernels.py) cover semantics; this tier
covers the actual TPU lowering, so a Mosaic regression (new JAX pin, new
workaround needed — see the "Mosaic workarounds" notes in solvers/fused.py)
fails here instead of only surfacing as a bench.py crash.

Run: ``COLUMNFLOW_TPU_TESTS=1 python -m pytest tests/ -m tpu -q`` on the
TPU host (auto-skipped everywhere else; see tests/conftest.py).

Covers: fused dopri5 fwd+bwd in both arg_grads modes, sdeint_fused for all
three methods (+ outer arg-grads), the WTA rollout fwd+bwd including the
chunked variants, and the fused drift kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.config import ColumnConfig
from columnflow.data import wta_stim_three_phases
from columnflow.solvers import odeint, sdeint
from columnflow.solvers.fused import odeint_dopri5_fused, sdeint_fused
from columnflow.solvers.sde import _brownian_pack

pytestmark = pytest.mark.tpu

CFG = ColumnConfig.load()


def _exp_drift(t, y, k):
    return -k * y + jnp.sin(3.0 * t) * jnp.ones_like(y)


class TestCompiledFusedDopri5:
    def _setup(self):
        ts = jnp.linspace(0.0, 5.0, 80)
        y0 = jnp.arange(1.0, 9.0).reshape(2, 4)
        k = jnp.full((2, 4), 0.7)
        return ts, y0, k

    def test_forward_parity(self):
        ts, y0, k = self._setup()
        ys_x = odeint(_exp_drift, y0, ts, k, method="dopri5")
        ys_f = odeint_dopri5_fused(_exp_drift, y0, ts, k, max_steps=256,
                                   chunk=64)
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_x),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("mode", ["kernel", "outer"])
    def test_backward_parity(self, mode):
        ts, y0, k = self._setup()

        def loss_x(y0, k):
            return jnp.sum(odeint(_exp_drift, y0, ts, k,
                                  method="dopri5") ** 2)

        def loss_f(y0, k):
            return jnp.sum(odeint_dopri5_fused(
                _exp_drift, y0, ts, k, max_steps=256, chunk=64,
                arg_grads=mode) ** 2)

        gx = jax.grad(loss_x, argnums=(0, 1))(y0, k)
        gf = jax.grad(loss_f, argnums=(0, 1))(y0, k)
        for a, b in zip(gx, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-5)


class TestCompiledFusedSDE:
    def _setup(self):
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

    @pytest.mark.parametrize("method", ["euler", "srk"])
    def test_pathwise_parity(self, method):
        ts, y0, p, key, (i1, i10, i11, i111) = self._setup()
        ones = jnp.ones((1, 3, 4))
        scan_pack = tuple(x[:, None, None] * ones
                          for x in (i1, i10, i11, i111))
        ys_s = sdeint(self._drift, self._diff, y0, ts, key, p,
                      method=method, additive=True, noise_pack=scan_pack)
        ys_f = sdeint_fused(self._drift, self._diff, y0, ts, key, p,
                            method=method, noise_pack=(i1, i10))
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_s),
                                   rtol=1e-4, atol=1e-4)

    def test_milstein_pathwise_gbm(self):
        """Milstein on multiplicative (GBM) noise — the in-kernel jax.jvp
        diffusion-derivative path, compiled."""
        ts = jnp.linspace(0.0, 1.0, 80)
        y0 = jnp.full((2, 4), 1.0)
        p = {"mu": jnp.full((2, 4), 0.3), "sig": jnp.full((2, 4), 0.5)}
        key = jax.random.PRNGKey(7)
        _, i1, i10, i11, i111 = _brownian_pack(key, ts, (), jnp.float32)
        drift = lambda t, y, p: p["mu"] * y
        diff = lambda t, y, p: p["sig"] * y
        ones = jnp.ones((1, 2, 4))
        scan_pack = tuple(x[:, None, None] * ones
                          for x in (i1, i10, i11, i111))
        ys_s = sdeint(drift, diff, y0, ts, key, p, method="milstein",
                      noise_pack=scan_pack)
        ys_f = sdeint_fused(drift, diff, y0, ts, key, p, method="milstein",
                            noise_pack=(i1, i10))
        np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_s),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["kernel", "outer"])
    def test_srk_grads(self, mode):
        ts, y0, p, key, (i1, i10, i11, i111) = self._setup()
        ones = jnp.ones((1, 3, 4))
        scan_pack = tuple(x[:, None, None] * ones
                          for x in (i1, i10, i11, i111))

        def loss_s(p):
            return jnp.sum(sdeint(self._drift, self._diff, y0, ts, key, p,
                                  method="srk", additive=True,
                                  noise_pack=scan_pack) ** 2)

        def loss_f(p):
            return jnp.sum(sdeint_fused(self._drift, self._diff, y0, ts,
                                        key, p, method="srk",
                                        noise_pack=(i1, i10),
                                        arg_grads=mode) ** 2)

        gs = jax.grad(loss_s)(p)
        gf = jax.grad(loss_f)(p)
        for kk in gs:
            np.testing.assert_allclose(np.asarray(gf[kk]),
                                       np.asarray(gs[kk]),
                                       rtol=1e-3, atol=1e-4)


def _scale_rel(got, want):
    g, w = np.asarray(got), np.asarray(want)
    return float(np.abs(g - w).max() / max(1.0, np.abs(w).max()))


class TestCompiledAdaptiveReplay:
    """The fused adaptive-SDE replay (sdeint_fused ts_steps mode):
    variable-step kernels compiled through Mosaic, vs the scan replay."""

    def test_fused_replay_matches_scan_and_grads(self):
        from columnflow.solvers import sdeint_adaptive

        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: 0.5 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(5)
        th0 = jnp.full((4,), 1.3)

        def run(fused):
            return sdeint_adaptive(drift, diff, jnp.ones(4), ts, key, th0,
                                   method="sra1", rtol=1e-4, atol=1e-4,
                                   max_steps=256, differentiable=True,
                                   fused=fused)

        a, b = run(False), run(True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

        def final(theta, fused):
            ys = sdeint_adaptive(drift, diff, jnp.ones(4), ts, key, theta,
                                 method="sra1", rtol=1e-4, atol=1e-4,
                                 max_steps=256, differentiable=True,
                                 fused=fused)
            return jnp.sum(ys ** 2)

        g_scan = np.asarray(jax.grad(lambda t: final(t, False))(th0))
        g_fused = np.asarray(jax.grad(lambda t: final(t, True))(th0))
        np.testing.assert_allclose(g_fused, g_scan, rtol=1e-3, atol=1e-5)

    def test_vmapped_fused_replay_compiles_and_matches(self):
        """vmap(B=3) over the fused replay, COMPILED: Mosaic batches every
        kernel ref, and a batched block passes the trailing-dims rule only
        if the unbatched ref was >= 2-D (trailing dims then equal the
        array's). Hence the SMEM scalar refs are (1, n) and states must be
        the 2-D (1, S) layout the kernel-safe batched drifts already use —
        the 104-column --fused --adaptive failure mode (RESULTS.md)."""
        from columnflow.solvers import sdeint_adaptive

        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: 0.5 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 9)
        keys = jax.random.split(jax.random.PRNGKey(11), 3)
        th0 = jnp.full((4,), 1.3)
        y0 = jnp.ones((1, 4))  # 2-D state: vmapped-compiled support surface

        def loss(t, fused):
            return jnp.sum(jax.vmap(
                lambda k: sdeint_adaptive(
                    drift, diff, y0, ts, k, t, method="sra1",
                    rtol=1e-4, atol=1e-4, max_steps=256,
                    differentiable=True, fused=fused, bptt_every=8) ** 2
            )(keys))

        # Differentiate INSIDE jit — the trainers' pattern and the solvers'
        # documented support surface (see fused.py module docstring).
        v_scan, g_scan = jax.jit(
            jax.value_and_grad(lambda t: loss(t, False)))(th0)
        v_fused, g_fused = jax.jit(
            jax.value_and_grad(lambda t: loss(t, True)))(th0)
        np.testing.assert_allclose(float(v_fused), float(v_scan), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_scan),
                                   rtol=1e-3, atol=1e-5)


class TestCompiledFusedSelectionPass:
    """The in-kernel adaptive-SDE step-size-selection pass
    (``sdeint_adaptive(..., fused_pass=True)``) compiled through Mosaic,
    vs the XLA pass (``brownian="kernel"``) on the SAME krng Brownian path
    on-device. Selection-semantics assertions per
    tests/test_sde_adaptive.py::TestFusedPass (near-threshold accept flips
    make the two valid grids diverge at ULP level, so step economics and
    tolerance-level agreement are the pinned properties)."""

    def _ou(self):
        drift = lambda t, y, th_: -th_ * y
        diff = lambda t, y, th_: jnp.full_like(y, 0.5)
        ts = jnp.linspace(0.0, 1.0, 11)
        theta = jnp.full((1, 4), 1.0)
        y0 = jnp.ones((1, 4))
        return drift, diff, y0, ts, theta

    def test_fused_pass_on_device(self):
        from columnflow.solvers import sdeint_adaptive

        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(3)
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=512,
                  differentiable=True, return_stats=True)
        ys_x, st_x = sdeint_adaptive(drift, diff, y0, ts, key, theta,
                                     brownian="kernel", **kw)
        ys_k, st_k = sdeint_adaptive(drift, diff, y0, ts, key, theta,
                                     fused_pass=True, **kw)
        assert bool(st_k.success)
        assert abs(int(st_k.naccept) - int(st_x.naccept)) <= 3
        np.testing.assert_allclose(np.asarray(ys_k[-1]),
                                   np.asarray(ys_x[-1]), atol=0.03)

    def test_fused_pass_grads_on_device(self):
        from columnflow.solvers import sdeint_adaptive

        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(5)

        def loss(th_, fused_pass):
            ys = sdeint_adaptive(drift, diff, y0, ts, key, th_,
                                 method="sra1", rtol=1e-3, atol=1e-3,
                                 max_steps=512, differentiable=True,
                                 fused_pass=fused_pass, brownian="kernel")
            return jnp.sum(ys[-1] ** 2)

        g_x = jax.grad(lambda t: loss(t, False))(theta)
        g_k = jax.grad(lambda t: loss(t, True))(theta)
        assert np.all(np.isfinite(np.asarray(g_k)))
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                                   rtol=0.05, atol=1e-4)


class TestCompiledWTAKernels:
    """Compiled WTA kernels vs the XLA reference path.

    Tolerances are horizon-dependent by measurement: the compiled kernel's
    MXU matmul rounds differently from XLA's HIGHEST path (~1e-6/step), and
    the stiff column dynamics amplify that seed — measured scale-relative
    trajectory divergence 1.7e-4 at T=20, 2.8e-3 at T=50, 9.0e-3 at T=100
    on the bench chip. Short horizons assert tight parity (catches logic
    regressions); T=100 asserts a 3e-2 scale-relative bound (catches
    lowering breakage while tolerating fp-seeded divergence growth).
    """

    def _setup(self, B=3, T=100):
        from columnflow.models import build_wta

        params, area = build_wta(CFG, jax.random.PRNGKey(0))
        dt = 1e-4
        ts = jnp.linspace(0.0, T * dt, T)
        stims = jnp.asarray([[20.0, 5.0 + i] for i in range(B)])
        tables = jax.vmap(lambda s: wta_stim_three_phases(s, T))(stims)
        h = float(ts[1] - ts[0])
        z1, z2 = jax.random.normal(jax.random.PRNGKey(7), (2, T - 1, B))
        i1 = np.sqrt(h) * z1
        i10 = h * (0.5 * i1 + np.sqrt(h / 12) * z2)
        return params, area, tables, ts, i1, i10

    def test_fused_drift(self):
        from columnflow.kernels import fused_drift
        from columnflow.models import Stimulus, wta_drift

        params, area, tables, ts, _, _ = self._setup()
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(3, 48)).astype(np.float32))
        stim_t = tables[:, 40, :]
        got = fused_drift(y, stim_t, params, area)

        def one(y_i, s_i):
            table = jnp.tile(s_i, (2, 1))
            return wta_drift(0.0, y_i, params, area,
                             Stimulus(0.0, 1.0, table))

        want = jax.vmap(one)(y, stim_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=2e-3)

    def test_rollout_forward_short_horizon_tight(self):
        from columnflow.kernels import wta_rollout_fused, wta_rollout_reference

        params, area, tables, ts, i1, i10 = self._setup(T=20)
        got = wta_rollout_fused(params, area, tables, ts, i1, i10)
        want = wta_rollout_reference(params, area, tables, ts, i1, i10)
        assert _scale_rel(got, want) < 1e-3

    def test_rollout_forward(self):
        from columnflow.kernels import wta_rollout_fused, wta_rollout_reference

        params, area, tables, ts, i1, i10 = self._setup()
        got = wta_rollout_fused(params, area, tables, ts, i1, i10)
        want = wta_rollout_reference(params, area, tables, ts, i1, i10)
        assert _scale_rel(got, want) < 3e-2

    @pytest.mark.parametrize("chunk", [None, 32])
    def test_rollout_diff_fwd_bwd(self, chunk):
        """The differentiable rollout (the bench.py workload): forward
        trajectory and recurrent-weight gradient vs the XLA reference path,
        compiled, unchunked AND chunked (chunk=32 exercises the carried-
        state path). T=50 keeps the fp-seeded divergence in the 3e-3 band
        so the gradient comparison stays meaningful."""
        from columnflow.kernels import wta_rollout_reference
        from columnflow.kernels.column_step import make_wta_rollout_diff

        params, area, tables, ts, i1, i10 = self._setup(T=50)
        rollout = make_wta_rollout_diff(area, ts, chunk=chunk)
        w = params["recurrent_weights"]

        got = rollout(w, tables, i1, i10)
        want = wta_rollout_reference(params, area, tables, ts, i1, i10)
        assert _scale_rel(got, want) < 1e-2

        def loss_f(w):
            return jnp.sum(rollout(w, tables, i1, i10) ** 2) / 1e4

        def loss_r(w):
            p = dict(params, recurrent_weights=w)
            return jnp.sum(wta_rollout_reference(p, area, tables, ts, i1,
                                                 i10) ** 2) / 1e4

        gf = jax.grad(loss_f)(w)
        gr = jax.grad(loss_r)(w)
        assert _scale_rel(gf, gr) < 3e-2

    def test_rollout_fused_chunked(self):
        from columnflow.kernels import wta_rollout_reference
        from columnflow.kernels.column_step import wta_rollout_fused_chunked

        params, area, tables, ts, i1, i10 = self._setup()
        got = wta_rollout_fused_chunked(params, area, jnp.zeros((3, 48)),
                                        tables, ts, i1, i10, chunk=32)
        want = wta_rollout_reference(params, area, tables, ts, i1, i10)
        assert _scale_rel(got, want) < 3e-2


class TestCompiledBatchedFusedReplay:
    """The lane-batched fused replay (sdeint_fused 2-D ts_steps mode)
    compiled through Mosaic: one kernel sweep over all frozen grids, vs
    the vmapped per-sample fused replay on-device."""

    def test_batch_matches_vmapped_values_and_grads(self):
        from columnflow.solvers import sdeint_adaptive, sdeint_adaptive_batch

        drift = lambda t, y, th: -th * y + 0.2 * t
        diff = lambda t, y, th: 0.5 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 9)
        B = 3
        y0 = jnp.ones((B, 4)) * jnp.asarray([0.5, 1.0, 1.5]).reshape(B, 1)
        keys = jax.random.split(jax.random.PRNGKey(11), B)
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=256)

        def loss_b(th):
            ys = sdeint_adaptive_batch(drift, diff, y0, ts, keys, th,
                                       fused=True, **kw)
            return jnp.sum(ys[:, -1] ** 2), ys

        def loss_v(th):
            # The vmapped per-sample kernels need the (1, S) lane layout
            # (a vmapped ref must be >= 2-D unbatched — CLAUDE.md rules).
            ys = jax.vmap(
                lambda y0_b, k: sdeint_adaptive(
                    drift, diff, y0_b[None], ts, k, th, differentiable=True,
                    fused=True, **kw)[:, 0, :])(y0, keys)
            return jnp.sum(ys[:, -1] ** 2), ys

        th0 = jnp.full((4,), 1.1)
        (lb, ys_b), gb = jax.value_and_grad(loss_b, has_aux=True)(th0)
        (lv, ys_v), gv = jax.value_and_grad(loss_v, has_aux=True)(th0)
        np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_v),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gv),
                                   rtol=1e-3, atol=1e-5)


class TestScaleFallback:
    """``--fused`` past the VMEM ceiling must COMPLETE (round-4 VERDICT
    #1): at 208 columns the deterministic fused kernels exceed VMEM and
    Mosaic refuses them; the trainer's compile_or_fallback probe must
    catch that and run the step on the XLA engine. Short horizon — the
    ceiling is set by the (P, P) weight operands, not the step count."""

    def test_over_ceiling_fused_step_completes(self):
        import warnings

        from columnflow.data import make_parity_batch
        from columnflow.solvers.fused import compile_or_fallback
        from columnflow.tasks import parity as par

        task = par.build_task(CFG, jax.random.PRNGKey(0),
                              columns_per_area=(128, 64, 16),
                              time_steps=50, max_steps=256)
        step = par.make_train_step(task, use_fused=True)
        opt_state = task.optimizer.init(task.params)
        stims = make_parity_batch(jax.random.PRNGKey(1), 4, 2)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            step, used_fused = compile_or_fallback(
                step, lambda: par.make_train_step(task, use_fused=False),
                (task.params, opt_state, stims),
                what="208-column fused step")
        params, opt_state, loss, *_ = step(task.params, opt_state, stims)
        assert np.isfinite(float(loss))
        if not used_fused:
            assert any("falling back" in str(w.message) for w in rec)


class TestCompiledSplit2:
    """The round-4 scale tier compiled through Mosaic: the select_func
    adaptive-kernel variant (pre-split selection args) and the 3-pass
    matmul_split2 drift, asserted against the exact fused engine
    on-device at reference scale (the at-scale wins are benchmarked in
    benchmarks/parity_scale_sweep.py; this pins the LOWERING)."""

    def test_split2_matches_exact_fused_on_device(self):
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as par

        task = par.build_task(CFG, jax.random.PRNGKey(0),
                              columns_per_area=(4, 2, 1), n_inputs=2,
                              time_steps=100, max_steps=1024)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)

        def loss(p, split2):
            ys = par.batched_rollout(p, task, stims, use_fused=True,
                                     split2=split2)
            return jnp.sum(par.readout(ys, p, task.net) ** 2), ys

        (l0, ys0), g0 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True))(task.params)
        (l1, ys1), g1 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True))(task.params)
        # Identical frozen grids (exact-split selection); values/grads
        # within the documented tier tolerance.
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(ys1), np.asarray(ys0),
                                   rtol=2e-3, atol=2e-3)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            assert np.all(np.isfinite(b)), k
            scale = max(1e-6, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3 * scale,
                                       err_msg=k)


class TestGalleryFusedSegment:
    """The figure gallery's auto-selected fused rollout on the real chip
    (round-4 VERDICT Weak #5): ``analysis.experiments._wta_segment_runner
    (use_fused=True)`` — the path every non-CPU gallery run takes — vs
    the scan path for a short segment. Both draw the identical Brownian
    pack per key; tolerance per the horizon-dependent divergence
    measurements in TestCompiledWTAKernels (T=100 band)."""

    def test_fused_segment_matches_scan_path(self):
        from columnflow.analysis.experiments import _wta_segment_runner
        from columnflow.models import build_wta

        params, area = build_wta(CFG, jax.random.PRNGKey(0))
        T = 100
        ts = jnp.linspace(0.0, T * 1e-4, T)
        run_fused = _wta_segment_runner(params, area, ts, use_fused=True)
        run_scan = _wta_segment_runner(params, area, ts, use_fused=False)

        y0 = jnp.zeros(48)
        stim_row = jnp.asarray(wta_stim_three_phases(
            jnp.asarray([20.0, 8.0]), T))[T // 2]
        k = jax.random.PRNGKey(5)
        got = run_fused(y0, k, stim_row)
        want = run_scan(y0, k, stim_row)
        assert got.shape == want.shape == (T, 48)
        assert np.all(np.isfinite(np.asarray(got)))
        assert _scale_rel(got, want) < 3e-2
