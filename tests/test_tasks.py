"""End-to-end smoke tests for the four task training loops (tiny scales).

Each test runs a few real optimization steps (jitted rollout + grads +
update) and checks losses are finite and params actually move — the CPU-CI
equivalent of the reference's run-and-look-at-the-plots workflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.tasks.bifurcation import train_bifurcation
from columnflow.tasks.parity import train_parity
from columnflow.tasks.wta import train_wta
from columnflow.tasks.xor import train_xor


def _finite(history, key="loss"):
    return all(np.isfinite(h[key]) for h in history if key in h)


class TestWTATask:
    def test_smoke(self):
        params, hist = train_wta(nr_samples=20, batch_size=5, seed=0,
                                 time_steps=120)
        assert len(hist) >= 4  # (20 + 10 spare) // 5
        assert _finite(hist)
        # Only the 4 masked entries of the recurrent matrix may move.
        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.models.wta import wta_lat_in_mask

        p0, _ = build_wta(ColumnConfig.load(), jax.random.PRNGKey(0))
        # params was trained from a different build key; compare masks of
        # change against anatomy instead: untrainable entries must be equal
        # across seeds of the trainable-perturbation only.
        mask = wta_lat_in_mask()
        w = np.asarray(params["recurrent_weights"])
        w0 = np.asarray(p0["recurrent_weights"])
        assert np.allclose(w[mask == 0], w0[mask == 0])


class TestXORTask:
    def test_smoke(self):
        params, hist = train_xor(nr_samples=8, time_steps=120, max_steps=512,
                                 seed=0)
        assert len(hist) == 2
        assert _finite(hist)
        # Structural mask respected: only L4e/L4i entries nonzero.
        w0 = np.asarray(params["ff_w0"])
        target = np.tile([0, 0, 1, 1, 0, 0, 0, 0], 2).astype(bool)
        assert np.all(w0[:, ~target] == 0.0)

    def test_fused_pass_rollout_and_grads(self):
        """--adaptive --fused --fused-pass on XOR: in-kernel selection pass
        over the kernel-safe batched drift; finite rollout, flowing grads."""
        from columnflow.config import ColumnConfig
        from columnflow.tasks import xor as xt

        cfg = ColumnConfig.load()
        task = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=60,
                             max_steps=512)
        conds = jnp.asarray([[0.0, 1.0], [1.0, 1.0]], jnp.float32)
        key = jax.random.PRNGKey(3)
        kw = dict(stochastic=True, adaptive=True, use_fused=True,
                  fused_pass=True, adaptive_max_steps=512)
        ys = xt.batched_rollout(task.params, task, conds, key=key,
                                differentiable=False, **kw)
        assert ys.shape == (2, 60, 72)
        assert bool(jnp.all(jnp.isfinite(ys)))

        def loss(p):
            ys = xt.batched_rollout(p, task, conds, key=key, **kw)
            _, l = xt.readout(ys, xt.xor_targets(conds))
            return l

        l, g = jax.jit(jax.value_and_grad(loss))(task.params)
        assert np.isfinite(float(l))
        gsum = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
        assert np.isfinite(gsum) and gsum > 0.0


class TestParityTask:
    def test_smoke(self):
        params, hist = train_parity(nr_samples=8, batch_size=4, seed=0,
                                    time_steps=120, max_steps=512)
        assert len(hist) == 3  # 2 steps + final accuracy record
        assert "acc" in hist[-1]
        assert _finite(hist)
        # Clamps respected after updates.
        assert np.all(np.asarray(params["lateral"]) <= 0.0)
        assert np.all(np.asarray(params["feedforward"]) >= 0.0)
        out = np.asarray(params["output_weights"])
        assert np.all((out >= 0.0) & (out <= 1.0))

    def test_loss_scale_is_gradient_noop(self):
        """loss_scale (the f32 overflow guard for the 104-column adaptive
        scale, RESULTS.md) must not change the training semantics: one step
        with scale 1e-6 produces the same loss and updated params as
        scale 1."""
        import jax

        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 4)

        def one(scale):
            step = pt.make_train_step(task, loss_scale=scale)
            # The step donates params/opt_state buffers; give it copies.
            fresh = jax.tree_util.tree_map(jnp.array, task.params)
            opt_state = task.optimizer.init(fresh)
            params, _, loss, _, gnorm, ok = step(fresh, opt_state, stims)
            return float(loss), float(gnorm), params

        l1, g1, p1 = one(1.0)
        l2, g2, p2 = one(1e-6)
        assert l1 == pytest.approx(l2, rel=1e-5)
        assert g1 == pytest.approx(g2, rel=1e-3)
        for k in p1:
            np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p1[k]),
                                       rtol=1e-4, atol=1e-6)

    def test_clip_grad_norm(self):
        """clip_grad_norm rescales the masked gradient to the requested
        global norm before the update (the truncated-BPTT companion,
        RESULTS.md): a tiny clip must produce a step of exactly that norm
        direction, and the update must be APPLIED (not skipped) even
        though the raw gnorm is reported unclipped."""
        import jax

        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 4)

        def one(clip):
            step = pt.make_train_step(task, clip_grad_norm=clip)
            fresh = jax.tree_util.tree_map(jnp.array, task.params)
            opt_state = task.optimizer.init(fresh)
            params, _, loss, _, gnorm, ok = step(fresh, opt_state, stims)
            return float(loss), float(gnorm), bool(ok), params

        l0, g0, ok0, p0 = one(None)
        l1, g1, ok1, p1 = one(1e-3)  # far below the raw gradient norm
        assert l0 == l1 and ok0 and ok1
        # Reported gnorm is the raw (pre-clip) norm: the observability
        # signal survives clipping.
        assert g1 == pytest.approx(g0, rel=1e-6)
        assert g0 > 1e-3
        # Clipped step differs from the unclipped one but stays clamped.
        changed = any(
            not np.allclose(np.asarray(p1[k]), np.asarray(p0[k]))
            for k in p0)
        assert changed
        assert np.all(np.asarray(p1["lateral"]) <= 0.0)
        # A generous clip (above the raw norm) is a no-op.
        _, _, _, p2 = one(1e6)
        for k in p0:
            np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p0[k]),
                                       rtol=1e-6, atol=0)

    def test_adaptive_fused_routes_to_adaptive_engine(self, monkeypatch):
        """``stochastic + adaptive + use_fused`` must run the ADAPTIVE
        engine (fused replay inside sdeint_adaptive). A branch-ordering bug
        used to let the fixed-grid fused branch shadow it, silently
        integrating the dt=1e-3 grid that --adaptive exists to avoid
        (RESULTS.md: unstable at scale)."""
        import jax

        import columnflow.solvers as solvers
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        calls = []
        real = solvers.sdeint_adaptive
        real_b = solvers.sdeint_adaptive_batch

        def spy(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        def spy_b(*a, **kw):
            calls.append(1)
            return real_b(*a, **kw)

        monkeypatch.setattr(solvers, "sdeint_adaptive", spy)
        monkeypatch.setattr(solvers, "sdeint_adaptive_batch", spy_b)
        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        ys = pt.batched_rollout(task.params, task, stims, stochastic=True,
                                adaptive=True, use_fused=True,
                                key=jax.random.PRNGKey(0),
                                differentiable=False)
        assert calls, "adaptive engine was never invoked"
        assert ys.shape == (2, 60, 3 * task.net.num_pops)
        assert bool(jnp.all(jnp.isfinite(ys)))

    def test_checkpoint_resume(self, tmp_path):
        """Train 2 iters with checkpointing, resume, finish the remaining 2:
        the resumed run starts at the saved step and only runs the rest."""
        ck = str(tmp_path / "parity_ck")
        common = dict(batch_size=4, seed=0, columns_per_area=(2, 1),
                      n_inputs=2, time_steps=60, max_steps=512,
                      checkpoint_every=1)
        train_parity(nr_samples=8, checkpoint_path=ck, **common)

        params, hist = train_parity(nr_samples=16, resume_from=ck, **common)
        # 4 total iterations, 2 already done -> 2 new loss records + final.
        assert sum(1 for h in hist if "loss" in h) == 2
        assert _finite(hist)

    def test_resume_verifies_anatomy(self, tmp_path):
        """Checkpoints record the static anatomy (topology + fan-in regime
        + mask hash); resuming onto a network rebuilt with a different
        regime fails loudly instead of silently loading trained params
        onto mismatched masks (round-4 advisor, medium)."""
        import pytest

        ck = str(tmp_path / "parity_ck")
        common = dict(batch_size=4, seed=0, columns_per_area=(2, 1),
                      n_inputs=2, time_steps=60, max_steps=512,
                      checkpoint_every=1)
        train_parity(nr_samples=4, checkpoint_path=ck,
                     random_fan_in=True, **common)
        # Same seed, different fan-in RNG regime -> different mask ->
        # loud mismatch naming the recorded settings.
        with pytest.raises(ValueError, match="DIFFERENT network anatomy"):
            train_parity(nr_samples=8, resume_from=ck,
                         random_fan_in=True, legacy_host_rng=True, **common)
        # Matching regime resumes cleanly.
        params, hist = train_parity(nr_samples=8, resume_from=ck,
                                    random_fan_in=True, **common)
        assert _finite(hist)

    def test_anatomy_record_distinguishes_rng_regimes(self):
        """The jax-counter and legacy-host fan-in draws produce different
        masks for the same seed — exactly the silent hazard the record
        exists to catch — and the record hashes them differently."""
        from columnflow.config import ColumnConfig
        from columnflow.tasks.parity import anatomy_record, build_task

        cfg = ColumnConfig.load()
        # The reference topology: enough fan-in freedom that the two
        # regimes' draws actually diverge (at (2,1) scale every source
        # must feed the single target column, so masks can coincide).
        kw = dict(columns_per_area=(8, 4, 1), n_inputs=4,
                  random_fan_in=True)
        t_new = build_task(cfg, jax.random.PRNGKey(0), **kw)
        t_old = build_task(cfg, jax.random.PRNGKey(0),
                           legacy_host_rng=True, **kw)
        a_new = anatomy_record(t_new.net, (8, 4, 1), 4, True, False)
        a_old = anatomy_record(t_old.net, (8, 4, 1), 4, True, True)
        assert a_new["mask_sha256"] != a_old["mask_sha256"]
        # Pre-round-5 checkpoint (no record): warn, don't fail.
        from columnflow.tasks.parity import verify_anatomy

        with pytest.warns(RuntimeWarning, match="predates anatomy"):
            verify_anatomy({}, a_new, "old.npz", random_fan_in=True)
        verify_anatomy({"anatomy": a_new}, a_new, "ck.npz", True)


class TestEngineAuto:
    """Scale-aware engine dispatch (round-4 VERDICT #3): ``--engine auto``
    applies the measured crossover table (RESULTS.md 'ceiling, broken')
    so users get torchdiffeq's ``method=``-only usability instead of
    assembling --fused --split2 ... from the docs."""

    def test_band_reference_scale_is_fused_exact(self):
        from columnflow.tasks.parity import resolve_engine

        flags, why = resolve_engine("auto", 13)
        assert flags == dict(use_fused=True, split2=False,
                             select_bf16=False, grad_bf16=False)
        assert "13 columns" in why

    def test_band_split2_tier_104_to_312(self):
        from columnflow.tasks.parity import resolve_engine

        for c in (104, 208, 312):
            flags, _ = resolve_engine("auto", c)
            assert flags["use_fused"] and flags["split2"], c
            assert not flags["select_bf16"]  # deterministic: exact select

    def test_band_past_ceiling_is_xla(self):
        from columnflow.tasks.parity import resolve_engine

        for c in (416, 1000):
            flags, why = resolve_engine("auto", c)
            assert not flags["use_fused"], c
            assert "ceiling" in why

    def test_stochastic_adaptive_flagship_tiers(self):
        from columnflow.tasks.parity import resolve_engine

        flags, _ = resolve_engine("auto", 104, stochastic=True,
                                  adaptive=True)
        assert flags == dict(use_fused=True, split2=True,
                             select_bf16=True, grad_bf16=True)
        # Small-scale stochastic adaptive stays exact.
        flags, _ = resolve_engine("auto", 13, stochastic=True, adaptive=True)
        assert flags == dict(use_fused=True, split2=False,
                             select_bf16=False, grad_bf16=False)
        # Stochastic FIXED-GRID has no split2 variant at any scale — the
        # resolved flags must be accepted by batched_rollout.
        flags, _ = resolve_engine("auto", 104, stochastic=True,
                                  adaptive=False)
        assert flags == dict(use_fused=True, split2=False,
                             select_bf16=False, grad_bf16=False)

    def test_lane_ceiling_band(self):
        """Round-5 measured lane ceiling: > 8 lanes at flagship scale
        routes the stochastic-adaptive auto policy straight to XLA
        (the fused replay's compile dies past 8 lanes: 8 measured
        working, 16 measured failing — 9-15 must not pay the ~2 min
        failed fused compile either) instead of a doomed fused compile
        before the fallback."""
        from columnflow.tasks.parity import resolve_engine

        for b in (9, 12, 16, 64):
            flags, why = resolve_engine("auto", 104, stochastic=True,
                                        adaptive=True, batch_size=b)
            assert not flags["use_fused"] and flags["select_bf16"], b
            assert "lane ceiling" in why
        # At or below the knee the flagship tiers stay.
        flags, _ = resolve_engine("auto", 104, stochastic=True,
                                  adaptive=True, batch_size=8)
        assert flags["use_fused"] and flags["grad_bf16"]
        # Small networks never hit the lane band (their replay kernels
        # are tiny; the ceiling was measured at flagship state size).
        flags, _ = resolve_engine("auto", 13, stochastic=True,
                                  adaptive=True, batch_size=64)
        assert flags["use_fused"]

    def test_pinned_names_and_unknown(self):
        from columnflow.tasks.parity import resolve_engine

        assert resolve_engine("xla", 104)[0]["use_fused"] is False
        assert resolve_engine("fused", 416)[0]["use_fused"] is True
        f, _ = resolve_engine("fused-split2", 13)
        assert f["use_fused"] and f["split2"]
        with pytest.raises(ValueError, match="unknown engine"):
            resolve_engine("warp", 104)

    def test_train_parity_engine_auto_end_to_end(self):
        """engine='auto' resolves and trains at tiny scale (fused engine,
        interpret mode on CPU)."""
        params, hist = train_parity(nr_samples=4, batch_size=4, seed=0,
                                    columns_per_area=(2, 1), n_inputs=2,
                                    time_steps=60, max_steps=512,
                                    engine="auto")
        assert _finite(hist)


class TestBifurcationTask:
    def test_smoke_and_learning(self):
        params, hist = train_bifurcation(
            nr_samples=24, batch_size=8, time_points=80, total_time=2.0,
            max_steps=512, seed=0,
        )
        assert len(hist) == 3
        assert _finite(hist)
        # Three steps of RMSprop on a smooth problem: loss should not grow.
        assert hist[-1]["loss"] <= hist[0]["loss"] * 1.5


class TestWTASweep:
    def test_psychometric_monotone_scan_path(self):
        import numpy as np

        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.tasks.wta_sweep import (
            psychometric_curve,
            sweep_noise_realizations,
        )

        cfg = ColumnConfig.load()
        params, area = build_wta(cfg, jax.random.PRNGKey(0))
        out = sweep_noise_realizations(
            params, area, jax.random.PRNGKey(1), [25.0, 15.0],
            n_realizations=8, time_steps=150, use_fused=False,
        )
        assert out["trajectories"].shape == (8, 150, 48)
        assert 0.0 <= out["frac_a_wins"] <= 1.0

        c, f = psychometric_curve(
            params, area, jax.random.PRNGKey(2),
            coherences=[-20.0, 0.0, 20.0], n_realizations=8,
            time_steps=150, use_fused=False,
        )
        # Strong evidence for B at -20 and for A at +20 must order correctly.
        assert f[0] <= f[-1]
        assert f.shape == (3,)

    def test_sweep_adaptive_path(self):
        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.tasks.wta_sweep import sweep_noise_realizations

        cfg = ColumnConfig.load()
        params, area = build_wta(cfg, jax.random.PRNGKey(0))
        out = sweep_noise_realizations(
            params, area, jax.random.PRNGKey(1), [25.0, 15.0],
            n_realizations=2, time_steps=60, adaptive=True,
        )
        assert out["trajectories"].shape == (2, 60, 48)
        assert bool(jnp.all(jnp.isfinite(out["trajectories"])))


class TestTrainScan:
    def test_scan_matches_sequential_steps(self):
        """K steps under make_train_scan == K make_train_step calls with the
        same per-step keys (exactness: same ops, same order)."""
        from columnflow.config import ColumnConfig
        from columnflow.tasks import wta as wta_task

        cfg = ColumnConfig.load()
        task = wta_task.build_task(cfg, jax.random.PRNGKey(0), time_steps=60)
        K, B = 3, 4
        true_states = 0.5 * jnp.ones((B, 60, 2))
        stims = jnp.tile(jnp.asarray([[20.0, 8.0]]), (B, 1))
        keys = jax.random.split(jax.random.PRNGKey(7), K)

        step = wta_task.make_train_step(task)
        p1 = jax.tree_util.tree_map(jnp.array, task.params)
        o1 = task.optimizer.init(p1)
        seq_losses = []
        for k in keys:
            p1, o1, loss, _ = step(p1, o1, true_states, stims, k)
            seq_losses.append(float(loss))

        scan = wta_task.make_train_scan(task)
        p2 = jax.tree_util.tree_map(jnp.array, task.params)
        o2 = task.optimizer.init(p2)
        ts_b = jnp.broadcast_to(true_states, (K,) + true_states.shape)
        st_b = jnp.broadcast_to(stims, (K,) + stims.shape)
        p2, o2, losses, _ = scan(p2, o2, ts_b, st_b, keys)

        np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(p1["recurrent_weights"]),
            np.asarray(p2["recurrent_weights"]), rtol=2e-5,
        )


class TestBifurcationResume:
    def test_checkpoint_resume(self, tmp_path):
        ck = str(tmp_path / "hopf_ck")
        common = dict(batch_size=8, seed=0, time_points=100, total_time=2.5,
                      max_steps=512, checkpoint_every=1)
        train_bifurcation(nr_samples=16, checkpoint_path=ck, **common)

        params, hist = train_bifurcation(nr_samples=32, resume_from=ck,
                                         **common)
        # 4 total iterations, 2 already done -> 2 new records.
        assert len(hist) == 2
        assert all(np.isfinite(h["loss"]) for h in hist)


class TestParityStochastic:
    """The reference's commented-in sdeint alternative
    (scripts/parity_ode.py:234): parity training through the Ito SDE."""

    def test_smoke_train(self):
        params, hist = train_parity(nr_samples=8, batch_size=4, seed=0,
                                    columns_per_area=(2, 1), n_inputs=2,
                                    time_steps=60, max_steps=512,
                                    stochastic=True)
        assert _finite(hist)
        assert np.all(np.asarray(params["lateral"]) <= 0.0)

    def test_adaptive_smoke_train(self):
        """--stochastic --adaptive end-to-end: adaptive step-doubling SRA1
        with replay gradients inside the jitted train scan (torchsde's
        adaptive=True with training, reference README.md:27-29)."""
        params, hist = train_parity(nr_samples=8, batch_size=4, seed=0,
                                    columns_per_area=(2, 1), n_inputs=2,
                                    time_steps=60, max_steps=512,
                                    stochastic=True, adaptive=True)
        assert _finite(hist)
        assert np.all(np.asarray(params["lateral"]) <= 0.0)

    def test_adaptive_rollout_shapes_and_noise(self):
        """Adaptive rollout: right shape, finite, pure per key, and noisy
        (two keys differ)."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        ys1 = pt.batched_rollout(task.params, task, stims, stochastic=True,
                                 adaptive=True, key=jax.random.PRNGKey(5),
                                 differentiable=False,
                                 adaptive_max_steps=1024)
        ys1b = pt.batched_rollout(task.params, task, stims, stochastic=True,
                                  adaptive=True, key=jax.random.PRNGKey(5),
                                  differentiable=False,
                                  adaptive_max_steps=1024)
        ys2 = pt.batched_rollout(task.params, task, stims, stochastic=True,
                                 adaptive=True, key=jax.random.PRNGKey(6),
                                 differentiable=False,
                                 adaptive_max_steps=1024)
        assert ys1.shape == (2, 60, 3 * task.net.num_pops)
        assert bool(jnp.all(jnp.isfinite(ys1)))
        np.testing.assert_array_equal(np.asarray(ys1), np.asarray(ys1b))
        assert float(jnp.max(jnp.abs(ys1 - ys2))) > 1e-3

    def test_adaptive_fused_rollout_and_grads(self):
        """--adaptive --fused: the replay sweep as Pallas kernels (premixed
        knot drift). Rollout finite; gradients flow into every trainable
        group."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        key = jax.random.PRNGKey(5)
        ys = pt.batched_rollout(task.params, task, stims, stochastic=True,
                                adaptive=True, use_fused=True, key=key,
                                differentiable=False,
                                adaptive_max_steps=512)
        assert ys.shape == (2, 60, 3 * task.net.num_pops)
        assert bool(jnp.all(jnp.isfinite(ys)))

        def loss(p):
            ys = pt.batched_rollout(p, task, stims, stochastic=True,
                                    adaptive=True, use_fused=True, key=key,
                                    adaptive_max_steps=512)
            out = pt.readout(ys, p, task.net)
            return jnp.mean(jnp.abs(out - pt.parity_targets(stims)))

        l, g = jax.value_and_grad(loss)(task.params)
        assert np.isfinite(float(l))
        for k, v in g.items():
            assert bool(jnp.all(jnp.isfinite(v))), k
            assert float(jnp.sum(jnp.abs(v))) > 0.0, k

    @pytest.mark.parametrize("select_bf16", [False, True])
    def test_fused_pass_rollout_and_grads(self, select_bf16):
        """--adaptive --fused --fused-pass: the step-size-selection pass
        runs in-kernel (weights VMEM-resident; krng Brownian backend),
        composed with f32 and bf16 selection drifts. Rollout finite;
        gradients flow into every trainable group."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        key = jax.random.PRNGKey(5)
        kw = dict(stochastic=True, adaptive=True, use_fused=True,
                  fused_pass=True, select_bf16=select_bf16,
                  adaptive_max_steps=512)
        ys = pt.batched_rollout(task.params, task, stims, key=key,
                                differentiable=False, **kw)
        assert ys.shape == (2, 60, 3 * task.net.num_pops)
        assert bool(jnp.all(jnp.isfinite(ys)))

        def loss(p):
            ys = pt.batched_rollout(p, task, stims, key=key, **kw)
            out = pt.readout(ys, p, task.net)
            return jnp.mean(jnp.abs(out - pt.parity_targets(stims)))

        l, g = jax.jit(jax.value_and_grad(loss))(task.params)
        assert np.isfinite(float(l))
        for k, v in g.items():
            assert bool(jnp.all(jnp.isfinite(v))), k
            assert float(jnp.sum(jnp.abs(v))) > 0.0, k

    def test_fused_pass_requires_fused_adaptive(self):
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        with pytest.raises(ValueError, match="fused_pass"):
            pt.batched_rollout(task.params, task, stims, stochastic=True,
                               adaptive=True, fused_pass=True,
                               key=jax.random.PRNGKey(0))

    def test_stochastic_rollout_paths(self):
        """Scan and fused SDE paths both produce finite, genuinely noisy
        trajectories of the right shape (noise draws differ by design:
        per-sample keys vs one batch pack)."""
        import jax

        from columnflow.config import ColumnConfig
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = jnp.asarray([[15.0, 0.0], [15.0, 15.0]], jnp.float32)
        det = pt.batched_rollout(task.params, task, stims,
                                 differentiable=False)
        for fused in (False, True):
            ys = pt.batched_rollout(task.params, task, stims,
                                    stochastic=True, use_fused=fused,
                                    key=jax.random.PRNGKey(3))
            assert ys.shape == (2, 60, 3 * task.net.num_pops)
            assert bool(jnp.all(jnp.isfinite(ys)))
            assert float(jnp.max(jnp.abs(ys - det))) > 1e-3

    def test_stochastic_requires_key(self):
        import jax
        import pytest

        from columnflow.config import ColumnConfig
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        with pytest.raises(ValueError, match="key"):
            pt.batched_rollout(task.params, task,
                               jnp.zeros((2, 2)), stochastic=True)


class TestXORStochastic:
    def test_smoke_train(self):
        params, hist = train_xor(nr_samples=8, time_steps=60, max_steps=512,
                                 seed=0, stochastic=True)
        assert _finite(hist)

    def test_adaptive_smoke_train(self):
        params, hist = train_xor(nr_samples=8, time_steps=60, max_steps=512,
                                 seed=0, stochastic=True, adaptive=True)
        assert _finite(hist)

    def test_fused_fixed_grid_rollout_and_grads(self):
        """--stochastic --fused: the whole 4-condition batch in ONE fused
        fixed-grid SDE solve (the parity pattern)."""
        from columnflow.config import ColumnConfig
        from columnflow.tasks import xor as xt

        cfg = ColumnConfig.load()
        task = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=60,
                             max_steps=512)
        conds = jnp.asarray(xt.xor_conditions())
        key = jax.random.PRNGKey(3)
        ys = xt.batched_rollout(task.params, task, conds, stochastic=True,
                                use_fused=True, key=key,
                                differentiable=False)
        assert ys.shape == (4, 60, 72)
        assert bool(jnp.all(jnp.isfinite(ys)))
        # Membrane-only noise: the rate block must stay smooth relative to
        # the noisy membrane block (variance ratio as a structure check).
        det = xt.batched_rollout(task.params, task, conds,
                                 differentiable=False)
        dv = float(jnp.var((ys - det)[:, :, :24]))
        assert dv > 0.0

        def loss(p):
            ys = xt.batched_rollout(p, task, conds, stochastic=True,
                                    use_fused=True, key=key)
            _, l = xt.readout(ys, xt.xor_targets(conds))
            return l

        l, g = jax.value_and_grad(loss)(task.params)
        assert np.isfinite(float(l))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in leaves)

    def test_adaptive_fused_rollout_and_grads(self):
        from columnflow.config import ColumnConfig
        from columnflow.tasks import xor as xt

        cfg = ColumnConfig.load()
        task = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=60,
                             max_steps=512)
        conds = jnp.asarray(xt.xor_conditions())
        key = jax.random.PRNGKey(5)
        ys = xt.batched_rollout(task.params, task, conds, stochastic=True,
                                adaptive=True, use_fused=True, key=key,
                                differentiable=False, adaptive_max_steps=512)
        assert ys.shape == (4, 60, 72)
        assert bool(jnp.all(jnp.isfinite(ys)))

        def loss(p):
            ys = xt.batched_rollout(p, task, conds, stochastic=True,
                                    adaptive=True, use_fused=True, key=key,
                                    adaptive_max_steps=512)
            _, l = xt.readout(ys, xt.xor_targets(conds))
            return l

        l, g = jax.value_and_grad(loss)(task.params)
        assert np.isfinite(float(l))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in leaves)
        assert float(sum(jnp.sum(jnp.abs(v)) for v in leaves)) > 0.0


class TestWTAResume:
    def test_checkpoint_resume_fast_path(self, tmp_path):
        """Resume on the scanned fast path: block-granular checkpoints."""
        ck = str(tmp_path / "wta_ck")
        common = dict(batch_size=5, seed=0, time_steps=90)
        train_wta(nr_samples=20, checkpoint_path=ck, **common)

        # Dataset size differs (40+10 vs 20+10 samples), so this is a
        # continuation on fresh data: only iterations beyond the saved
        # step run.
        params, hist = train_wta(nr_samples=40, resume_from=ck, **common)
        assert len(hist) == (50 // 5) - (30 // 5)
        assert all(np.isfinite(h["loss"]) for h in hist)


class TestXORResume:
    def test_checkpoint_resume(self, tmp_path):
        ck = str(tmp_path / "xor_ck")
        common = dict(time_steps=60, max_steps=512, seed=0,
                      checkpoint_every=1)
        train_xor(nr_samples=8, checkpoint_path=ck, **common)
        params, hist = train_xor(nr_samples=16, resume_from=ck, **common)
        assert len(hist) == 2
        assert _finite(hist)


class TestParityGradBf16:
    def test_values_exact_grads_close(self):
        """--grad-bf16: rollout values bitwise unchanged; gradients at
        bf16-matmul tolerance of the exact ones, flowing everywhere."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        key = jax.random.PRNGKey(5)

        def loss(p, gb):
            ys = pt.batched_rollout(p, task, stims, stochastic=True,
                                    adaptive=True, use_fused=True,
                                    adaptive_max_steps=512, key=key,
                                    grad_bf16=gb)
            out = pt.readout(ys, p, task.net)
            return jnp.mean(jnp.abs(out - pt.parity_targets(stims))), ys

        (l0, ys0), g0 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True))(task.params)
        (l1, ys1), g1 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True))(task.params)
        np.testing.assert_array_equal(np.asarray(ys1), np.asarray(ys0))
        assert float(l0) == float(l1)
        changed = False
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            assert np.all(np.isfinite(b)), k
            scale = max(1e-6, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, rtol=0.1, atol=0.02 * scale,
                                       err_msg=k)
            changed = changed or not np.array_equal(a, b)
        assert changed  # the substitute really was used

    def test_requires_fused_adaptive(self):
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        stims = make_parity_batch(jax.random.PRNGKey(1), 2, 2)
        with pytest.raises(ValueError, match="grad_bf16"):
            pt.batched_rollout(task.params, task, stims, stochastic=True,
                               adaptive=True, grad_bf16=True,
                               key=jax.random.PRNGKey(0))


class TestLatentSDETask:
    """Latent-SDE training on sdeint_logqp (tasks/latent_sde.py) — the
    end-to-end workload for the Girsanov KL path (round-4 VERDICT Missing
    #3; torchsde's flagship application, Li et al. 2020)."""

    def test_smoke_elbo_improves_and_moments_match(self):
        from columnflow.tasks.latent_sde import (posterior_samples,
                                                 train_latent_sde)

        params, task, hist = train_latent_sde(
            iters=60, latent=3, hidden=16, time_points=24, n_samples=4,
            kl_anneal=30, seed=0)
        first = np.mean([h["loss"] for h in hist[:5]])
        last = np.mean([h["loss"] for h in hist[-5:]])
        # -ELBO must drop by a large factor (measured: ~7000 -> ~210).
        assert last < 0.2 * first, (first, last)

        # Posterior reconstructions track the observed trajectory: the
        # mean path lands within a few observation sigmas on average.
        post = np.asarray(posterior_samples(
            params, task, jax.random.PRNGKey(7), n=16))
        xs = np.asarray(task.xs)
        rmse = float(np.sqrt(np.mean((post.mean(0) - xs) ** 2)))
        assert rmse < 0.35, rmse  # data amplitude is O(0.8), obs sigma 0.05
        # ... and second moments are in the data's ballpark (the posterior
        # is stochastic, not collapsed).
        assert 0.1 < float(post.std(0).mean()) < 1.0
