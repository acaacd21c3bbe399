"""Analysis-suite tests: statistics semantics and experiment plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.analysis import (
    alternation_rate,
    bistable_perception,
    coherence_sweep,
    dominance_time,
    running_mean,
    wta_timecourse,
)
from columnflow.config import ColumnConfig
from columnflow.models import build_wta

CFG = ColumnConfig.load()


class TestStats:
    def test_running_mean_basic(self):
        x = np.arange(10, dtype=float)
        out = running_mean(x, N=3, outliers=True)
        np.testing.assert_allclose(out, np.convolve(x, np.ones(3) / 3,
                                                    mode="valid"))

    def test_running_mean_outlier_removal(self):
        x = np.ones(100)
        x[50] = 1000.0  # > 10x mean
        out = running_mean(x, N=10)
        assert out.max() < 2.0  # outlier zeroed, not averaged in

    def test_dominance_time_alternating_signal(self):
        # Two anti-phase square waves -> dominance intervals of half period.
        dt = 1e-3
        t = np.arange(0, 40.0, dt)
        a1 = (np.sin(2 * np.pi * t / 10.0) > 0).astype(float)
        a2 = 1.0 - a1
        dom = dominance_time(a1, a2, dt=dt, cutoff=0.5, sliding_window=100)
        assert len(dom) >= 5
        np.testing.assert_allclose(np.abs(dom), 5.0, atol=0.5)
        # Alternating signs.
        assert np.all(np.sign(dom[:-1]) != np.sign(dom[1:]))

    def test_dominance_no_switch(self):
        a1 = np.ones(5000)
        a2 = np.zeros(5000)
        dom = dominance_time(a1, a2, dt=1e-3, sliding_window=100)
        assert len(dom) == 1 and dom[0] > 0

    def test_alternation_rate(self):
        dt = 1e-3
        t = np.arange(0, 40.0, dt)
        a1 = (np.sin(2 * np.pi * t / 10.0) > 0).astype(float)
        a2 = 1.0 - a1
        rate, count = alternation_rate(a1, a2, dt=dt, cutoff=0.5,
                                       sliding_window=100)
        assert 6 <= count <= 8  # ~7 switches in 40 s of period-10 rivalry
        assert abs(rate - count / 40.0) < 0.02


class TestExperiments:
    def setup_method(self):
        self.params, self.area = build_wta(CFG, jax.random.PRNGKey(0))

    def test_coherence_sweep_shapes_and_response(self):
        fr = coherence_sweep(self.params, self.area,
                             coherences=jnp.asarray([0.0, 10.0, 20.0]),
                             stim_phase=0.02, window=(100, 400))
        assert fr.shape == (4, 3, 300, 2)
        assert np.all(np.isfinite(np.asarray(fr)))
        # At max coherence column B gets mu=0: A (L4) must out-fire B during
        # stimulation.
        l4 = np.asarray(fr)[1, 2]  # layer 4, coherence 20
        assert l4[:, 0].mean() > l4[:, 1].mean()

    def test_bistable_perception_runs(self):
        out = bistable_perception(self.params, self.area,
                                  jax.random.PRNGKey(1), nr_iterations=2,
                                  phase=0.2, sliding_window=100)
        assert out["rates"].shape == (4000, 16)
        assert np.all(np.isfinite(out["rates"]))
        assert len(out["dominance"]) >= 1

    def test_wta_timecourse(self):
        rates, stim = wta_timecourse(
            self.params, self.area, jax.random.PRNGKey(2),
            stim_sequence=[[0.0, 0.0], [20.0, 5.0]], phase=0.05,
        )
        assert rates.shape == (1000, 16)
        assert stim.shape == (1000, 16)
        assert np.all(np.isfinite(rates))


class TestPlots:
    def test_figures_render(self, tmp_path):
        from columnflow.analysis import plots

        fr = np.random.default_rng(0).random((4, 3, 50, 2))
        p1 = plots.plot_coherence_sweep(fr, [0.0, 10.0, 20.0],
                                        str(tmp_path / "coh.png"))
        rates = np.random.default_rng(1).random((200, 16))
        stim = np.zeros((200, 2))
        p2 = plots.plot_timecourse(rates, stim, 1e-3,
                                   str(tmp_path / "tc.png"))
        p3 = plots.plot_dominance_histogram([1.0, -2.0, 3.0],
                                            str(tmp_path / "dom.png"))
        p4 = plots.plot_dom_alt_heatmaps(np.zeros((3, 3)), np.ones((3, 3)),
                                         str(tmp_path / "hm.png"))
        params = {"w": np.ones((4, 4)), "v": np.ones(6), "zero": np.zeros(3)}
        written = plots.plot_weight_matrices(params, str(tmp_path / "wm"))
        import os

        for p in [p1, p2, p3, p4, *written]:
            assert os.path.exists(p) and os.path.getsize(p) > 0
        assert len(written) == 2  # zero-sum group skipped


def test_rivalry_sweep_grid():
    import jax
    import numpy as np

    from columnflow.analysis import rivalry_sweep
    from columnflow.config import ColumnConfig
    from columnflow.models import build_wta

    cfg = ColumnConfig.load()
    params, area = build_wta(cfg, jax.random.PRNGKey(0))
    out = rivalry_sweep(
        params, area, jax.random.PRNGKey(1),
        mu_values=[15.0, 20.0], nr_iterations=1, phase=0.2,
        use_fused=False,
    )
    assert out["mean_dominance"].shape == (2, 2)
    assert out["alternation_rate"].shape == (2, 2)
    assert np.isfinite(out["alternation_rate"]).all()


class TestDemoCheckpoint:
    def test_load_demo_wta(self):
        """The packaged trained checkpoint loads and differs from anatomy
        exactly on the 4 trainable lateral-inhibition/self-excitation
        entries."""
        import jax

        from columnflow.analysis.demo import load_demo_wta
        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.models.wta import wta_lat_in_mask

        params, area = load_demo_wta()
        p0, _ = build_wta(ColumnConfig.load(), jax.random.PRNGKey(0))
        w, w0 = (np.asarray(params["recurrent_weights"]),
                 np.asarray(p0["recurrent_weights"]))
        mask = wta_lat_in_mask()
        assert np.allclose(w[mask == 0], w0[mask == 0])
        assert np.max(np.abs(w[mask == 1] - w0[mask == 1])) > 1e-4

    def test_demo_parity_solves_parity(self):
        """The packaged parity checkpoint classifies all four fixed-position
        patterns correctly (the repo's headline science result, pinned as a
        verifiable artifact)."""
        import jax

        from columnflow.analysis.demo import load_demo_parity
        from columnflow.tasks.parity import (
            TARGET_EVEN,
            batched_rollout,
            parity_targets,
            readout,
        )
        from columnflow.data import parity_combinations

        task = load_demo_parity()
        stims = jnp.asarray(parity_combinations(4, fixed_position=True))
        ys = batched_rollout(task.params, task, stims, differentiable=False)
        out = readout(ys, task.params, task.net)
        targets = parity_targets(stims)
        acc = float(jnp.mean((out > TARGET_EVEN / 2) == (targets > 0)))
        assert acc == 1.0, (acc, np.asarray(out))

    def test_demo_xor_solves_xor(self):
        import jax

        from columnflow.analysis.demo import load_demo_xor
        from columnflow.tasks.xor import (batched_rollout, build_task,
                                          readout, xor_conditions,
                                          xor_targets)
        from columnflow.config import ColumnConfig

        params, net = load_demo_xor()
        task = build_task(ColumnConfig.load(), jax.random.PRNGKey(0))
        task = task._replace(params=params)
        conds = jnp.asarray(xor_conditions())
        ys = batched_rollout(params, task, conds, differentiable=False)
        final_c, _ = readout(ys, xor_targets(conds))
        # Different-input conditions must read out above same-input ones.
        final_c = np.asarray(final_c)
        targets = np.asarray(xor_targets(conds))
        assert final_c[targets == 1.0].min() > final_c[targets == 0.25].max()


class TestWongWangPhasePlane:
    """phase_plane analysis the reference's DM docstring promises but never
    implements (src/ww_model.py:48); validated against the textbook
    Wong & Wang (2006) attractor structure and against the DM simulator."""

    def test_bistable_decision_regime(self):
        from columnflow.analysis import wong_wang_phase_plane, ww_drift

        pp = wong_wang_phase_plane(30.0, 30.0)
        assert len(pp.stability) == 3
        assert pp.stability == ["stable", "saddle", "stable"]
        # roots are genuine and the decision pair is symmetric
        for s in pp.fixed_points:
            assert np.linalg.norm(ww_drift(s, [30.0, 30.0])) < 1e-8
        lo, mid, hi = pp.fixed_points
        np.testing.assert_allclose(lo, hi[::-1], atol=1e-8)
        np.testing.assert_allclose(mid[0], mid[1], atol=1e-8)

    def test_resting_state_has_five_fixed_points(self):
        from columnflow.analysis import wong_wang_phase_plane

        pp = wong_wang_phase_plane(0.0, 0.0)
        assert len(pp.stability) == 5
        assert pp.stability.count("stable") == 3
        assert pp.stability.count("saddle") == 2

    def test_high_drive_single_attractor(self):
        from columnflow.analysis import wong_wang_phase_plane

        pp = wong_wang_phase_plane(70.0, 70.0)
        assert pp.stability == ["stable"]

    def test_coherence_biases_drives(self):
        from columnflow.analysis import wong_wang_phase_plane

        pp = wong_wang_phase_plane(30.0, 30.0, coherence=0.5)
        # biased toward pool A: the A-winning attractor dominates
        stable = [s for s, lab in zip(pp.fixed_points, pp.stability)
                  if lab == "stable"]
        assert max(s[0] for s in stable) > max(s[1] for s in stable)

    def test_stability_labels_match_dynamics(self):
        from columnflow.analysis import wong_wang_phase_plane, ww_drift

        mu = [30.0, 30.0]
        pp = wong_wang_phase_plane(*mu)
        dt = 1e-3
        for s0, lab in zip(pp.fixed_points, pp.stability):
            s = s0 + np.array([1e-3, -1e-3])
            for _ in range(2000):
                s = s + dt * ww_drift(s, mu)
            dist = np.linalg.norm(s - s0)
            if lab == "stable":
                assert dist < 1e-3
            else:  # the saddle repels along its unstable manifold
                assert dist > 1e-2

    def test_nullclines_lie_on_zero_level_set(self):
        from columnflow.analysis import wong_wang_phase_plane, ww_drift

        pp = wong_wang_phase_plane(30.0, 30.0)
        a = np.abs(ww_drift(pp.nullcline_a, [30.0, 30.0])[:, 0])
        b = np.abs(ww_drift(pp.nullcline_b, [30.0, 30.0])[:, 1])
        scale = np.abs(pp.ds[..., 0]).max()
        assert np.median(a) < 1e-3 * scale
        assert np.median(b) < 1e-3 * scale

    def test_phase_plane_figure(self, tmp_path):
        from columnflow.analysis import wong_wang_phase_plane
        from columnflow.analysis import plots

        pp = wong_wang_phase_plane(30.0, 30.0, n_grid=41)
        p = plots.plot_phase_plane(pp, str(tmp_path / "pp.png"), title="t")
        import os

        assert os.path.exists(p) and os.path.getsize(p) > 0


class TestGallery:
    """The one-CLI figure gallery (round-2 VERDICT #8):
    ``python -m columnflow.analysis.experiments all --demo`` produces the
    reference's CCN-style figures end-to-end, headless (Agg)."""

    def test_load_demo_hopf(self):
        """The packaged Hopf checkpoint tracks a held-out ground-truth
        spiral (reference validation criterion,
        scripts/bifurcation_ode.py:109-119)."""
        import jax

        from columnflow.analysis.demo import load_demo_hopf
        from columnflow.data import make_hopf_dataset
        from columnflow.ops.losses import smooth_l1
        from columnflow.tasks.bifurcation import rollout

        params, task = load_demo_hopf()
        true = make_hopf_dataset(jax.random.PRNGKey(123), 1, task.ts)
        pred = rollout(params, task, true[0, :, :2], true[:, :, 2],
                       differentiable=False)
        val = float(smooth_l1(pred, true[:, :, :2]))
        assert val < 0.12, val  # trained run reaches ~0.05; untrained ~0.7

    def test_gallery_all_demo_headless(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        from columnflow.analysis.experiments import GALLERY, main

        main(["all", "--demo", "--out-dir", str(tmp_path),
              "--iterations", "2", "--train-iters", "20"])
        wrote = sorted(p.name for p in tmp_path.iterdir())
        want = {"coherence.png", "dominance.png", "wta_timecourse.png",
                "xor_timecourse.png", "hopf_spiral.png",
                "ww_phase_plane.png", "latent_sde.png"}
        assert want <= set(wrote), wrote
        assert len(GALLERY) == len(want)
        for p in tmp_path.iterdir():
            assert p.stat().st_size > 2000, (p.name, p.stat().st_size)
