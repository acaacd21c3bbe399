"""Adaptive SDE stepping tests: pathwise accuracy against the exact GBM
solution evaluated on the SAME virtual-Brownian-tree path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestDifferentiableAdaptive:
    """Replay-gradient adaptive SDE (the round-1 VERDICT capability gap):
    the frozen-sequence replay must reproduce the adaptive trajectory and
    expose correct reverse-mode gradients."""

    def test_replay_matches_inference_milstein(self):
        drift = lambda t, y: -y
        diff = lambda t, y: 0.3 * y + 0.1
        ts = jnp.linspace(0.0, 1.0, 17)
        key = jax.random.PRNGKey(3)
        a = sdeint_adaptive(drift, diff, jnp.ones(4), ts, key,
                            method="milstein", max_steps=512)
        b = sdeint_adaptive(drift, diff, jnp.ones(4), ts, key,
                            method="milstein", max_steps=512,
                            differentiable=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_replay_matches_inference_sra1(self):
        drift = lambda t, y: -2.0 * y
        diff = lambda t, y: jnp.full_like(y, 0.4)
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(4)
        a = sdeint_adaptive(drift, diff, jnp.ones(3), ts, key,
                            method="sra1", max_steps=512)
        b = sdeint_adaptive(drift, diff, jnp.ones(3), ts, key,
                            method="sra1", max_steps=512, differentiable=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_y0_matches_closed_form(self):
        # OU: dy = -theta y dt + sigma dW  =>  dy(T)/dy0 = exp(-theta T)
        # EXACTLY, independent of the noise path.
        theta, sigma, T = 1.3, 0.5, 1.0
        drift = lambda t, y: -theta * y
        diff = lambda t, y: jnp.full_like(y, sigma)
        ts = jnp.linspace(0.0, T, 9)

        for method in ("milstein", "sra1"):
            def final(y0):
                ys = sdeint_adaptive(drift, diff, y0, ts,
                                     jax.random.PRNGKey(5), method=method,
                                     rtol=1e-4, atol=1e-4, max_steps=1024,
                                     differentiable=True)
                return ys[-1].sum()

            g = float(jax.grad(final)(jnp.ones(1))[0])
            # Tolerance is the scheme's deterministic-part discretization
            # error (prod(1 - theta h_i) vs e^{-theta T}), not gradient
            # noise: the replay gradient is exact for the discrete scheme.
            rel = 1e-2 if method == "milstein" else 2e-3
            assert g == pytest.approx(float(np.exp(-theta * T)), rel=rel), \
                (method, g)

    def test_grad_param_matches_fd(self):
        # d y(T) / d theta via replay vs central finite differences of the
        # same function. Milstein draws only W from the tree, so y(T) is
        # continuous in theta (SRA1's interval-keyed I10 draws jump when
        # the FD evaluations land on a different accepted-step sequence,
        # which corrupts FD but not the frozen-sequence gradient itself —
        # that one is validated against the closed form above).
        sigma, T = 0.4, 1.0
        diff = lambda t, y: jnp.full_like(y, sigma)
        ts = jnp.linspace(0.0, T, 9)
        key = jax.random.PRNGKey(6)

        def final(theta):
            drift = lambda t, y: -theta * y
            ys = sdeint_adaptive(drift, diff, jnp.ones(1), ts, key,
                                 method="milstein", rtol=1e-5, atol=1e-5,
                                 max_steps=1024, differentiable=True)
            return ys[-1].sum()

        g = float(jax.grad(final)(jnp.float32(1.1)))
        eps = 1e-2
        fd = (float(final(jnp.float32(1.1 + eps)))
              - float(final(jnp.float32(1.1 - eps)))) / (2 * eps)
        assert g == pytest.approx(fd, rel=5e-2), (g, fd)

    def test_grads_flow_under_jit_and_stats(self):
        drift = lambda t, y, a: -a * y
        diff = lambda t, y, a: jnp.full_like(y, 0.2)
        ts = jnp.linspace(0.0, 0.5, 6)

        @jax.jit
        def loss_and_stats(a):
            ys, stats = sdeint_adaptive(
                drift, diff, jnp.ones(2), ts, jax.random.PRNGKey(7), a,
                method="milstein", max_steps=256, differentiable=True,
                return_stats=True,
            )
            return jnp.sum(ys**2), stats

        (val, stats), = [loss_and_stats(jnp.float32(0.8))]
        assert bool(stats.success) and int(stats.naccept) > 0
        g = jax.grad(lambda a: loss_and_stats(a)[0])(jnp.float32(0.8))
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestAdaptiveSRA1:
    def test_sra1_ou_moments(self):
        # Distributional accuracy: over many independent paths the adaptive
        # SRA1 endpoint must match the exact OU law
        # y(T) ~ N(y0 e^{-th T}, s^2 (1 - e^{-2 th T}) / (2 th)).
        # (A pathwise test against the tree path is NOT valid for SRA1: its
        # space-time integrals I10 are interval-keyed draws — correct in
        # law, but extra randomness not measurable from W alone.)
        th, s, T = 1.0, 0.5, 1.0
        drift = lambda t, y: -th * y
        diff = lambda t, y: jnp.full_like(y, s)
        ts = jnp.linspace(0.0, T, 5)

        def endpoint(key):
            return sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                                   method="sra1", rtol=1e-3, atol=1e-3,
                                   max_steps=512)[-1]

        K = 400
        ys = np.asarray(jax.jit(jax.vmap(endpoint))(
            jax.random.split(jax.random.PRNGKey(0), K)
        ))
        mean_exact = np.exp(-th * T)
        var_exact = s**2 * (1 - np.exp(-2 * th * T)) / (2 * th)
        se = np.sqrt(var_exact / K)
        assert abs(ys.mean() - mean_exact) < 4 * se, (ys.mean(), mean_exact)
        assert abs(ys.var() - var_exact) / var_exact < 0.25, \
            (ys.var(), var_exact)

    def test_sra1_fewer_steps_than_euler(self):
        # The point of strong order 1.5: at matched tolerance SRA1 needs
        # far fewer accepted steps (that efficiency is what makes adaptive
        # stochastic training affordable).
        th, s = 1.0, 0.5
        drift = lambda t, y: -th * y
        diff = lambda t, y: jnp.full_like(y, s)
        ts = jnp.linspace(0.0, 1.0, 5)

        def steps(method, key):
            _, stats = sdeint_adaptive(
                drift, diff, jnp.float32(1.0), ts, key, method=method,
                rtol=1e-4, atol=1e-4, max_steps=4096, return_stats=True)
            assert bool(stats.success)
            return int(stats.naccept)

        n_e = np.mean([steps("euler", jax.random.PRNGKey(k))
                       for k in range(4)])
        n_s = np.mean([steps("sra1", jax.random.PRNGKey(k))
                       for k in range(4)])
        assert n_s < 0.5 * n_e, (n_s, n_e)

    def test_sra1_reproducible(self):
        drift = lambda t, y: -y
        diff = lambda t, y: jnp.full_like(y, 0.5)
        ts = jnp.linspace(0.0, 1.0, 11)
        a = sdeint_adaptive(drift, diff, jnp.ones(3), ts,
                            jax.random.PRNGKey(0), method="sra1")
        b = sdeint_adaptive(drift, diff, jnp.ones(3), ts,
                            jax.random.PRNGKey(0), method="sra1")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLargeNetworkStability:
    """The round-1 VERDICT's 'done' criterion for differentiable adaptive
    SDE: the large-scale stochastic column network is stable under adaptive
    stepping where the reference's fixed dt=1e-3 grid is not (the firing-
    rate artefact its README warns about, reference README.md:27-29).

    CI runs the 52-column (1248-dim) scale; RESULTS.md records the
    104-column TPU run. The fixed grid at dt=1e-3 drives membrane
    potentials to ~1e10 (physically meaningless, en route to overflow);
    the adaptive controller shrinks steps through the stiff tau_syn mode
    and keeps the state at biophysical scale."""

    def _net(self, cpa):
        from columnflow.config import ColumnConfig
        from columnflow.models import build_column_network

        cfg = ColumnConfig.load()
        return build_column_network(cfg, jax.random.PRNGKey(0),
                                    areas=("mt",) * len(cpa),
                                    columns_per_area=cpa, n_inputs=4)

    def _fns(self, params, net):
        from columnflow.data import parity_stim_table
        from columnflow.models import Stimulus
        from columnflow.models.network import (network_diffusion,
                                               network_drift)

        T, dt = 400, 1e-3
        ts = jnp.linspace(0.0, T * dt, T)
        table = parity_stim_table(jnp.asarray([15.0, 0.0, 15.0, 0.0]), T)
        stim = Stimulus(0.0, float(ts[1] - ts[0]), table)
        drift = lambda t, y: network_drift(t, y, params, net, stim)
        diff = lambda t, y: network_diffusion(t, y, params, net, stim)
        return drift, diff, ts

    def test_fixed_grid_unstable_adaptive_stable(self):
        from columnflow.solvers import sdeint

        params, net = self._net((32, 16, 4))
        drift, diff, ts = self._fns(params, net)
        S = 3 * net.num_pops

        ys_fixed = sdeint(drift, diff, jnp.zeros(S), ts,
                          jax.random.PRNGKey(1), method="srk",
                          noise="scalar", additive=True)
        # The fixed grid leaves the biophysical regime by orders of
        # magnitude (the artefact); membrane potentials are O(10-100) mV
        # in a healthy integration.
        assert float(jnp.max(jnp.abs(ys_fixed))) > 1e6

        ys_a, stats = sdeint_adaptive(
            drift, diff, jnp.zeros(S), ts, jax.random.PRNGKey(1),
            method="sra1", rtol=1e-3, atol=1e-3, max_steps=8192,
            return_stats=True,
        )
        assert bool(stats.success)
        assert bool(jnp.all(jnp.isfinite(ys_a)))
        assert float(jnp.max(jnp.abs(ys_a))) < 1e4

    def test_adaptive_train_step_stable(self):
        """One full stochastic train step (rollout -> parity readout loss ->
        replay gradients) through the adaptive solver at the 52-column
        scale: loss and gradients finite, solver succeeds."""
        from columnflow.data import parity_stim_table
        from columnflow.models import Stimulus
        from columnflow.models.network import (network_diffusion,
                                               network_drift)
        from columnflow.ops.transfer import compute_firing_rate

        params, net = self._net((32, 16, 4))
        T, dt = 400, 1e-3
        ts = jnp.linspace(0.0, T * dt, T)
        table = parity_stim_table(jnp.asarray([15.0, 0.0, 15.0, 0.0]), T)
        stim = Stimulus(0.0, float(ts[1] - ts[0]), table)
        S = 3 * net.num_pops
        P = net.num_pops

        def loss_fn(p):
            ys = sdeint_adaptive(
                lambda t, y: network_drift(t, y, p, net, stim),
                lambda t, y: network_diffusion(t, y, p, net, stim),
                jnp.zeros(S), ts, jax.random.PRNGKey(2),
                method="sra1", rtol=1e-3, atol=1e-3, max_steps=6144,
                differentiable=True,
            )
            fr = compute_firing_rate(ys[:, :P] - ys[:, P : 2 * P])
            out = jnp.sum(jnp.mean(fr[-100:, -8:], axis=0)
                          * p["output_weights"])
            return jnp.abs(out - 20.0)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # Gradients actually flow into every trainable group.
        assert float(sum(jnp.sum(jnp.abs(g)) for g in leaves)) > 0.0


class TestFusedReplay:
    """fused=True runs the replay sweep (and its backward) as Pallas
    kernels over the non-uniform half-step grid (sdeint_fused ts_steps
    mode). Same tree increments and interval-keyed I10 draws as the scan
    replay -> trajectories and gradients match to fp reassociation."""

    drift = staticmethod(lambda t, y: -1.3 * y)
    diff = staticmethod(lambda t, y: 0.5 * jnp.ones_like(y))
    ts = jnp.linspace(0.0, 1.0, 9)

    @pytest.mark.parametrize("method", ["sra1", "euler", "milstein"])
    def test_matches_scan_replay(self, method):
        key = jax.random.PRNGKey(5)
        a = sdeint_adaptive(self.drift, self.diff, jnp.ones(4), self.ts,
                            key, method=method, rtol=1e-4, atol=1e-4,
                            max_steps=256, differentiable=True)
        b = sdeint_adaptive(self.drift, self.diff, jnp.ones(4), self.ts,
                            key, method=method, rtol=1e-4, atol=1e-4,
                            max_steps=256, differentiable=True, fused=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match_scan_replay(self):
        # Differentiable quantities must be explicit *args on the fused
        # path (a Pallas kernel cannot capture traced closure constants) —
        # the same contract as every fused solver here.
        key = jax.random.PRNGKey(6)
        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: 0.5 * jnp.ones_like(y)

        def final(theta, fused):
            ys = sdeint_adaptive(drift, diff, jnp.ones(2), self.ts,
                                 key, theta, method="sra1", rtol=1e-4,
                                 atol=1e-4, max_steps=256,
                                 differentiable=True, fused=fused)
            return jnp.sum(ys ** 2)

        th0 = jnp.full((2,), 1.1)
        g_scan = np.asarray(jax.grad(lambda a: final(a, False))(th0))
        g_fused = np.asarray(jax.grad(lambda a: final(a, True))(th0))
        np.testing.assert_allclose(g_fused, g_scan, rtol=1e-4)

    def test_vmapped_over_batch(self):
        """The task usage pattern: vmap over per-sample keys (each sample
        its own frozen step sequence inside the kernels)."""
        keys = jax.random.split(jax.random.PRNGKey(7), 3)

        def one(k, fused):
            return sdeint_adaptive(self.drift, self.diff, jnp.ones(4),
                                   self.ts, k, method="sra1", rtol=1e-4,
                                   atol=1e-4, max_steps=256,
                                   differentiable=True, fused=fused)

        a = jax.vmap(lambda k: one(k, False))(keys)
        b = jax.vmap(lambda k: one(k, True))(keys)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


class TestTruncatedBPTT:
    """``bptt_every=W`` truncates reverse-mode chains every W accepted
    steps — the surrogate-gradient answer to exponential pathwise cotangent
    growth on chaotic long horizons (measured ~1.4x/step on the 104-column
    network's late attractor regime; RESULTS.md). Values are untouched;
    only gradient flow is windowed."""

    drift = staticmethod(lambda t, y, th: -th * y)
    diff = staticmethod(lambda t, y, th: 0.5 * jnp.ones_like(y))
    ts = jnp.linspace(0.0, 1.0, 9)

    def _value_and_grad(self, fused, bptt):
        def loss(th):
            ys = sdeint_adaptive(self.drift, self.diff, jnp.ones(2), self.ts,
                                 jax.random.PRNGKey(3), th, method="sra1",
                                 rtol=1e-4, atol=1e-4, max_steps=256,
                                 differentiable=True, fused=fused,
                                 bptt_every=bptt)
            return jnp.sum(ys ** 2)

        v, g = jax.value_and_grad(loss)(jnp.full((2,), 1.1))
        return float(v), np.asarray(g)

    @pytest.mark.parametrize("fused", [False, True])
    def test_window_covering_solve_is_exact(self, fused):
        # W == max_steps puts the only truncation point at step 0, which
        # severs d/dy0 through the dynamics but no parameter chains.
        v_full, g_full = self._value_and_grad(fused, None)
        v_trunc, g_trunc = self._value_and_grad(fused, 256)
        assert v_full == v_trunc
        np.testing.assert_allclose(g_trunc, g_full, rtol=1e-6)

    @pytest.mark.parametrize("fused", [False, True])
    def test_small_window_changes_gradient_not_value(self, fused):
        # Fused path: the solver chunk is capped at the window, so small
        # windows truncate even where the auto-chunk would cover the
        # whole solve.
        v_full, g_full = self._value_and_grad(fused, None)
        v_trunc, g_trunc = self._value_and_grad(fused, 4)
        assert v_full == v_trunc
        assert np.all(np.isfinite(g_trunc))
        assert np.any(g_trunc != 0.0)
        assert not np.allclose(g_trunc, g_full, rtol=1e-3)

    def test_invalid_window_raises(self):
        with pytest.raises(ValueError, match="bptt_every"):
            sdeint_adaptive(self.drift, self.diff, jnp.ones(2), self.ts,
                            jax.random.PRNGKey(0), jnp.ones(2),
                            method="sra1", differentiable=True,
                            bptt_every=0)

    def test_fused_chunk_truncation_matches_manual_scan(self):
        # The fused path truncates at chunk boundaries (window rounded to
        # chunk granularity): chunk=8 + bptt_every=8 must equal a manual
        # scan with stop_gradient on the carry every 8 steps.
        from columnflow.solvers.fused import sdeint_fused

        n = 32
        st = jnp.linspace(0.0, 1.0, n + 1)
        i1 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, 2))
        i10 = jnp.zeros((n, 2))
        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: 0.3 * jnp.ones_like(y)
        y0 = jnp.ones(2)

        def loss_fused(th):
            ys = sdeint_fused(drift, diff, y0, None, None, th,
                              method="euler", noise_pack=(i1, i10),
                              ts_steps=st, chunk=8, bptt_every=8,
                              interpret=True)
            return jnp.sum(ys ** 2)

        def loss_manual(th):
            def body(y, k):
                y = jnp.where(k % 8 == 0, jax.lax.stop_gradient(y), y)
                t0 = st[k]
                h = st[k + 1] - t0
                y1 = y + h * drift(t0, y, th) + diff(t0, y, th) * i1[k]
                return y1, y1

            _, ys = jax.lax.scan(body, y0, jnp.arange(n))
            return jnp.sum(y0 ** 2) + jnp.sum(ys ** 2)

        th0 = jnp.full((2,), 0.9)
        g_f = np.asarray(jax.grad(loss_fused)(th0))
        g_m = np.asarray(jax.grad(loss_manual)(th0))
        np.testing.assert_allclose(g_f, g_m, rtol=1e-5)


class TestSelectionOverride:
    """select_drift/select_args route the step-size-selection pass through a
    cheaper drift (the bf16-weights optimization, RESULTS.md's 104-column
    bandwidth accounting) without touching the replay's values/gradients."""

    drift = staticmethod(lambda t, y, a: -a * y)
    diff = staticmethod(lambda t, y, a: jnp.full_like(y, 0.4))
    ts = jnp.linspace(0.0, 1.0, 9)

    def _solve(self, **kw):
        return sdeint_adaptive(
            self.drift, self.diff, jnp.ones(3), self.ts,
            jax.random.PRNGKey(11), jnp.float32(1.3),
            method="sra1", max_steps=512, differentiable=True,
            return_stats=True, **kw,
        )

    def test_identity_select_is_bit_exact(self):
        a, sa = self._solve()
        b, sb = self._solve(select_drift=self.drift,
                            select_diffusion=self.diff,
                            select_args=(jnp.float32(1.3),))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(sa.naccept) == int(sb.naccept)

    def test_perturbed_select_changes_grid_not_accuracy(self):
        # A bf16-level perturbation of the selection drift picks a (possibly)
        # different accepted-step grid; the replayed f32 integration of the
        # SAME Brownian path must agree at the final time (an accepted point
        # on both grids — INTERIOR output points interpolate linearly across
        # different accepted intervals and legitimately differ by the
        # O(sigma*sqrt(h)) Brownian wiggle between them) and the controller
        # must stay in the same step-count regime.
        def sel(t, y, a):
            y16 = y.astype(jnp.bfloat16).astype(jnp.float32)
            return -a * y16

        a, sa = self._solve()
        b, sb = self._solve(select_drift=sel)
        assert bool(sb.success)
        np.testing.assert_allclose(np.asarray(a[-1]), np.asarray(b[-1]),
                                   atol=5e-2)
        assert int(sb.naccept) < 2 * int(sa.naccept) + 4
        assert int(sa.naccept) < 2 * int(sb.naccept) + 4

    def test_select_args_fixed_grid_gradient_matches_fd(self):
        # With select_args pinned to a constant, the accepted grid does not
        # move with the diff arg, so central FD is exact for the replayed
        # scheme and must match the replay gradient.
        key = jax.random.PRNGKey(12)
        ts = self.ts
        sel_a = (jnp.float32(1.25),)

        def final(a):
            ys = sdeint_adaptive(
                self.drift, self.diff, jnp.ones(1), ts, key, a,
                method="milstein", rtol=1e-5, atol=1e-5, max_steps=1024,
                differentiable=True, select_args=sel_a,
            )
            return ys[-1].sum()

        g = float(jax.grad(final)(jnp.float32(1.3)))
        eps = 1e-2
        fd = (float(final(jnp.float32(1.3 + eps)))
              - float(final(jnp.float32(1.3 - eps)))) / (2 * eps)
        assert g == pytest.approx(fd, rel=1e-3), (g, fd)

    def test_inference_mode_uses_select_fns(self):
        # In inference mode the pass IS the integration: a zero select drift
        # must produce the zero-drift (pure noise) trajectory.
        zero_drift = lambda t, y, a: jnp.zeros_like(y)
        ys_sel = sdeint_adaptive(
            self.drift, self.diff, jnp.ones(3), self.ts,
            jax.random.PRNGKey(13), jnp.float32(1.3),
            method="sra1", max_steps=512, select_drift=zero_drift,
        )
        ys_zero = sdeint_adaptive(
            zero_drift, self.diff, jnp.ones(3), self.ts,
            jax.random.PRNGKey(13), jnp.float32(1.3),
            method="sra1", max_steps=512,
        )
        np.testing.assert_allclose(np.asarray(ys_sel), np.asarray(ys_zero),
                                   rtol=1e-6, atol=1e-6)


class TestNetworkSelect16:
    """models.network's bf16 selection drifts: faithful to the f32 drift at
    bf16 precision, and usable end-to-end through the parity rollout."""

    def _setup(self):
        from columnflow.config import ColumnConfig
        from columnflow.models.network import build_column_network
        from columnflow.tasks.parity import parity_stim_table
        from columnflow.models.column import Stimulus

        cfg = ColumnConfig.load()
        params, net = build_column_network(
            cfg, jax.random.PRNGKey(0), columns_per_area=(2, 1),
        )
        table = parity_stim_table(jnp.asarray([15.0, 0.0, 15.0, 0.0]), 50)
        stim = Stimulus(0.0, 1e-3, table)
        return params, net, stim

    def test_select16_matches_f32_to_bf16_precision(self):
        from columnflow.models.network import (
            network_drift,
            network_drift_select16,
            select_weights_bf16,
        )

        params, net, stim = self._setup()
        w16, iw16 = select_weights_bf16(params, net)
        P3 = 3 * net.num_pops
        y = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (P3,))
        f = np.asarray(network_drift(0.02, y, params, net, stim))
        f16 = np.asarray(network_drift_select16(0.02, y, w16, iw16, net,
                                                stim))
        denom = np.maximum(np.abs(f), 1e-1 * np.max(np.abs(f)))
        assert np.max(np.abs(f16 - f) / denom) < 3e-2

    def test_premixed_select16_matches_plain_select16(self):
        from columnflow.models.network import (
            build_network_fused_consts,
            network_drift_premixed_select16,
            network_drift_select16,
            premix_network_weights,
            premix_select16,
            select_weights_bf16,
        )

        params, net, stim = self._setup()
        w16, iw16 = select_weights_bf16(params, net)
        pw16 = premix_select16(premix_network_weights(params, net))
        fc = build_network_fused_consts(net)
        P3 = 3 * net.num_pops
        y = 5.0 * jax.random.normal(jax.random.PRNGKey(2), (P3,))
        a = np.asarray(network_drift_select16(0.02, y, w16, iw16, net, stim))
        from columnflow.models.column import Stimulus as _S
        stim_b = _S(stim.t0, stim.dt, stim.table[:, None, :])
        b = np.asarray(network_drift_premixed_select16(
            0.02, y[None], pw16, fc, stim_b))[0]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)

    def test_parity_rollout_select_bf16_trains(self):
        from columnflow.config import ColumnConfig
        from columnflow.tasks.parity import (
            build_task,
            make_train_step,
            make_parity_batch,
        )

        cfg = ColumnConfig.load()
        task = build_task(cfg, jax.random.PRNGKey(0),
                          columns_per_area=(2, 1), time_steps=50,
                          max_steps=256)
        step = make_train_step(task, stochastic=True, adaptive=True,
                               select_bf16=True)
        stims = make_parity_batch(jax.random.PRNGKey(1), 4, 2)
        opt_state = task.optimizer.init(task.params)
        params, opt_state, loss, out, gnorm, ok = step(
            task.params, opt_state, stims, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
        assert bool(ok)


class TestStepController:
    def test_invalid_controller_raises(self):
        drift = lambda t, y: -y
        diff = lambda t, y: 0.3 * jnp.ones_like(y)
        with pytest.raises(ValueError, match="controller"):
            sdeint_adaptive(drift, diff, jnp.ones(2),
                            jnp.linspace(0.0, 1.0, 5),
                            jax.random.PRNGKey(0), controller="pid")

    def test_pi_cuts_rejections_on_stiff_noise(self):
        # Stiff OU + strong additive noise keeps the deadbeat controller
        # oscillating around the accept threshold; PI's memory damps it.
        # (On the column networks the measured cut is ~55% of rejections /
        # ~12% of total attempts, RESULTS.md.)
        drift = lambda t, y: -40.0 * y
        diff = lambda t, y: jnp.full_like(y, 2.0)
        ts = jnp.linspace(0.0, 2.0, 9)

        def counts(ctrl):
            na = nr = 0
            for k in range(4):
                _, st = sdeint_adaptive(
                    drift, diff, jnp.ones(4), ts, jax.random.PRNGKey(k),
                    method="sra1", max_steps=4096, return_stats=True,
                    controller=ctrl)
                assert bool(st.success)
                na += int(st.naccept)
                nr += int(st.nreject)
            return na, nr

        na_i, nr_i = counts("i")
        na_pi, nr_pi = counts("pi")
        assert nr_pi < nr_i
        assert na_pi + nr_pi < na_i + nr_i  # fewer TOTAL attempts

    def test_pi_replay_matches_inference(self):
        # The frozen-sequence replay must track the PI-selected grid too.
        drift = lambda t, y: -2.0 * y
        diff = lambda t, y: jnp.full_like(y, 0.4)
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(4)
        a = sdeint_adaptive(drift, diff, jnp.ones(3), ts, key,
                            method="sra1", max_steps=512, controller="pi")
        b = sdeint_adaptive(drift, diff, jnp.ones(3), ts, key,
                            method="sra1", max_steps=512, controller="pi",
                            differentiable=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


class TestPairedDoubling:
    def test_sra1_paired_matches_sequential(self):
        # The pass's paired SRA1 doubling attempt (one batched stage-2 drift
        # eval for the full and first-half steps — one weight-matrix HBM
        # read instead of two) must equal three sequential _sra1_step calls
        # up to matmul reassociation.
        from columnflow.solvers.sde_adaptive import _sra1_doubling, _sra1_step

        drift = lambda t, y, a: -a * y + jnp.sin(3.0 * t)
        diff = lambda t, y, a: jnp.full_like(y, 0.4) * (1.0 + 0.1 * t)
        a = jnp.float32(1.3)
        for k in range(5):
            ks = jax.random.split(jax.random.PRNGKey(k), 5)
            y = jax.random.normal(ks[0], (7,))
            t, h = jnp.float32(0.3), jnp.float32(0.05)
            dw_a = 0.1 * jax.random.normal(ks[1], ())
            dw_b = 0.1 * jax.random.normal(ks[2], ())
            i10_a = 0.01 * jax.random.normal(ks[3], ())
            i10_b = 0.01 * jax.random.normal(ks[4], ())
            i10_f = i10_a + i10_b + 0.5 * h * dw_a
            yf_seq = _sra1_step(drift, diff, t, y, h, dw_a + dw_b, i10_f,
                                (a,))
            yh = _sra1_step(drift, diff, t, y, 0.5 * h, dw_a, i10_a, (a,))
            yh2_seq = _sra1_step(drift, diff, t + 0.5 * h, yh, 0.5 * h,
                                 dw_b, i10_b, (a,))
            yf, yh2 = _sra1_doubling(drift, diff, t, y, h, dw_a, dw_b,
                                     i10_a, i10_b, i10_f, (a,))
            np.testing.assert_allclose(np.asarray(yf), np.asarray(yf_seq),
                                       rtol=2e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(yh2), np.asarray(yh2_seq),
                                       rtol=2e-6, atol=1e-7)

    def test_zero_h_is_safe(self):
        from columnflow.solvers.sde_adaptive import _sra1_doubling

        drift = lambda t, y: -y
        diff = lambda t, y: jnp.full_like(y, 0.4)
        y = jnp.ones(3)
        z = jnp.float32(0.0)
        yf, yh2 = _sra1_doubling(drift, diff, z, y, z, z, z, z, z, z, ())
        assert np.all(np.isfinite(np.asarray(yf)))
        np.testing.assert_allclose(np.asarray(yh2), np.asarray(y))


class TestBatchedReplay:
    """sdeint_adaptive_batch: vmapped-per-sample semantics, chunk-gated
    batched replay (the padding-tail skip the vmapped path cannot do —
    per-sample lax.cond under vmap degrades to select)."""

    drift = staticmethod(lambda t, y, a, s: -a * y + s * jnp.sin(3.0 * t))
    diff = staticmethod(lambda t, y, a, s: jnp.full_like(y, 0.4))
    ts = jnp.linspace(0.0, 1.0, 9)
    theta = jnp.float32(1.3)

    def _inputs(self):
        B = 4
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        y0 = jax.random.normal(jax.random.PRNGKey(1), (B, 3))
        shifts = jnp.linspace(0.5, 2.0, B)
        return y0, keys, shifts

    def _ref(self, y0, keys, shifts, method, bptt):
        return jax.vmap(lambda y0b, kb, sb: sdeint_adaptive(
            self.drift, self.diff, y0b, self.ts, kb, self.theta, sb,
            method=method, max_steps=128, differentiable=True,
            bptt_every=bptt))(y0, keys, shifts)

    @pytest.mark.parametrize("method", ["sra1", "milstein", "euler"])
    def test_matches_vmapped_per_sample(self, method):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, shifts = self._inputs()
        ref = self._ref(y0, keys, shifts, method, None)
        for chunk in (128, 16, 5):  # incl. a non-divisor of max_steps
            out = sdeint_adaptive_batch(
                self.drift, self.diff, y0, self.ts, keys, self.theta,
                batch_args=(shifts,), method=method, max_steps=128,
                replay_chunk=chunk)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-6, atol=1e-7,
                                       err_msg=f"chunk={chunk}")

    def test_bptt_and_gradients_match(self):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, shifts = self._inputs()
        ref = self._ref(y0, keys, shifts, "sra1", 3)
        out = sdeint_adaptive_batch(
            self.drift, self.diff, y0, self.ts, keys, self.theta,
            batch_args=(shifts,), method="sra1", max_steps=128,
            bptt_every=3, replay_chunk=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=1e-7)

        def loss_ref(a):
            ys = jax.vmap(lambda y0b, kb, sb: sdeint_adaptive(
                self.drift, self.diff, y0b, self.ts, kb, a, sb,
                method="sra1", max_steps=128, differentiable=True,
                bptt_every=3))(y0, keys, shifts)
            return jnp.sum(ys ** 2)

        def loss_bat(a):
            from columnflow.solvers import sdeint_adaptive_batch as bat
            ys = bat(self.drift, self.diff, y0, self.ts, keys, a,
                     batch_args=(shifts,), method="sra1", max_steps=128,
                     bptt_every=3, replay_chunk=16)
            return jnp.sum(ys ** 2)

        g_ref = float(jax.grad(loss_ref)(self.theta))
        g_bat = float(jax.grad(loss_bat)(self.theta))
        assert g_bat == pytest.approx(g_ref, rel=1e-4), (g_ref, g_bat)

    def test_stats_match_and_select_drift(self):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, shifts = self._inputs()
        _, st_b = sdeint_adaptive_batch(
            self.drift, self.diff, y0, self.ts, keys, self.theta,
            batch_args=(shifts,), method="sra1", max_steps=128,
            return_stats=True)
        _, st_r = jax.vmap(lambda y0b, kb, sb: sdeint_adaptive(
            self.drift, self.diff, y0b, self.ts, kb, self.theta, sb,
            method="sra1", max_steps=128, differentiable=True,
            return_stats=True))(y0, keys, shifts)
        np.testing.assert_array_equal(np.asarray(st_b.naccept),
                                      np.asarray(st_r.naccept))
        np.testing.assert_array_equal(np.asarray(st_b.nreject),
                                      np.asarray(st_r.nreject))
        assert bool(jnp.all(st_b.success))

        # select_drift keeps the batch signature (*args, *batch_args_b)
        sel = lambda t, y, a, s: (-a) * y.astype(jnp.bfloat16).astype(
            jnp.float32) + s * jnp.sin(3.0 * t)
        ys = sdeint_adaptive_batch(
            self.drift, self.diff, y0, self.ts, keys, self.theta,
            batch_args=(shifts,), method="sra1", max_steps=128,
            select_drift=sel)
        assert np.all(np.isfinite(np.asarray(ys)))

    def test_parity_rollout_uses_batched_replay(self):
        # The task's XLA adaptive training branch routes through
        # sdeint_adaptive_batch and must reproduce the vmapped per-sample
        # replay BIT-EXACTLY on the column network (same grids, same draws,
        # same vmapped stepper lowering). Pointwise train-vs-inference
        # comparison is NOT meaningful here: the pass's paired doubling
        # differs from the replay at matmul-reassociation level and the
        # column dynamics amplify that chaotically.
        from columnflow.config import ColumnConfig
        from columnflow.data import parity_stim_table
        from columnflow.models.column import Stimulus
        from columnflow.models.network import (network_diffusion,
                                               network_drift)
        from columnflow.tasks.parity import (batched_rollout, build_task,
                                             make_parity_batch)

        cfg = ColumnConfig.load()
        task = build_task(cfg, jax.random.PRNGKey(0),
                          columns_per_area=(2, 1), time_steps=50,
                          max_steps=256)
        stims = make_parity_batch(jax.random.PRNGKey(1), 4, 2)
        key = jax.random.PRNGKey(2)
        keys = jax.random.split(key, stims.shape[0])
        P3 = 3 * task.net.num_pops

        ys_new = batched_rollout(task.params, task, stims, stochastic=True,
                                 adaptive=True, key=key, differentiable=True)

        def one(stim_raw, k):
            stim = Stimulus(0.0, task.dt, parity_stim_table(stim_raw, 50))
            return sdeint_adaptive(
                lambda t, y: network_drift(t, y, task.params, task.net,
                                           stim),
                lambda t, y: network_diffusion(t, y, task.params, task.net,
                                               stim),
                jnp.zeros(P3), task.ts, k, method="sra1", rtol=1e-3,
                atol=1e-3, max_steps=256, differentiable=True)

        ys_old = jax.vmap(one)(stims, keys)
        np.testing.assert_array_equal(np.asarray(ys_new),
                                      np.asarray(ys_old))


class TestFusedPass:
    """In-kernel step-size-selection pass (``fused_pass=True``) and the
    krng Brownian backend it rides on (``brownian="kernel"``)."""

    def _ou(self):
        th, s = 1.0, 0.5
        drift = lambda t, y, th_: -th_ * y
        diff = lambda t, y, th_: jnp.full_like(y, s)
        ts = jnp.linspace(0.0, 1.0, 11)
        theta = jnp.full((1, 4), th)
        y0 = jnp.ones((1, 4))
        return drift, diff, y0, ts, theta

    def test_kernel_backend_ou_variance(self):
        # brownian="kernel" (XLA pass + replay, no Pallas): the krng tree
        # must integrate as accurately as the jax tree. OU stationary
        # variance = sig^2 / (2 th) = 0.125.
        drift = lambda t, y: -y
        diff = lambda t, y: jnp.full_like(y, 0.5)
        ts = jnp.linspace(0.0, 4.0, 9)

        def final(key):
            return sdeint_adaptive(drift, diff, jnp.zeros(()), ts, key,
                                   method="sra1", rtol=1e-3, atol=1e-3,
                                   brownian="kernel")[-1]

        keys = jax.random.split(jax.random.PRNGKey(0), 512)
        finals = jax.vmap(final)(keys)
        assert abs(float(jnp.var(finals)) - 0.125) < 0.02

    @pytest.mark.parametrize("method", ["euler", "sra1"])
    def test_fused_pass_matches_xla_pass(self, method):
        # Interpret-mode kernel pass vs the XLA pass on the SAME krng
        # Brownian path. The step grids agree until an FMA-contraction ULP
        # difference flips a near-threshold accept (PI controllers hover at
        # err ~ 1), after which the two valid controllers walk different
        # grids — so the pinned property is the documented selection
        # semantics: both replays are f32 integrations of the SAME path at
        # the same tolerance, agreeing at tolerance level, with
        # near-identical step economics.
        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(3)
        kw = dict(method=method, rtol=1e-3, atol=1e-3, max_steps=512,
                  differentiable=True, return_stats=True)
        ys_x, st_x = sdeint_adaptive(drift, diff, y0, ts, key, theta,
                                     brownian="kernel", **kw)
        ys_k, st_k = sdeint_adaptive(drift, diff, y0, ts, key, theta,
                                     fused_pass=True, **kw)
        assert bool(st_k.success)
        assert abs(int(st_k.naccept) - int(st_x.naccept)) <= 3
        assert (int(st_k.naccept) + int(st_k.nreject)
                <= int(st_x.naccept) + int(st_x.nreject) + 3)
        # The final output time is an accepted point on BOTH grids — two
        # valid tol-controlled integrations of the same path agree there at
        # tolerance level. Interior output points are linear interpolations
        # between each grid's own accepted points, where the Brownian path
        # itself wiggles O(sqrt(h) sigma) ~ 0.15 — so only a sanity bound
        # holds there (same property as torchsde's dense output).
        np.testing.assert_allclose(np.asarray(ys_k[-1]),
                                   np.asarray(ys_x[-1]), atol=0.03)
        np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_x),
                                   atol=0.3)

    def test_fused_pass_first_steps_identical(self):
        # Before any near-threshold flip the kernel pass IS the XLA pass:
        # the first accepted step times agree to FMA-contraction ULPs,
        # pinning that the controller logic is the same computation.
        from columnflow.solvers import sde_adaptive as sa

        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(3)
        stepper, err_exp, with_i10, doubling = sa._STEPPERS["sra1"]
        tree, i10_draw = sa._noise_backend(key, ts[0], ts[-1], 20,
                                           jnp.float32, "kernel")
        h0 = jnp.asarray((ts[-1] - ts[0]) / (4.0 * ts.shape[0]), jnp.float32)
        c = sa._adaptive_pass(stepper, err_exp, with_i10, drift, diff, y0,
                              ts[0], ts[-1], tree, i10_draw, 1e-3, 1e-3, h0,
                              512, (theta,), controller="pi",
                              doubling=doubling)
        st_k, na, nr, ok = sa._adaptive_pass_fused(
            drift, diff, y0, key, 0.0, 1.0, 1e-3, 1e-3, float(h0), 512, 20,
            "pi", "sra1", (theta,), interpret=True)
        np.testing.assert_allclose(np.asarray(st_k)[:4],
                                   np.asarray(c.step_times)[:4],
                                   rtol=0, atol=2e-7)
        assert bool(ok)

    def test_fused_pass_gradients_match_xla_pass(self):
        # Gradients come from the replay over each pass's frozen grid; two
        # valid grids at the same tolerance give tolerance-level-equal
        # gradients on this smooth OU system.
        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(5)

        def loss(th_, fused_pass):
            ys = sdeint_adaptive(drift, diff, y0, ts, key, th_,
                                 method="sra1", rtol=1e-3, atol=1e-3,
                                 max_steps=512, differentiable=True,
                                 fused_pass=fused_pass, brownian="kernel")
            return jnp.sum(ys[-1] ** 2)

        g_x = jax.grad(lambda th_: loss(th_, False))(theta)
        g_k = jax.grad(lambda th_: loss(th_, True))(theta)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                                   rtol=0.05, atol=1e-4)

    def test_fused_pass_inference_and_stats(self):
        drift, diff, y0, ts, theta = self._ou()
        key = jax.random.PRNGKey(7)
        ys, st = sdeint_adaptive(drift, diff, y0, ts, key, theta,
                                 method="sra1", rtol=1e-3, atol=1e-3,
                                 max_steps=512, fused_pass=True,
                                 return_stats=True)
        assert bool(st.success) and int(st.naccept) > 0
        assert np.all(np.isfinite(np.asarray(ys)))
        np.testing.assert_array_equal(np.asarray(ys[0]), np.asarray(y0))

    def test_fused_pass_requires_kernel_backend(self):
        drift, diff, y0, ts, theta = self._ou()
        with pytest.raises(ValueError, match="kernel"):
            sdeint_adaptive(drift, diff, y0, ts, jax.random.PRNGKey(0),
                            theta, fused_pass=True, brownian="jax")

    def test_batch_fused_pass_matches_vmapped(self):
        from columnflow.solvers import sdeint_adaptive_batch

        drift, diff, _, ts, theta = self._ou()
        B = 3
        y0 = jnp.ones((B, 1, 4)) * jnp.asarray([0.5, 1.0, 1.5]
                                               ).reshape(B, 1, 1)
        keys = jax.random.split(jax.random.PRNGKey(11), B)
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=512)
        ys_b, st_b = sdeint_adaptive_batch(
            drift, diff, y0, ts, keys, theta, fused_pass=True,
            return_stats=True, **kw)
        ys_v = jax.vmap(
            lambda y0_b, k: sdeint_adaptive(
                drift, diff, y0_b, ts, k, theta, differentiable=True,
                fused_pass=True, **kw)
        )(y0, keys)
        np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_v),
                                   rtol=1e-5, atol=1e-7)
        assert st_b.naccept.shape == (B,)
        assert bool(jnp.all(st_b.success))


class TestBatchedFusedReplay:
    """``sdeint_adaptive_batch(fused=True)``: one lane-batched kernel sweep
    replays every sample's frozen grid. Must match
    ``vmap(sdeint_adaptive(fused=True))`` — same selection grids, same
    per-lane tree/I10 draws — to fp reassociation, values and gradients."""

    drift = staticmethod(lambda t, y, th: -th * y + 0.2 * t)
    diff = staticmethod(lambda t, y, th: 0.5 * jnp.ones_like(y))
    ts = jnp.linspace(0.0, 1.0, 9)

    def _batch(self):
        B = 3
        y0 = jnp.ones((B, 4)) * jnp.asarray([0.5, 1.0, 1.5]).reshape(B, 1)
        keys = jax.random.split(jax.random.PRNGKey(11), B)
        th = jnp.full((4,), 1.1)
        return y0, keys, th

    @pytest.mark.parametrize("method", ["euler", "sra1"])
    def test_matches_vmapped_per_sample_fused(self, method):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, th = self._batch()
        kw = dict(method=method, rtol=1e-3, atol=1e-3, max_steps=256)
        ys_b, st_b = sdeint_adaptive_batch(
            self.drift, self.diff, y0, self.ts, keys, th, fused=True,
            return_stats=True, **kw)
        ys_v = jax.vmap(
            lambda y0_b, k: sdeint_adaptive(
                self.drift, self.diff, y0_b, self.ts, k, th,
                differentiable=True, fused=True, **kw)
        )(y0, keys)
        np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_v),
                                   rtol=1e-5, atol=1e-6)
        assert bool(jnp.all(st_b.success))

    def test_gradients_match_vmapped(self):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, th = self._batch()
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=256)

        def loss_b(th):
            ys = sdeint_adaptive_batch(self.drift, self.diff, y0, self.ts,
                                       keys, th, fused=True, **kw)
            return jnp.sum(ys[:, -1] ** 2)

        def loss_v(th):
            ys = jax.vmap(
                lambda y0_b, k: sdeint_adaptive(
                    self.drift, self.diff, y0_b, self.ts, k, th,
                    differentiable=True, fused=True, **kw)
            )(y0, keys)
            return jnp.sum(ys[:, -1] ** 2)

        gb = jax.grad(loss_b)(th)
        gv = jax.grad(loss_v)(th)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gv),
                                   rtol=1e-4, atol=1e-6)

    def test_bptt_window_matches_vmapped(self):
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, th = self._batch()
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=256,
                  bptt_every=4)

        def loss_b(th):
            ys = sdeint_adaptive_batch(self.drift, self.diff, y0, self.ts,
                                       keys, th, fused=True, **kw)
            return jnp.sum(ys[:, -1] ** 2)

        def loss_v(th):
            ys = jax.vmap(
                lambda y0_b, k: sdeint_adaptive(
                    self.drift, self.diff, y0_b, self.ts, k, th,
                    differentiable=True, fused=True, **kw)
            )(y0, keys)
            return jnp.sum(ys[:, -1] ** 2)

        (vb, gb) = jax.value_and_grad(loss_b)(th)
        (vv, gv) = jax.value_and_grad(loss_v)(th)
        np.testing.assert_allclose(float(vb), float(vv), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gv),
                                   rtol=1e-4, atol=1e-6)

    def test_composes_with_fused_pass_selection(self):
        # In-kernel per-lane selection + one lane-batched replay sweep.
        from columnflow.solvers import sdeint_adaptive_batch

        y0, keys, th = self._batch()
        y0 = y0[:, None, :]                    # (B, 1, 4) kernel lane shape
        kw = dict(method="sra1", rtol=1e-3, atol=1e-3, max_steps=256)
        ys_b, st_b = sdeint_adaptive_batch(
            self.drift, self.diff, y0, self.ts, keys, th, fused=True,
            fused_pass=True, fused_y0=y0[:, 0, :], return_stats=True, **kw)
        ys_v = jax.vmap(
            lambda y0_b, k: sdeint_adaptive(
                self.drift, self.diff, y0_b, self.ts, k, th,
                differentiable=True, fused=True, fused_pass=True, **kw)
        )(y0, keys)
        np.testing.assert_allclose(np.asarray(ys_b),
                                   np.asarray(ys_v[:, :, 0, :]),
                                   rtol=1e-5, atol=1e-6)
        assert bool(jnp.all(st_b.success))


class TestDtMin:
    """torchsde's dt_min: a step floor with unconditional accept at the
    floor (its adaptive default is 1e-5; here the default 0.0 = no floor,
    preserving prior behavior exactly)."""

    def _setup(self):
        mu, sig = 0.3, 0.7
        return (lambda t, y: mu * y), (lambda t, y: sig * y)

    def test_default_zero_is_identity(self):
        drift, diff = self._setup()
        ts = jnp.linspace(0.0, 1.0, 11)
        key = jax.random.PRNGKey(0)
        a = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                            method="milstein")
        b = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                            method="milstein", dt_min=0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_floor_prevents_budget_exhaustion(self):
        # At an unmeetable tolerance the controller grinds to tiny steps
        # and exhausts the budget (success False); a floor of span/budget
        # forces progress and completes.
        from columnflow.solvers.sde_adaptive import SDESolverStats  # noqa: F401

        drift, diff = self._setup()
        ts = jnp.linspace(0.0, 1.0, 11)
        key = jax.random.PRNGKey(2)
        kw = dict(method="milstein", rtol=1e-14, atol=1e-14, max_steps=256,
                  return_stats=True)
        _, st_no = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                                   **kw)
        assert not bool(st_no.success)
        ys, st = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                                 dt_min=1.0 / 128, **kw)
        assert bool(st.success)
        assert np.all(np.isfinite(np.asarray(ys)))

    def test_accepted_steps_respect_floor(self):
        drift, diff = self._setup()
        ts = jnp.linspace(0.0, 1.0, 11)
        key = jax.random.PRNGKey(3)
        dt_min = 1.0 / 64
        from columnflow.solvers.sde_adaptive import _setup as solver_setup  # noqa
        ys, st = sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key,
                                 method="milstein", rtol=1e-14, atol=1e-14,
                                 max_steps=512, dt_min=dt_min,
                                 return_stats=True)
        assert bool(st.success)
        # completing 1.0 of span within the budget at floor dt_min means
        # naccept <= span/dt_min + slack (every accepted step >= ~dt_min,
        # modulo the final end-of-span clamp per output landing)
        assert int(st.naccept) <= 64 + 16

    def test_differentiable_replay_with_floor(self):
        drift = lambda t, y, a: a * y
        diff = lambda t, y, a: 0.7 * y
        ts = jnp.linspace(0.0, 1.0, 6)
        key = jax.random.PRNGKey(5)

        def term(a):
            return sdeint_adaptive(drift, diff, jnp.float32(1.0), ts, key, a,
                                   method="milstein", rtol=1e-9, atol=1e-9,
                                   max_steps=256, dt_min=1.0 / 64,
                                   differentiable=True)[-1]
        y_t = float(term(0.3))
        g = float(jax.grad(term)(0.3))
        assert np.isfinite(g) and y_t > 0.0
        # Ito GBM pathwise: dy_T/da = T y_T
        assert abs(g - y_t) < 0.05 * abs(y_t)

    def test_kernel_pass_matches_xla_pass(self):
        # fused_pass (interpret on CPU) with dt_min: at an unmeetable
        # tolerance every attempt sits at the floor and is force-accepted,
        # so the controller's decisions are deterministic — both backends
        # must walk the SAME grid (no near-threshold ULP ambiguity).
        mu = 0.3
        drift = lambda t, y: mu * y
        diff = lambda t, y: jnp.full_like(y, 0.5)
        ts = jnp.linspace(0.0, 1.0, 6)
        y0 = jnp.ones((1, 4))
        key = jax.random.PRNGKey(8)
        kw = dict(method="euler", rtol=1e-14, atol=1e-14, max_steps=128,
                  dt_min=1.0 / 32, return_stats=True, differentiable=True)
        ys_x, st_x = sdeint_adaptive(drift, diff, y0, ts, key,
                                     brownian="kernel", **kw)
        ys_k, st_k = sdeint_adaptive(drift, diff, y0, ts, key,
                                     fused_pass=True, **kw)
        assert bool(st_x.success) and bool(st_k.success)
        assert int(st_x.naccept) == int(st_k.naccept)
        np.testing.assert_allclose(np.asarray(ys_x), np.asarray(ys_k),
                                   rtol=1e-5)


class TestFrozenGridAPI:
    """``sde_select_grid`` + ``sdeint_replay`` compose to exactly
    ``sdeint_adaptive(differentiable=True)`` — the explicit decomposition
    the adaptive adjoint and the TP parity tests build on."""

    def test_select_plus_replay_bit_exact(self):
        from columnflow.solvers import (sde_select_grid, sdeint_adaptive,
                                        sdeint_replay)

        drift = lambda t, y, a: a * (1.0 - y)
        diff = lambda t, y, a: 0.3 * jnp.ones_like(y)
        y0 = jnp.zeros(3)
        ts = jnp.linspace(0.0, 1.0, 7)
        key = jax.random.PRNGKey(3)

        ys_ref = sdeint_adaptive(drift, diff, y0, ts, key, 1.5,
                                 method="sra1", differentiable=True,
                                 max_steps=256)
        grid = sde_select_grid(drift, diff, y0, ts, key, 1.5, method="sra1",
                               max_steps=256)
        assert int(grid.naccept) > 1
        assert bool(grid.stats.success)
        ys = sdeint_replay(drift, diff, y0, ts, key, grid, 1.5,
                           method="sra1")
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(ys_ref))

        g_ref = jax.grad(lambda a: sdeint_adaptive(
            drift, diff, y0, ts, key, a, method="sra1", differentiable=True,
            max_steps=256)[-1].sum())(1.5)
        g = jax.grad(lambda a: sdeint_replay(
            drift, diff, y0, ts, key, grid, a, method="sra1")[-1].sum())(1.5)
        np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-6)

    def test_grid_reusable_across_drift_variants(self):
        """A grid selected on one drift variant (here: perturbed params —
        the bf16-selection pattern) replays the full-precision drift: the
        replay must integrate the FULL-precision functions over that grid."""
        from columnflow.solvers import sde_select_grid, sdeint_replay

        drift = lambda t, y, a: a * (1.0 - y)
        diff = lambda t, y, a: 0.3 * jnp.ones_like(y)
        y0 = jnp.zeros(3)
        ts = jnp.linspace(0.0, 1.0, 7)
        key = jax.random.PRNGKey(3)
        grid = sde_select_grid(drift, diff, y0, ts, key, 1.497,
                               method="sra1", max_steps=256)
        ys = sdeint_replay(drift, diff, y0, ts, key, grid, 1.5,
                           method="sra1")
        assert bool(jnp.all(jnp.isfinite(ys)))
