"""Implicit ESDIRK (kvaerno3) adaptive solver: stiff systems.

No reference/torchdiffeq analog (torchdiffeq punts stiff problems to
scipy_solver, losing autodiff); motivation is the column physics itself —
tau_syn = 0.5 ms vs tau_adapt = 10 s (reference config/model.toml:33-36).
Oracles: closed-form stiff linear solutions, step-count economy vs dopri5
at matched tolerance, L-stability behavior at extreme stiffness, FD
gradient checks through the replay pass, and the dopri8 alias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import odeint, odeint_stats


def _stiff_f(lam):
    # y' = -lam (y - cos t) - sin t, y(0) = 1 -> y(t) = cos(t)
    return lambda t, y: -lam * (y - jnp.cos(t)) - jnp.sin(t)


class TestKvaerno3:
    def test_stiff_linear_accuracy(self):
        ts = jnp.linspace(0.0, 2.0, 21)
        ys = odeint(_stiff_f(1000.0), jnp.ones(1), ts, method="kvaerno3",
                    rtol=1e-6, atol=1e-8)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 1e-4, err

    def test_step_economy_vs_dopri5(self):
        """At lam = 1000 the L-stable method steps at the accuracy-limited
        rate; dopri5 at the stability-limited rate (~10x more steps)."""
        ts = jnp.linspace(0.0, 2.0, 21)
        sk = odeint_stats(_stiff_f(1000.0), jnp.ones(1), ts,
                          method="kvaerno3", rtol=1e-6, atol=1e-8)
        sd = odeint_stats(_stiff_f(1000.0), jnp.ones(1), ts,
                          method="dopri5", rtol=1e-6, atol=1e-8)
        assert bool(sk.success) and bool(sd.success)
        assert int(sk.naccept) * 10 < int(sd.naccept), \
            (int(sk.naccept), int(sd.naccept))

    def test_l_stability_extreme_stiffness(self):
        """lam = 1e5 under a 64-step budget: kvaerno3 completes, dopri5
        exhausts its budget (stability-limited h ~ 1/lam)."""
        ts = jnp.linspace(0.0, 1.0, 5)
        sk = odeint_stats(_stiff_f(1e5), jnp.ones(1), ts, method="kvaerno3",
                          rtol=1e-4, atol=1e-6, max_steps=64)
        sd = odeint_stats(_stiff_f(1e5), jnp.ones(1), ts, method="dopri5",
                          rtol=1e-4, atol=1e-6, max_steps=64)
        assert bool(sk.success)
        assert not bool(sd.success)
        ys = odeint(_stiff_f(1e5), jnp.ones(1), ts, method="kvaerno3",
                    rtol=1e-4, atol=1e-6, max_steps=64)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 1e-3, err

    def test_nonstiff_accuracy(self):
        """Exponential decay + harmonic oscillator vs closed form."""
        ts = jnp.linspace(0.0, 2.0, 17)
        ys = odeint(lambda t, y: -y, jnp.ones(3), ts, method="kvaerno3",
                    rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ys[:, 0]),
                                   np.exp(-np.asarray(ts)), rtol=2e-5,
                                   atol=1e-7)
        rot = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
        ys2 = odeint(lambda t, y: rot @ y, jnp.asarray([1.0, 0.0]), ts,
                     method="kvaerno3", rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ys2[:, 0]),
                                   np.cos(np.asarray(ts)), atol=3e-5)

    def test_nonlinear_stiff_converges(self):
        """y' = -k y^3 (stiff near t=0 for large k): matches the closed form
        y = (y0^-2 + 2 k t)^(-1/2)."""
        k = 200.0
        ts = jnp.linspace(0.0, 1.0, 9)
        ys = odeint(lambda t, y, k: -k * y**3, jnp.full((1,), 2.0), ts, k,
                    method="kvaerno3", rtol=1e-6, atol=1e-8)
        want = (2.0 ** -2 + 2 * k * np.asarray(ts)) ** -0.5
        np.testing.assert_allclose(np.asarray(ys[:, 0]), want, rtol=1e-3)

    def test_matrix_shaped_state(self):
        """Non-vector states ravel internally for the Newton solve."""
        a = jnp.asarray([[-2.0, 1.0], [0.0, -3.0]])
        ts = jnp.linspace(0.0, 1.0, 7)
        y0 = jnp.ones((2, 3))
        ys = odeint(lambda t, y: a @ y, y0, ts, method="kvaerno3",
                    rtol=1e-6, atol=1e-8)
        assert ys.shape == (7, 2, 3)
        ref = odeint(lambda t, y: a @ y, y0, ts, method="dopri5",
                     rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(ref[-1]),
                                   rtol=1e-4, atol=1e-6)

    def test_gradient_matches_fd(self):
        ts = jnp.linspace(0.0, 1.0, 9)

        def loss(k):
            ys = odeint(lambda t, y, k: -k * (y - jnp.cos(t)) - jnp.sin(t),
                        jnp.ones(1), ts, k, method="kvaerno3",
                        rtol=1e-7, atol=1e-9)
            return ys[-1, 0]

        k0 = jnp.float32(50.0)
        g = jax.grad(loss)(k0)
        eps = 0.5
        fd = (loss(k0 + eps) - loss(k0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-2,
                                   atol=1e-7)

    def test_grad_y0_through_stiff_solve(self):
        ts = jnp.linspace(0.0, 0.5, 5)
        g = jax.grad(lambda y0: odeint(_stiff_f(300.0), y0, ts,
                                       method="kvaerno3", rtol=1e-6,
                                       atol=1e-8)[-1].sum())(jnp.ones(1))
        # fast transient forgets y0: dy(T)/dy0 = exp(-lam T) ~ 0
        assert abs(float(g[0])) < 1e-4

    def test_column_timescale_toy(self):
        """The column physics' timescale split (tau = 0.5 ms vs 10 s) as a
        2-d linear toy: kvaerno3 needs ~10x fewer steps over a 1 s horizon."""
        tau_fast, tau_slow = 5e-4, 10.0

        def f(t, y):
            drive = jnp.sin(2 * jnp.pi * t)
            return jnp.stack([(-y[0] + drive) / tau_fast,
                              (-y[1] + y[0]) / tau_slow])

        ts = jnp.linspace(0.0, 1.0, 11)
        y0 = jnp.zeros(2)
        sk = odeint_stats(f, y0, ts, method="kvaerno3", rtol=1e-4,
                          atol=1e-6, max_steps=16384)
        sd = odeint_stats(f, y0, ts, method="dopri5", rtol=1e-4, atol=1e-6,
                          max_steps=16384)
        assert bool(sk.success) and bool(sd.success)
        assert int(sk.naccept) * 5 < int(sd.naccept), \
            (int(sk.naccept), int(sd.naccept))


class TestKvaerno5:
    """ESDIRK 5(4): the tight-tolerance stiff companion of kvaerno3."""

    def test_tight_tolerance_stiff_where_kvaerno3_exhausts(self):
        """At rtol=1e-7 on the lam=1000 problem the 3(2) pair is
        accuracy-limited and exhausts a 2048-step budget; the 5(4) pair
        completes in ~160 accepted steps (measured 158 acc / 151 rej)."""
        ts = jnp.linspace(0.0, 2.0, 21)
        s5 = odeint_stats(_stiff_f(1000.0), jnp.ones(1), ts,
                          method="kvaerno5", rtol=1e-7, atol=1e-9)
        s3 = odeint_stats(_stiff_f(1000.0), jnp.ones(1), ts,
                          method="kvaerno3", rtol=1e-7, atol=1e-9)
        assert bool(s5.success)
        assert not bool(s3.success)
        assert int(s5.naccept) + int(s5.nreject) < 500
        ys = odeint(_stiff_f(1000.0), jnp.ones(1), ts, method="kvaerno5",
                    rtol=1e-7, atol=1e-9)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 1e-5, err

    def test_l_stability_extreme_stiffness(self):
        ts = jnp.linspace(0.0, 1.0, 5)
        s = odeint_stats(_stiff_f(1e5), jnp.ones(1), ts, method="kvaerno5",
                         rtol=1e-4, atol=1e-6, max_steps=64)
        assert bool(s.success)
        ys = odeint(_stiff_f(1e5), jnp.ones(1), ts, method="kvaerno5",
                    rtol=1e-4, atol=1e-6, max_steps=64)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 1e-3, err

    def test_nonstiff_accuracy(self):
        ts = jnp.linspace(0.0, 2.0, 17)
        ys = odeint(lambda t, y: -y, jnp.ones(3), ts, method="kvaerno5",
                    rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ys[:, 0]),
                                   np.exp(-np.asarray(ts)), rtol=2e-5,
                                   atol=1e-6)

    def test_fifth_order_convergence(self):
        """Fixed-step convergence order of the pair's 5th-order solution:
        halving h cuts the one-solve error by ~2^5 (checked on a smooth
        nonlinear problem via tolerance-driven step counts instead: the
        accepted-step count grows ~(tol ratio)^(1/5))."""
        f = lambda t, y: -y ** 3 + jnp.sin(t)
        ts = jnp.linspace(0.0, 4.0, 9)
        s_loose = odeint_stats(f, jnp.ones(1), ts, method="kvaerno5",
                               rtol=1e-4, atol=1e-7)
        s_tight = odeint_stats(f, jnp.ones(1), ts, method="kvaerno5",
                               rtol=1e-9, atol=1e-12)
        assert bool(s_loose.success) and bool(s_tight.success)
        growth = int(s_tight.naccept) / max(int(s_loose.naccept), 1)
        # 1e5 tolerance ratio -> ~10x steps for order 5 (3.2x for order 10,
        # 46x for order 3); allow a broad band around 10x
        assert 3.0 < growth < 32.0, growth

    def test_gradient_matches_fd(self):
        ts = jnp.linspace(0.0, 1.0, 9)

        def loss(k):
            ys = odeint(lambda t, y, k: -k * (y - jnp.cos(t)) - jnp.sin(t),
                        jnp.ones(1), ts, k, method="kvaerno5",
                        rtol=1e-7, atol=1e-9)
            return ys[-1, 0]

        k0 = jnp.float32(50.0)
        g = jax.grad(loss)(k0)
        eps = 0.5
        fd = (loss(k0 + eps) - loss(k0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-2,
                                   atol=1e-7)

    def test_tableau_consistency(self):
        """Row sums equal c; b is stage 7 (stiffly accurate); the embedded
        solution is stage 6."""
        from columnflow.solvers.esdirk import KVAERNO5

        a = np.asarray(KVAERNO5.a)
        np.testing.assert_allclose(a.sum(axis=1), np.asarray(KVAERNO5.c),
                                   atol=1e-15)
        np.testing.assert_allclose(a[-1], np.asarray(KVAERNO5.b), atol=0)
        bhat = np.asarray(KVAERNO5.b) - np.asarray(KVAERNO5.b_err)
        np.testing.assert_allclose(bhat[:6], a[5, :6], atol=0)
        assert bhat[6] == 0.0


class TestErrorEstimator:
    """Regressions pinning the RAW embedded error estimate (RESULTS.md
    "ESDIRK error estimator"): the (I - h*gamma*J)^(-1)-smoothed variant
    was measured and rejected — it livelocks on Van der Pol mu=1000 and
    under-resolves 1-D fully-stiff problems by ~(h*gamma*lam) x tol.
    These tests fail under either alternative estimator."""

    def test_van_der_pol_1000(self):
        """Relaxation oscillation at mu=1000: must complete (the smoothed
        estimator hit the rejection rail here) and track scipy LSODA."""
        from scipy.integrate import solve_ivp

        mu = 1000.0

        def f(t, y):
            return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

        ts = jnp.linspace(0.0, 300.0, 16)
        kw = dict(method="kvaerno5", rtol=1e-6, atol=1e-8, max_steps=16384)
        s = odeint_stats(f, jnp.array([2.0, 0.0]), ts, **kw)
        assert bool(s.success), (int(s.naccept), int(s.nreject))
        # raw estimator measured 430 acc / 229 rej; the smoothed one dies
        # at 65600 rejections
        assert int(s.nreject) < 4 * int(s.naccept)
        ys = odeint(f, jnp.array([2.0, 0.0]), ts, **kw)
        sol = solve_ivp(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
                        [0.0, 300.0], [2.0, 0.0], rtol=1e-10, atol=1e-12,
                        dense_output=True, method="LSODA")
        ref = sol.sol(np.asarray(ts)).T
        err = np.abs(np.asarray(ys) - ref).max()
        assert err < 1e-4, err

    def test_tight_tolerance_not_underresolved(self):
        """rtol=1e-7 on the 1-D lam=1e3 problem must deliver ~tolerance
        error at OUTPUT times (the smoothed estimator tolerates a
        (h*gamma*lam) x tol manifold offset -> 1.5e-3 here)."""
        ts = jnp.linspace(0.0, 2.0, 21)
        ys = odeint(_stiff_f(1000.0), jnp.ones(1), ts, method="kvaerno5",
                    rtol=1e-7, atol=1e-9)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 1e-5, err

    def test_graceful_under_drift_noise(self):
        """eps=1e-6 deterministic noise on the drift's cos term degrades
        the lam=1e3 solve gracefully (err ~ eps), guarding the estimator
        against noise-amplifying changes. (At eps=1e-5 the lam-amplified
        estimate collapses the step size — documented limit, RESULTS.md.)"""
        lam, eps = 1000.0, 1e-6

        def f(t, y):
            c = jnp.cos(t) + eps * jnp.sin(12345.6 * t)
            return -lam * (y - c) - jnp.sin(t)

        ts = jnp.linspace(0.0, 2.0, 21)
        s = odeint_stats(f, jnp.ones(1), ts, method="kvaerno5",
                         rtol=1e-7, atol=1e-9, max_steps=4096)
        assert bool(s.success)
        ys = odeint(f, jnp.ones(1), ts, method="kvaerno5",
                    rtol=1e-7, atol=1e-9, max_steps=4096)
        err = np.abs(np.asarray(ys[:, 0]) - np.cos(np.asarray(ts))).max()
        assert err < 5e-6, err


class TestColumnStiff:
    """kvaerno3 on the actual column physics via the task plumbing."""

    def test_xor_rollout_matches_dopri5(self):
        """A loose-tolerance kvaerno3 task rollout matches a tight dopri5
        reference on the 72-dim XOR network, with fewer controller steps
        (the stiff tau_syn=0.5 ms mode bounds explicit step sizes;
        reference config/model.toml:33-36)."""
        import columnflow.tasks.xor as xt
        from columnflow.config import ColumnConfig
        from columnflow.data import prep_xor_stim, xor_conditions
        from columnflow.models import Stimulus, xor_drift
        from columnflow.solvers import odeint_stats

        cfg = ColumnConfig.load()
        T = 120
        stiff = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=T,
                              ode_method="kvaerno3", rtol=1e-4, atol=1e-6,
                              max_steps=4096)
        ref = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=T,
                            max_steps=4096)  # dopri5 @ 1e-7/1e-9
        conds = jnp.asarray(xor_conditions())
        ys_k = xt.batched_rollout(stiff.params, stiff, conds,
                                  differentiable=False)
        ys_d = xt.batched_rollout(ref.params, ref, conds,
                                  differentiable=False)
        # membrane block: O(30)-scale states; tolerance set by the LOOSE
        # side's rtol=1e-4 (observed max deviation ~2e-3)
        np.testing.assert_allclose(np.asarray(ys_k[..., :24]),
                                   np.asarray(ys_d[..., :24]),
                                   atol=1e-2)

        # Step economy holds in the stiffness-limited regime: the full 1 s
        # horizon at loose tolerance, where dopri5's step size is pinned by
        # the tau_syn mode's stability bound (h ~ 3.3 tau_syn) rather than
        # accuracy. (At tight tolerance or short horizons dopri5 is
        # accuracy-limited and the 5th order wins — RESULTS.md.)
        T_long = 1000
        long = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=T_long,
                             max_steps=8192)
        table = prep_xor_stim(conds[0], T_long)
        stim = Stimulus(0.0, long.dt, table)
        f = lambda t, y: xor_drift(t, y, long.params, long.net, stim)
        y0 = jnp.zeros(ys_k.shape[-1])
        sk = odeint_stats(f, y0, long.ts, method="kvaerno3", rtol=1e-3,
                          atol=1e-3, max_steps=8192)
        sd = odeint_stats(f, y0, long.ts, method="dopri5", rtol=1e-3,
                          atol=1e-3, max_steps=8192)
        assert bool(sk.success) and bool(sd.success)
        assert int(sk.naccept) * 2 < int(sd.naccept), \
            (int(sk.naccept), int(sd.naccept))

    def test_parity_task_method_plumbing(self):
        """build_task carries ode_method/rtol/atol into the rollout path."""
        import columnflow.tasks.parity as pt
        from columnflow.config import ColumnConfig

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=80, ode_method="kvaerno3",
                             rtol=1e-4, atol=1e-6, max_steps=4096)
        assert task.ode_method == "kvaerno3"
        stims = jnp.asarray([[15.0, 0.0], [15.0, 15.0]])
        ys = pt.batched_rollout(task.params, task, stims,
                                differentiable=False)
        assert ys.shape == (2, 80, 3 * task.net.num_pops)
        assert bool(jnp.all(jnp.isfinite(ys)))
        ref = pt.build_task(cfg, jax.random.PRNGKey(0),
                            columns_per_area=(2, 1), n_inputs=2,
                            time_steps=80, max_steps=4096)
        ys_d = pt.batched_rollout(ref.params, ref, stims,
                                  differentiable=False)
        P = task.net.num_pops
        np.testing.assert_allclose(np.asarray(ys[..., :P]),
                                   np.asarray(ys_d[..., :P]), atol=2e-3)


class TestDopri8Alias:
    def test_alias_routes_to_dop853(self):
        ts = jnp.linspace(0.0, 1.0, 9)
        y8 = odeint(lambda t, y: -y, jnp.ones(2), ts, method="dopri8")
        yd = odeint(lambda t, y: -y, jnp.ones(2), ts, method="dop853")
        np.testing.assert_allclose(np.asarray(y8), np.asarray(yd), rtol=0,
                                   atol=0)

    def test_alias_in_stats(self):
        ts = jnp.linspace(0.0, 1.0, 9)
        s = odeint_stats(lambda t, y: -y, jnp.ones(2), ts, method="dopri8")
        assert bool(s.success)
