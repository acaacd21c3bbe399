"""Solver engine tests: fixed-step RK, adaptive dopri5, dense output, gradients.

Validation targets are closed-form ODE solutions (exponential decay, harmonic
oscillator, logistic) per the test strategy in SURVEY.md section 4 — the
north-star correctness bar is trajectory rel-err <= 1e-5 at torchdiffeq's
default tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import odeint, odeint_stats


def exp_decay(t, y, k=1.0):
    return -k * y


def harmonic(t, y):
    # y = (x, v), x'' = -x
    return jnp.stack([y[1], -y[0]])


class TestFixedStep:
    @pytest.mark.parametrize("method,tol", [
        ("euler", 5e-3), ("midpoint", 2e-5), ("heun", 2e-5),
        ("heun3", 5e-6), ("rk4", 5e-6),
    ])
    def test_exp_decay(self, method, tol):
        ts = jnp.linspace(0.0, 2.0, 1001)
        ys = odeint(exp_decay, jnp.asarray([1.0, 2.0]), ts, method=method)
        want = np.exp(-np.asarray(ts))[:, None] * np.asarray([1.0, 2.0])
        err = np.max(np.abs(np.asarray(ys) - want) / np.abs(want))
        assert err < tol

    def test_rk4_harmonic(self):
        ts = jnp.linspace(0.0, 2 * np.pi, 629)
        ys = odeint(harmonic, jnp.asarray([1.0, 0.0]), ts, method="rk4")
        want = np.stack([np.cos(np.asarray(ts)), -np.sin(np.asarray(ts))], axis=1)
        np.testing.assert_allclose(np.asarray(ys), want, atol=1e-5)

    def test_gradient_through_scan(self):
        ts = jnp.linspace(0.0, 1.0, 101)

        def loss(k):
            ys = odeint(exp_decay, jnp.ones(1), ts, k, method="rk4")
            return ys[-1, 0]

        g = jax.grad(loss)(1.5)
        # d/dk exp(-k) = -exp(-k)
        np.testing.assert_allclose(float(g), -np.exp(-1.5), rtol=1e-5)


class TestDopri5:
    def test_exp_decay_tight(self):
        ts = jnp.linspace(0.0, 5.0, 777)
        ys = odeint(exp_decay, jnp.asarray([1.0]), ts, method="dopri5",
                    adjoint="none")
        want = np.exp(-np.asarray(ts))[:, None]
        err = np.max(np.abs(np.asarray(ys) - want))
        assert err < 1e-5

    def test_harmonic_dense_output(self):
        # Many output points per accepted step exercises the interpolant.
        ts = jnp.linspace(0.0, 4 * np.pi, 2000)
        ys = odeint(harmonic, jnp.asarray([1.0, 0.0]), ts, method="dopri5",
                    adjoint="none")
        want = np.stack([np.cos(np.asarray(ts)), -np.sin(np.asarray(ts))], axis=1)
        assert np.max(np.abs(np.asarray(ys) - want)) < 1e-4

    def test_matches_scipy_at_matched_tolerance(self):
        from scipy.integrate import solve_ivp

        def f_np(t, y):
            return [y[1], -np.sin(y[0]) - 0.1 * y[1]]

        def f_jx(t, y):
            return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

        ts = np.linspace(0.0, 10.0, 50)
        sol = solve_ivp(f_np, (0, 10.0), [1.2, 0.0], t_eval=ts, method="RK45",
                        rtol=1e-9, atol=1e-11)
        ys = odeint(f_jx, jnp.asarray([1.2, 0.0]), jnp.asarray(ts),
                    method="dopri5", adjoint="none")
        # float32 solver vs float64 scipy: expect ~1e-5 agreement.
        np.testing.assert_allclose(np.asarray(ys), sol.y.T, atol=3e-5)

    def test_batched_state_shared_controller(self):
        # Batched y0 integrates with one controller (torchdiffeq semantics on
        # the reference's Hopf workload, scripts/bifurcation_ode.py:210).
        ts = jnp.linspace(0.0, 1.0, 11)
        y0 = jnp.asarray([[1.0], [2.0], [3.0]])
        ys = odeint(exp_decay, y0, ts, method="dopri5", adjoint="none")
        want = np.exp(-np.asarray(ts))[:, None, None] * np.asarray(y0)[None]
        np.testing.assert_allclose(np.asarray(ys), want, atol=1e-5)

    def test_vmap(self):
        ts = jnp.linspace(0.0, 1.0, 5)
        y0s = jnp.linspace(0.5, 2.0, 4)[:, None]

        def solve(y0):
            return odeint(exp_decay, y0, ts, method="dopri5", adjoint="none")

        ys = jax.vmap(solve)(y0s)
        want = np.asarray(y0s)[:, None, :] * np.exp(-np.asarray(ts))[None, :, None]
        np.testing.assert_allclose(np.asarray(ys), want, atol=1e-5)

    def test_stats(self):
        ts = jnp.linspace(0.0, 5.0, 3)
        stats = odeint_stats(exp_decay, jnp.asarray([1.0]), ts)
        assert bool(stats.success)
        assert int(stats.naccept) > 0
        assert int(stats.nfev) >= 6 * int(stats.naccept)

    def test_stats_vmap_per_lane(self):
        """vmapped odeint_stats reports PER-LANE controller counts — the
        instrument behind BASELINE.md's lockstep-cost measurement (stiffer
        lanes take more accepted steps than gentle ones)."""
        ts = jnp.linspace(0.0, 2.0, 3)
        rates = jnp.asarray([1.0, 300.0])  # gentle vs stiff decay

        def stats_one(k):
            return odeint_stats(lambda t, y: -k * y, jnp.ones(1), ts,
                                rtol=1e-6, atol=1e-8)

        st = jax.jit(jax.vmap(stats_one))(rates)
        assert st.naccept.shape == (2,)
        assert bool(jnp.all(st.success))
        assert int(st.naccept[1]) > 2 * int(st.naccept[0]), np.asarray(
            st.naccept)

    def test_time_dependent_rhs(self):
        # y' = cos(t), y(0)=0 -> y = sin(t)
        ts = jnp.linspace(0.0, 3.0, 61)
        ys = odeint(lambda t, y: jnp.cos(t) * jnp.ones_like(y),
                    jnp.zeros(1), ts, method="dopri5", adjoint="none")
        np.testing.assert_allclose(
            np.asarray(ys)[:, 0], np.sin(np.asarray(ts)), atol=1e-5
        )


class TestGradients:
    def _grad_case(self, adjoint):
        ts = jnp.linspace(0.0, 1.5, 7)

        def loss(y0, k):
            ys = odeint(exp_decay, y0, ts, k, method="dopri5", adjoint=adjoint)
            return jnp.sum(ys[-1])

        y0 = jnp.asarray([1.0, 2.0])
        k = jnp.asarray(0.8)
        gy, gk = jax.grad(loss, argnums=(0, 1))(y0, k)
        # y(T) = y0 exp(-kT): dL/dy0 = exp(-kT), dL/dk = -T sum(y0) exp(-kT)
        T = 1.5
        np.testing.assert_allclose(
            np.asarray(gy), np.exp(-0.8 * T) * np.ones(2), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(gk), -T * 3.0 * np.exp(-0.8 * T), rtol=1e-4
        )

    def test_replay_gradients(self):
        self._grad_case("replay")

    def test_backsolve_gradients(self):
        self._grad_case("backsolve")

    def test_replay_matches_backsolve(self):
        ts = jnp.linspace(0.0, 2.0, 9)

        def mk_loss(adj):
            def loss(k):
                def f(t, y, kk):
                    return jnp.stack([y[1], -kk * y[0]])
                ys = odeint(f, jnp.asarray([1.0, 0.0]), ts, k,
                            method="dopri5", adjoint=adj)
                return jnp.sum(ys ** 2)
            return loss

        g1 = jax.grad(mk_loss("replay"))(jnp.asarray(2.0))
        g2 = jax.grad(mk_loss("backsolve"))(jnp.asarray(2.0))
        np.testing.assert_allclose(float(g1), float(g2), rtol=1e-3)

    def test_pytree_state(self):
        ts = jnp.linspace(0.0, 1.0, 5)

        def f(t, y):
            return {"a": -y["a"], "b": -2.0 * y["b"]}

        y0 = {"a": jnp.ones(2), "b": jnp.ones(3)}
        ys = odeint(f, y0, ts, method="dopri5", adjoint="none")
        np.testing.assert_allclose(
            np.asarray(ys["a"][-1]), np.exp(-1.0) * np.ones(2), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ys["b"][-1]), np.exp(-2.0) * np.ones(3), atol=1e-5
        )


class TestOtherAdaptiveMethods:
    """bosh3 (FSAL 3(2)), adaptive_heun (non-FSAL 2(1)) and fehlberg2
    (FSAL 1(2)) — torchdiffeq's other adaptive solvers, sharing the
    generalized embedded-RK core with cubic-Hermite dense output."""

    @pytest.mark.parametrize("method,rtol_assert", [
        ("bosh3", 2e-5), ("adaptive_heun", 2e-5),
        # order-2 advancing solution: global error ~ tol * nsteps
        ("fehlberg2", 5e-4),
    ])
    def test_exp_decay_accuracy(self, method, rtol_assert):
        ts = jnp.linspace(0.0, 5.0, 50)
        ys = odeint(exp_decay, jnp.ones(4), ts, method=method,
                    rtol=1e-6, atol=1e-8, max_steps=8192, adjoint="none")
        exact = np.exp(-np.asarray(ts))[:, None] * np.ones(4)
        np.testing.assert_allclose(np.asarray(ys), exact, rtol=rtol_assert,
                                   atol=1e-6)

    @pytest.mark.parametrize("method,atol_assert", [
        ("bosh3", 5e-5), ("adaptive_heun", 5e-5), ("fehlberg2", 1e-3),
    ])
    def test_harmonic_matches_dopri5(self, method, atol_assert):
        ts = jnp.linspace(0.0, 6.0, 61)
        y0 = jnp.asarray([1.0, 0.0])
        ref = odeint(harmonic, y0, ts, method="dopri5", adjoint="none")
        ys = odeint(harmonic, y0, ts, method=method, rtol=1e-6, atol=1e-8,
                    max_steps=8192, adjoint="none")
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ref),
                                   atol=atol_assert)

    @pytest.mark.parametrize("method", ["bosh3", "adaptive_heun", "fehlberg2"])
    def test_gradient_matches_analytic(self, method):
        T = 2.0
        ts = jnp.linspace(0.0, T, 20)

        def loss(k):
            ys = odeint(lambda t, y, k: -k * y, jnp.ones(3), ts, k,
                        method=method, rtol=1e-6, atol=1e-8,
                        max_steps=4096)
            return jnp.sum(ys[-1])

        g = jax.grad(loss)(jnp.float32(0.7))
        expected = -3.0 * T * np.exp(-0.7 * T)
        np.testing.assert_allclose(float(g), expected, rtol=1e-4)

    def test_stats_lower_order_needs_more_steps(self):
        ts = jnp.linspace(0.0, 5.0, 10)
        y0 = jnp.asarray([1.0, 0.0])
        st5 = odeint_stats(harmonic, y0, ts, rtol=1e-6, atol=1e-8,
                           max_steps=8192)
        st3 = odeint_stats(harmonic, y0, ts, rtol=1e-6, atol=1e-8,
                           max_steps=8192, method="bosh3")
        st2 = odeint_stats(harmonic, y0, ts, rtol=1e-6, atol=1e-8,
                           max_steps=8192, method="adaptive_heun")
        assert bool(st5.success) and bool(st3.success) and bool(st2.success)
        assert int(st3.naccept) > int(st5.naccept)
        assert int(st2.naccept) > int(st3.naccept)

    def test_backsolve_rejected_for_non_dopri5(self):
        ts = jnp.linspace(0.0, 1.0, 5)
        with pytest.raises(ValueError, match="backsolve"):
            odeint(exp_decay, jnp.ones(2), ts, method="bosh3",
                   adjoint="backsolve")


class TestDop853:
    """Hairer 8(5,3) — beyond torchdiffeq (scipy-DOP853 semantics: 13-stage
    FSAL tableau, combined 5th/3rd-order error estimator, -1/8 controller
    exponent, 7th-order dense output with three extra stages per replayed
    step)."""

    def test_dense_output_seventh_order(self):
        # few large steps + many output points: interpolation quality is
        # what's measured; Hermite would sit at ~1e-4 here
        ts = jnp.linspace(0.0, 5.0, 101)
        ys = odeint(exp_decay, jnp.ones(2), ts, method="dop853",
                    rtol=1e-7, atol=1e-9, max_steps=4096, adjoint="none")
        exact = np.exp(-np.asarray(ts))[:, None] * np.ones(2)
        err = float(np.max(np.abs(np.asarray(ys) - exact)))
        assert err < 5e-6, err

    def test_endpoint_accuracy(self):
        ts = jnp.asarray([0.0, 5.0])
        ys = odeint(exp_decay, jnp.ones(4), ts, method="dop853",
                    rtol=1e-7, atol=1e-9, max_steps=4096, adjoint="none")
        np.testing.assert_allclose(
            np.asarray(ys[-1]), np.exp(-5.0) * np.ones(4), rtol=1e-5,
            atol=1e-7)

    def test_fewer_steps_than_dopri5(self):
        ts = jnp.linspace(0.0, 6.0, 7)
        y0 = jnp.asarray([1.0, 0.0])
        st8 = odeint_stats(harmonic, y0, ts, rtol=1e-7, atol=1e-9,
                           max_steps=4096, method="dop853")
        st5 = odeint_stats(harmonic, y0, ts, rtol=1e-7, atol=1e-9,
                           max_steps=4096)
        assert bool(st8.success) and bool(st5.success)
        assert int(st8.naccept) < int(st5.naccept)
        # FSAL accounting: 12 new derivative evals per attempted step + 2 init.
        assert int(st8.nfev) == 2 + 12 * (int(st8.naccept) + int(st8.nreject))

    def test_gradient_matches_analytic(self):
        T = 2.0
        ts = jnp.linspace(0.0, T, 20)

        def loss(k):
            ys = odeint(lambda t, y, k: -k * y, jnp.ones(3), ts, k,
                        method="dop853", rtol=1e-7, atol=1e-9,
                        max_steps=4096)
            return jnp.sum(ys[-1])

        g = jax.grad(loss)(jnp.float32(0.7))
        expected = -3.0 * T * np.exp(-0.7 * T)
        np.testing.assert_allclose(float(g), expected, rtol=1e-3)

    def test_combined_error_estimator_matches_scipy_formula(self):
        """_step_error_ratio with b_err2 == scipy DOP853._estimate_error_norm."""
        from columnflow.solvers.dopri import _step_error_ratio
        from columnflow.solvers.rk import ADAPTIVE_TABLEAUS

        tab = ADAPTIVE_TABLEAUS["dop853"]
        rng = np.random.default_rng(0)
        n = 6
        ks = rng.normal(size=(tab.c.shape[0], n)).astype(np.float32)
        y0 = rng.normal(size=n).astype(np.float32)
        y1 = rng.normal(size=n).astype(np.float32)
        h, rtol, atol = 0.37, 1e-6, 1e-8

        got = float(_step_error_ratio(tab, jnp.float32(h), jnp.asarray(ks),
                                      rtol, atol, jnp.asarray(y0),
                                      jnp.asarray(y1)))

        scale = atol + rtol * np.maximum(np.abs(y0), np.abs(y1))
        err5 = (tab.b_err @ ks.astype(np.float64)) / scale
        err3 = (tab.b_err2 @ ks.astype(np.float64)) / scale
        n5 = np.sum(err5 ** 2)
        n3 = np.sum(err3 ** 2)
        want = abs(h) * n5 / np.sqrt((n5 + 0.01 * n3) * n)
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_vs_scipy_dop853(self):
        """Stiff-ish Van der Pol (mu=2) against float64 scipy DOP853."""
        scipy_int = pytest.importorskip("scipy.integrate")
        mu = 2.0

        def vdp(t, y):
            return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

        ts = np.linspace(0.0, 8.0, 5)
        y0 = np.array([2.0, 0.0])
        ys = odeint(vdp, jnp.asarray(y0, dtype=jnp.float32),
                    jnp.asarray(ts, dtype=jnp.float32),
                    method="dop853", rtol=1e-6, atol=1e-8, max_steps=8192,
                    adjoint="none")
        sol = scipy_int.solve_ivp(
            lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
            (0.0, 8.0), y0, method="DOP853", t_eval=ts,
            rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ys), sol.y.T, atol=3e-4)


class TestAdamsMethods:
    """Fixed-grid multistep solvers — torchdiffeq's 'explicit_adams'
    (Adams-Bashforth 4) and 'implicit_adams'/'fixed_adams' (PECE ABM4),
    with an RK4 startup ramp."""

    @pytest.mark.parametrize("method", ["explicit_adams", "fixed_adams"])
    def test_fourth_order_convergence(self, method):
        errs = []
        for n in (8, 16):
            ts = jnp.linspace(0.0, 4.0, n + 1)
            ys = odeint(exp_decay, jnp.ones(2), ts, method=method,
                        adjoint="none")
            exact = np.exp(-np.asarray(ts))[:, None] * np.ones(2)
            errs.append(float(np.max(np.abs(np.asarray(ys) - exact))))
        # halving h should shrink the error ~16x; allow slack for fp32
        assert errs[1] < errs[0] / 8.0, errs

    def test_corrector_improves_on_predictor(self):
        ts = jnp.linspace(0.0, 6.0, 121)
        y0 = jnp.asarray([1.0, 0.0])
        exact = np.stack([np.cos(np.asarray(ts)), -np.sin(np.asarray(ts))],
                         axis=-1)
        e_ab = np.max(np.abs(np.asarray(
            odeint(harmonic, y0, ts, method="explicit_adams",
                   adjoint="none")) - exact))
        e_abm = np.max(np.abs(np.asarray(
            odeint(harmonic, y0, ts, method="fixed_adams",
                   adjoint="none")) - exact))
        assert e_abm < e_ab
        assert e_abm < 5e-4

    def test_implicit_is_fixed_adams(self):
        ts = jnp.linspace(0.0, 3.0, 31)
        a = odeint(exp_decay, jnp.ones(3), ts, method="implicit_adams",
                   adjoint="none")
        b = odeint(exp_decay, jnp.ones(3), ts, method="fixed_adams",
                   adjoint="none")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("method", ["explicit_adams", "fixed_adams"])
    def test_gradient_matches_analytic(self, method):
        T = 2.0
        ts = jnp.linspace(0.0, T, 41)

        def loss(k):
            ys = odeint(lambda t, y, k: -k * y, jnp.ones(3), ts, k,
                        method=method)
            return jnp.sum(ys[-1])

        g = jax.grad(loss)(jnp.float32(0.7))
        expected = -3.0 * T * np.exp(-0.7 * T)
        np.testing.assert_allclose(float(g), expected, rtol=1e-3)

    def test_short_grid_is_pure_startup(self):
        # len(ts)-1 <= order-1: every interval is an RK4 startup step.
        ts = jnp.linspace(0.0, 0.3, 4)
        adams = odeint(exp_decay, jnp.ones(2), ts, method="fixed_adams",
                       adjoint="none")
        rk4 = odeint(exp_decay, jnp.ones(2), ts, method="rk4",
                     adjoint="none")
        np.testing.assert_allclose(np.asarray(adams), np.asarray(rk4),
                                   rtol=1e-6)

    def test_vmap(self):
        ts = jnp.linspace(0.0, 1.0, 21)
        y0s = jnp.stack([jnp.ones(2), 2.0 * jnp.ones(2)])
        ys = jax.vmap(
            lambda y0: odeint(exp_decay, y0, ts, method="fixed_adams",
                              adjoint="none")
        )(y0s)
        exact = (np.exp(-np.asarray(ts))[None, :, None]
                 * np.array([1.0, 2.0])[:, None, None]
                 * np.ones((1, 1, 2)))
        np.testing.assert_allclose(np.asarray(ys), exact, rtol=1e-5,
                                   atol=1e-6)


class TestEdgeCases:
    def test_int_y0_promoted(self):
        ts = jnp.linspace(0.0, 1.0, 5)
        ys = odeint(lambda t, y: -y, jnp.asarray([1, 2]), ts, adjoint="none")
        assert ys.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(ys[-1]), np.exp(-1.0) * np.array([1.0, 2.0]),
            rtol=1e-5)

    def test_zero_span_ts(self):
        ts = jnp.zeros(4)
        y0 = jnp.asarray([1.0, -2.0])
        ys = odeint(exp_decay, y0, ts, adjoint="none")
        np.testing.assert_allclose(np.asarray(ys),
                                   np.tile(np.asarray(y0), (4, 1)))

    def test_max_steps_exhaustion_flagged(self):
        ts = jnp.linspace(0.0, 50.0, 10)
        st = odeint_stats(harmonic, jnp.asarray([1.0, 0.0]), ts,
                          rtol=1e-9, atol=1e-12, max_steps=8)
        assert not bool(st.success)


class TestFiniteDifferenceGradients:
    """Central-difference oracle on a NONLINEAR drift (logistic growth):
    catches gradient bugs that linear test problems can't (SURVEY section 4
    test strategy)."""

    @pytest.mark.parametrize("adjoint", ["replay", "backsolve"])
    def test_nonlinear_grad_vs_central_difference(self, adjoint):
        ts = jnp.linspace(0.0, 2.0, 9)

        def loss(k):
            def logistic(t, y, kk):
                return kk * y * (1.0 - y)

            ys = odeint(logistic, jnp.asarray([0.1, 0.25]), ts, k,
                        method="dopri5", adjoint=adjoint)
            return float(jnp.sum(ys ** 2)) if not isinstance(k, jnp.ndarray) \
                else jnp.sum(ys ** 2)

        k0 = jnp.float32(1.3)
        g = float(jax.grad(loss)(k0))
        eps = 1e-3
        fd = (loss(float(k0) + eps) - loss(float(k0) - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=5e-3)


class TestTorchdiffeqSemanticsExtras:
    def test_descending_ts(self):
        """torchdiffeq accepts decreasing ts: integrate backward in time.
        y' = -y from y(2) = 1 backward to t=0 gives y(t) = exp(2 - t)."""
        ts = jnp.linspace(2.0, 0.0, 9)
        ys = odeint(exp_decay, jnp.ones(2), ts, adjoint="none")
        exact = np.exp(2.0 - np.asarray(ts))[:, None] * np.ones(2)
        np.testing.assert_allclose(np.asarray(ys), exact, rtol=1e-5)

    def test_descending_ts_gradients(self):
        ts = jnp.linspace(1.0, 0.0, 5)

        def loss(k):
            return jnp.sum(odeint(lambda t, y, k: -k * y, jnp.ones(3),
                                  ts, k)[-1])

        g = float(jax.grad(loss)(jnp.float32(0.6)))
        # y(0) = exp(k) backward from y(1)=1: d/dk 3 exp(k) = 3 exp(k).
        np.testing.assert_allclose(g, 3.0 * np.exp(0.6), rtol=1e-4)

    def test_tensor_tolerances(self):
        """torchdiffeq accepts per-element atol; the error norm must
        broadcast them (tight tolerance on one component forces more
        steps)."""
        ts = jnp.linspace(0.0, 5.0, 10)
        y0 = jnp.asarray([1.0, 0.0])
        loose = odeint_stats(harmonic, y0, ts, rtol=0.0,
                             atol=jnp.asarray([1e-3, 1e-3]), max_steps=8192)
        tight = odeint_stats(harmonic, y0, ts, rtol=0.0,
                             atol=jnp.asarray([1e-8, 1e-3]), max_steps=8192)
        assert bool(loose.success) and bool(tight.success)
        assert int(tight.naccept) > int(loose.naccept)

    def test_descending_ts_stats(self):
        ts = jnp.linspace(2.0, 0.0, 9)
        st = odeint_stats(exp_decay, jnp.ones(2), ts)
        assert bool(st.success)
        assert int(st.naccept) > 0
