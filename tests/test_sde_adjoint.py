"""Stratonovich SDE methods and the stochastic adjoint (sdeint_adjoint).

Completes the torchsde engine surface (SURVEY §2.2): torchsde supports both
calculi (sde_type="ito"/"stratonovich") and ships adjoint-based gradients as
its central capability (Li et al. 2020); the reference imports the package at
scripts/wta_ode.py:10. Oracles here are closed-form pathwise solutions:

- Stratonovich GBM dy = a y dt + b y ∘ dW has y(t) = y0 exp(a t + b W(t)) —
  an EXACT function of the sampled increments, so both trajectories and
  pathwise gradients (d log y_T / da = T, d/db = W_T, d/dy0 = 1/y0) are
  checkable without any reference integrator.
- Additive noise: Ito and Stratonovich coincide; linear OU gradients are
  pathwise-exact (dy_T/dy0 = e^{-θT}).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import sdeint, sdeint_adjoint
from columnflow.solvers.sde import _brownian_pack

STRAT_METHODS = ("euler_heun", "heun", "midpoint", "milstein")


def _gbm_setup(n_steps=1000, seed=0, dim=3):
    key = jax.random.PRNGKey(seed)
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)
    y0 = jnp.ones(dim)
    a, b = 0.3, 0.4
    drift = lambda t, y, a_, b_: a_ * y
    diff = lambda t, y, a_, b_: b_ * y
    _, i1, *_ = _brownian_pack(key, ts, (), jnp.float32)
    w = jnp.concatenate([jnp.zeros(1), jnp.cumsum(i1)])
    return key, ts, y0, a, b, drift, diff, w


class TestStratonovichMethods:
    @pytest.mark.parametrize("method", STRAT_METHODS)
    def test_gbm_pathwise_exact(self, method):
        """Each method converges to the STRATONOVICH solution of GBM."""
        key, ts, y0, a, b, drift, diff, w = _gbm_setup()
        exact_strat = y0[None] * jnp.exp(a * ts + b * w)[:, None]
        exact_ito = y0[None] * jnp.exp((a - 0.5 * b * b) * ts + b * w)[:, None]
        ys = sdeint(drift, diff, y0, ts, key, a, b,
                    method=method, sde_type="stratonovich")
        err = float(jnp.max(jnp.abs(ys - exact_strat) / exact_strat))
        err_ito = float(jnp.max(jnp.abs(ys - exact_ito) / exact_ito))
        assert err < 2e-3, f"{method}: {err}"
        # The Ito solution differs by the exp(-b^2 t / 2) factor (~8%):
        # the convention is load-bearing, not a tolerance artifact.
        assert err_ito > 0.05

    def test_strong_convergence(self):
        """Halving h reduces the pathwise error (strong order >= ~1 for
        scalar — i.e. commutative — noise)."""
        errs = {}
        for n in (250, 1000):
            key, ts, y0, a, b, drift, diff, w = _gbm_setup(n_steps=n)
            exact = y0[None] * jnp.exp(a * ts + b * w)[:, None]
            ys = sdeint(drift, diff, y0, ts, key, a, b,
                        method="heun", sde_type="stratonovich")
            errs[n] = float(jnp.max(jnp.abs(ys - exact)))
        assert errs[1000] < errs[250] / 2.5

    def test_additive_calculi_coincide(self):
        """Constant diffusion: Stratonovich heun and Ito euler integrate the
        SAME equation; matched increments give matching paths to O(h)."""
        key = jax.random.PRNGKey(3)
        ts = jnp.linspace(0.0, 1.0, 1001)
        y0 = jnp.zeros(4)
        drift = lambda t, y: -1.5 * y
        diff = lambda t, y: 0.5 * jnp.ones_like(y)
        pack = _brownian_pack(key, ts, (), jnp.float32)[1:]
        ys_s = sdeint(drift, diff, y0, ts, key, method="heun",
                      sde_type="stratonovich", noise_pack=pack)
        ys_i = sdeint(drift, diff, y0, ts, key, method="euler",
                      noise_pack=pack)
        assert float(jnp.max(jnp.abs(ys_s - ys_i))) < 5e-3

    def test_bad_strat_method_raises(self):
        key, ts, y0, a, b, drift, diff, _ = _gbm_setup(n_steps=4)
        with pytest.raises(ValueError, match="stratonovich method"):
            sdeint(drift, diff, y0, ts, key, a, b,
                   method="srk", sde_type="stratonovich")
        with pytest.raises(ValueError, match="sde_type"):
            sdeint(drift, diff, y0, ts, key, a, b, sde_type="backward_ito")


class TestStochasticAdjoint:
    def test_gbm_pathwise_gradients_exact(self):
        """log y_T = log y0 + a T + b W_T, so the pathwise gradients are
        exactly (T, W_T, 1/y0) — the adjoint must reproduce them including
        its ∂g/∂y and ∂g/∂θ noise-VJP terms (g = b y is state-dependent)."""
        key, ts, y0, a, b, drift, diff, w = _gbm_setup()
        dim = y0.shape[0]

        def loss(params, y0_):
            a_, b_ = params
            ys = sdeint_adjoint(drift, diff, y0_, ts, key, a_, b_,
                                method="milstein", sde_type="stratonovich")
            return jnp.log(ys[-1]).sum()

        (ga, gb), gy0 = jax.jit(jax.grad(loss, argnums=(0, 1)))((a, b), y0)
        np.testing.assert_allclose(float(ga), dim * 1.0, rtol=1e-3)
        np.testing.assert_allclose(float(gb), dim * float(w[-1]), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gy0), 1.0 / np.asarray(y0),
                                   rtol=1e-3)

    def test_adjoint_matches_replay_additive(self):
        """Ito + additive (the reference's model class, via SRA1): adjoint
        gradients converge to the replay (discrete-backprop) gradients."""
        key = jax.random.PRNGKey(1)
        y0 = jnp.asarray([1.0, -0.5])

        def make_loss(integrator, n):
            ts = jnp.linspace(0.0, 1.0, n + 1)

            def loss(theta, sigma, y0_):
                drift = lambda t, y, th, sg: -th * y
                diff = lambda t, y, th, sg: sg * jnp.ones_like(y)
                ys = integrator(drift, diff, y0_, ts, key, theta, sigma,
                                method="srk", additive=True)
                return jnp.sum(ys[-1] ** 2) + 0.1 * jnp.sum(ys**2) / n
            return loss

        def rel_gap(n):
            g_rep = jax.grad(make_loss(sdeint, n), argnums=(0, 1, 2))(
                1.2, 0.3, y0)
            g_adj = jax.grad(make_loss(sdeint_adjoint, n), argnums=(0, 1, 2))(
                1.2, 0.3, y0)
            num = sum(float(jnp.max(jnp.abs(r - a)))
                      for r, a in zip(jax.tree_util.tree_leaves(g_rep),
                                      jax.tree_util.tree_leaves(g_adj)))
            den = sum(float(jnp.max(jnp.abs(r)))
                      for r in jax.tree_util.tree_leaves(g_rep))
            return num / den

        gap_coarse, gap_fine = rel_gap(200), rel_gap(800)
        assert gap_fine < 2e-2
        assert gap_fine < gap_coarse / 2.0  # O(h): shrinks with the grid

    def test_linear_dy0_exact(self):
        """dy = -θ y dt + σ dW: dy_T/dy0 = e^{-θT} pathwise-exactly."""
        key = jax.random.PRNGKey(5)
        ts = jnp.linspace(0.0, 2.0, 2001)
        theta = 0.8

        def loss(y0_):
            drift = lambda t, y: -theta * y
            diff = lambda t, y: 0.4 * jnp.ones_like(y)
            ys = sdeint_adjoint(drift, diff, y0_, ts, key,
                                method="srk", additive=True)
            return ys[-1].sum()

        g = jax.grad(loss)(jnp.ones(3))
        np.testing.assert_allclose(np.asarray(g), np.exp(-theta * 2.0),
                                   rtol=2e-3)

    def test_trajectory_cotangents(self):
        """Cotangents at every output time (trajectory losses) are seeded
        interval-by-interval, not just at the endpoint."""
        key = jax.random.PRNGKey(2)
        ts = jnp.linspace(0.0, 1.0, 401)
        y0 = jnp.asarray([0.7])

        def make(integrator):
            def loss(th):
                drift = lambda t, y, th_: -th_ * y
                diff = lambda t, y, th_: 0.2 * jnp.ones_like(y)
                ys = integrator(drift, diff, y0, ts, key, th,
                                method="euler", additive=True)
                return jnp.mean(ys**2)
            return loss

        g_rep = jax.grad(make(sdeint))(1.0)
        g_adj = jax.grad(make(sdeint_adjoint))(1.0)
        np.testing.assert_allclose(float(g_adj), float(g_rep), rtol=2e-2)

    def test_ito_multiplicative_rejected(self):
        key, ts, y0, a, b, drift, diff, _ = _gbm_setup(n_steps=4)
        with pytest.raises(ValueError, match="additive"):
            sdeint_adjoint(drift, diff, y0, ts, key, a, b,
                           method="milstein", sde_type="ito")

    def test_vmap_jit_compose(self):
        ts = jnp.linspace(0.0, 1.0, 201)
        y0 = jnp.ones(2)

        @jax.jit
        @jax.vmap
        def g(key):
            def loss(th):
                drift = lambda t, y, th_: -th_ * y
                diff = lambda t, y, th_: 0.3 * jnp.ones_like(y)
                return sdeint_adjoint(drift, diff, y0, ts, key, th,
                                      method="srk", additive=True)[-1].sum()
            return jax.grad(loss)(1.0)

        gs = g(jax.random.split(jax.random.PRNGKey(0), 4))
        assert gs.shape == (4,)
        assert bool(jnp.all(jnp.isfinite(gs)))
        assert float(jnp.std(gs)) > 0  # per-key paths differ

    def test_pytree_state(self):
        key = jax.random.PRNGKey(9)
        ts = jnp.linspace(0.0, 0.5, 101)
        y0 = {"u": jnp.ones(2), "v": jnp.zeros(3)}

        def loss(th):
            drift = lambda t, y, th_: jax.tree_util.tree_map(
                lambda x: -th_ * x, y)
            diff = lambda t, y, th_: jax.tree_util.tree_map(
                lambda x: 0.1 * jnp.ones_like(x), y)
            ys = sdeint_adjoint(drift, diff, y0, ts, key, th,
                                method="euler", additive=True)
            return jnp.sum(ys["u"][-1]) + jnp.sum(ys["v"][-1] ** 2)

        g = jax.grad(loss)(1.0)
        assert bool(jnp.isfinite(g))


class TestDtSubstep:
    """dt= on sdeint_adjoint: values == sdeint(dt=) on the same key (the
    refinement recursion is identical), gradients via the stochastic
    adjoint on the same fine grid."""

    def test_values_match_sdeint_dt(self):
        from columnflow.solvers import sdeint

        drift = lambda t, y, a: a * y
        diff = lambda t, y, a: 0.4 * y
        ts = jnp.linspace(0.0, 1.0, 5)
        key = jax.random.PRNGKey(11)
        ya = sdeint_adjoint(drift, diff, jnp.ones(2), ts, key, 0.3,
                            method="midpoint", noise="diagonal",
                            sde_type="stratonovich", dt=0.02)
        yb = sdeint(drift, diff, jnp.ones(2), ts, key, 0.3,
                    method="midpoint", noise="diagonal",
                    sde_type="stratonovich", dt=0.02)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-6)

    def test_gradient_closed_form(self):
        # Stratonovich GBM: y_T = y0 exp(a T + b W_T) pathwise, so
        # d y_T / d a = T y_T exactly for ANY path; a coarse output grid
        # with dt-substeps must recover it.
        drift = lambda t, y, a: a * y
        diff = lambda t, y, a: 0.4 * y
        ts = jnp.linspace(0.0, 1.0, 3)
        key = jax.random.PRNGKey(4)

        def term(a):
            return sdeint_adjoint(drift, diff, jnp.ones(()), ts, key, a,
                                  method="midpoint", noise="scalar",
                                  sde_type="stratonovich", dt=1e-3)[-1]
        y_t = float(term(0.3))
        g = float(jax.grad(term)(0.3))
        assert abs(g - y_t) < 2e-2 * abs(y_t), (g, y_t)

    def test_traced_ts_raises_value_error(self):
        """Advisor regression: traced ts with dt= raises the intended
        ValueError, not an opaque TracerArrayConversionError."""
        import pytest

        drift = lambda t, y: -y
        diff = lambda t, y: jnp.zeros_like(y)

        @jax.jit
        def run(ts):
            return sdeint_adjoint(drift, diff, jnp.ones(()), ts,
                                  jax.random.PRNGKey(0), noise="scalar",
                                  sde_type="stratonovich", dt=0.01)

        with pytest.raises(ValueError, match="concrete ts"):
            run(jnp.linspace(0.0, 1.0, 4))


class TestAdaptiveAdjoint:
    """torchsde's flagship combination ``sdeint_adjoint(adaptive=True)``:
    selection pass -> frozen accepted grid -> adjoint backward over the
    grid with O(|state|) memory (solvers/sde_adjoint.py
    ``sdeint_adjoint_adaptive``). Additive-noise OU problem."""

    @staticmethod
    def _prob():
        drift = lambda t, y, th: th * (1.2 - y)
        diff = lambda t, y, th: 0.3 * jnp.ones_like(y)
        return (drift, diff, jnp.zeros(4), jnp.linspace(0.0, 1.0, 9),
                jax.random.PRNGKey(8))

    def test_forward_matches_adaptive_replay_exactly(self):
        from columnflow.solvers import sdeint_adaptive
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift, diff, y0, ts, key = self._prob()
        ys_a = sdeint_adjoint_adaptive(drift, diff, y0, ts, key, 0.9,
                                       rtol=1e-3, atol=1e-3, max_steps=2048)
        ys_r = sdeint_adaptive(drift, diff, y0, ts, key, 0.9, method="sra1",
                               rtol=1e-3, atol=1e-3, max_steps=2048,
                               differentiable=True)
        # same grid, same noise, same stepper; the adjoint's memory-lean
        # forward accumulates the output interpolation in a different
        # association (one ulp)
        np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_r),
                                   rtol=0, atol=2e-7)

    def test_param_grad_converges_to_fine_replay(self):
        """Both the adjoint and the replay gradient discretize the same
        pathwise derivative; at tight tolerance the adjoint must land on
        the fine-grid replay value (measured 1.5e-4 rel at tol=1e-5)."""
        from columnflow.solvers import sdeint_adaptive
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift, diff, y0, ts, key = self._prob()
        g_true = jax.grad(lambda a: sdeint_adaptive(
            drift, diff, y0, ts, key, a, method="sra1", rtol=3e-7,
            atol=3e-7, max_steps=16384, differentiable=True)[-1].sum())(0.9)
        g_a = jax.grad(lambda a: sdeint_adjoint_adaptive(
            drift, diff, y0, ts, key, a, rtol=1e-5, atol=1e-5,
            max_steps=16384)[-1].sum())(0.9)
        rel = abs(float(g_a - g_true)) / abs(float(g_true))
        assert rel < 1e-3, (float(g_a), float(g_true), rel)

    def test_y0_grad_matches_replay(self):
        from columnflow.solvers import sdeint_adaptive
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift, diff, y0, ts, key = self._prob()
        gy_a = jax.grad(lambda y: sdeint_adjoint_adaptive(
            drift, diff, y * jnp.ones(4), ts, key, 0.9, rtol=1e-4,
            atol=1e-4, max_steps=8192)[-1].sum())(0.1)
        gy_r = jax.grad(lambda y: sdeint_adaptive(
            drift, diff, y * jnp.ones(4), ts, key, 0.9, method="sra1",
            rtol=1e-4, atol=1e-4, max_steps=8192,
            differentiable=True)[-1].sum())(0.1)
        np.testing.assert_allclose(float(gy_a), float(gy_r), rtol=1e-4)

    def test_interior_output_cotangents(self):
        """Cotangents at interior output times route through the
        interpolation transpose onto the accepted points (not only the
        final state)."""
        from columnflow.solvers import sdeint_adaptive
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift, diff, y0, ts, key = self._prob()
        loss_a = lambda a: (sdeint_adjoint_adaptive(
            drift, diff, y0, ts, key, a, rtol=1e-5, atol=1e-5,
            max_steps=16384) * jnp.arange(9.0)[:, None]).sum()
        loss_r = lambda a: (sdeint_adaptive(
            drift, diff, y0, ts, key, a, method="sra1", rtol=1e-5,
            atol=1e-5, max_steps=16384,
            differentiable=True) * jnp.arange(9.0)[:, None]).sum()
        g_a, g_r = float(jax.grad(loss_a)(0.9)), float(jax.grad(loss_r)(0.9))
        np.testing.assert_allclose(g_a, g_r, rtol=2e-3)

    def test_public_adaptive_kwarg(self):
        from columnflow.solvers import sdeint_adjoint
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift, diff, y0, ts, key = self._prob()
        a = sdeint_adjoint(drift, diff, y0, ts, key, 0.9, additive=True,
                           adaptive=True, rtol=1e-3, atol=1e-3,
                           max_steps=1024)
        b = sdeint_adjoint_adaptive(drift, diff, y0, ts, key, 0.9,
                                    rtol=1e-3, atol=1e-3, max_steps=1024)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_adaptive_requires_additive(self):
        import pytest

        from columnflow.solvers import sdeint_adjoint

        drift, diff, y0, ts, key = self._prob()
        with pytest.raises(ValueError, match="additive"):
            sdeint_adjoint(drift, diff, y0, ts, key, 0.9, adaptive=True)


class TestAdaptiveAdjointBatch:
    def test_vmap_over_keys(self):
        """The adaptive adjoint composes with vmap (per-sample Brownian
        paths and grids), like every other engine in the package."""
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        drift = lambda t, y, th: th * (1.2 - y)
        diff = lambda t, y, th: 0.3 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 5)
        keys = jax.random.split(jax.random.PRNGKey(0), 3)

        def loss(th):
            ys = jax.vmap(lambda k: sdeint_adjoint_adaptive(
                drift, diff, jnp.zeros(2), ts, k, th, rtol=1e-3,
                atol=1e-3, max_steps=512))(keys)
            return ys[:, -1].sum()

        g = float(jax.grad(loss)(0.9))
        # per-sample values match the unbatched calls
        ys_b = jax.vmap(lambda k: sdeint_adjoint_adaptive(
            drift, diff, jnp.zeros(2), ts, k, 0.9, rtol=1e-3, atol=1e-3,
            max_steps=512))(keys)
        ys_0 = sdeint_adjoint_adaptive(drift, diff, jnp.zeros(2), ts,
                                       keys[0], 0.9, rtol=1e-3, atol=1e-3,
                                       max_steps=512)
        np.testing.assert_allclose(np.asarray(ys_b[0]), np.asarray(ys_0),
                                   rtol=1e-5, atol=1e-6)
        assert np.isfinite(g)


class TestAdaptiveAdjointAdvisorRegressions:
    """Round-3 advisor findings (ADVICE.md): select_* overrides must survive
    the pytree-state recursion, and the dt= path must reject decreasing
    grids like sdeint's."""

    def test_pytree_state_forwards_select_overrides(self):
        """A pytree y0 + select_drift/select_diffusion overrides: the
        selection pass must use the OVERRIDE functions (here: a 40x
        stiffer drift that forces ~10x more accepted steps) — previously
        the pytree recursion silently dropped them and selected on the
        full-precision functions. Proven via solver stats (bit-identical
        grids between the flat and wrapped programs are not guaranteed:
        the wrappers compile to different fusion/rounding)."""
        from columnflow.solvers.sde_adjoint import sdeint_adjoint_adaptive

        # Pytree-aware functions (they receive the unraveled dict state).
        drift = lambda t, y, th: jax.tree.map(lambda v: th * (1.2 - v), y)
        diff = lambda t, y, th: jax.tree.map(
            lambda v: 0.3 * jnp.ones_like(v), y)
        sel_drift = lambda t, y, th: jax.tree.map(
            lambda v: 40.0 * th * (1.2 - v), y)
        ts = jnp.linspace(0.0, 1.0, 7)
        key = jax.random.PRNGKey(3)
        y0 = {"a": jnp.zeros(2), "b": jnp.zeros(2)}

        _, s_plain = sdeint_adjoint_adaptive(
            drift, diff, y0, ts, key, 0.9, rtol=1e-3, atol=1e-3,
            max_steps=1024, return_stats=True)
        ys, s_sel = sdeint_adjoint_adaptive(
            drift, diff, y0, ts, key, 0.9, rtol=1e-3, atol=1e-3,
            max_steps=1024, select_drift=sel_drift, select_diffusion=diff,
            return_stats=True)
        # Override used -> the stiff selection drift forces a much denser
        # accepted grid (measured: 9 -> 92).
        assert int(s_sel.naccept) > 3 * int(s_plain.naccept), (
            int(s_plain.naccept), int(s_sel.naccept))
        # Values are still the full-precision functions' (the override
        # only steers step selection): finite, and roughly the same OU
        # solution (different grids query the Brownian tree at different
        # points, so pathwise agreement is loose).
        ys_plain = sdeint_adjoint_adaptive(
            drift, diff, y0, ts, key, 0.9, rtol=1e-3, atol=1e-3,
            max_steps=1024)
        for k in ("a", "b"):
            assert np.all(np.isfinite(np.asarray(ys[k])))
            np.testing.assert_allclose(np.asarray(ys[k]),
                                       np.asarray(ys_plain[k]), atol=0.25)

    def test_dt_decreasing_ts_raises(self):
        drift = lambda t, y: -y
        diff = lambda t, y: jnp.ones_like(y)
        ts = jnp.asarray([0.0, 0.5, 0.3, 1.0])
        with pytest.raises(ValueError, match="non-decreasing"):
            sdeint_adjoint(drift, diff, jnp.ones(2), ts,
                           jax.random.PRNGKey(0), additive=True,
                           sde_type="ito", dt=0.01)
