"""Reversible Heun method + exact O(1)-state-memory reversible adjoint.

torchsde's method='reversible_heun' / adjoint_method='adjoint_reversible_heun'
pair (Kidger et al. 2021), its recommended training configuration. Oracles:

- Stratonovich GBM y(t) = y0 exp(a t + b W(t)) — exact pathwise in the
  sampled increments, so trajectories AND gradients are closed-form.
- Exactness of the reversible adjoint: unlike the continuous backsolve
  adjoint, the algebraic-reversal gradient must equal autodiff through the
  forward scan to roundoff, not merely to O(h).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import sdeint, sdeint_reversible
from columnflow.solvers.sde import _brownian_pack


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


class TestReversibleHeunMethod:
    def test_gbm_pathwise_exact(self):
        key, ts, y0, a, b, drift, diff, w = _gbm_setup()
        exact = y0[None] * jnp.exp(a * ts + b * w)[:, None]
        ys = sdeint(drift, diff, y0, ts, key, a, b,
                    method="reversible_heun", sde_type="stratonovich")
        err = float(jnp.max(jnp.abs(ys - exact) / exact))
        assert err < 2e-3, err

    def test_strong_convergence(self):
        errs = {}
        for n in (250, 1000):
            key, ts, y0, a, b, drift, diff, w = _gbm_setup(n_steps=n)
            exact = y0[None] * jnp.exp(a * ts + b * w)[:, None]
            ys = sdeint(drift, diff, y0, ts, key, a, b,
                        method="reversible_heun", sde_type="stratonovich")
            errs[n] = float(jnp.max(jnp.abs(ys - exact)))
        assert errs[1000] < errs[250] / 2.5

    def test_requires_stratonovich(self):
        key, ts, y0, a, b, drift, diff, _ = _gbm_setup(n_steps=4)
        with pytest.raises(ValueError, match="method"):
            sdeint(drift, diff, y0, ts, key, a, b, method="reversible_heun",
                   sde_type="ito")


class TestReversibleAdjoint:
    def test_trajectories_match_plain_sdeint(self):
        key, ts, y0, a, b, drift, diff, _ = _gbm_setup(n_steps=300)
        ys_plain = sdeint(drift, diff, y0, ts, key, a, b,
                          method="reversible_heun", sde_type="stratonovich")
        ys_rev = sdeint_reversible(drift, diff, y0, ts, key, a, b)
        np.testing.assert_allclose(np.asarray(ys_rev), np.asarray(ys_plain),
                                   rtol=1e-6, atol=1e-7)

    def test_gradients_equal_autodiff_exactly(self):
        """The algebraic-reversal adjoint is backprop-through-the-solver:
        it must agree with autodiff through the forward scan to roundoff
        (the backsolve adjoint is only O(h)-close)."""
        key, ts, y0, a, b, drift, diff, _ = _gbm_setup(n_steps=400)

        def loss_rev(params, y0_):
            a_, b_ = params
            ys = sdeint_reversible(drift, diff, y0_, ts, key, a_, b_)
            return jnp.log(ys[-1]).sum() + 0.1 * jnp.sum(ys[ts.shape[0] // 2])

        def loss_auto(params, y0_):
            a_, b_ = params
            ys = sdeint(drift, diff, y0_, ts, key, a_, b_,
                        method="reversible_heun", sde_type="stratonovich")
            return jnp.log(ys[-1]).sum() + 0.1 * jnp.sum(ys[ts.shape[0] // 2])

        g_rev = jax.jit(jax.grad(loss_rev, argnums=(0, 1)))((a, b), y0)
        g_auto = jax.jit(jax.grad(loss_auto, argnums=(0, 1)))((a, b), y0)
        for gr, ga in zip(jax.tree_util.tree_leaves(g_rev),
                          jax.tree_util.tree_leaves(g_auto)):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(ga),
                                       rtol=2e-4, atol=1e-6)

    def test_gbm_pathwise_gradients_exact(self):
        """log y_T = log y0 + a T + b W_T -> exact gradients (T, W_T, 1/y0)."""
        key, ts, y0, a, b, drift, diff, w = _gbm_setup()
        dim = y0.shape[0]

        def loss(params, y0_):
            a_, b_ = params
            ys = sdeint_reversible(drift, diff, y0_, ts, key, a_, b_)
            return jnp.log(ys[-1]).sum()

        (ga, gb), gy0 = jax.jit(jax.grad(loss, argnums=(0, 1)))((a, b), y0)
        np.testing.assert_allclose(float(ga), dim * 1.0, rtol=1e-3)
        np.testing.assert_allclose(float(gb), dim * float(w[-1]), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gy0), 1.0 / np.asarray(y0),
                                   rtol=1e-3)

    def test_diagonal_noise(self):
        key = jax.random.PRNGKey(7)
        ts = jnp.linspace(0.0, 1.0, 201)
        y0 = jnp.ones(4)
        drift = lambda t, y, th: -th * y
        diff = lambda t, y, th: 0.3 * jnp.ones_like(y)
        ys_plain = sdeint(drift, diff, y0, ts, key, 1.2,
                          method="reversible_heun", sde_type="stratonovich",
                          noise="diagonal")
        ys_rev = sdeint_reversible(drift, diff, y0, ts, key, 1.2,
                                   noise="diagonal")
        np.testing.assert_allclose(np.asarray(ys_rev), np.asarray(ys_plain),
                                   rtol=1e-6, atol=1e-7)
        g = jax.grad(
            lambda th: jnp.sum(sdeint_reversible(drift, diff, y0, ts, key,
                                                 th, noise="diagonal")[-1])
        )(jnp.float32(1.2))
        # additive noise: dy_T/dtheta is the pathwise ODE-like sensitivity;
        # just require it to match autodiff through the scan
        g_auto = jax.grad(
            lambda th: jnp.sum(sdeint(drift, diff, y0, ts, key, th,
                                      method="reversible_heun",
                                      sde_type="stratonovich",
                                      noise="diagonal")[-1])
        )(jnp.float32(1.2))
        np.testing.assert_allclose(float(g), float(g_auto), rtol=1e-4)

    def test_pytree_state(self):
        key = jax.random.PRNGKey(5)
        ts = jnp.linspace(0.0, 0.5, 101)
        y0 = {"a": jnp.ones(2), "b": 2.0 * jnp.ones(3)}

        def drift(t, y, k):
            return {"a": -k * y["a"], "b": -0.5 * y["b"]}

        def diff(t, y, k):
            return {"a": 0.2 * y["a"], "b": 0.1 * jnp.ones_like(y["b"])}

        ys = sdeint_reversible(drift, diff, y0, ts, key, jnp.float32(0.9))
        assert ys["a"].shape == (101, 2) and ys["b"].shape == (101, 3)
        g = jax.grad(
            lambda k: jnp.sum(sdeint_reversible(drift, diff, y0, ts, key,
                                                k)["a"][-1])
        )(jnp.float32(0.9))
        assert np.isfinite(float(g))


class TestReversibleAdaptive:
    """Reversible Heun over an adaptively selected frozen grid
    (``sdeint_reversible_adaptive``): torchsde's ``adaptive=True`` +
    ``adjoint_reversible_heun`` combination — exact O(1)-state-memory
    gradients on the adaptive grid."""

    @staticmethod
    def _prob():
        drift = lambda t, y, th: th * (1.2 - y)
        diff = lambda t, y, th: 0.3 * jnp.ones_like(y)
        return (drift, diff, jnp.zeros(3), jnp.linspace(0.0, 1.0, 7),
                jax.random.PRNGKey(2))

    def test_values_match_explicit_reversible_on_fine_grid(self):
        """The adaptive wrapper's values equal plain reversible Heun run
        over the same frozen half-step grid with the same tree increments
        (interpolated onto ts)."""
        from columnflow.solvers import (sde_select_grid, sdeint_reversible,
                                        sdeint_reversible_adaptive)
        from columnflow.solvers.brownian import VirtualBrownianTree
        from columnflow.solvers.sde_adaptive import _interp_accepted
        from columnflow.solvers.sde_adjoint import _adaptive_fine_grid

        drift, diff, y0, ts, key = self._prob()
        ys = sdeint_reversible_adaptive(drift, diff, y0, ts, key, 0.9,
                                        max_steps=256)
        grid = sde_select_grid(drift, diff, y0, ts, key, 0.9,
                               method="sra1", max_steps=256)
        tree = VirtualBrownianTree(t0=ts[0], t1=ts[-1], key=key, depth=20)
        ht = _adaptive_fine_grid(grid.step_times)
        w = jax.vmap(tree.evaluate)(ht)
        ys_fine = sdeint_reversible(drift, diff, y0, ht, key, 0.9,
                                    noise_pack=(w[1:] - w[:-1],))
        want = _interp_accepted(ys_fine[::2], y0, ts, grid.step_times,
                                grid.naccept)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

    def test_gradients_equal_autodiff_through_scan(self):
        """The algebraic-reversal gradient on the frozen grid equals
        backprop through a plain differentiable scan of the SAME scheme on
        the SAME grid and noise — the 'exact' in exact O(1)-memory
        gradients."""
        from columnflow.solvers import (sde_select_grid, sdeint,
                                        sdeint_reversible_adaptive)
        from columnflow.solvers.brownian import VirtualBrownianTree
        from columnflow.solvers.sde_adaptive import _interp_accepted
        from columnflow.solvers.sde_adjoint import _adaptive_fine_grid

        drift, diff, y0, ts, key = self._prob()
        grid = sde_select_grid(drift, diff, y0, ts, key, 0.9,
                               method="sra1", max_steps=256)
        tree = VirtualBrownianTree(t0=ts[0], t1=ts[-1], key=key, depth=20)
        ht = _adaptive_fine_grid(grid.step_times)
        w = jax.vmap(tree.evaluate)(ht)
        pack = (w[1:] - w[:-1], None, None, None)

        def loss_rev(a):
            return sdeint_reversible_adaptive(
                drift, diff, y0, ts, key, a, max_steps=256)[-1].sum()

        def loss_scan(a):
            ys_fine = sdeint(drift, diff, y0, ht, key, a,
                             method="reversible_heun",
                             sde_type="stratonovich", noise="scalar",
                             noise_pack=pack)
            return _interp_accepted(ys_fine[::2], y0, ts, grid.step_times,
                                    grid.naccept)[-1].sum()

        g_rev = float(jax.grad(loss_rev)(0.9))
        g_scan = float(jax.grad(loss_scan)(0.9))
        np.testing.assert_allclose(g_rev, g_scan, rtol=1e-5)

    def test_stats_and_pytree(self):
        from columnflow.solvers import sdeint_reversible_adaptive

        drift = lambda t, y, th: {"x": th * (1.0 - y["x"])}
        diff = lambda t, y, th: {"x": 0.2 * jnp.ones_like(y["x"])}
        ys, st = sdeint_reversible_adaptive(
            drift, diff, {"x": jnp.zeros(2)}, jnp.linspace(0, 1, 5),
            jax.random.PRNGKey(1), 0.7, max_steps=128, return_stats=True)
        assert ys["x"].shape == (5, 2)
        assert bool(st.success)
        assert int(st.naccept) >= 2
