"""SDE solver tests: reproducibility, shapes, strong accuracy, moments, grads.

Strong-order validation couples the Brownian path across grid resolutions by
exact aggregation of (I1, I10) from a fine grid (the I10 aggregation identity
int_t^{t+H}(W_s - W_t)ds = sum_j I10_j + sum_j (W_tj - W_t) h). Statistical
equivalence with torchsde (not pathwise — Brownian sampling differs) is the
documented bar per SURVEY.md section 7.3 item 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.solvers import sdeint


def _gbm(mu=0.3, sig=0.7):
    return (lambda t, y: mu * y), (lambda t, y: sig * y)


def _coarsen(i1f, i10f, hf, factor):
    """Exactly aggregate fine-grid (I1, I10) onto a coarser grid."""
    b, nf = i1f.shape
    n = nf // factor
    i1c = i1f.reshape(b, n, factor).sum(-1)
    cum = np.concatenate([np.zeros((b, 1)), np.cumsum(i1f, axis=1)], axis=1)[:, :-1]
    cum = cum.reshape(b, n, factor)
    w_local = cum - cum[:, :, :1]
    i10c = i10f.reshape(b, n, factor).sum(-1) + (w_local * hf).sum(-1)
    return i1c, i10c


def _packs(i1, i10, h):
    i11 = 0.5 * (i1**2 - h)
    i111 = (i1**3 - 3 * h * i1) / 6
    return tuple(jnp.asarray(a, dtype=jnp.float32) for a in (i1, i10, i11, i111))


class TestBasics:
    def test_reproducible_and_key_sensitive(self):
        drift = lambda t, y: -y
        diffusion = lambda t, y: jnp.ones_like(y)
        ts = jnp.linspace(0.0, 1.0, 101)
        y0 = jnp.zeros(4)
        a = sdeint(drift, diffusion, y0, ts, jax.random.PRNGKey(0))
        b = sdeint(drift, diffusion, y0, ts, jax.random.PRNGKey(0))
        c = sdeint(drift, diffusion, y0, ts, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.max(np.abs(np.asarray(a) - np.asarray(c))) > 1e-3

    def test_shapes_and_initial_state(self):
        drift = lambda t, y: -y
        diffusion = lambda t, y: 0.1 * jnp.ones_like(y)
        ts = jnp.linspace(0.0, 0.5, 51)
        y0 = jnp.full((2, 3), 1.5)
        for noise in ("scalar", "diagonal"):
            ys = sdeint(drift, diffusion, y0, ts, jax.random.PRNGKey(0),
                        noise=noise, method="euler")
            assert ys.shape == (51, 2, 3)
            np.testing.assert_array_equal(np.asarray(ys[0]), np.asarray(y0))

    def test_zero_diffusion_matches_ode(self):
        drift = lambda t, y: -y
        diffusion = lambda t, y: jnp.zeros_like(y)
        ts = jnp.linspace(0.0, 1.0, 201)
        for method, tol in (("euler", 5e-3), ("milstein", 5e-3), ("srk", 1e-5)):
            ys = sdeint(drift, diffusion, jnp.ones(1), ts, jax.random.PRNGKey(0),
                        method=method)
            np.testing.assert_allclose(float(ys[-1, 0]), np.exp(-1.0), rtol=tol)

    def test_gradients_flow(self):
        ts = jnp.linspace(0.0, 0.5, 51)

        def loss(theta):
            drift = lambda t, y, th: -th * y
            diffusion = lambda t, y, th: 0.2 * jnp.ones_like(y)
            ys = sdeint(drift, diffusion, jnp.ones(2), ts, jax.random.PRNGKey(3),
                        theta, method="srk", additive=True)
            return jnp.mean(ys**2)

        g = jax.grad(loss)(jnp.asarray(1.2))
        assert np.isfinite(float(g))
        assert abs(float(g)) > 1e-4


class TestStrongAccuracy:
    """GBM d y = mu y dt + sig y dW has the exact terminal value
    y0 exp((mu - sig^2/2) T + sig W_T); strong error is measured against it
    with the solver pinned to the same Brownian path via noise_pack."""

    @pytest.fixture(scope="class")
    def gbm_errors(self):
        mu, sig, T = 0.3, 0.7, 1.0
        drift, diffusion = _gbm(mu, sig)
        B, nf = 256, 512
        rng = np.random.default_rng(0)
        hf = T / nf
        i1f = np.sqrt(hf) * rng.normal(size=(B, nf))
        i10f = hf * (0.5 * i1f + np.sqrt(hf / 12) * rng.normal(size=(B, nf)))
        exact = np.exp((mu - sig**2 / 2) * T + sig * i1f.sum(-1))

        errors = {}
        for n in (32, 128):
            h = T / n
            i1, i10 = _coarsen(i1f, i10f, hf, nf // n)
            pack = _packs(i1, i10, h)
            ts = jnp.linspace(0.0, T, n + 1)
            for method in ("euler", "milstein", "srk"):
                solve = jax.vmap(
                    lambda p: sdeint(
                        drift, diffusion, jnp.float32(1.0), ts,
                        jax.random.PRNGKey(0), method=method, noise_pack=p,
                    )[-1],
                )
                finals = np.asarray(solve(pack))
                errors[(method, n)] = float(
                    np.sqrt(np.mean((finals - exact) ** 2))
                )
        return errors

    def test_method_ordering(self, gbm_errors):
        for n in (32, 128):
            assert gbm_errors[("srk", n)] < 0.2 * gbm_errors[("milstein", n)]
            assert gbm_errors[("milstein", n)] < 0.5 * gbm_errors[("euler", n)]

    def test_srk_strong_order(self, gbm_errors):
        # 4x refinement: order 1.5 predicts 8x error reduction; demand >= 3x
        # to absorb sampling noise.
        assert gbm_errors[("srk", 32)] / gbm_errors[("srk", 128)] > 3.0

    def test_milstein_strong_order(self, gbm_errors):
        # order 1.0 predicts 4x; demand >= 2x.
        assert gbm_errors[("milstein", 32)] / gbm_errors[("milstein", 128)] > 2.0

    def test_srk_absolute_accuracy(self, gbm_errors):
        assert gbm_errors[("srk", 128)] < 1e-3


class TestAdditive:
    def test_ou_stationary_variance(self):
        # OU: dy = -theta y dt + s dW; Var[y_inf] = s^2 / (2 theta).
        theta, s = 1.0, 0.5
        drift = lambda t, y: -theta * y
        diffusion = lambda t, y: jnp.full_like(y, s)
        ts = jnp.linspace(0.0, 6.0, 601)

        def solve(key):
            return sdeint(drift, diffusion, jnp.zeros(()), ts, key,
                          method="srk", additive=True)[-1]

        finals = jax.vmap(solve)(jax.random.split(jax.random.PRNGKey(7), 2048))
        var = float(jnp.var(finals))
        want = s * s / (2 * theta)
        assert abs(var - want) / want < 0.15

    def test_sra1_refinement(self):
        # Self-refinement with a coupled path: errors must drop steeply.
        theta, s, T = 1.0, 0.5, 1.0
        drift = lambda t, y: -theta * y
        diffusion = lambda t, y: jnp.full_like(y, s)
        B, nf = 128, 512
        rng = np.random.default_rng(4)
        hf = T / nf
        i1f = np.sqrt(hf) * rng.normal(size=(B, nf))
        i10f = hf * (0.5 * i1f + np.sqrt(hf / 12) * rng.normal(size=(B, nf)))

        finals = {}
        for n in (16, 64, 512):
            h = T / n
            i1, i10 = _coarsen(i1f, i10f, hf, nf // n)
            pack = _packs(i1, i10, h)
            ts = jnp.linspace(0.0, T, n + 1)
            solve = jax.vmap(
                lambda p: sdeint(drift, diffusion, jnp.float32(1.0), ts,
                                 jax.random.PRNGKey(0), method="srk",
                                 additive=True, noise_pack=p)[-1]
            )
            finals[n] = np.asarray(solve(pack))
        e16 = np.sqrt(np.mean((finals[16] - finals[512]) ** 2))
        e64 = np.sqrt(np.mean((finals[64] - finals[512]) ** 2))
        assert e16 / e64 > 4.0  # order 1.5 predicts 8x over 4x refinement


class TestErrorPaths:
    def test_bad_method_raises(self):
        import pytest

        ts = jnp.linspace(0.0, 1.0, 10)
        with pytest.raises(ValueError, match="method"):
            sdeint(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                   jnp.ones(2), ts, jax.random.PRNGKey(0), method="nope")

    def test_bad_noise_raises(self):
        import pytest

        ts = jnp.linspace(0.0, 1.0, 10)
        with pytest.raises(ValueError, match="noise"):
            sdeint(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                   jnp.ones(2), ts, jax.random.PRNGKey(0), noise="pink")


class TestTransformComposability:
    """Solvers must be jit/vmap/grad-safe in any composition (CLAUDE.md
    architecture rules)."""

    def test_vmap_jit_grad_sdeint(self):
        """jit(grad(mean over vmap)) equals the mean of per-sample grads
        computed without vmap — the transforms must not change the math."""
        ts = jnp.linspace(0.0, 0.5, 40)
        keys = jax.random.split(jax.random.PRNGKey(0), 5)

        def final_mean(theta, k):
            ys = sdeint(lambda t, y, th: -th * y,
                        lambda t, y, th: 0.3 * jnp.ones_like(y),
                        jnp.ones(3), ts, k, theta,
                        method="srk", noise="scalar", additive=True)
            return jnp.mean(ys[-1])

        theta = jnp.float32(1.2)
        g = jax.jit(jax.grad(
            lambda th: jnp.mean(jax.vmap(lambda k: final_mean(th, k))(keys))
        ))(theta)
        g_seq = np.mean([float(jax.grad(final_mean)(theta, k))
                         for k in keys])
        assert np.isfinite(float(g))
        np.testing.assert_allclose(float(g), g_seq, rtol=1e-5)

    def test_vmap_over_y0_odeint(self):
        from columnflow.solvers import odeint

        ts = jnp.linspace(0.0, 1.0, 10)
        y0s = jnp.stack([jnp.ones(2), 2.0 * jnp.ones(2), 3.0 * jnp.ones(2)])
        ys = jax.jit(jax.vmap(
            lambda y0: odeint(lambda t, y: -y, y0, ts, adjoint="none")
        ))(y0s)
        np.testing.assert_allclose(
            np.asarray(ys[:, -1]), np.asarray(y0s) * np.exp(-1.0), rtol=1e-5)


class TestPytreeState:
    def test_pytree_state_matches_flat(self):
        """Pytree-state sdeint == flat-state sdeint on the raveled vector
        (same key -> same Brownian draws)."""
        ts = jnp.linspace(0.0, 1.0, 50)
        key = jax.random.PRNGKey(5)

        def drift_t(t, y):
            return {"a": -y["a"], "b": -2.0 * y["b"]}

        def diff_t(t, y):
            return {"a": 0.3 * jnp.ones_like(y["a"]),
                    "b": 0.1 * jnp.ones_like(y["b"])}

        y0 = {"a": jnp.ones(2), "b": jnp.full(3, 2.0)}
        ys = sdeint(drift_t, diff_t, y0, ts, key, method="srk",
                    additive=True)
        assert ys["a"].shape == (50, 2) and ys["b"].shape == (50, 3)

        from jax.flatten_util import ravel_pytree

        flat0, unravel = ravel_pytree(y0)
        flat = sdeint(
            lambda t, y: ravel_pytree(drift_t(t, unravel(y)))[0],
            lambda t, y: ravel_pytree(diff_t(t, unravel(y)))[0],
            flat0, ts, key, method="srk", additive=True)
        np.testing.assert_allclose(np.asarray(ys["a"]),
                                   np.asarray(flat[:, :2]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ys["b"]),
                                   np.asarray(flat[:, 2:]), rtol=1e-6)


class TestDtSubstep:
    """torchsde's ``sdeint(..., dt=)``: internal steps of size <= dt between
    the output times (reference call shape: the torchsde default dt=1e-3
    equals the reference scripts' time_vec spacing, scripts/wta_ode.py:174,
    so one-step-per-interval is its faithful default here; dt= restores the
    decoupled surface for coarser output grids)."""

    def test_matches_manual_fine_grid(self):
        drift, diffusion = _gbm()
        y0 = jnp.ones(3)
        ts = jnp.linspace(0.0, 1.0, 5)          # interval 0.25
        key = jax.random.PRNGKey(7)
        ys = sdeint(drift, diffusion, y0, ts, key, method="euler",
                    noise="diagonal", dt=0.25 / 8)
        tfine = jnp.linspace(0.0, 1.0, 4 * 8 + 1)
        ys_fine = sdeint(drift, diffusion, y0, tfine, key, method="euler",
                         noise="diagonal")
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_fine[::8]),
                                   rtol=1e-6)

    def test_large_dt_is_identity(self):
        drift, diffusion = _gbm()
        y0 = jnp.ones(2)
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(3)
        a = sdeint(drift, diffusion, y0, ts, key, noise="diagonal")
        b = sdeint(drift, diffusion, y0, ts, key, noise="diagonal", dt=1.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_refinement_improves_strong_error(self):
        # GBM on the SAME coarse output grid and the SAME Brownian path
        # (bm= is queried by time, so it is resolution-consistent): euler
        # with dt-substeps must beat one-step-per-interval in strong error
        # against the path's closed-form terminal value.
        from columnflow.solvers.brownian import BrownianInterval

        mu, sig = 0.3, 0.7
        drift, diffusion = _gbm(mu, sig)
        ts = jnp.linspace(0.0, 1.0, 9)
        errs = {}
        for dt in (None, 0.125 / 16):
            e = []
            for s in range(8):
                bm = BrownianInterval(t0=0.0, t1=1.0, entropy=s)
                ys = sdeint(drift, diffusion, jnp.ones(()), ts,
                            jax.random.PRNGKey(0), method="euler",
                            noise="scalar", bm=bm, dt=dt)
                w1 = float(bm(0.0, 1.0))
                exact = float(np.exp((mu - 0.5 * sig**2) * 1.0 + sig * w1))
                e.append(abs(float(ys[-1]) - exact))
            errs[dt] = np.mean(e)
        assert errs[0.125 / 16] < 0.5 * errs[None]

    def test_dt_with_noise_pack_raises(self):
        drift, diffusion = _gbm()
        ts = jnp.linspace(0.0, 1.0, 5)
        h = np.full((1, 4), 0.25)
        i1 = np.zeros((1, 4))
        pack = _packs(i1, np.zeros((1, 4)), h)
        pack = tuple(p[0] for p in pack)
        with pytest.raises(ValueError, match="noise_pack"):
            sdeint(drift, diffusion, jnp.ones(()), ts, jax.random.PRNGKey(0),
                   noise="scalar", noise_pack=pack, dt=0.01)

    def test_pytree_state(self):
        ts = jnp.linspace(0.0, 1.0, 5)
        y0 = {"a": jnp.ones(2), "b": jnp.zeros(())}
        drift = lambda t, y: jax.tree_util.tree_map(lambda x: -x, y)
        diffusion = lambda t, y: jax.tree_util.tree_map(
            lambda x: 0.3 * jnp.ones_like(x), y)
        ys = sdeint(drift, diffusion, y0, ts, jax.random.PRNGKey(1),
                    method="milstein", noise="diagonal", dt=0.05)
        assert ys["a"].shape == (5, 2) and ys["b"].shape == (5,)
        assert np.all(np.isfinite(np.asarray(ys["a"])))

    def test_single_output_time(self):
        """Advisor regression: len(ts)==1 with dt= returns y0 (np.max over
        an empty diff used to raise)."""
        drift, diffusion = _gbm()
        y = sdeint(drift, diffusion, jnp.ones(2), jnp.asarray([0.3]),
                   jax.random.PRNGKey(0), noise="diagonal", dt=0.01)
        np.testing.assert_allclose(np.asarray(y), np.ones((1, 2)))

    def test_decreasing_ts_rejected(self):
        """Advisor regression: a decreasing grid used to silently skip
        refinement (k collapsed to 1 through a signed diff) and then NaN in
        the Brownian construction; it must raise instead."""
        import pytest

        drift = lambda t, y: -0.5 * y
        diffusion = lambda t, y: jnp.zeros_like(y)
        with pytest.raises(ValueError, match="decreasing"):
            sdeint(drift, diffusion, jnp.ones(()), jnp.linspace(1.0, 0.0, 5),
                   jax.random.PRNGKey(0), method="euler", noise="scalar",
                   dt=0.01)


class TestInputValidation:
    def test_decreasing_ts_rejected_base_path(self):
        """Round-3 hardening: the base path (no dt=) also rejects
        decreasing grids instead of silently NaN-ing in sqrt(h)."""
        import pytest

        with pytest.raises(ValueError, match="decreasing"):
            sdeint(lambda t, y: -y, lambda t, y: jnp.zeros_like(y),
                   jnp.ones(2), jnp.linspace(1.0, 0.0, 5),
                   jax.random.PRNGKey(0), noise="scalar")

    def test_pytree_grad_free_honored(self):
        """Round-3 hardening: the pytree-state recursion forwards
        grad_free (it used to drop it, silently using the jvp Milstein)."""
        drift = lambda t, y: {"x": -y["x"]}
        diffn = lambda t, y: {"x": 0.3 * y["x"]}
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(1)
        a = sdeint(drift, diffn, {"x": jnp.ones(2)}, ts, key,
                   method="milstein", noise="diagonal", grad_free=True)
        b = sdeint(lambda t, y: -y, lambda t, y: 0.3 * y, jnp.ones(2), ts,
                   key, method="milstein", noise="diagonal", grad_free=True)
        np.testing.assert_allclose(np.asarray(a["x"]), np.asarray(b),
                                   rtol=1e-6)

    def test_srk_zero_width_intervals_are_noops(self):
        """Round-3 hardening: h == 0 padding intervals are exact no-ops
        for SRA1/SRIW1 too (they divide by h internally; the adaptive
        variants were already guarded)."""
        ts = jnp.concatenate([jnp.linspace(0.0, 1.0, 5),
                              jnp.asarray([1.0, 1.0])])
        for additive in (True, False):
            ys = sdeint(lambda t, y: -y,
                        lambda t, y: 0.1 * jnp.ones_like(y), jnp.ones(2),
                        ts, jax.random.PRNGKey(0), method="srk",
                        noise="scalar", additive=additive)
            assert bool(jnp.all(jnp.isfinite(ys)))
            np.testing.assert_array_equal(np.asarray(ys[4]),
                                          np.asarray(ys[6]))
