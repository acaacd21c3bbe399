"""Unit tests for the math ops layer (transfer function, interp, losses).

Where torch is available we check parity against torch implementations of the
same formulas (the reference is torch; its loss/activation semantics must be
reproduced exactly in float32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from columnflow.ops import (
    compute_firing_rate,
    fr_to_binary,
    huber_trajectory_loss_wta,
    interp,
    interp_at,
    min_max,
    smooth_l1,
    soft_clamp,
)


def torch_firing_rate(x):
    # The reference's transfer function (reference: src/utils.py:13-28).
    a, b, d = 48.0, 981.0, 0.0089
    x_nom = a * x - b
    exp_input = 80.0 * torch.tanh((-d * x_nom) / 80.0)
    return x_nom / (1 - torch.exp(exp_input))


class TestTransfer:
    def test_matches_reference_formula(self):
        x = np.linspace(-50.0, 150.0, 401, dtype=np.float32)
        ours = np.asarray(compute_firing_rate(jnp.asarray(x)))
        theirs = torch_firing_rate(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=5e-5)

    def test_singularity_guarded(self):
        # a*x = b at x = 981/48: the reference formula is 0/0 there; we return
        # the limit 1/d and a finite gradient.
        x = jnp.asarray(981.0 / 48.0, dtype=jnp.float32)
        val = compute_firing_rate(x)
        assert np.isfinite(val)
        np.testing.assert_allclose(float(val), 1.0 / 0.0089, rtol=1e-3)
        g = jax.grad(compute_firing_rate)(x)
        assert np.isfinite(g)

    def test_gradient_finite_everywhere(self):
        xs = jnp.linspace(-100.0, 200.0, 301)
        grads = jax.vmap(jax.grad(compute_firing_rate))(xs)
        assert np.all(np.isfinite(grads))

    def test_soft_clamp(self):
        np.testing.assert_allclose(
            float(soft_clamp(jnp.asarray(1e6))), 80.0, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(soft_clamp(jnp.asarray(0.1))), 0.1, rtol=1e-3
        )


class TestInterp:
    def test_matches_numpy(self):
        xp = np.linspace(0.0, 1.0, 11).astype(np.float32)
        fp = np.random.default_rng(0).normal(size=(11, 3)).astype(np.float32)
        for x in [0.0, 0.05, 0.11, 0.5, 0.999, 1.0, -0.5, 1.5]:
            ours = np.asarray(interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
            want = np.stack(
                [np.interp(np.clip(x, 0, 1), xp, fp[:, j]) for j in range(3)]
            )
            np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)

    def test_uniform_fast_path_matches(self):
        fp = np.random.default_rng(1).normal(size=(64, 5)).astype(np.float32)
        xp = (0.25 + 0.01 * np.arange(64)).astype(np.float32)
        for x in [0.25, 0.30001, 0.5, 0.88, 0.2, 2.0]:
            a = np.asarray(interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
            b = np.asarray(interp_at(jnp.asarray(x), 0.25, 0.01, jnp.asarray(fp)))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_differentiable_in_t(self):
        xp = jnp.linspace(0.0, 1.0, 11)
        fp = jnp.sin(xp)[:, None]
        g = jax.grad(lambda t: interp(t, xp, fp).sum())(0.42)
        assert np.isfinite(g)


class TestLosses:
    def test_smooth_l1_matches_torch(self):
        rng = np.random.default_rng(2)
        p = rng.normal(size=(7, 5)).astype(np.float32) * 3
        t = rng.normal(size=(7, 5)).astype(np.float32)
        ours = float(smooth_l1(jnp.asarray(p), jnp.asarray(t)))
        theirs = float(
            torch.nn.SmoothL1Loss(beta=1.0)(torch.tensor(p), torch.tensor(t))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_min_max(self):
        x = jnp.asarray([1.0, 3.0, 2.0])
        out = np.asarray(min_max(x))
        np.testing.assert_allclose(out, [0.0, 1.0, 0.5], atol=1e-7)

    def test_fr_to_binary_matches_torch(self):
        x = np.asarray([0.5, 1.5, 2.5, 0.1], dtype=np.float32)
        ours = np.asarray(fr_to_binary(jnp.asarray(x)))
        xt = torch.tensor(x)
        theirs = torch.sigmoid((xt - xt.mean()) / xt.std()).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_wta_trajectory_loss_shape_and_value(self):
        rng = np.random.default_rng(3)
        pred = rng.normal(size=(2, 10, 48)).astype(np.float32)
        true = rng.normal(size=(2, 10, 2)).astype(np.float32)
        w = np.zeros(8, dtype=np.float32)
        w[0] = 1.0
        loss = huber_trajectory_loss_wta(
            jnp.asarray(pred), jnp.asarray(true), jnp.asarray(w)
        )
        assert loss.shape == ()
        # Cross-check against a direct torch computation of the same formula
        # (reference: src/utils.py:74-88).
        mem, adap = torch.tensor(pred[..., :16]), torch.tensor(pred[..., 16:32])
        fr = torch_firing_rate(mem - adap)
        fa = (fr[..., :8] * torch.tensor(w)).sum(-1)
        fb = (fr[..., 8:16] * torch.tensor(w)).sum(-1)
        stacked = torch.stack([fa, fb], dim=-1)
        want = torch.nn.SmoothL1Loss(beta=1.0)(stacked, torch.tensor(true))
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-4)
