"""Training-layer tests: optimizer parity vs torch, masks, clamps,
checkpoint roundtrip, metrics logging.

The reference trains with torch.optim.RMSprop(+ExponentialLR) and Adam
(reference: scripts/wta_ode.py:157-158, scripts/xor_ode.py:167-168,
scripts/parity_ode.py:213); torch (CPU) is the oracle here so the
reference's tuned learning rates provably transfer.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from columnflow.train import (
    MetricsLogger,
    adam,
    clamp_params,
    exponential_lr,
    load_checkpoint,
    mask_grads,
    save_checkpoint,
    torch_rmsprop,
)

torch = pytest.importorskip("torch")


def _run_torch(opt_name, lr, grads, w0, **kw):
    w = torch.nn.Parameter(torch.tensor(w0))
    if opt_name == "rmsprop":
        opt = torch.optim.RMSprop([w], lr=lr, alpha=kw.get("alpha", 0.99))
    else:
        opt = torch.optim.Adam([w], lr=lr)
    sch = None
    if "gamma" in kw:
        sch = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=kw["gamma"])
    for g in grads:
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
        if sch is not None:
            sch.step()
    return w.detach().numpy()


def _run_jax(optimizer, grads, w0):
    p = {"w": jnp.asarray(w0)}
    st = optimizer.init(p)
    for g in grads:
        up, st = optimizer.update({"w": jnp.asarray(g)}, st, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, up)
    return np.asarray(p["w"])


W0 = np.asarray([1.0, -2.0, 3.0], np.float32)
GRADS = [np.asarray(g, np.float32) for g in
         ([0.5, -1.0, 2.0], [-0.3, 0.7, 0.1], [1.5, 0.2, -0.9],
          [0.05, -0.4, 0.33])]


class TestOptimizerTorchParity:
    def test_rmsprop_wta_settings(self):
        # WTA: RMSprop(lr=10, alpha=0.9) + ExponentialLR(0.99)
        want = _run_torch("rmsprop", 10.0, GRADS, W0, alpha=0.9, gamma=0.99)
        got = _run_jax(torch_rmsprop(exponential_lr(10.0, 0.99), alpha=0.9),
                       GRADS, W0)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_rmsprop_xor_settings(self):
        want = _run_torch("rmsprop", 0.5, GRADS, W0, alpha=0.95, gamma=0.8)
        got = _run_jax(torch_rmsprop(exponential_lr(0.5, 0.8), alpha=0.95),
                       GRADS, W0)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_adam_parity_settings(self):
        want = _run_torch("adam", 0.1, GRADS, W0)
        got = _run_jax(adam(0.1), GRADS, W0)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMasksAndClamps:
    def test_mask_grads(self):
        grads = {"a": jnp.ones((2, 2)), "b": jnp.full((3,), 2.0)}
        masks = {"a": jnp.asarray([[1.0, 0.0], [0.0, 1.0]]), "b": None}
        out = mask_grads(grads, masks)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.eye(2))
        np.testing.assert_array_equal(np.asarray(out["b"]), [2.0, 2.0, 2.0])

    def test_clamp_params(self):
        params = {"lat": jnp.asarray([-1.0, 2.0]), "ff": jnp.asarray([-3.0, 4.0]),
                  "out": jnp.asarray([0.5, 7.0])}
        clamps = {"lat": (None, 0.0), "ff": (0.0, None), "out": (0.0, 1.0)}
        out = clamp_params(params, clamps)
        np.testing.assert_array_equal(np.asarray(out["lat"]), [-1.0, 0.0])
        np.testing.assert_array_equal(np.asarray(out["ff"]), [0.0, 4.0])
        np.testing.assert_array_equal(np.asarray(out["out"]), [0.5, 1.0])


class TestGlobalNorm:
    def test_exact_small(self):
        from columnflow.train import global_norm

        n, gmax, ns = global_norm({"a": jnp.asarray([3.0, 4.0]),
                                   "b": jnp.zeros(7)})
        assert float(n) == pytest.approx(5.0, rel=1e-6)
        assert float(gmax) == pytest.approx(4.0)
        assert float(gmax * ns) == pytest.approx(5.0, rel=1e-6)

    def test_overflow_robust(self):
        """Entries ~1e20 overflow the naive sqrt(sum(g**2)) (squares reach
        1e40, past f32 max) — the max-prescaled norm stays exact, and the
        (clip/gmax)/ns clip factor is finite (the 104-column truncated-BPTT
        clip path, RESULTS.md)."""
        from columnflow.train import global_norm

        tree = {"a": jnp.full((1024,), 1e20, jnp.float32),
                "b": jnp.zeros(5, jnp.float32)}
        naive = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in tree.values()))
        assert not np.isfinite(float(naive))
        n, gmax, ns = global_norm(tree)
        assert float(gmax) == pytest.approx(1e20)
        assert float(ns) == pytest.approx(32.0, rel=1e-5)
        assert float(n) == pytest.approx(3.2e21, rel=1e-5)
        clip_factor = (1.0 / gmax) / jnp.maximum(ns, 1e-30)
        assert np.isfinite(float(clip_factor)) and float(clip_factor) > 0

    def test_zero_tree(self):
        from columnflow.train import global_norm

        n, gmax, ns = global_norm({"a": jnp.zeros(3)})
        assert float(n) == 0.0 and np.isfinite(float(gmax))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {"w": jnp.arange(4.0), "b": {"x": jnp.ones((2, 3))}}
        opt = adam(0.1)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(7)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params=params, opt_state=opt_state, key=key,
                        step=42, extra={"note": "hi"})
        out = load_checkpoint(path, params_like=params,
                              opt_state_like=opt_state, key_like=key)
        assert out["step"] == 42
        assert out["extra"] == {"note": "hi"}
        np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                      np.arange(4.0))
        np.testing.assert_array_equal(np.asarray(out["key"]), np.asarray(key))
        chex_leaves = jax.tree_util.tree_leaves(out["opt_state"])
        assert len(chex_leaves) == len(jax.tree_util.tree_leaves(opt_state))

    def test_structure_mismatch_raises(self, tmp_path):
        """A stale checkpoint must not silently restore into a refactored
        pytree of the same leaf count (round-1 VERDICT Weak #5)."""
        params = {"w": jnp.arange(4.0), "b": jnp.ones(3)}
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params=params, step=1)
        # Same leaf count, different key names -> treedef mismatch.
        renamed = {"weights": jnp.arange(4.0), "bias": jnp.ones(3)}
        with pytest.raises(ValueError, match="structure"):
            load_checkpoint(path, params_like=renamed)
        # Matching treedef but refactored leaf shape -> shape mismatch.
        reshaped = {"w": jnp.arange(8.0), "b": jnp.ones(3)}
        with pytest.raises(ValueError, match="shape"):
            load_checkpoint(path, params_like=reshaped)
        # strict=False restores the old permissive behavior.
        out = load_checkpoint(path, params_like=renamed, strict=False)
        np.testing.assert_array_equal(np.asarray(out["params"]["weights"]),
                                      np.arange(4.0))


class TestMetricsLogger:
    def test_jsonl_output(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        logger = MetricsLogger(path)
        logger.log(0, loss=jnp.asarray(1.5), acc=0.5)
        logger.log(1, loss=jnp.asarray(0.5))
        logger.close()
        rows = [json.loads(l) for l in open(path)]
        assert rows[0]["step"] == 0 and rows[0]["loss"] == 1.5
        assert rows[1]["step"] == 1
