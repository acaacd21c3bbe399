"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Checks (a) the DP step runs sharded across 8 devices, (b) its numerics match
the single-device step on the same inputs (pmean of equal shards == global
mean), (c) params stay replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.parallel import make_mesh, replicate, shard_batch
from columnflow.tasks import wta as wta_task


def _setup(batch=8, time_steps=90):
    cfg = ColumnConfig.load()
    task = wta_task.build_task(cfg, jax.random.PRNGKey(0),
                               time_steps=time_steps)
    k = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(k, 3)
    true_states = 0.5 + 0.1 * jax.random.normal(k1, (batch, time_steps, 2))
    stims = jax.random.uniform(k2, (batch, 2), minval=10.0, maxval=30.0)
    keys = jax.random.split(k3, batch)
    return task, true_states, stims, keys


class TestDPTraining:
    def test_eight_device_mesh(self):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        mesh = make_mesh()
        assert mesh.devices.shape == (8,)

    def test_dp_matches_single_device(self):
        task, true_states, stims, keys = _setup()
        mesh = make_mesh()

        # Single-device step.
        opt_state = task.optimizer.init(task.params)
        step = wta_task.make_train_step(task)
        # make_train_step takes a single key and splits internally; for exact
        # comparison use the DP loss path directly on one device instead.
        def single_loss(params):
            return wta_task.loss_fn(params, task, true_states, stims, keys)

        loss_single, grads_single = jax.value_and_grad(single_loss)(task.params)

        # Single-device update computed FIRST: the DP step donates its params
        # buffers and jax.device_put may alias the originals.
        from columnflow.train import mask_grads

        g = mask_grads(grads_single, task.grad_mask)
        upd, _ = task.optimizer.update(g, task.optimizer.init(task.params),
                                       task.params)
        want = jax.tree_util.tree_map(lambda p, u: p + u, task.params, upd)
        want = jax.tree_util.tree_map(np.asarray, want)

        # Sharded DP step.
        dp_step = wta_task.make_dp_train_step(task, mesh)
        params_r = replicate(jax.tree_util.tree_map(jnp.array, task.params),
                             mesh)
        opt_r = replicate(task.optimizer.init(params_r), mesh)
        bt, bs, bk = shard_batch((true_states, stims, keys), mesh)
        params2, opt2, loss_dp = dp_step(params_r, opt_r, bt, bs, bk)

        np.testing.assert_allclose(float(loss_dp), float(loss_single),
                                   rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(params2["recurrent_weights"]),
            np.asarray(want["recurrent_weights"]),
            rtol=2e-3, atol=1e-5,
        )

    def test_multi_step_stability(self):
        task, true_states, stims, keys = _setup()
        mesh = make_mesh()
        dp_step = wta_task.make_dp_train_step(task, mesh)
        params = replicate(jax.tree_util.tree_map(jnp.array, task.params),
                           mesh)
        opt_state = replicate(task.optimizer.init(params), mesh)
        batch = shard_batch((true_states, stims, keys), mesh)
        for _ in range(3):
            params, opt_state, loss = dp_step(params, opt_state, *batch)
            assert np.isfinite(float(loss))


class TestTaskDPSteps:
    """Every task family exposes a mesh-sharded training step; on the
    virtual 8-device CPU mesh each must run and produce finite loss."""

    def test_parity_dp_step(self):
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.parallel import make_mesh, replicate, shard_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        mesh = make_mesh(8)
        step = pt.make_dp_train_step(task, mesh)
        # Poison params with clamp violations (positive lateral inhibition,
        # output weight above scale): the mesh step must apply the
        # reference-matching post-step clamps (scripts/parity_ode.py:267-274)
        # exactly like the single-device trainer does.
        poisoned = dict(task.params)
        poisoned["lateral"] = task.params["lateral"].at[0, 0].set(0.5)
        poisoned["output_weights"] = (
            task.params["output_weights"].at[0].set(pt.OUTPUT_SCALE + 3.0))
        params = replicate(poisoned, mesh)
        opt_state = replicate(task.optimizer.init(task.params), mesh)
        stims = shard_batch(make_parity_batch(jax.random.PRNGKey(1), 2, 8),
                            mesh)
        params, opt_state, loss = step(params, opt_state, stims)
        assert bool(jnp.isfinite(loss))
        assert float(jnp.max(params["lateral"])) <= 0.0
        assert float(jnp.min(params["input_weights"])) >= 0.0
        assert float(jnp.min(params["feedforward"])) >= 0.0
        assert float(jnp.min(params["output_weights"])) >= 0.0
        assert float(jnp.max(params["output_weights"])) <= pt.OUTPUT_SCALE

    def test_parity_dp_step_stochastic_adaptive(self):
        """The flagship scale configuration sharded over the mesh: each
        device shard integrates the adaptive SDE (truncated-BPTT replay
        gradients) on its own Brownian key, gradients pmean over the mesh
        axis, clamps applied in the sharded step."""
        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.parallel import make_mesh, replicate, shard_batch
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)
        mesh = make_mesh(8)
        step = pt.make_dp_train_step(task, mesh, stochastic=True,
                                     adaptive=True, bptt_every=16)
        params = replicate(task.params, mesh)
        opt_state = replicate(task.optimizer.init(task.params), mesh)
        stims = shard_batch(make_parity_batch(jax.random.PRNGKey(1), 2, 8),
                            mesh)
        dev_keys = shard_batch(
            jax.random.split(jax.random.PRNGKey(2), 8), mesh)
        params, opt_state, loss = step(params, opt_state, stims, dev_keys)
        assert bool(jnp.isfinite(loss))
        for leaf in jax.tree_util.tree_leaves(params):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert float(jnp.max(params["lateral"])) <= 0.0

    def test_xor_dp_step(self):
        from columnflow.config import ColumnConfig
        from columnflow.parallel import make_mesh, replicate, shard_batch
        from columnflow.tasks import xor as xt

        cfg = ColumnConfig.load()
        task = xt.build_task(cfg, jax.random.PRNGKey(0), time_steps=60,
                             max_steps=512)
        mesh = make_mesh(8)
        step = xt.make_dp_train_step_mesh(task, mesh)
        params = replicate(task.params, mesh)
        opt_state = replicate(task.optimizer.init(task.params), mesh)
        conds = shard_batch(jnp.tile(jnp.asarray(xt.xor_conditions()), (2, 1)),
                            mesh)
        params, opt_state, loss = step(params, opt_state, conds)
        assert bool(jnp.isfinite(loss))

    def test_bifurcation_dp_step(self):
        from columnflow.parallel import make_mesh, replicate, shard_batch
        from columnflow.tasks import bifurcation as bt

        task = bt.build_task(jax.random.PRNGKey(0), time_points=40,
                             total_time=2.0, max_steps=256)
        mesh = make_mesh(8)
        step = bt.make_dp_train_step(task, mesh)
        params = replicate(task.params, mesh)
        opt_state = replicate(task.optimizer.init(task.params), mesh)
        true_y = shard_batch(
            0.3 * jax.random.normal(jax.random.PRNGKey(2), (8, 40, 3)), mesh
        )
        params, opt_state, loss = step(params, opt_state, true_y)
        assert bool(jnp.isfinite(loss))


class TestTPTraining:
    """Tensor-parallel (dp x tp) network training on the 8-device CPU mesh."""

    def _task(self):
        from columnflow.config import ColumnConfig
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        return pt.build_task(cfg, jax.random.PRNGKey(0),
                             columns_per_area=(2, 1), n_inputs=2,
                             time_steps=60, max_steps=512)

    def _stims(self, batch=4):
        from columnflow.data import make_parity_batch

        return make_parity_batch(jax.random.PRNGKey(1), 2, batch)

    def test_tp_step_runs_sharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from columnflow.parallel import (
            make_mesh_2d,
            make_tp_train_step,
            shard_network_opt_state,
            shard_network_params,
        )

        task = self._task()
        mesh = make_mesh_2d(2, 4)
        step = make_tp_train_step(task, mesh)
        params = shard_network_params(task.params, mesh)
        opt_state = shard_network_opt_state(
            task.optimizer.init(task.params), task.params, mesh)
        stims = jax.device_put(self._stims(),
                               NamedSharding(mesh, P("batch")))

        for _ in range(2):
            params, opt_state, loss = step(params, opt_state, stims)
        assert bool(jnp.isfinite(loss))
        # Weight matrices stay row-sharded over "model" across steps.
        spec = params["feedforward"].sharding.spec
        assert spec[0] == "model", spec

    def test_tp_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from columnflow.parallel import (
            make_mesh_2d,
            make_tp_train_step,
            shard_network_opt_state,
            shard_network_params,
        )

        task = self._task()
        stims = self._stims()

        def run(mesh):
            # Fresh copies: the jitted step donates params/opt_state buffers.
            fresh = jax.tree_util.tree_map(jnp.array, task.params)
            step = make_tp_train_step(task, mesh)
            params = shard_network_params(fresh, mesh)
            opt_state = shard_network_opt_state(
                task.optimizer.init(fresh), fresh, mesh)
            s = jax.device_put(stims, NamedSharding(mesh, P("batch")))
            params, opt_state, loss = step(params, opt_state, s)
            return jax.tree_util.tree_map(np.asarray, params), float(loss)

        params_tp, loss_tp = run(make_mesh_2d(2, 4))
        params_1, loss_1 = run(make_mesh_2d(1, 1))

        assert np.isclose(loss_tp, loss_1, rtol=1e-5), (loss_tp, loss_1)
        for k in params_1:
            np.testing.assert_allclose(
                params_tp[k], params_1[k], rtol=1e-5, atol=1e-7,
                err_msg=k)


class TestShardedSweep:
    """Mesh-sharded WTA noise sweeps match the unsharded rollout exactly
    (same keys -> same Brownian paths; sharding only moves work)."""

    def test_sweep_matches_unsharded(self):
        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.parallel import make_mesh
        from columnflow.tasks.wta_sweep import sweep_noise_realizations

        cfg = ColumnConfig.load()
        params, area = build_wta(cfg, jax.random.PRNGKey(0))
        kw = dict(stim_pair=[25.0, 15.0], n_realizations=8, time_steps=90,
                  use_fused=False)
        ref = sweep_noise_realizations(params, area, jax.random.PRNGKey(1),
                                       **kw)
        out = sweep_noise_realizations(params, area, jax.random.PRNGKey(1),
                                       mesh=make_mesh(), **kw)
        # Batched-vs-per-device matmul reassociation gives ~1e-5 abs
        # drift over 90 steps of the decision dynamics.
        np.testing.assert_allclose(np.asarray(out["trajectories"]),
                                   np.asarray(ref["trajectories"]),
                                   rtol=1e-3, atol=1e-4)
        assert out["frac_a_wins"] == ref["frac_a_wins"]

    def test_psychometric_sharded(self):
        from columnflow.config import ColumnConfig
        from columnflow.models import build_wta
        from columnflow.parallel import make_mesh
        from columnflow.tasks.wta_sweep import psychometric_curve

        cfg = ColumnConfig.load()
        params, area = build_wta(cfg, jax.random.PRNGKey(0))
        c, f = psychometric_curve(params, area, jax.random.PRNGKey(2),
                                  coherences=[-20.0, 20.0],
                                  n_realizations=4, time_steps=90,
                                  mesh=make_mesh(), use_fused=False)
        assert f.shape == (2,)
        assert np.all((f >= 0.0) & (f <= 1.0))


class TestMeshErrors:
    def test_mesh_2d_too_many_devices_raises(self):
        import pytest

        from columnflow.parallel import make_mesh_2d

        with pytest.raises(ValueError, match="devices"):
            make_mesh_2d(8, 8)  # 64 > the 8 virtual devices


class TestTPFullScale:
    def test_tp_step_at_reference_scale(self):
        """dp x tp on the full (8,4,1)-column network (312-dim state): the
        row-sharded (P, P) matrices partition over the model axis and the
        step produces finite loss with shardings preserved."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from columnflow.config import ColumnConfig
        from columnflow.data import make_parity_batch
        from columnflow.parallel import (
            make_mesh_2d,
            make_tp_train_step,
            shard_network_opt_state,
            shard_network_params,
        )
        from columnflow.tasks import parity as pt

        cfg = ColumnConfig.load()
        task = pt.build_task(cfg, jax.random.PRNGKey(0), time_steps=60,
                             max_steps=512)
        mesh = make_mesh_2d(2, 4)
        step = make_tp_train_step(task, mesh)
        params = shard_network_params(task.params, mesh)
        opt_state = shard_network_opt_state(
            task.optimizer.init(task.params), task.params, mesh)
        stims = jax.device_put(make_parity_batch(jax.random.PRNGKey(1), 4, 4),
                               NamedSharding(mesh, P("batch")))
        params, opt_state, loss = step(params, opt_state, stims)
        assert bool(jnp.isfinite(loss))
        assert params["feedforward"].sharding.spec[0] == "model"
