"""Torch-oracle one-iteration WTA training parity (VERDICT round-1, Missing #2).

One full reference-protocol WTA training iteration executed on BOTH sides
with identical initial weights and an identical Brownian pack (I1, I10):

    torch side:  the reference's OWN ColumnAreaWTA.forward/diffusion and
                 huber_loss_wta (src/utils.py:74-88), hand-rolled SRA1
                 stepping (torchsde is not installed; same scheme the
                 columnflow solver uses), autograd backward through the step
                 graph, grad *= lat_in_mask, torch.optim.RMSprop(lr=10,
                 alpha=0.9) + ExponentialLR(0.99) — exactly
                 scripts/wta_ode.py:139-205.
    jax side:    sdeint(method='srk', additive=True, noise_pack=...) over the
                 vmapped batch, huber_trajectory_loss_wta, mask_grads,
                 torch_rmsprop + exponential_lr.

Asserting loss, the masked gradient, and the post-update trainable entries
agree converts the "RMSprop(lr=10) is inherently non-convergent at the
current config's weight scale" claim (tasks/wta.py docstring) from a
docstring argument into a demonstrated fact: the iteration math is the
reference's own.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from columnflow.config import ColumnConfig
from columnflow.data import wta_stim_three_phases
from columnflow.models import Stimulus, build_wta, wta_diffusion, wta_drift
from columnflow.models.wta import wta_lat_in_mask
from columnflow.ops.losses import huber_trajectory_loss_wta
from columnflow.solvers import sdeint
from columnflow.solvers.sde import _brownian_pack
from columnflow.train import exponential_lr, mask_grads, torch_rmsprop

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "src", "coupled_columns.py")),
    reason="reference checkout not available",
)

TIME_STEPS = 300
DT = 1e-4
N_SAMPLES = 3


@pytest.fixture(scope="module")
def ref_mods():
    import importlib.util
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location(
        "ref_cc_oracle", os.path.join(REF_ROOT, "src", "coupled_columns.py")
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    spec_u = importlib.util.spec_from_file_location(
        "ref_utils_oracle", os.path.join(REF_ROOT, "src", "utils.py")
    )
    utils = importlib.util.module_from_spec(spec_u)
    spec_u.loader.exec_module(utils)
    return cc, utils


@pytest.fixture(scope="module")
def ref_toml():
    import tomllib

    with open(os.path.join(REF_ROOT, "config", "model.toml"), "rb") as f:
        return tomllib.load(f)


def _one_iteration(ref_mods, ref_toml):
    """Run the matched iteration on both sides; returns a dict of pairs."""
    cc, utils = ref_mods
    cfg = ColumnConfig.load()
    params, area = build_wta(cfg, jax.random.PRNGKey(0))
    ts = jnp.linspace(0.0, TIME_STEPS * DT, TIME_STEPS)
    dt_grid = float(ts[1] - ts[0])
    mask = wta_lat_in_mask()

    rng = np.random.default_rng(0)
    stims = np.stack(
        [
            rng.uniform(15.0, 25.0, N_SAMPLES),
            rng.uniform(25.0, 45.0, N_SAMPLES),
        ],
        axis=-1,
    ).astype(np.float32)
    # Wong-Wang-scale targets (the exact values are irrelevant to parity).
    true = rng.uniform(0.0, 1.5, (N_SAMPLES, TIME_STEPS, 2)).astype(np.float32)

    # One shared Brownian pack per sample, fed to BOTH sides.
    packs = [
        _brownian_pack(jax.random.PRNGKey(100 + s), ts, (), jnp.float32)
        for s in range(N_SAMPLES)
    ]

    tables = [wta_stim_three_phases(jnp.asarray(stims[s]), TIME_STEPS)
              for s in range(N_SAMPLES)]

    # ---- jax side -------------------------------------------------------
    def loss_fn(p):
        def drift(t, y, table):
            return wta_drift(t, y, p, area, Stimulus(0.0, dt_grid, table))

        def diffusion(t, y, table):
            return wta_diffusion(t, y, p, area, Stimulus(0.0, dt_grid, table))

        ys = jnp.stack(
            [
                sdeint(
                    drift, diffusion, jnp.zeros(48), ts,
                    jax.random.PRNGKey(0), tables[s],
                    method="srk", noise="scalar", additive=True,
                    noise_pack=packs[s][1:],
                )
                for s in range(N_SAMPLES)
            ]
        )
        return huber_trajectory_loss_wta(ys, jnp.asarray(true),
                                         p["output_weights"])

    loss_jax, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    grads = mask_grads(grads, {"recurrent_weights": jnp.asarray(mask),
                               "output_weights": None})
    opt = torch_rmsprop(exponential_lr(10.0, 0.99), alpha=0.9)
    opt_state = opt.init(params)
    updates, _ = opt.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)

    # ---- torch side -----------------------------------------------------
    torch.manual_seed(0)
    net = cc.ColumnAreaWTA(ref_toml, "mt")
    net.recurrent_weights.data = torch.tensor(
        np.asarray(params["recurrent_weights"]), dtype=torch.float32
    )
    time_vec = torch.linspace(0.0, TIME_STEPS * DT, TIME_STEPS)
    net.set_time_vec(time_vec)

    # The stimulus builder itself must match the reference's
    # set_stim_three_phases (scripts/wta_ode.py:109-122; that script imports
    # torchsde at module level, so its builder is replicated here verbatim
    # instead of imported).
    ref_tables = []
    for s in range(N_SAMPLES):
        stim = torch.zeros(16)
        stim[2] = stim[3] = float(stims[s, 0])
        stim[10] = stim[11] = float(stims[s, 1])
        tbl = torch.zeros((TIME_STEPS, 16))
        onset = int(TIME_STEPS / 3)
        offset = int(onset + TIME_STEPS / 3)
        tbl[onset:offset, :] = stim
        ref_tables.append(tbl)
        np.testing.assert_allclose(np.asarray(tables[s]), tbl.numpy(),
                                   rtol=0, atol=0)

    opt_t = torch.optim.RMSprop([net.recurrent_weights], lr=10.0, alpha=0.9)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt_t, gamma=0.99)
    opt_t.zero_grad()

    preds = []
    for s in range(N_SAMPLES):
        net.set_stim(ref_tables[s])
        _, i1, i10, _, _ = packs[s]
        i1_t = torch.tensor(np.asarray(i1))
        i10_t = torch.tensor(np.asarray(i10))
        y = torch.zeros(1, 48)
        traj = [y]
        for i in range(TIME_STEPS - 1):
            t0 = time_vec[i]
            h = time_vec[i + 1] - time_vec[i]
            g = net.diffusion(t0, y).squeeze(-1)
            g_end = net.diffusion(t0 + h, y).squeeze(-1)
            f1 = net.forward(t0, y)
            i10h = i10_t[i] / h
            h2 = y + 0.75 * h * f1 + 1.5 * i10h * g_end
            f2 = net.forward(t0 + 0.75 * h, h2)
            y = (y + h * (f1 / 3.0 + 2.0 * f2 / 3.0)
                 + (i1_t[i] - i10h) * g_end + i10h * g)
            traj.append(y)
        preds.append(torch.stack(traj))  # (T, 1, 48)

    pred_states = torch.stack(preds)  # (B, T, 1, 48)
    loss_torch = utils.huber_loss_wta(pred_states,
                                      torch.tensor(true), net)
    loss_torch.backward()
    with torch.no_grad():
        net.recurrent_weights.grad *= net.lat_in_mask
    grad_torch = net.recurrent_weights.grad.detach().numpy().copy()
    opt_t.step()
    sched.step()

    return {
        "mask": mask,
        "loss": (float(loss_jax), float(loss_torch.detach())),
        "grad": (np.asarray(grads["recurrent_weights"]), grad_torch),
        "weights": (
            np.asarray(new_params["recurrent_weights"]),
            net.recurrent_weights.detach().numpy(),
        ),
        "old_weights": np.asarray(params["recurrent_weights"]),
    }


@pytest.fixture(scope="module")
def iteration(ref_mods, ref_toml):
    return _one_iteration(ref_mods, ref_toml)


def test_loss_matches(iteration):
    lj, lt = iteration["loss"]
    assert lj == pytest.approx(lt, rel=1e-3), (lj, lt)


def test_masked_gradient_matches(iteration):
    gj, gt = iteration["grad"]
    mask = iteration["mask"].astype(bool)
    # Gradient is zero outside the 4 trainable entries on both sides.
    assert np.all(gj[~mask] == 0.0) and np.all(gt[~mask] == 0.0)
    np.testing.assert_allclose(gj[mask], gt[mask], rtol=2e-3)


def test_updated_weights_match(iteration):
    wj, wt = iteration["weights"]
    mask = iteration["mask"].astype(bool)
    old = iteration["old_weights"]
    # Non-trainable entries unchanged on both sides.
    np.testing.assert_allclose(wj[~mask], old[~mask], rtol=0, atol=0)
    np.testing.assert_allclose(wt[~mask], old[~mask], rtol=0, atol=0)
    # The 4 trainable entries after one RMSprop(lr=10) step.
    np.testing.assert_allclose(wj[mask], wt[mask], rtol=1e-3)


def test_lr10_step_is_order_ten(iteration):
    """The demonstrated fact behind the non-convergence claim: one
    RMSprop(lr=10) update moves each trainable entry by ~lr (RMSprop's
    normalized step is ~lr regardless of gradient scale), i.e. O(10) on
    weights whose anatomical scale is O(300) — a ~3% jolt per iteration
    on a noisy SmoothL1 objective."""
    wj, _ = iteration["weights"]
    mask = iteration["mask"].astype(bool)
    old = iteration["old_weights"]
    step = np.abs(wj[mask] - old[mask])
    assert np.all(step > 5.0) and np.all(step < 35.0), step
