"""Model-layer tests: weight construction golden values, drift correctness,
Wong-Wang generator behavior.

Golden values below were produced by executing the reference's own
ColumnAreaWTA weight pipeline (src/coupled_columns.py:10-21) against
config/model.toml. (The 16x16 matrix hardcoded in the reference's
scripts/plotting_results.py:36-99 is from an OLDER config generation — a
global /1000 scale and two stale probabilities, consistent with the toml
comment "# 0.0874 (idx 0,1)" — so it is not a valid target for the current
config; the executed pipeline is.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from columnflow.config import ColumnConfig
from columnflow.models import (
    Stimulus,
    build_area_params,
    build_column_network,
    build_hopf_mlp,
    build_wta,
    build_xor_network,
    network_diffusion,
    network_drift,
    wong_wang_three_phase,
    wta_diffusion,
    wta_drift,
    wta_lat_in_mask,
    xor_diffusion,
    xor_drift,
)
from columnflow.models.hopf import mlp_apply

CFG = ColumnConfig.load()

# Rows 0 and 4 of the anatomical 8x8 recurrent block of a 2-column
# small-network 'mt' area, captured from a run of the reference's own
# ColumnAreaWTA construction (row 4 has no trainable entries; row 0's
# diagonal is trainable but the perturbation std is 1e-4).
GOLDEN_ROW0 = [282.9845, -492.2254, 114.045, -105.6567, 20.4329, 0.0,
               5.304, 0.0]
GOLDEN_ROW4 = [281.5052, -170.8602, 64.1563, -7.0772, 53.9911, -290.1104,
               14.3296, 0.0]


class TestWeightConstruction:
    def test_golden_wta_anatomy(self):
        area = build_area_params(CFG, "mt", 2, small_network=True)
        w = np.asarray(area.recurrent_weights)
        np.testing.assert_allclose(w[0, :8], GOLDEN_ROW0, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(w[4, :8], GOLDEN_ROW4, rtol=2e-4, atol=1e-6)
        # Cross-column block is zero (block-diagonal anatomy).
        assert np.all(w[:8, 8:] == 0.0)
        # Second column's block is identical to the first.
        np.testing.assert_allclose(w[8:, 8:], w[:8, :8], rtol=1e-6)

    def test_small_network_background(self):
        area = build_area_params(CFG, "mt", 2, small_network=True)
        # bg current = 2510 * 0.0878 * 8.0 for every population
        np.testing.assert_allclose(
            np.asarray(area.background_current),
            np.full(16, 2510 * 0.0878 * 8.0),
            rtol=1e-5,
        )

    def test_full_network_background(self):
        area = build_area_params(CFG, "mt", 1, small_network=False)
        want = np.asarray([1600, 1500, 2100, 1900, 2000, 1900, 2900, 2100])
        np.testing.assert_allclose(
            np.asarray(area.background_current), want * 0.0878 * 8.0, rtol=1e-5
        )

    def test_feedforward_weights(self):
        area = build_area_params(CFG, "mt", 2, small_network=True)
        want = np.tile(np.asarray([0, 0, 295, 186, 0, 0, 0, 0]) * 0.0878, 2)
        np.testing.assert_allclose(
            np.asarray(area.feedforward_weights), want, rtol=1e-5
        )

    def test_constants(self):
        area = build_area_params(CFG, "mt", 2, small_network=True)
        assert np.isclose(area.resistance, 0.02 / 250e-6)
        assert np.isclose(area.tau_syn, 0.0005)
        assert np.isclose(area.tau_adapt, 10.0)


class TestWTA:
    def setup_method(self):
        self.params, self.area = build_wta(CFG, jax.random.PRNGKey(0))
        T = 100
        table = np.zeros((T, 16), dtype=np.float32)
        table[30:60, [2, 3]] = 20.0
        table[30:60, [10, 11]] = 15.0
        self.stim = Stimulus(t0=0.0, dt=1e-3, table=jnp.asarray(table))

    def test_trainable_entries_perturbed_only(self):
        w = np.asarray(self.params["recurrent_weights"])
        anatomical = np.asarray(self.area.recurrent_weights)
        mask = wta_lat_in_mask() * np.asarray(self.area.external_mask)
        diff = np.abs(w - anatomical)
        assert np.all(diff[mask == 0] == 0.0)
        assert np.all(diff[mask == 1] > 0.0)

    def test_drift_matches_manual_computation(self):
        y = jnp.asarray(np.random.default_rng(0).normal(size=48).astype(np.float32))
        t = 0.045
        dy = np.asarray(wta_drift(t, y, self.params, self.area, self.stim))

        # Independent numpy computation of the same equations
        # (reference: src/coupled_columns.py:204-237).
        v, a, r = np.split(np.asarray(y), 3)
        x = 48.0 * (v - a) - 981.0
        fr = x / (1 - np.exp(80 * np.tanh(-0.0089 * x / 80)))
        stim_t = np.asarray(self.stim.table)[45]  # t=0.045, dt=1e-3
        ff = np.asarray(self.area.feedforward_weights) * stim_t
        rec = np.asarray(self.params["recurrent_weights"]) @ fr
        total = (ff + np.asarray(self.area.background_current) + rec) * 0.0005
        want_dv = (-v + total * 80.0) / 0.02
        want_da = (-a + np.asarray(self.area.adaptation_strength) * fr) / 10.0
        want_dr = (-r + fr) / 0.0005
        want = np.concatenate([want_dv, want_da, want_dr])
        np.testing.assert_allclose(dy, want, rtol=2e-4, atol=1e-2)

    def test_diffusion_quirk_default(self):
        y = jnp.ones(48)
        g = np.asarray(wta_diffusion(0.0, y, self.params, self.area, self.stim))
        assert np.all(g == 100.0)  # actual reference behavior: whole state
        g2 = np.asarray(
            wta_diffusion(0.0, y, self.params, self.area, self.stim,
                          membrane_only=True)
        )
        assert np.all(g2[:16] == 100.0) and np.all(g2[16:] == 0.0)

    def test_resting_state_is_stable_scale(self):
        # From zero state with no stimulus the drift must be finite and the
        # rates must relax toward the transfer function's floor.
        table = jnp.zeros((10, 16))
        stim = Stimulus(0.0, 1e-2, table)
        dy = wta_drift(0.0, jnp.zeros(48), self.params, self.area, stim)
        assert np.all(np.isfinite(np.asarray(dy)))


class TestXOR:
    def setup_method(self):
        self.params, self.net = build_xor_network(CFG, jax.random.PRNGKey(1))
        T = 50
        table = np.zeros((T, 2, 16), dtype=np.float32)
        table[25:, 0, [2, 3]] = 20.0
        table[25:, 1, [10, 11]] = 20.0
        self.stim = Stimulus(0.0, 1e-3, jnp.asarray(table))

    def test_ff_weights_masked(self):
        w0 = np.asarray(self.params["ff_w0"])  # (2, 16)
        target = np.tile([0, 0, 1, 1, 0, 0, 0, 0], 2).astype(bool)
        assert np.all(w0[:, ~target] == 0.0)
        assert np.all(w0[:, target] > 0.0)
        w1 = np.asarray(self.params["ff_w1"])  # (2, 8)
        assert np.all(w1[:, [0, 1, 4, 5, 6, 7]] == 0.0)

    def test_area0_lateral_removed(self):
        w = np.asarray(self.net.area0.recurrent_weights)
        assert np.all(w[:8, 8:] == 0.0) and np.all(w[8:, :8] == 0.0)

    def test_drift_shapes_and_gradients(self):
        y = jnp.zeros(72)
        dy = xor_drift(0.03, y, self.params, self.net, self.stim)
        assert dy.shape == (72,)
        assert np.all(np.isfinite(np.asarray(dy)))

        def loss(p):
            return jnp.sum(xor_drift(0.03, jnp.ones(72) * 0.1, p, self.net,
                                     self.stim) ** 2)

        g = jax.grad(loss)(self.params)
        assert np.all(np.isfinite(np.asarray(g["ff_w0"])))

    def test_diffusion_membrane_only(self):
        g = np.asarray(xor_diffusion(0.0, jnp.ones(72), self.params, self.net,
                                     self.stim))
        assert np.all(g[:24] == 10.0) and np.all(g[24:] == 0.0)


class TestColumnNetwork:
    def setup_method(self):
        self.params, self.net = build_column_network(
            CFG, jax.random.PRNGKey(2), columns_per_area=(8, 4, 1), n_inputs=4
        )

    def test_dimensions(self):
        assert self.net.num_pops == 104
        assert self.params["feedforward"].shape == (104, 104)
        assert self.params["input_weights"].shape == (104, 4)

    def test_block_structure(self):
        ff = np.asarray(self.params["feedforward"])
        # Only blocks (area1 <- area0) rows 64:96 cols 0:64 and
        # (area2 <- area1) rows 96:104 cols 64:96 may be nonzero.
        allowed = np.zeros((104, 104), dtype=bool)
        allowed[64:96, 0:64] = True
        allowed[96:104, 64:96] = True
        assert np.all(ff[~allowed] == 0.0)
        assert ff[allowed].max() > 0.0

        lat = np.asarray(self.params["lateral"])
        block_diag = np.zeros((104, 104), dtype=bool)
        block_diag[0:64, 0:64] = True
        block_diag[64:96, 64:96] = True
        block_diag[96:104, 96:104] = True
        assert np.all(lat[~block_diag] == 0.0)

        inner = np.asarray(self.net.inner_weights)
        col_diag = np.zeros((104, 104), dtype=bool)
        for c in range(13):
            col_diag[c * 8 : (c + 1) * 8, c * 8 : (c + 1) * 8] = True
        assert np.all(inner[~col_diag] == 0.0)

    def test_ff_fan_in(self):
        # Area1 (4 cols) from area0 (8 cols): fan-in keeps 2x2 diagonal
        # blocks -> target cols 0,1 see only source cols 0..3.
        ff = np.asarray(self.params["feedforward"])[64:96, 0:64]
        assert np.all(ff[0:16, 32:64] == 0.0)
        assert np.all(ff[16:32, 0:32] == 0.0)

    def test_output_weights(self):
        w = np.asarray(self.params["output_weights"])
        mask = np.asarray(self.net.output_mask).astype(bool)
        assert np.all(w[~mask] == 0.0)
        assert np.all(w[mask] > 0.0)
        # Reference squares the init (src/coupled_columns.py:684-685):
        # values ~ (1 +- 1e-3)^2 near 1 for L2/3e.
        assert abs(w[0] - 1.0) < 0.02

    def test_drift_and_diffusion(self):
        T = 40
        table = np.zeros((T, 4), dtype=np.float32)
        table[20:] = [15.0, 0.0, 15.0, 0.0]
        stim = Stimulus(0.0, 1e-3, jnp.asarray(table))
        y = jnp.zeros(312)
        dy = network_drift(0.03, y, self.params, self.net, stim)
        assert dy.shape == (312,)
        assert np.all(np.isfinite(np.asarray(dy)))
        g = np.asarray(network_diffusion(0.0, jnp.ones(312), self.params,
                                         self.net, stim))
        assert np.all(g == 10.0)  # actual-behavior quirk default


class TestHopfMLP:
    def test_init_statistics(self):
        params = build_hopf_mlp(jax.random.PRNGKey(0))
        assert [p["w"].shape for p in params] == [
            (100, 3), (100, 100), (100, 100), (2, 100)
        ]
        w = np.asarray(params[1]["w"])
        assert abs(w.std() - 0.1) < 0.01
        assert np.all(np.asarray(params[0]["b"]) == 0.0)

    def test_apply_batched(self):
        params = build_hopf_mlp(jax.random.PRNGKey(0))
        out = mlp_apply(params, jnp.ones((5, 3)))
        assert out.shape == (5, 2)


class TestWongWang:
    def test_decision_dynamics(self):
        # With muB > muA, pool B's rate must win during the stimulus phase.
        rates = wong_wang_three_phase(jax.random.PRNGKey(0), 18.0, 32.0)
        r = np.asarray(rates)
        assert r.shape == (3 * 5001, 2)
        assert np.all(np.isfinite(r))
        stim_end = 2 * 5001 - 10
        assert r[stim_end, 1] > r[stim_end, 0] + 5.0
        # Plausible firing-rate range (Hz)
        assert r.max() < 100.0 and r.min() >= 0.0

    def test_symmetric_input_symmetric_in_stable_regime(self):
        # Equal drives: the symmetric state is STABLE at rest but UNSTABLE
        # under stimulation (that instability IS the winner-take-all
        # mechanism), so exact symmetry is only testable pre-stimulus and
        # early in the stimulus phase.
        rates = wong_wang_three_phase(jax.random.PRNGKey(1), 25.0, 25.0)
        r = np.asarray(rates)
        np.testing.assert_allclose(
            r[:6000, 0], r[:6000, 1], rtol=1e-3, atol=1e-3
        )

    def test_matches_independent_numpy_loop(self):
        # Plain-Euler reference loop written independently in numpy.
        def numpy_sim(mu_a, mu_b, steps):
            W = np.array([[0.2609, -0.0497], [-0.0497, 0.2609]])
            s = np.ones(2) * 0.1
            i_noise = np.zeros(2)
            out = []
            dt = 1e-3
            for i in range(steps):
                i_ext = 5.2e-4 * np.array([mu_a, mu_b])
                i_rec = W @ s
                i_noise = i_noise + dt * (0.3255 - i_noise) / 0.002
                x = i_rec + i_ext + i_noise
                r = (270 * x - 108) / (1 - np.exp(-0.154 * (270 * x - 108)))
                s = s + dt * (-s / 0.1 + (1 - s) * 0.641 * r)
                out.append(r)
            return np.asarray(out)

        import columnflow.models.ww as ww
        got = np.asarray(
            ww.wong_wang_sim(
                jax.random.PRNGKey(0),
                jnp.asarray([[30.0, 10.0]]),
                600,
            )
        )
        want = numpy_sim(30.0, 10.0, 600)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_random_fan_in_network_builds_and_runs():
    """The reference's randomized fan-in variant (src/coupled_columns.py:
    529-575): every target column must receive the required source count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from columnflow.config import ColumnConfig
    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus, build_column_network, network_drift

    cfg = ColumnConfig.load()
    params, net = build_column_network(
        cfg, jax.random.PRNGKey(0), columns_per_area=(4, 2, 1), n_inputs=2,
        random_fan_in=True,
    )
    # Input fan-in: each first-area column receives >= min(2, n_inputs)
    # distinct input units (reference step 2 fills to 2).
    im = np.asarray(net.input_mask)[: 4 * 8]
    per_col = (im.reshape(4, 8, 2).sum(axis=1) > 0).sum(axis=1)
    assert (per_col >= 2).all(), per_col

    # Feedforward masks stay FIXED fan-in even under --random-fan-in:
    # the reference only ever enables the random variant for the input
    # mask (src/coupled_columns.py:597; the ff random call at :627 is
    # commented out). Fixed (2,2) fan-in gives each target column exactly
    # 2 distinct source columns here.
    ff = np.asarray(net.feedforward_mask)
    offs = [0, 32, 48, 56]  # pops offsets for (4, 2, 1) areas
    for a, (n_prev, n_tgt) in enumerate([(4, 2), (2, 1)]):
        blk = ff[offs[a + 1]:offs[a + 2], offs[a]:offs[a + 1]]
        got = (blk.reshape(n_tgt, 8, n_prev, 8).sum(axis=(1, 3)) > 0).sum(1)
        assert (got == 2).all(), (a, got)

    table = parity_stim_table(jnp.asarray([15.0, 0.0]), 50)
    dy = network_drift(0.01, jnp.zeros(3 * net.num_pops), params, net,
                       Stimulus(0.0, 1e-3, table))
    assert bool(jnp.all(jnp.isfinite(dy)))


def test_random_fan_in_rng_regimes():
    """Round-4 RNG unification: fan-in mask draws ride the counter-based
    jax.random contract by default; ``legacy_host_rng=True`` reinstates the
    pre-round-4 host-numpy draws (models/network.py). Both regimes are
    per-seed deterministic and satisfy the fan-in structure; the legacy
    flag reproduces the old regime's exact masks."""
    import jax
    import numpy as np

    from columnflow.config import ColumnConfig
    from columnflow.models import build_column_network
    from columnflow.models.network import make_mask_fan_in_random

    cfg = ColumnConfig.load()
    kw = dict(columns_per_area=(4, 2, 1), n_inputs=2, random_fan_in=True)
    _, a1 = build_column_network(cfg, jax.random.PRNGKey(5), **kw)
    _, a2 = build_column_network(cfg, jax.random.PRNGKey(5), **kw)
    np.testing.assert_array_equal(np.asarray(a1.input_mask),
                                  np.asarray(a2.input_mask))

    _, l1 = build_column_network(cfg, jax.random.PRNGKey(5),
                                 legacy_host_rng=True, **kw)
    _, l2 = build_column_network(cfg, jax.random.PRNGKey(5),
                                 legacy_host_rng=True, **kw)
    np.testing.assert_array_equal(np.asarray(l1.input_mask),
                                  np.asarray(l2.input_mask))

    # The legacy path IS the old algorithm: host Generator seeded from the
    # key exactly as pre-round-4 builds did.
    key = jax.random.PRNGKey(5)
    key, *_ = jax.random.split(key, 5)
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))
    base = np.tile(np.asarray(cfg.connection_masks["input"]), (4, 2))
    want = make_mask_fan_in_random(base, rng, source_is_input=True)
    np.testing.assert_array_equal(np.asarray(l1.input_mask)[:32], want)

    # Both regimes: every first-area column receives >= 2 input units.
    for net in (a1, l1):
        im = np.asarray(net.input_mask)[: 4 * 8]
        per_col = (im.reshape(4, 8, 2).sum(axis=1) > 0).sum(axis=1)
        assert (per_col >= 2).all(), per_col


def test_all_toml_areas_build():
    """Every cortical area in config/model.toml (v1..fst) must build a
    valid ColumnArea parameter set (reference supports the same set,
    config/model.toml [population_size])."""
    import numpy as np

    from columnflow.config import ColumnConfig
    from columnflow.models import build_area_params

    cfg = ColumnConfig.load()
    for area in cfg.population_sizes:
        ap = build_area_params(cfg, area, 2, small_network=True)
        assert np.isfinite(ap.recurrent_weights).all(), area
        assert ap.recurrent_weights.shape == (16, 16), area
        assert (ap.population_sizes > 0).all(), area


def test_stochastic_network_integration():
    """The reference's commented-in stochastic option for the hierarchical
    network (scripts/parity_ode.py:234): sdeint and sdeint_adaptive both
    integrate network drift+diffusion."""
    import jax
    import jax.numpy as jnp

    from columnflow.config import ColumnConfig
    from columnflow.data import parity_stim_table
    from columnflow.models import Stimulus, build_column_network
    from columnflow.models.network import network_diffusion, network_drift
    from columnflow.solvers import sdeint, sdeint_adaptive

    cfg = ColumnConfig.load()
    params, net = build_column_network(
        cfg, jax.random.PRNGKey(0), columns_per_area=(2, 1), n_inputs=2
    )
    S = 3 * net.num_pops
    T = 80
    ts = jnp.linspace(0.0, 0.08, T)
    table = parity_stim_table(jnp.asarray([15.0, 0.0]), T)
    stim = Stimulus(0.0, 1e-3, table)

    drift = lambda t, y: network_drift(t, y, params, net, stim)
    diff = lambda t, y: network_diffusion(t, y, params, net, stim)

    ys = sdeint(drift, diff, jnp.zeros(S), ts, jax.random.PRNGKey(1),
                method="srk", noise="scalar", additive=True)
    assert bool(jnp.all(jnp.isfinite(ys))) and ys.shape == (T, S)

    ys_a = sdeint_adaptive(drift, diff, jnp.zeros(S), ts,
                           jax.random.PRNGKey(2), method="milstein")
    assert bool(jnp.all(jnp.isfinite(ys_a))) and ys_a.shape == (T, S)


def test_weight_construction_matches_reference_exactly():
    """Golden check against the REFERENCE IMPLEMENTATION ITSELF: import the
    reference's ColumnArea (plain torch/numpy, no solver deps) and compare
    every constructed weight array bit-for-bit-ish. Skipped when the
    reference checkout is not present (the framework is standalone)."""
    import os

    import pytest

    ref_root = "/root/reference"
    if not os.path.exists(os.path.join(ref_root, "src", "coupled_columns.py")):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")

    import importlib.util
    import sys
    import tomllib

    import numpy as np

    sys.path.insert(0, ref_root)  # the reference imports `src.utils`
    spec = importlib.util.spec_from_file_location(
        "ref_cc", os.path.join(ref_root, "src", "coupled_columns.py")
    )
    ref_cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_cc)
    with open(os.path.join(ref_root, "config", "model.toml"), "rb") as f:
        ref_params = tomllib.load(f)

    from columnflow.config import ColumnConfig
    from columnflow.models import build_area_params

    cfg = ColumnConfig.load()
    for num_columns, small in [(2, True), (1, True), (3, False)]:
        ref = ref_cc.ColumnArea(ref_params, "mt", num_columns,
                                small_network=small)
        ours = build_area_params(cfg, "mt", num_columns, small_network=small)
        np.testing.assert_allclose(
            np.asarray(ours.recurrent_weights),
            ref.recurrent_weights.detach().numpy(), rtol=1e-4,
            err_msg=f"recurrent ({num_columns}, small={small})",
        )
        np.testing.assert_allclose(
            np.asarray(ours.background_current),
            (ref.background_weights * ref.background_drive).numpy(),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours.feedforward_weights),
            ref.feedforward_weights.numpy(), rtol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(ours.internal_mask),
                                   ref.internal_mask.numpy())
        assert float(ours.resistance) == pytest.approx(
            float(ref.resistance), rel=1e-6
        )
