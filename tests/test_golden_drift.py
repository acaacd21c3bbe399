"""Golden drift/diffusion parity vs the reference's OWN torch classes.

Imports ``ColumnAreaWTA`` / ``ColumnNetworkXOR`` / ``ColumnNetwork`` from the
read-only reference checkout, overwrites their weight tensors with the
columnflow-built parameter values (weight *construction* parity is covered
separately by tests/test_models.py::test_weight_construction_matches_reference_exactly),
points both sides at the same stimulus table, and asserts drift + diffusion
agree at >=100 random (t, state) points per model.

This is the round-1 VERDICT's highest-leverage missing artifact: a subtle
porting error in XOR's summed-source x10 feedforward
(src/coupled_columns.py:390-395), the input-mask row swap (:595-596), or
ColumnNetwork's per-area current assembly (:717-751) would be caught here.

Reference drift/diffusion: src/coupled_columns.py:204-249 (WTA),
:407-454 (XOR), :753-800 (ColumnNetwork).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from columnflow.config import ColumnConfig
from columnflow.models import (
    Stimulus,
    build_column_network,
    build_wta,
    build_xor_network,
    network_diffusion,
    network_drift,
    wta_diffusion,
    wta_drift,
    xor_diffusion,
    xor_drift,
)

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "src", "coupled_columns.py")),
    reason="reference checkout not available",
)

CFG = ColumnConfig.load()
N_POINTS = 120


@pytest.fixture(scope="module")
def ref_cc():
    import importlib.util
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)  # the reference imports `src.utils`
    spec = importlib.util.spec_from_file_location(
        "ref_cc_drift", os.path.join(REF_ROOT, "src", "coupled_columns.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_toml():
    import tomllib

    with open(os.path.join(REF_ROOT, "config", "model.toml"), "rb") as f:
        return tomllib.load(f)


def _tt(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _random_states(rng, n, num_pops):
    """Plausible (t-agnostic) random states: membrane +-~25 mV around rest,
    small adaptation, nonnegative low-pass rates."""
    v = rng.normal(0.0, 25.0, (n, num_pops))
    a = rng.normal(0.0, 5.0, (n, num_pops))
    r = np.abs(rng.normal(0.0, 30.0, (n, num_pops)))
    return np.concatenate([v, a, r], axis=1).astype(np.float32)


def _assert_drift_close(ours, ref, label):
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(ours - ref).max()) / scale
    assert err <= 1e-5, f"{label}: rel-err {err:.3g} > 1e-5"


def _stim_grid(T, dt):
    """Uniform grid + the reference-style time_vec for torch_interp."""
    time_vec = torch.linspace(0.0, (T - 1) * dt, T)
    return time_vec


class TestWTADriftGolden:
    """WTA drift vs ColumnAreaWTA.forward (src/coupled_columns.py:204-237)."""

    @pytest.fixture(scope="class")
    def setup(self, ref_cc, ref_toml):
        params, area = build_wta(CFG, jax.random.PRNGKey(0))
        T, dt = 90, 1e-3
        rng = np.random.default_rng(42)
        table = rng.uniform(0.0, 20.0, (T, 16)).astype(np.float32)
        stim = Stimulus(0.0, dt, jnp.asarray(table))

        torch.manual_seed(0)
        ref = ref_cc.ColumnAreaWTA(ref_toml, "mt")
        # Same weights in -> same drift out (construction parity is a
        # separate golden test).
        ref.recurrent_weights.data = _tt(params["recurrent_weights"])
        ref.set_time_vec(_stim_grid(T, dt))
        ref.set_stim(_tt(table))
        return params, area, stim, ref, T, dt

    def test_drift_parity(self, setup):
        params, area, stim, ref, T, dt = setup
        rng = np.random.default_rng(1)
        ys = _random_states(rng, N_POINTS, 16)
        ts = rng.uniform(-0.005, T * dt * 1.05, N_POINTS).astype(np.float32)

        ours = np.asarray(
            jax.vmap(lambda t, y: wta_drift(t, y, params, area, stim))(
                jnp.asarray(ts), jnp.asarray(ys)
            )
        )
        with torch.no_grad():
            want = np.stack(
                [
                    ref.forward(torch.tensor(float(t)), _tt(y)[None])
                    .squeeze(0)
                    .numpy()
                    for t, y in zip(ts, ys)
                ]
            )
        _assert_drift_close(ours, want, "wta_drift")

    def test_diffusion_parity(self, setup):
        params, area, stim, ref, T, dt = setup
        y = np.random.default_rng(2).normal(size=(1, 48)).astype(np.float32)
        with torch.no_grad():
            want = ref.diffusion(torch.tensor(0.01), _tt(y)).squeeze(-1).numpy()
        ours = np.asarray(
            wta_diffusion(0.01, jnp.asarray(y[0]), params, area, stim)
        )
        np.testing.assert_allclose(ours, want[0], rtol=0, atol=0)


class TestXORDriftGolden:
    """XOR drift vs ColumnNetworkXOR.forward (src/coupled_columns.py:407-442):
    covers the per-source ff vectors, the summed-L2/3e x10 source rate, and
    the two-area current assembly."""

    @pytest.fixture(scope="class")
    def setup(self, ref_cc, ref_toml):
        params, net = build_xor_network(CFG, jax.random.PRNGKey(1))
        T, dt = 70, 1e-3
        rng = np.random.default_rng(43)
        table = rng.uniform(0.0, 20.0, (T, 2, 16)).astype(np.float32)
        stim = Stimulus(0.0, dt, jnp.asarray(table))

        torch.manual_seed(0)
        ref = ref_cc.ColumnNetworkXOR(
            ref_toml,
            {
                "nr_areas": 2,
                "areas": ["mt", "mt"],
                "nr_columns_per_area": [2, 1],
                "nr_input_units": 2,
            },
        )
        for i in range(2):
            ref.feedforward_target_weights["0"][i].data = _tt(
                params["ff_w0"][i]
            )
            ref.feedforward_target_weights["1"][i].data = _tt(
                params["ff_w1"][i]
            )
        # Anatomy arrays: same weights in on both sides.
        ref.areas["0"].recurrent_weights = _tt(net.area0.recurrent_weights)
        ref.areas["1"].recurrent_weights = _tt(net.area1.recurrent_weights)
        ref.set_time_vec(_stim_grid(T, dt))
        ref.set_stim(_tt(table))
        return params, net, stim, ref, T, dt

    def test_drift_parity(self, setup):
        params, net, stim, ref, T, dt = setup
        rng = np.random.default_rng(3)
        ys = _random_states(rng, N_POINTS, 24)
        ts = rng.uniform(-0.005, T * dt * 1.05, N_POINTS).astype(np.float32)

        ours = np.asarray(
            jax.vmap(lambda t, y: xor_drift(t, y, params, net, stim))(
                jnp.asarray(ts), jnp.asarray(ys)
            )
        )
        with torch.no_grad():
            want = np.stack(
                [
                    ref.forward(torch.tensor(float(t)), _tt(y)[None])
                    .squeeze(0)
                    .numpy()
                    for t, y in zip(ts, ys)
                ]
            )
        _assert_drift_close(ours, want, "xor_drift")

    def test_diffusion_parity(self, setup):
        params, net, stim, ref, T, dt = setup
        y = np.random.default_rng(4).normal(size=(1, 72)).astype(np.float32)
        with torch.no_grad():
            want = ref.diffusion(torch.tensor(0.0), _tt(y)).squeeze(-1).numpy()
        ours = np.asarray(
            xor_diffusion(0.0, jnp.asarray(y[0]), params, net, stim)
        )
        np.testing.assert_allclose(ours, want[0], rtol=0, atol=0)


class _NetworkGoldenBase:
    """Shared harness for ColumnNetwork topologies
    (src/coupled_columns.py:753-788)."""

    columns_per_area = (8, 4, 1)
    n_inputs = 4
    random_fan_in = False
    seed = 2

    @pytest.fixture(scope="class")
    def setup(self, ref_cc, ref_toml):
        params, net = build_column_network(
            CFG,
            jax.random.PRNGKey(self.seed),
            areas=("mt",) * len(self.columns_per_area),
            columns_per_area=self.columns_per_area,
            n_inputs=self.n_inputs,
            random_fan_in=self.random_fan_in,
        )
        T, dt = 60, 1e-3
        rng = np.random.default_rng(44 + self.seed)
        table = rng.uniform(0.0, 15.0, (T, self.n_inputs)).astype(np.float32)
        stim = Stimulus(0.0, dt, jnp.asarray(table))

        torch.manual_seed(0)
        ref = ref_cc.ColumnNetwork(
            ref_toml,
            {
                "nr_areas": len(self.columns_per_area),
                "areas": ["mt"] * len(self.columns_per_area),
                "nr_columns_per_area": list(self.columns_per_area),
                "nr_input_units": self.n_inputs,
            },
            "cpu",
        )
        # Map the block-embedded full-size matrices back onto the
        # reference's per-area tensors (the embedding at build time is the
        # TPU-first design choice; this test proves it preserves semantics).
        offs = np.concatenate(
            [[0], np.cumsum([8 * c for c in self.columns_per_area])]
        )
        inner = np.asarray(net.inner_weights)
        lat = np.asarray(params["lateral"])
        ff = np.asarray(params["feedforward"])
        for k in range(len(self.columns_per_area)):
            sl = slice(int(offs[k]), int(offs[k + 1]))
            ref.areas[str(k)].inner_weights = _tt(inner[sl, sl])
            ref.areas[str(k)].lateral_weights.data = _tt(lat[sl, sl])
            if k > 0:
                prev = slice(int(offs[k - 1]), int(offs[k]))
                ref.areas[str(k)].feedforward_weights.data = _tt(ff[sl, prev])
        P0 = 8 * self.columns_per_area[0]
        ref.areas["0"].input_weights.data = _tt(
            np.asarray(params["input_weights"])[:P0]
        )
        ref.set_time_vec(_stim_grid(T, dt))
        ref.set_stim(_tt(table))
        return params, net, stim, ref, T, dt

    def test_drift_parity(self, setup):
        params, net, stim, ref, T, dt = setup
        rng = np.random.default_rng(5 + self.seed)
        ys = _random_states(rng, N_POINTS, net.num_pops)
        ts = rng.uniform(-0.005, T * dt * 1.05, N_POINTS).astype(np.float32)

        ours = np.asarray(
            jax.vmap(lambda t, y: network_drift(t, y, params, net, stim))(
                jnp.asarray(ts), jnp.asarray(ys)
            )
        )
        with torch.no_grad():
            want = np.stack(
                [
                    ref.forward(torch.tensor(float(t)), _tt(y)[None])
                    .squeeze(0)
                    .numpy()
                    for t, y in zip(ts, ys)
                ]
            )
        _assert_drift_close(ours, want, f"network_drift{self.columns_per_area}")

    def test_diffusion_parity(self, setup):
        params, net, stim, ref, T, dt = setup
        S = 3 * net.num_pops
        y = np.random.default_rng(6).normal(size=(1, S)).astype(np.float32)
        with torch.no_grad():
            want = ref.diffusion(torch.tensor(0.0), _tt(y)).squeeze(-1).numpy()
        ours = np.asarray(
            network_diffusion(0.0, jnp.asarray(y[0]), params, net, stim)
        )
        np.testing.assert_allclose(ours, want[0], rtol=0, atol=0)


class TestParityNetworkDriftGolden(_NetworkGoldenBase):
    """The parity-task topology ([8,4,1], 4 inputs, fixed fan-in)."""


class TestParityNetworkRandomFanInGolden(_NetworkGoldenBase):
    """Random fan-in variant (src/coupled_columns.py:529-575): mask structure
    differs per RNG regime, but with our weights copied across, the drift
    equations must still agree exactly."""

    random_fan_in = True
    seed = 7


class TestAltNetworkDriftGolden(_NetworkGoldenBase):
    """A second topology ([8,2,1], 2 inputs) so the block-offset arithmetic
    is exercised at a different shape. (First areas need >= 6 columns: the
    reference's hardcoded input-mask row swap indexes rows 32:48 and crashes
    below that, src/coupled_columns.py:595-596.)"""

    columns_per_area = (8, 2, 1)
    n_inputs = 2
    seed = 11
