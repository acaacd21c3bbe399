"""Test configuration: force an 8-device virtual CPU platform (default),
or — with ``COLUMNFLOW_TPU_TESTS=1`` — leave the real TPU backend active
for the compiled-kernel tier (``-m tpu``, tests/test_tpu_compiled.py).

The default tier never needs a real TPU; sharding tests use a virtual
8-device CPU mesh (the same mechanism the driver uses for the multi-chip
dry-run), and Pallas kernels run in interpret mode. The TPU tier compiles
every Pallas kernel through Mosaic on the bench chip so a lowering
regression (new JAX pin, new workaround needed) fails CI-style instead of
only surfacing as a bench crash:

    COLUMNFLOW_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Note: this machine's sitecustomize registers a TPU PJRT plugin and
overrides JAX_PLATFORMS in-process, so the env var alone is not enough —
we must also update jax.config before any backend initializes (they
initialize lazily on first device use, which is after conftest import).
"""

import os

import pytest

TPU_TIER = os.environ.get("COLUMNFLOW_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-TPU kernel tier (needs a real TPU and "
        "COLUMNFLOW_TPU_TESTS=1; auto-skipped otherwise)",
    )
    # In TPU mode the rest of the suite assumes the 8-device CPU platform;
    # restrict collection to the tpu tier unless the caller said otherwise.
    if TPU_TIER and not config.option.markexpr:
        config.option.markexpr = "tpu"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state after each test module.

    A full-suite run performs thousands of XLA CPU compilations in one
    process; with all executables retained, the compiler eventually
    segfaults deep into the run (observed at ~75% in
    jax compiler.backend_compile_and_load — process-history-dependent:
    every module passes in isolation). Dropping the in-memory caches at
    module teardown keeps the compiler healthy; cross-module cache hits
    are rare, so the runtime cost is noise.
    """
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if TPU_TIER and jax.default_backend() != "cpu":
        return
    reason = (
        "TPU-compiled tier: run COLUMNFLOW_TPU_TESTS=1 python -m pytest "
        "tests/ -m tpu on a TPU host"
        if not TPU_TIER
        else "COLUMNFLOW_TPU_TESTS=1 set but no TPU backend is available"
    )
    skip = pytest.mark.skip(reason=reason)
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
