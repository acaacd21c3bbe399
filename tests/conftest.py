"""Test configuration: force an 8-device virtual CPU platform.

Tests never need a real TPU; sharding tests use a virtual 8-device CPU mesh
(the same mechanism the driver uses for the multi-chip dry-run).

Note: this machine's sitecustomize registers a TPU PJRT plugin and overrides
JAX_PLATFORMS in-process, so the env var alone is not enough — we must also
update jax.config before any backend initializes (they initialize lazily on
first device use, which is after conftest import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
