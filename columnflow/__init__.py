"""columnflow — a TPU-native neural ODE/SDE framework for cortical column networks.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
project ccnmaastricht/ODE-Column: a neural ODE/SDE solver engine (replacing
torchdiffeq/torchsde), laminar cortical-column model families, end-to-end
jit-compiled training for the four reference tasks (Hopf bifurcation,
winner-take-all, XOR, 4-bit parity), and an analysis suite.

Layering (see SURVEY.md section 7):
    config   -> typed TOML loading (reference: src/utils.py:5-10)
    ops      -> transfer function, interpolation, losses (src/utils.py:13-88)
    solvers  -> odeint/sdeint engines (replacing torchdiffeq/torchsde)
    models   -> column physics as pure functions over parameter pytrees
    kernels  -> fused Pallas step kernels with XLA fallback
    train    -> optax optimizers, gradient masks, clamps, checkpointing
    parallel -> device-mesh sharding (DP over batch x noise realizations)
    data     -> Wong-Wang / Hopf / stimulus dataset builders
    tasks    -> the four runnable reference workloads
    analysis -> post-hoc statistics and figures
"""

__version__ = "0.1.0"

# Pin the PRNG key-derivation regime at the package boundary: every Brownian
# path (solvers/brownian.py VirtualBrownianTree, solvers/krng.py — whose
# bit-identity-to-jax.random claim is proven under this flag) is a pure
# function of (key, location) ONLY within one threefry partitioning regime.
# JAX has flipped this default across releases; without the pin, tests
# (tests/conftest.py sets it) and production runs (bench.py, task CLIs) could
# generate different paths for the same key. tests/test_brownian.py pins that
# this production default matches the test regime.
#
# Advisor-hardened (round 4): the pin no longer OVERRIDES a host
# application's explicit opt-out. On modern JAX the library default is
# already True, so this is a no-op there; if the embedding program (env var
# JAX_THREEFRY_PARTITIONABLE=0 or jax.config.update before importing
# columnflow) selected the legacy regime, we respect it and warn once that
# columnflow's path-reproducibility contract (same key -> same Brownian
# path across releases) does not hold in that regime. Documented in
# README.md / docs/MIGRATING.md.
import jax as _jax

if _jax.config.jax_threefry_partitionable:
    pass  # library default on modern JAX — nothing to mutate
else:
    import warnings as _warnings

    _warnings.warn(
        "columnflow: jax_threefry_partitionable is False (legacy "
        "key-derivation regime, set by the host application or an old JAX "
        "default). columnflow's Brownian paths are reproducible only under "
        "the partitionable regime; set "
        "jax.config.update('jax_threefry_partitionable', True) for the "
        "supported contract.",
        stacklevel=2,
    )
    del _warnings
del _jax

from columnflow.config import load_config, ColumnConfig

__all__ = ["load_config", "ColumnConfig", "__version__"]
