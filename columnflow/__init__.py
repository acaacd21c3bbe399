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
# Advisor-hardened (rounds 4-5): the pin no longer OVERRIDES a host
# application's explicit opt-out, but it DOES still pin True when False
# merely reflects an old JAX library default (the round-4 guard could not
# tell the two apart and silently changed old-JAX paths for the same
# seed). Explicit opt-out is detected as: the JAX_THREEFRY_PARTITIONABLE
# env var being present, or running a JAX release (>= 0.4.30) whose
# library default is already True — there False can only come from a
# host-side jax.config.update. In the explicit case we respect it and
# warn once that columnflow's path-reproducibility contract (same key ->
# same Brownian path across releases) does not hold in that regime.
# Documented in README.md / docs/MIGRATING.md.
import jax as _jax

if not _jax.config.jax_threefry_partitionable:
    import os as _os

    def _ver(v):
        # LEADING digit run only: "3rc1" must parse as 3, not 31 — else a
        # prerelease like 0.4.3rc1 reads as (0, 4, 31) and skips the pin.
        parts = []
        for tok in v.split(".")[:3]:
            num = ""
            for ch in tok:
                if not ch.isdigit():
                    break
                num += ch
            parts.append(int(num) if num else 0)
        return tuple(parts)

    _explicit = ("JAX_THREEFRY_PARTITIONABLE" in _os.environ
                 or _ver(_jax.__version__) >= (0, 4, 30))
    if _explicit:
        import warnings as _warnings

        _warnings.warn(
            "columnflow: jax_threefry_partitionable is False (legacy "
            "key-derivation regime, explicitly selected by the host "
            "application). columnflow's Brownian paths are reproducible "
            "only under the partitionable regime; set "
            "jax.config.update('jax_threefry_partitionable', True) for "
            "the supported contract.",
            stacklevel=2,
        )
        del _warnings
    else:
        # Old-JAX library default, no host opt-out: pin the supported
        # regime so the same seed produces the same Brownian paths as on
        # modern JAX.
        _jax.config.update("jax_threefry_partitionable", True)
    del _os, _explicit, _ver
del _jax

from columnflow.config import load_config, ColumnConfig

__all__ = ["load_config", "ColumnConfig", "__version__"]
