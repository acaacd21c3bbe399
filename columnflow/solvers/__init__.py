"""columnflow.solvers — the TPU-native ODE/SDE solver engine.

This package replaces everything the reference delegated to torchdiffeq and
torchsde (reference: imports at scripts/wta_ode.py:9-10, scripts/xor_ode.py:2-3,
scripts/parity_ode.py:10-11, scripts/bifurcation_ode.py:12):

- ``odeint``: fixed-step (euler/midpoint/heun/rk4 over ``lax.scan``) and
  adaptive Dormand-Prince 4(5) with PI step control and 4th-order dense output
  (over ``lax.while_loop``), with torchdiffeq's default tolerance semantics
  (rtol=1e-7, atol=1e-9, outputs by interpolation of accepted steps).
- gradients: discrete backprop through the step sequence ("replay", default,
  matching the reference's backprop-through-solver), continuous adjoint
  ("backsolve", O(1) memory) as ``jax.custom_vjp``.
- ``sdeint``: Euler-Maruyama, Milstein (jvp or ``grad_free=True``
  derivative-free), and strong order 1.5 stochastic Runge-Kutta (SRA1
  additive / SRIW1 general) for Ito SDEs, plus the Stratonovich method
  surface (euler_heun/heun/midpoint/milstein/log_ode) behind
  ``sde_type="stratonovich"``, with scalar, diagonal, or general
  (matrix-against-m-channels) noise, counter-based Brownian increments from
  ``jax.random``, Davie-approximation Levy areas (``solvers.levy``: the
  log-ODE scheme's strong-1.0 general-noise driver, with Chen-relation
  coarsening), and a virtual Brownian tree for adaptive stepping.
- ``sdeint_adjoint``: stochastic-adjoint gradients (torchsde's flagship
  capability, Li et al. 2020) — the backward pass re-integrates state +
  adjoint in reverse on the SAME Brownian path, regenerated from the
  counter-based key instead of torchsde's C++ Brownian-interval cache.
  ``adaptive=True`` composes it with the adaptive controller: the adjoint
  runs backward over the frozen accepted grid at O(|state| + |outputs|)
  memory (``sdeint_adjoint_adaptive``); ``sdeint_reversible_adaptive`` is
  the exact-gradient (algebraic-reversal) alternative on the same grid.
- the frozen accepted-step grid is a public object: ``sde_select_grid``
  -> ``FrozenGrid`` -> ``sdeint_replay`` compose bit-exactly to
  ``sdeint_adaptive(differentiable=True)``.
- Levy areas at torchsde's three approximation levels ("space-time",
  "davie", "foster") on ``levy_pack``/``BrownianInterval``/``log_ode``.
- ``sdeint_logqp``: the Girsanov KL path against a prior drift (torchsde's
  ``logqp=True``, the latent-SDE training signal) by state augmentation —
  rides every method, noise kind, and gradient path.
"""

from columnflow.solvers.api import odeint
from columnflow.solvers.event import odeint_event
from columnflow.solvers.sde import sdeint
from columnflow.solvers.sde_adjoint import (sdeint_adjoint,
                                            sdeint_adjoint_adaptive)
from columnflow.solvers.sde_logqp import sdeint_logqp
from columnflow.solvers.sde_reversible import (sdeint_reversible,
                                               sdeint_reversible_adaptive)
from columnflow.solvers.sde_adaptive import (FrozenGrid,
                                             sde_select_grid,
                                             sdeint_adaptive,
                                             sdeint_adaptive_batch,
                                             sdeint_replay)
from columnflow.solvers.brownian import (
    BrownianInterval,
    VirtualBrownianTree,
    brownian_path,
)
from columnflow.solvers.dopri import SolverStats, odeint_stats
from columnflow.solvers.fused import odeint_dopri5_fused, sdeint_fused
from columnflow.solvers.levy import chen_combine, levy_pack

__all__ = [
    "chen_combine",
    "levy_pack",
    "odeint",
    "odeint_event",
    "odeint_dopri5_fused",
    "sdeint",
    "sdeint_adjoint",
    "sdeint_adjoint_adaptive",
    "sdeint_logqp",
    "sdeint_reversible",
    "sdeint_reversible_adaptive",
    "sdeint_fused",
    "FrozenGrid",
    "sde_select_grid",
    "sdeint_adaptive",
    "sdeint_adaptive_batch",
    "sdeint_replay",
    "BrownianInterval",
    "VirtualBrownianTree",
    "brownian_path",
    "SolverStats",
    "odeint_stats",
]
