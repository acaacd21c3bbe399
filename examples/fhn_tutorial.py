"""The docs/TUTORIAL.md worked example as one runnable script.

Defines a NEW model on the framework (FitzHugh-Nagumo neuron driven by a
current pulse) and takes it through the full pipeline the built-in tasks
use: solve -> verify solver stats -> train through the solver ->
stochastic variant -> checkpoint round-trip. Asserts the measured
outcomes quoted in the tutorial so the doc cannot rot
(tests/test_examples.py runs this end-to-end in the slow tier).

Usage:
    python examples/fhn_tutorial.py          # default device (TPU if present)
    python examples/fhn_tutorial.py --cpu    # force the CPU platform
"""

import math
import sys

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from columnflow.models import Stimulus
from columnflow.ops import interp_at
from columnflow.solvers import odeint, odeint_stats, sdeint
from columnflow.train import adam, load_checkpoint, save_checkpoint


# --- 1. model: a pure drift over a parameter pytree (TUTORIAL.md section 1)
def fhn_drift(t, y, params, stim):
    v, w = y[..., 0], y[..., 1]
    i_ext = params["gain"] * interp_at(t, stim.t0, stim.dt, stim.table)
    dv = v - v**3 / 3 - w + i_ext
    dw = params["tau_inv"] * (v + params["a"] - params["b"] * w)
    return jnp.stack([dv, dw], axis=-1)


def main(checkpoint_path="fhn.npz"):
    ts = jnp.linspace(0.0, 40.0, 400)
    table = jnp.where((ts > 5.0) & (ts < 30.0), 0.8, 0.0)  # current pulse
    stim = Stimulus(0.0, float(ts[1] - ts[0]), table)
    true_params = {"gain": 1.0, "a": 0.7, "b": 0.8, "tau_inv": 1.0 / 12.5}
    y0 = jnp.array([-1.0, 1.0])

    # --- 2. solve + solver observability (section 2)
    target = odeint(fhn_drift, y0, ts, true_params, stim)
    st = odeint_stats(fhn_drift, y0, ts, true_params, stim)
    assert bool(st.success), "max_steps exhausted"
    print(f"target {target.shape}, naccept {int(st.naccept)}")

    # --- 3. train through the solver: recover gain/a (section 3)
    init = {"gain": 0.4, "a": 0.3, "b": 0.8, "tau_inv": 1.0 / 12.5}
    opt = adam(5e-2)

    def loss_fn(params):
        ys = odeint(fhn_drift, y0, ts, params, stim)
        return jnp.mean((ys - target) ** 2)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    params, opt_state = init, opt.init(init)
    for _ in range(150):
        params, opt_state, loss = train_step(params, opt_state)
    loss, gain, a = float(loss), float(params["gain"]), float(params["a"])
    print(f"loss {loss:.2e}, gain {gain:.3f} (true 1.0), a {a:.3f} (true 0.7)")
    assert loss < 1e-3 and abs(gain - 1.0) < 0.05

    # --- 4. stochastic variant + vmapped noise realizations (section 4)
    def fhn_diffusion(t, y):
        return 0.05 * jnp.ones_like(y)

    finals = jax.vmap(lambda k: sdeint(
        lambda t, y: fhn_drift(t, y, params, stim), fhn_diffusion,
        y0, ts, k, method="srk", noise="diagonal", additive=True)[-1])(
        jax.random.split(jax.random.PRNGKey(0), 32))
    assert finals.shape == (32, 2) and bool(jnp.all(jnp.isfinite(finals)))
    print(f"stochastic finals mean {float(finals.mean()):.3f}")

    # --- 5. checkpoint round-trip (section 5)
    save_checkpoint(checkpoint_path, params=params, opt_state=opt_state,
                    step=150)
    ck = load_checkpoint(checkpoint_path, params_like=params,
                         opt_state_like=opt_state)
    assert math.isclose(float(ck["params"]["gain"]), gain, rel_tol=0.0,
                        abs_tol=0.0)
    print(f"checkpoint ok, step {ck['step']}")
    print("TUTORIAL EXAMPLE OK")


if __name__ == "__main__":
    main()
