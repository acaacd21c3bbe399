"""Runnable task workloads reproducing the reference's four experiments:

- wta: stochastic winner-take-all, trainable lateral inhibition
  (reference: scripts/wta_ode.py)
- xor: XOR classification via feedforward weights (scripts/xor_ode.py)
- parity: 4-bit parity on a 3-area hierarchy (scripts/parity_ode.py)
- bifurcation: Hopf-spiral neural ODE regression (scripts/bifurcation_ode.py)
- wta_sweep: psychometric sweep over (coherence x 100+ noise realizations)
  (BASELINE.json config 5; no reference equivalent — it runs one SDE at
  a time)

Each module exposes ``train_*`` (pure-ish: returns params + history) and a
CLI (``python -m columnflow.tasks.<name> [--smoke]``).
"""
