"""Figure rendering for analysis experiments and training visualization.

Covers the reference's visual outputs: coherence rainbow panels
(scripts/plotting_results.py:142-208), WTA/XOR time courses (:469-647),
dominance histograms and dominance/alternation heatmaps (:429-466), and the
per-iteration training figures (scripts/wta_ode.py:17-54,
scripts/xor_ode.py:15-50, scripts/parity_ode.py:18-114,
scripts/bifurcation_ode.py:23-64). Matplotlib is imported lazily with the
Agg backend so nothing here requires a display.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _save(fig, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    _plt().close(fig)
    return path


def plot_coherence_sweep(fr_results, coherences, path):
    """2x2 layer panels, one line pair per coherence (reference :142-208)."""
    plt = _plt()
    fr = np.asarray(fr_results)
    fig, axes = plt.subplots(2, 2, figsize=(9, 6))
    cmap = plt.get_cmap("rainbow", len(coherences))
    layers = ["Layer 2/3", "Layer 4", "Layer 5", "Layer 6"]
    order = [(0, 0), (1, 0), (0, 1), (1, 1)]
    for l_idx, pos in enumerate(order):
        ax = axes[pos]
        for c_idx in range(len(coherences)):
            color = cmap(c_idx)
            ax.plot(fr[l_idx, c_idx, :, 1], "--", color=color, lw=0.8)
            ax.plot(fr[l_idx, c_idx, :, 0], color=color, lw=0.8)
        ax.set_title(layers[l_idx])
        ax.axvline(x=100, color="gray", linestyle="--", lw=0.8)
    fig.suptitle("Firing rates by layer across coherence levels")
    fig.tight_layout()
    return _save(fig, path)


def plot_timecourse(rates, stim_course, dt, path, columns=(0, 8),
                    labels=("Column A", "Column B"), title="L2/3e firing rates"):
    """Stacked rates + inputs figure (reference :529-562, :607-647)."""
    plt = _plt()
    rates = np.asarray(rates)
    stim = np.asarray(stim_course)
    time = np.arange(rates.shape[0]) * dt
    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(12, 6), sharex=True,
        gridspec_kw={"height_ratios": [2.5, 1.0]},
    )
    for col, lab in zip(columns, labels):
        ax1.plot(time, rates[:, col], label=lab, lw=1.5)
    ax1.set_title(title)
    ax1.set_ylabel("Firing rate")
    ax1.legend()
    ax1.grid(True, linestyle="--", alpha=0.5)
    for j in range(stim.shape[1]):
        ax2.plot(time, stim[:, j], lw=2, label=f"Input {j + 1}")
    ax2.set_xlabel("Time (s)")
    ax2.set_ylabel("Hz")
    ax2.legend()
    ax2.grid(True, linestyle="--", alpha=0.5)
    fig.tight_layout()
    return _save(fig, path)


def plot_dominance_histogram(dominance, path, bins: int = 100):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.abs(np.asarray(dominance)), bins=bins, color="r")
    ax.set_xlabel("Dominance duration (s)")
    ax.set_ylabel("Count")
    return _save(fig, path)


def plot_dom_alt_heatmaps(dominance, alternation, path, extent=(10, 20, 10, 20)):
    """Dominance / alternation heatmaps over (muA, muB) grids
    (reference :434-466)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for ax, data, title in zip(
        axes, (dominance, alternation), ("Dominance", "Alternation rate")
    ):
        hm = ax.imshow(np.asarray(data), cmap="viridis",
                       interpolation="nearest", extent=extent)
        fig.colorbar(hm, ax=ax)
        ax.set_title(title)
        ax.set_xlabel("muB")
        ax.set_ylabel("muA")
    return _save(fig, path)


def plot_wta_training(pred_states, true_states, stim, output_weights, weights,
                      train_loss, test_loss, path):
    """Per-iteration WTA training figure (reference: scripts/wta_ode.py:17-54):
    predicted vs target L2/3e rates + current weight heatmap."""
    from columnflow.ops.transfer import compute_firing_rate

    plt = _plt()
    pred = np.asarray(pred_states)
    fr = np.asarray(compute_firing_rate(pred[:, :16] - pred[:, 16:32]))
    w = np.asarray(output_weights)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].plot(np.asarray(true_states)[:, 0], "--", label="true col 1")
    axes[0].plot(np.asarray(true_states)[:, 1], "--", label="true col 2")
    axes[0].plot((fr[:, :8] * w).sum(-1), label="pred col 1")
    axes[0].plot((fr[:, 8:] * w).sum(-1), label="pred col 2")
    axes[0].set_title("Firing rates in layer 2/3")
    axes[0].legend()
    hm = axes[1].imshow(np.asarray(weights), cmap="viridis",
                        interpolation="nearest")
    fig.colorbar(hm, ax=axes[1])
    axes[1].set_title("Current weights")
    fig.text(0.3, 0.02, f"train loss {float(train_loss):.3f}", ha="center")
    fig.text(0.7, 0.02, f"val loss {float(test_loss):.3f}", ha="center")
    fig.tight_layout(pad=2.0)
    return _save(fig, path)


def plot_xor_training(firing_rates, condition, loss, path):
    """Per-iteration XOR figure (reference: scripts/xor_ode.py:15-50)."""
    plt = _plt()
    fr = np.asarray(firing_rates)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].plot(fr[:, 0], label="col A")
    axes[0].plot(fr[:, 8], label="col B")
    axes[0].set_title("L2/3e rates, columns A and B")
    axes[0].legend()
    axes[1].plot(fr[:, 16], label="col C")
    axes[1].set_title("L2/3e rate, column C")
    cond = "diff input - XOR" if condition[0] != condition[1] else "same input - AND"
    fig.text(0.5, 0.02,
             f"{cond} | loss {float(loss):.3f} | final {fr[-1, 16]:.2f}",
             ha="center")
    fig.tight_layout(pad=2.0)
    return _save(fig, path)


def plot_weight_matrices(params, path_prefix):
    """Heatmaps/bars of all nonzero parameter groups (reference:
    scripts/parity_ode.py:87-114). Returns list of written paths."""
    plt = _plt()
    written = []
    for name, p in params.items():
        arr = np.asarray(p)
        if np.sum(arr) == 0:
            continue
        fig, ax = plt.subplots(figsize=(8, 5))
        if arr.ndim == 2:
            hm = ax.imshow(arr, cmap="viridis", interpolation="nearest")
            fig.colorbar(hm, ax=ax)
            ax.set_title(f"Weight matrix: {name}")
        else:
            ax.bar(np.arange(arr.size), arr.ravel(), color="slateblue")
            ax.set_title(f"Weight vector: {name}")
        written.append(_save(fig, f"{path_prefix}_{name}.png"))
    return written


def plot_hopf(true_y, pred_y, ts, train_loss, val_loss, path):
    """Input / trajectories / phase-portrait panel (reference:
    scripts/bifurcation_ode.py:23-64)."""
    plt = _plt()
    t = np.asarray(ts)
    ty, py = np.asarray(true_y), np.asarray(pred_y)
    fig = plt.figure(figsize=(12, 4))
    ax_in = fig.add_subplot(131)
    ax_tr = fig.add_subplot(132)
    ax_ph = fig.add_subplot(133)
    ax_in.plot(t, ty[:, 0, 2])
    ax_in.set_title("Input")
    ax_in.set_ylim(-3, 3)
    ax_tr.plot(t, ty[:, 0, 0], "g-", t, ty[:, 0, 1], "g-")
    ax_tr.plot(t, py[:, 0, 0], "b--", t, py[:, 0, 1], "b--")
    ax_tr.set_title("Trajectories")
    ax_ph.plot(ty[:, 0, 0], ty[:, 0, 1], "g-")
    ax_ph.plot(py[:, 0, 0], py[:, 0, 1], "b--")
    ax_ph.set_title("Phase portrait")
    ax_ph.set_xlim(-2, 2)
    ax_ph.set_ylim(-2, 2)
    fig.text(0.4, 0.02, f"val {float(val_loss):.4f}", ha="center")
    fig.text(0.6, 0.02, f"train {float(train_loss):.4f}", ha="center")
    fig.tight_layout()
    return _save(fig, path)


def plot_phase_plane(pp, path, title=None):
    """Wong-Wang phase portrait: vector field (streamlines), both nullclines,
    and fixed points colored by stability. ``pp`` is an
    ``analysis.phase_plane.PhasePlane``; fills the phase_plane analysis the
    reference's DM docstring promises but never implements
    (src/ww_model.py:48)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    g = np.asarray(pp.grid)
    ds = np.asarray(pp.ds)
    ax.streamplot(g, g, ds[..., 0], ds[..., 1], color="0.75", density=1.2,
                  linewidth=0.7, arrowsize=0.8)
    for pts, color, label in ((pp.nullcline_a, "tab:orange", "ds_A/dt = 0"),
                              (pp.nullcline_b, "tab:blue", "ds_B/dt = 0")):
        pts = np.asarray(pts)
        if pts.size:
            ax.plot(pts[:, 0], pts[:, 1], ".", ms=2, color=color, label=label)
    marker = {"stable": ("o", "black"), "saddle": ("s", "tab:red"),
              "unstable": ("^", "tab:purple")}
    for s, lab in zip(np.asarray(pp.fixed_points), pp.stability):
        m, c = marker[lab]
        ax.plot(s[0], s[1], m, color=c, ms=9, mfc="white", mew=2)
    ax.set_xlabel("$s_A$")
    ax.set_ylabel("$s_B$")
    ax.set_xlim(g[0], g[-1])
    ax.set_ylim(g[0], g[-1])
    if title:
        ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    return _save(fig, path)
