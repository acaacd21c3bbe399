"""Bistable-perception statistics (reference: scripts/plotting_results.py:212-288).

Host-side numpy post-processing of firing-rate time courses: sliding-window
smoothing, dominance intervals, alternation rate. Semantics match the
reference exactly, including its quirks (the ``outliers=False`` branch is the
one that *removes* outliers, mutating in place; reproduced on a copy).
"""

from __future__ import annotations

import numpy as np


def running_mean(x, N: int, outliers: bool = False):
    """Sliding-window mean of length N (output length len(x) - N + 1).

    With ``outliers=False`` (the default, as in the reference:
    scripts/plotting_results.py:212-226), samples greater than 10x the mean
    are zeroed first.
    """
    x = np.array(x, dtype=np.float64)
    # A window longer than the trace would yield an empty result (and NaN
    # statistics downstream); clamp so short traces degrade gracefully.
    N = min(int(N), x.shape[0])
    if not outliers:
        mean = np.mean(x)
        x[x > mean * 10] = 0.0
    cumsum = np.cumsum(np.insert(x, 0, 0.0))
    return (cumsum[N:] - cumsum[:-N]) / float(N)


def dominance_time(A1, A2, dt: float = 1e-4, cutoff: float = 0.1,
                   thresh: float = 1e-4, sliding_window: int = 10_000):
    """Signed dominance intervals between two activity traces
    (reference: scripts/plotting_results.py:228-261).

    Returns an array of signed durations (sign = which trace dominated);
    if no switch lasts past ``cutoff``, a single full-length interval.
    """
    a1 = running_mean(np.asarray(A1), N=sliding_window)
    a2 = running_mean(np.asarray(A2), N=sliding_window)
    diff = a1 - a2

    sign_diff = np.sign(diff)
    switch_inds = np.where(np.diff(sign_diff) != 0)[0]

    signed = []
    for i in range(len(switch_inds) - 1):
        start, end = switch_inds[i], switch_inds[i + 1]
        dur = (end - start) * dt
        if dur >= cutoff:
            dominant = np.sign(np.mean(diff[start:end]))
            signed.append(dominant * dur)
    if signed:
        return np.asarray(signed)
    return np.asarray([np.sign(np.mean(diff)) * len(np.asarray(A1)) * dt])


def alternation_rate(A1, A2, dt: float = 1e-4, cutoff: float = 0.1,
                     sliding_window: int = 1000):
    """(rate, count) of perceptual alternations
    (reference: scripts/plotting_results.py:263-288)."""
    diff = running_mean(np.asarray(A1), N=sliding_window) - running_mean(
        np.asarray(A2), N=sliding_window
    )
    alternations = 0
    k = 0
    current = 0.0
    for t in range(len(diff)):
        if k == 0:
            current = np.sign(diff[t])
            k += 1
        elif np.sign(diff[t]) != current and k * dt >= cutoff:
            k = 0
            alternations += 1
        else:
            k += 1
    rate = alternations / (len(diff) * dt)
    return rate, alternations
