from columnflow.analysis.stats import (
    running_mean,
    dominance_time,
    alternation_rate,
)
from columnflow.analysis.experiments import (
    coherence_sweep,
    bistable_perception,
    rivalry_sweep,
    wta_timecourse,
    xor_timecourse,
)
from columnflow.analysis.phase_plane import (
    PhasePlane,
    wong_wang_phase_plane,
    ww_drift,
)

__all__ = [
    "running_mean",
    "dominance_time",
    "alternation_rate",
    "coherence_sweep",
    "bistable_perception",
    "rivalry_sweep",
    "wta_timecourse",
    "xor_timecourse",
    "PhasePlane",
    "wong_wang_phase_plane",
    "ww_drift",
]
