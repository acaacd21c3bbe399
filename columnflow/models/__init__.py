from columnflow.models.column import AreaParams, build_area_params, Stimulus
from columnflow.models.wta import (
    build_wta,
    wta_drift,
    wta_diffusion,
    WTA_STATE_DIM,
    wta_lat_in_mask,
)
from columnflow.models.xor import build_xor_network, xor_drift, xor_diffusion
from columnflow.models.network import (
    build_column_network,
    network_drift,
    network_diffusion,
)
from columnflow.models.hopf import build_hopf_mlp, hopf_mlp_drift, hopf_dynamics
from columnflow.models.ww import wong_wang_sim, wong_wang_three_phase

__all__ = [
    "AreaParams",
    "build_area_params",
    "Stimulus",
    "build_wta",
    "wta_drift",
    "wta_diffusion",
    "WTA_STATE_DIM",
    "wta_lat_in_mask",
    "build_xor_network",
    "xor_drift",
    "xor_diffusion",
    "build_column_network",
    "network_drift",
    "network_diffusion",
    "build_hopf_mlp",
    "hopf_mlp_drift",
    "hopf_dynamics",
    "wong_wang_sim",
    "wong_wang_three_phase",
]
