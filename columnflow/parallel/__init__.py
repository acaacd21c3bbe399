from columnflow.parallel.sharding import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
)
from columnflow.parallel.tp import (
    make_mesh_2d,
    make_tp_train_step,
    make_tp_stochastic_adaptive_train_step,
    network_param_shardings,
    shard_network_opt_state,
    shard_network_params,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "make_mesh_2d",
    "make_tp_train_step",
    "make_tp_stochastic_adaptive_train_step",
    "network_param_shardings",
    "shard_network_opt_state",
    "shard_network_params",
]
