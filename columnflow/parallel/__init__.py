from columnflow.parallel.sharding import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "make_dp_train_step"]
