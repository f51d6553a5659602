from plnlp_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_graph,
    shard_params,
)
from plnlp_tpu.parallel.sharded import make_sharded_train_step

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_graph",
    "shard_batch",
    "make_sharded_train_step",
]
