from plnlp_tpu.parallel.graph_parallel import (
    GraphParallel,
    make_graph_parallel,
    partitioned_spmm,
    shard_node_features,
)
from plnlp_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_graph,
    shard_params,
)
from plnlp_tpu.parallel.partition import PartitionedGraph, partition_graph
from plnlp_tpu.parallel.sharded import make_sharded_train_step

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_graph",
    "shard_batch",
    "make_sharded_train_step",
    "GraphParallel",
    "make_graph_parallel",
    "partitioned_spmm",
    "shard_node_features",
    "PartitionedGraph",
    "partition_graph",
]
