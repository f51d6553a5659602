"""Device mesh + sharding layouts for multi-chip training.

The reference is strictly single-process single-GPU (reference main.py:71-72;
no torch.distributed anywhere) — this module is new capability defined by the
project north star, built the XLA way: annotate shardings on a
``jax.sharding.Mesh`` and let the SPMD partitioner insert the collectives
(psum / all-gather / reduce-scatter over ICI).

Mesh axes:
* ``data`` — data parallelism over the pair mini-batch (the DP axis);
  gradient all-reduce rides ICI.
* ``node`` — the graph-structure axis: the learnable node-embedding table is
  sharded over its rows (the EP/TP analog — citation2's 2.9M×d table is the
  largest tensor in every config), and the flat edge arrays are sharded over
  the edge dimension so SpMM's gather/scatter work is split across chips
  (the SP analog for graphs).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plnlp_tpu.dense import DenseAdj
from plnlp_tpu.graph import Graph

__all__ = ["make_mesh", "shard_params", "shard_graph", "shard_batch"]


def make_mesh(
    data: int = 1, node: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * node
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, node)
    return Mesh(arr, ("data", "node"))


def _rep(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Embedding table row-sharded over 'node'; everything else replicated
    (encoder/predictor weights are small: ≤ 512×512)."""
    out = {}
    for k, v in params.items():
        if k == "emb":
            out[k] = jax.device_put(v, NamedSharding(mesh, P("node", None)))
        else:
            out[k] = jax.device_put(v, _rep(mesh))
    return out


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Sharding pytree matching ``params`` (for jit in/out_shardings)."""
    return {
        k: (
            NamedSharding(mesh, P("node", None))
            if k == "emb"
            else jax.tree_util.tree_map(lambda _: _rep(mesh), v)
        )
        for k, v in params.items()
    }


def shard_graph(graph, mesh: Mesh):
    """Edge arrays sharded over 'node'; indptr replicated (small).

    For DenseAdj, rows (destinations) are sharded over 'node'.
    """
    if isinstance(graph, DenseAdj):
        return DenseAdj(
            adj=jax.device_put(
                graph.adj, NamedSharding(mesh, P("node", None))
            ),
            in_degrees=jax.device_put(graph.in_degrees, _rep(mesh)),
            num_nodes=graph.num_nodes,
        )
    edge_sh = NamedSharding(mesh, P("node"))
    blk_sh = NamedSharding(mesh, P("node", None))
    kw = dict(
        senders=jax.device_put(graph.senders, edge_sh),
        receivers=jax.device_put(graph.receivers, edge_sh),
        edge_weight=jax.device_put(graph.edge_weight, edge_sh),
        indptr=jax.device_put(graph.indptr, _rep(mesh)),
        num_nodes=graph.num_nodes,
        num_edges=graph.num_edges,
        block_rows=graph.block_rows,
        block_edges=graph.block_edges,
        # Membership-test metadata must survive the rebuild: max_degree
        # bounds edges_exist's CSR binary search (0 would degenerate it to
        # 2 probes -> false negatives -> the negative sampler emitting true
        # edges) and edge_mask is the small-graph O(1) membership path.
        max_degree=graph.max_degree,
        edge_mask=(
            None
            if graph.edge_mask is None
            else jax.device_put(graph.edge_mask, _rep(mesh))
        ),
    )
    if graph.blk_src is not None:
        kw.update(
            blk_src=jax.device_put(graph.blk_src, blk_sh),
            blk_weight=jax.device_put(graph.blk_weight, blk_sh),
            blk_local=jax.device_put(graph.blk_local, blk_sh),
            blk_rowblock=jax.device_put(
                graph.blk_rowblock, NamedSharding(mesh, P("node"))
            ),
        )
    return Graph(**kw)


def shard_batch(batch, mesh: Mesh):
    """Pair batches sharded over 'data' on the leading axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )
