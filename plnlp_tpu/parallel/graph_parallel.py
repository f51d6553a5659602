"""Graph-parallel SpMM: shard_map over row-partitioned graphs.

The multi-chip aggregation path (SURVEY §2c): destination rows — and with
them the node-embedding/feature matrix — are sharded over the mesh 'node'
axis; each chip aggregates its own rows' in-edges after an all-gather of the
source features over ICI.  The backward runs the SAME body on the
source-sharded structure (dX = Aᵀ dY), so gradients land pre-sharded and no
unsharded gradient is ever materialized.

``GraphParallel`` is a drop-in aggregation operand: ``ops.spmm.spmm`` and
the encoders accept it alongside Graph / DenseAdj, so the whole Model runs
multi-chip by just swapping the graph object.

v1 communication = full all-gather of x per layer.  A halo exchange (only
boundary rows, all_to_all with per-peer quotas) is the planned v2; the
structure here — per-shard metadata with global source ids — already
supports it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plnlp_tpu.ops.spmm import blocked_sum_arrays
from plnlp_tpu.parallel.partition import PartitionedGraph, partition_graph

__all__ = [
    "GraphParallel",
    "make_graph_parallel",
    "partitioned_spmm",
    "shard_node_features",
]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["pg"],
    meta_fields=["mesh"],
)
@dataclasses.dataclass(frozen=True)
class GraphParallel:
    """Partitioned graph + its mesh (mesh is static/hashable)."""

    pg: PartitionedGraph
    mesh: Mesh

    @property
    def num_nodes(self) -> int:
        return self.pg.num_nodes


def make_graph_parallel(
    src,
    dst,
    weight=None,
    *,
    num_nodes: int,
    mesh: Mesh,
    block=(128, 512),
    symmetrize: bool = False,
) -> GraphParallel:
    num_shards = mesh.shape["node"]
    pg = partition_graph(
        src,
        dst,
        weight,
        num_nodes=num_nodes,
        num_shards=num_shards,
        block=block,
        symmetrize=symmetrize,
    )
    return GraphParallel(pg=pg, mesh=mesh)


def shard_node_features(x: jnp.ndarray, pg: PartitionedGraph, mesh: Mesh):
    """Pad x to the partition's row count and shard rows over 'node'."""
    pad = pg.padded_nodes - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return jax.device_put(x, NamedSharding(mesh, P("node", None)))


def _apply(mesh, R, rows, x, blk_src, blk_weight, blk_local, blk_rowblock):
    def body(x_blk, bs, bw, bl, brb):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        return blocked_sum_arrays(x_full, bs[0], bw[0], bl[0], brb[0], R, rows)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=P("node", None),
    )(x, blk_src, blk_weight, blk_local, blk_rowblock)


def _mean_scale(pg: PartitionedGraph, y: jnp.ndarray) -> jnp.ndarray:
    deg = pg.local_in_degrees.reshape(-1)
    scale = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0).astype(y.dtype)
    return y * scale[:, None]


def _zero_cot(leaf):
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return jnp.zeros_like(leaf)
    return np.zeros(leaf.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pspmm(pg: PartitionedGraph, x: jnp.ndarray, mesh: Mesh, reduce: str):
    y = _apply(
        mesh,
        pg.block_rows,
        pg.rows_per_shard,
        x,
        pg.fwd_blk_src,
        pg.fwd_blk_weight,
        pg.fwd_blk_local,
        pg.fwd_blk_rowblock,
    )
    if reduce == "mean":
        y = _mean_scale(pg, y)
    return y


def _pspmm_fwd(pg, x, mesh, reduce):
    return _pspmm(pg, x, mesh, reduce), pg


def _pspmm_bwd(mesh, reduce, pg, g):
    if reduce == "mean":
        g = _mean_scale(pg, g)
    gx = _apply(
        mesh,
        pg.block_rows,
        pg.rows_per_shard,
        g,
        pg.bwd_blk_src,
        pg.bwd_blk_weight,
        pg.bwd_blk_local,
        pg.bwd_blk_rowblock,
    )
    return (jax.tree_util.tree_map(_zero_cot, pg), gx)


_pspmm.defvjp(_pspmm_fwd, _pspmm_bwd)


def partitioned_spmm(
    gp: GraphParallel, x: jnp.ndarray, reduce: str = "sum"
) -> jnp.ndarray:
    """Row-sharded SpMM.  ``x``: (num_nodes or padded_nodes, D); rows beyond
    the real node count are zero-padded.  Returns (num_nodes, D)."""
    pg = gp.pg
    if x.shape[0] < pg.padded_nodes:
        x = jnp.pad(x, ((0, pg.padded_nodes - x.shape[0]), (0, 0)))
    y = _pspmm(pg, x, gp.mesh, reduce)
    return y[: pg.num_nodes]
