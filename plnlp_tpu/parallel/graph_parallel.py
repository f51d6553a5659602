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
    meta_fields=["mesh", "comm"],
)
@dataclasses.dataclass(frozen=True)
class GraphParallel:
    """Partitioned graph + its mesh (mesh/comm are static/hashable).

    comm: 'all_gather' (v1: full feature gather) or 'halo' (v2: per-peer
    quota-padded all_to_all of only the boundary rows each shard reads).
    """

    pg: PartitionedGraph
    mesh: Mesh
    comm: str = "all_gather"

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
    comm: str = "all_gather",
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
    if comm == "halo":
        from plnlp_tpu.parallel.partition import with_halo

        pg = with_halo(pg)
    return GraphParallel(pg=pg, mesh=mesh, comm=comm)


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


def _apply_halo(
    mesh, R, rows, x, send_idx, halo_src, blk_weight, blk_local, blk_rowblock
):
    """Halo-exchange aggregation: send only the unique boundary rows each
    peer reads (see parallel.halo), then aggregate from the halo buffer."""

    def body(x_blk, sidx, hsrc, bw, bl, brb):
        send = x_blk[sidx[0].reshape(-1)]  # (S*q, D), ordered by dest shard
        halo = jax.lax.all_to_all(
            send, "node", split_axis=0, concat_axis=0, tiled=True
        )  # (S*q, D): segment s*q.. holds the rows owned by shard s
        return blocked_sum_arrays(halo, hsrc[0], bw[0], bl[0], brb[0], R, rows)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=P("node", None),
    )(x, send_idx, halo_src, blk_weight, blk_local, blk_rowblock)


def _mean_scale(pg: PartitionedGraph, y: jnp.ndarray) -> jnp.ndarray:
    deg = pg.local_in_degrees.reshape(-1)
    scale = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0).astype(y.dtype)
    return y * scale[:, None]


def _zero_cot(leaf):
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return jnp.zeros_like(leaf)
    return np.zeros(leaf.shape, dtype=jax.dtypes.float0)


def _direction(pg: PartitionedGraph, mesh: Mesh, comm: str, x, direction: str):
    pre = "fwd_" if direction == "fwd" else "bwd_"
    get = lambda name: getattr(pg, pre + name)
    if comm == "halo":
        return _apply_halo(
            mesh,
            pg.block_rows,
            pg.rows_per_shard,
            x,
            get("send_idx"),
            get("halo_src"),
            get("blk_weight"),
            get("blk_local"),
            get("blk_rowblock"),
        )
    return _apply(
        mesh,
        pg.block_rows,
        pg.rows_per_shard,
        x,
        get("blk_src"),
        get("blk_weight"),
        get("blk_local"),
        get("blk_rowblock"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pspmm(
    pg: PartitionedGraph, x: jnp.ndarray, mesh: Mesh, reduce: str, comm: str
):
    y = _direction(pg, mesh, comm, x, "fwd")
    if reduce == "mean":
        y = _mean_scale(pg, y)
    return y


def _pspmm_fwd(pg, x, mesh, reduce, comm):
    return _pspmm(pg, x, mesh, reduce, comm), pg


def _pspmm_bwd(mesh, reduce, comm, pg, g):
    if reduce == "mean":
        g = _mean_scale(pg, g)
    gx = _direction(pg, mesh, comm, g, "bwd")
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
    if gp.comm == "halo" and pg.fwd_send_idx is None:
        raise ValueError("comm='halo' requires a halo plan (with_halo / "
                         "make_graph_parallel(comm='halo'))")
    y = _pspmm(pg, x, gp.mesh, reduce, gp.comm)
    return y[: pg.num_nodes]


def partitioned_transformer_conv(gp: GraphParallel, lp, x: jnp.ndarray):
    """One TransformerConv layer over a partitioned graph.

    Because edges are destination-sharded, the per-destination softmax
    segments are entirely shard-local: each shard computes its own edges'
    attention logits (q from local rows, k/v from the all-gathered features),
    normalizes over its local destinations, and reuses the blocked
    scatter-matmul with the attention weights as the runtime edge weights.
    Backward runs through XLA autodiff (no custom VJP yet — correctness
    path; see TODO_ROUND2.md).
    """
    import math as _math

    from plnlp_tpu.nn import linear

    pg = gp.pg
    R = pg.block_rows
    rows = pg.rows_per_shard
    d = lp["lin_query"]["w"].shape[1]
    if x.shape[0] < pg.padded_nodes:
        x = jnp.pad(x, ((0, pg.padded_nodes - x.shape[0]), (0, 0)))

    def body(x_blk, bs, bw, bl, brb):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        q = linear(lp["lin_query"], x_blk)  # local rows only
        k = linear(lp["lin_key"], x_full)
        v = linear(lp["lin_value"], x_full)
        bs0, bw0, bl0, brb0 = bs[0], bw[0], bl[0], brb[0]
        dst_local = brb0[:, None] * R + bl0  # (nblk, B) shard-local rows
        logits = (
            jnp.sum(q[dst_local] * k[bs0], axis=-1) / _math.sqrt(d)
        ).astype(jnp.float32)
        valid = bw0 != 0
        flat_dst = dst_local.reshape(-1)
        flat_logits = jnp.where(valid.reshape(-1), logits.reshape(-1), -jnp.inf)
        seg_max = jax.ops.segment_max(flat_logits, flat_dst, num_segments=rows)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(
            valid.reshape(-1),
            jnp.exp(flat_logits - seg_max[flat_dst]),
            0.0,
        )
        seg_sum = jax.ops.segment_sum(ex, flat_dst, num_segments=rows)
        denom = jnp.maximum(seg_sum, jnp.finfo(jnp.float32).tiny)
        alpha = (ex / denom[flat_dst]).reshape(bw0.shape).astype(jnp.float32)
        agg = blocked_sum_arrays(v, bs0, alpha, bl0, brb0, R, rows)
        return agg + linear(lp["lin_skip"], x_blk)

    out = jax.shard_map(
        body,
        mesh=gp.mesh,
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=P("node", None),
    )(x, pg.fwd_blk_src, pg.fwd_blk_weight, pg.fwd_blk_local, pg.fwd_blk_rowblock)
    return out[: pg.num_nodes]
