"""Graph partitioning for multi-chip SpMM (the reference has no equivalent).

Destination rows are split into ``num_shards`` contiguous, equal-size ranges
(padded to a multiple of block_rows).  Each shard owns:

* forward structure — its rows' in-edges, blocked for the scatter-matmul
  (blk_src holds GLOBAL source ids; destinations are shard-local);
* backward structure — the same edges re-grouped by SOURCE shard: the edges
  whose source lies in the shard, blocked over shard-local source row-blocks
  with GLOBAL destination ids in blk_src.  dX = Aᵀ dY then has exactly the
  same compute shape as the forward, so one shard_map body serves both.

All shards are padded to a common sub-block count so the stacked arrays have
a uniform leading 'shard' axis that maps onto the mesh 'node' axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import _blocks_np, _csr_np, _pad_to

__all__ = ["PartitionedGraph", "partition_graph", "with_halo"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "fwd_blk_src",
        "fwd_blk_weight",
        "fwd_blk_local",
        "fwd_blk_rowblock",
        "bwd_blk_src",
        "bwd_blk_weight",
        "bwd_blk_local",
        "bwd_blk_rowblock",
        "bwd_gather_fwd",
        "local_in_degrees",
        "fwd_halo",
        "bwd_halo",
    ],
    meta_fields=[
        "num_nodes",
        "num_shards",
        "rows_per_shard",
        "block_rows",
        "block_edges",
        "halo_quota",
        "halo_hubs",
    ],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    # stacked per-shard blocked metadata; leading axis = shard
    fwd_blk_src: jnp.ndarray  # (S, nblk_f, B) int32, GLOBAL src ids
    fwd_blk_weight: jnp.ndarray  # (S, nblk_f, B) f32
    fwd_blk_local: jnp.ndarray  # (S, nblk_f, B) int32, dst - shard_row0 - rb*R
    fwd_blk_rowblock: jnp.ndarray  # (S, nblk_f) int32, shard-local, sorted
    bwd_blk_src: jnp.ndarray  # (S, nblk_b, B) int32, GLOBAL dst ids
    bwd_blk_weight: jnp.ndarray
    bwd_blk_local: jnp.ndarray  # src-local offsets
    bwd_blk_rowblock: jnp.ndarray
    # For each bwd edge slot: the flat index (into the (S·nblk_f·B,)
    # concatenation of every shard's fwd slots) of the SAME edge — lets
    # RUNTIME per-edge values computed in fwd layout (attention weights,
    # softmax-jacobian terms) be re-laid into bwd layout with one gather
    # after an all_gather.  Padding slots point at 0 and are masked by
    # bwd_blk_weight == 0.
    bwd_gather_fwd: jnp.ndarray  # (S, nblk_b, B) int32
    local_in_degrees: jnp.ndarray  # (S, rows_per_shard) int32 (unweighted)
    num_nodes: int
    num_shards: int
    rows_per_shard: int
    block_rows: int
    block_edges: int
    # --- optional halo-exchange plan (None until with_halo) ---
    # Each is a dict of stacked per-shard arrays from halo.build_halo_plan:
    # local/remote blocked structures, send_idx (S,S,q), hub_idx (S,qh).
    fwd_halo: Optional[dict] = None
    bwd_halo: Optional[dict] = None
    halo_quota: int = 0  # q: per-peer non-hub boundary rows
    halo_hubs: int = 0  # qh: per-owner replicated hub rows

    @property
    def padded_nodes(self) -> int:
        return self.num_shards * self.rows_per_shard


def with_halo(pg: PartitionedGraph, hub_k: Optional[int] = None) -> PartitionedGraph:
    """Attach hardened halo-exchange plans for both directions (host-side).

    ``hub_k``: rows read remotely by >= hub_k shards are replicated via
    all_gather instead of counted against every peer quota (default
    max(3, S//2+1)).  See parallel.halo for the plan layout."""
    from plnlp_tpu.parallel.halo import build_halo_plan

    def build(pre):
        get = lambda name: np.asarray(getattr(pg, pre + name))
        return build_halo_plan(
            get("blk_src"),
            get("blk_weight"),
            get("blk_local"),
            get("blk_rowblock"),
            pg.rows_per_shard,
            pg.num_shards,
            pg.block_rows,
            pg.block_edges,
            hub_k=hub_k,
        )

    f_plan, qf, qhf = build("fwd_")
    b_plan, qb, qhb = build("bwd_")
    to_dev = lambda plan: {k: jnp.asarray(v) for k, v in plan.items()}
    return dataclasses.replace(
        pg,
        fwd_halo=to_dev(f_plan),
        bwd_halo=to_dev(b_plan),
        halo_quota=max(qf, qb),
        halo_hubs=max(qhf, qhb),
    )


def _shard_blocks(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_shards: int,
    rows_per_shard: int,
    R: int,
    B: int,
):
    """Group (dst-sorted) edges by dst shard; per-shard blocked metadata with
    shard-local rowblocks and GLOBAL src ids; pad shards to common nblk."""
    shard_meta = []
    for s in range(num_shards):
        lo_row, hi_row = s * rows_per_shard, (s + 1) * rows_per_shard
        sel = (dst >= lo_row) & (dst < hi_row)
        # Build the shard-local CSR by hand: _csr_np's (dst*n+src) sort key
        # would collide here because src ids are GLOBAL (>= rows_per_shard).
        ls, ld, lw = src[sel], dst[sel] - lo_row, w[sel]
        order = np.lexsort((ls, ld))
        ls, ld, lw = ls[order], ld[order], lw[order]
        indptr = np.zeros(rows_per_shard + 1, np.int64)
        np.add.at(indptr, ld + 1, 1)
        csr = {
            "senders": ls.astype(np.int32),
            "receivers": ld.astype(np.int32),
            "edge_weight": lw.astype(np.float32),
            "indptr": np.cumsum(indptr).astype(np.int32),
            "num_nodes": rows_per_shard,
            "num_edges": int(len(ls)),
        }
        shard_meta.append(_blocks_np(csr, R, B))
    return stack_padded_blocks(shard_meta, rows_per_shard, R)


def stack_padded_blocks(blocks, rows_per_shard: int, R: int):
    """Stack per-shard block metadata, padding every shard to a common nblk.

    PADDING CONVENTION (shared with parallel.halo — change both or neither):
    padding sub-blocks carry weight 0 (so they contribute nothing) and are
    assigned to the LAST local rowblock, keeping ``blk_rowblock`` sorted for
    ``indices_are_sorted`` segment sums downstream.
    """
    nblk = max(m["blk_src"].shape[0] for m in blocks)
    B = blocks[0]["blk_src"].shape[1]
    # Keep each shard's flat gather (nblk*B rows) off the slow %1024
    # residue (see graph._align_blocks) — re-check after taking the max.
    if B % 1024 and (nblk * B) % 1024 == 0:
        nblk += 1
    nrb_local = rows_per_shard // R

    def pad(m):
        p = nblk - m["blk_src"].shape[0]
        return {
            "blk_src": np.pad(m["blk_src"], ((0, p), (0, 0))),
            "blk_weight": np.pad(m["blk_weight"], ((0, p), (0, 0))),
            "blk_local": np.pad(m["blk_local"], ((0, p), (0, 0))),
            "blk_rowblock": np.pad(
                m["blk_rowblock"], (0, p), constant_values=nrb_local - 1
            ),
        }

    padded = [pad(m) for m in blocks]
    return {
        k: np.stack([m[k] for m in padded]) for k in padded[0]
    }


def _bwd_gather_fwd_np(fwd, bwd, num_shards, rows_per_shard, R):
    """Flat fwd-slot index of each bwd slot's edge (host-side, vectorized).

    Both structures hold exactly the real edge set once; matching the two
    key-sorted slot lists element-wise pairs every bwd slot with the fwd slot
    of the same (src, dst) edge — stable even with duplicate edges (the key
    multisets are identical, so the k-th duplicate maps to the k-th)."""
    S, nf, B = fwd["blk_src"].shape
    nb = bwd["blk_src"].shape[1]
    stride = np.int64(S) * rows_per_shard
    shard = np.arange(S, dtype=np.int64)[:, None, None]

    f_dst = shard * rows_per_shard + fwd["blk_rowblock"][:, :, None].astype(
        np.int64
    ) * R + fwd["blk_local"].astype(np.int64)
    keys_f = f_dst * stride + fwd["blk_src"].astype(np.int64)
    valid_f = fwd["blk_weight"].reshape(-1) != 0
    kf = keys_f.reshape(-1)[valid_f]
    ff = np.arange(S * nf * B, dtype=np.int64)[valid_f]

    b_src = shard * rows_per_shard + bwd["blk_rowblock"][:, :, None].astype(
        np.int64
    ) * R + bwd["blk_local"].astype(np.int64)
    keys_b = bwd["blk_src"].astype(np.int64) * stride + b_src
    valid_b = bwd["blk_weight"].reshape(-1) != 0
    kb = keys_b.reshape(-1)[valid_b]
    assert kf.shape == kb.shape, "fwd/bwd edge counts diverged"

    out = np.zeros(S * nb * B, np.int64)
    out[np.nonzero(valid_b)[0][np.argsort(kb, kind="stable")]] = ff[
        np.argsort(kf, kind="stable")
    ]
    return out.reshape(S, nb, B).astype(np.int32)


def partition_graph(
    src,
    dst,
    weight=None,
    *,
    num_nodes: int,
    num_shards: int,
    block: Tuple[int, int] = (128, 512),
    symmetrize: bool = False,
    coalesce: bool = True,
) -> PartitionedGraph:
    R, B = block
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, 1)
    e = csr["num_edges"]
    es = csr["senders"][:e].astype(np.int64)
    ed = csr["receivers"][:e].astype(np.int64)
    ew = csr["edge_weight"][:e]

    rows_per_shard = _pad_to(
        _pad_to(num_nodes, num_shards) // num_shards, R
    )
    fwd = _shard_blocks(es, ed, ew, num_shards, rows_per_shard, R, B)
    # backward: same edges, grouped by SOURCE shard (dst becomes the "src")
    bwd = _shard_blocks(ed, es, ew, num_shards, rows_per_shard, R, B)
    bwd_map = _bwd_gather_fwd_np(fwd, bwd, num_shards, rows_per_shard, R)

    deg = np.zeros(num_shards * rows_per_shard, np.int32)
    np.add.at(deg, ed, 1)

    return PartitionedGraph(
        fwd_blk_src=jnp.asarray(fwd["blk_src"].astype(np.int32)),
        fwd_blk_weight=jnp.asarray(fwd["blk_weight"]),
        fwd_blk_local=jnp.asarray(fwd["blk_local"].astype(np.int32)),
        fwd_blk_rowblock=jnp.asarray(fwd["blk_rowblock"].astype(np.int32)),
        bwd_blk_src=jnp.asarray(bwd["blk_src"].astype(np.int32)),
        bwd_blk_weight=jnp.asarray(bwd["blk_weight"]),
        bwd_blk_local=jnp.asarray(bwd["blk_local"].astype(np.int32)),
        bwd_blk_rowblock=jnp.asarray(bwd["blk_rowblock"].astype(np.int32)),
        bwd_gather_fwd=jnp.asarray(bwd_map),
        local_in_degrees=jnp.asarray(
            deg.reshape(num_shards, rows_per_shard)
        ),
        num_nodes=num_nodes,
        num_shards=num_shards,
        rows_per_shard=rows_per_shard,
        block_rows=R,
        block_edges=B,
    )
