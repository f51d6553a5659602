"""Graph partitioning for multi-chip SpMM (the reference has no equivalent).

Destination rows are split into ``num_shards`` equal-capacity SLOT ranges
(padded to a multiple of block_rows).  Each shard owns:

* forward structure — its rows' in-edges, blocked for the scatter-matmul
  (blk_src holds slot-space source ids; destinations are shard-local);
* backward structure — the same edges re-grouped by SOURCE shard: the edges
  whose source lies in the shard, blocked over shard-local source row-blocks
  with slot-space destination ids in blk_src.  dX = Aᵀ dY then has exactly
  the same compute shape as the forward, so one shard_map body serves both.

All shards are padded to a common sub-block count so the stacked arrays have
a uniform leading 'shard' axis that maps onto the mesh 'node' axis.

**Load balance / locality (``reorder``).**  The naive assignment (node id ==
slot, contiguous equal-NODE ranges) is hub-hostile: on power-law graphs one
shard inherits the hubs, every other shard pads to its sub-block count, and
per-layer compute flatlines at the hub shard's cost.  ``reorder`` chooses a
node→slot assignment instead:

* ``'edges'``  — contiguous ranges over the EXISTING id order cut at equal
  EDGE counts (cheap: one cumsum walk), capacity-capped so no shard exceeds
  ``cap_factor``× the mean node count.  Preserves whatever locality the id
  order has.
* ``'degree'`` — serpentine deal by descending in-degree: equal node counts
  and near-perfect edge balance, but discards locality (max halo cut).
* ``'bfs'``    — level-synchronous BFS order (hub-seeded, per component)
  then equal-edge contiguous ranges over it: edge balance AND a small edge
  cut on community-structured graphs.
* ``'auto'``   — measures the naive split's edge imbalance and picks
  ``'degree'`` when max/mean > 1.25 (measured best: 1.05× balance at zero
  padding cost — see assign_slots), else the zero-cost identity layout.

A non-identity assignment is carried as two padded-length permutations
(``perm_in``: slot → global position, ``perm_out``: global position → slot)
applied as pure gathers inside the custom VJPs — no scatters, no autodiff
through the relayout.  Everything downstream (halo plans, the transformer
VJP's slot maps) operates in slot space unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import _blocks_np, _csr_np, _pad_to

__all__ = [
    "PartitionedGraph",
    "partition_graph",
    "with_halo",
    "assign_slots",
]


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
        "perm_in",
        "perm_out",
        "tile_vals",
        "tile_row",
        "tile_col",
        "tile_vals_t",
        "tile_row_t",
        "tile_col_t",
        "tile_row_mask",
        "tile_row_mask_t",
    ],
    meta_fields=[
        "num_nodes",
        "num_shards",
        "rows_per_shard",
        "block_rows",
        "block_edges",
        "halo_quota",
        "halo_hubs",
        "reorder",
        "shard_edges",
        "shard_nblk",
        "tile",
        "tile_dense_edges",
        "shard_tiles",
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
    # --- optional node→slot relayout (None = identity) ---
    # perm_in[slot] = global position, perm_out[global position] = slot;
    # both (padded_nodes,) int32, mutually inverse permutations.  Applied
    # as gathers at the custom-VJP boundary (graph_parallel).
    perm_in: Optional[jnp.ndarray] = None
    perm_out: Optional[jnp.ndarray] = None
    reorder: str = "none"
    # per-shard real edge counts / pre-padding sub-block counts of the fwd
    # (destination-sharded) structure — the load-balance report
    shard_edges: Tuple[int, ...] = ()
    shard_nblk: Tuple[int, ...] = ()
    # --- optional per-shard dense-tile sets (the hybrid backend, multi-chip:
    # ops/tile_spmm composed with the partition).  ``tile`` == 0 disables.
    # tile_row is SHARD-LOCAL (row tile within the shard's row range, sorted
    # per shard incl. padding tiles at nRl-1); tile_col indexes the GLOBAL
    # all-gathered buffer's col tiles.  ``*_t`` = transposed set, grouped by
    # source shard (the backward).  Masks: per-shard row-tile coverage for
    # the Pallas kernel (None = fully covered).
    tile_vals: Optional[jnp.ndarray] = None  # (S, nt, T, T)
    tile_row: Optional[jnp.ndarray] = None  # (S, nt) int32
    tile_col: Optional[jnp.ndarray] = None  # (S, nt) int32
    tile_vals_t: Optional[jnp.ndarray] = None
    tile_row_t: Optional[jnp.ndarray] = None
    tile_col_t: Optional[jnp.ndarray] = None
    tile_row_mask: Optional[jnp.ndarray] = None  # (S, rows_per_shard/T) bool
    tile_row_mask_t: Optional[jnp.ndarray] = None
    tile: int = 0
    tile_dense_edges: int = 0
    shard_tiles: Tuple[int, ...] = ()

    @property
    def padded_nodes(self) -> int:
        return self.num_shards * self.rows_per_shard

    @property
    def node_map(self) -> Optional[jnp.ndarray]:
        """Original node id → slot ((num_nodes,) int32), None = identity."""
        return None if self.perm_out is None else self.perm_out[: self.num_nodes]


def with_halo(pg: PartitionedGraph, hub_k: Optional[int] = None) -> PartitionedGraph:
    """Attach hardened halo-exchange plans for both directions (host-side).

    ``hub_k``: rows read remotely by >= hub_k shards are replicated via
    all_gather instead of counted against every peer quota (default
    max(3, S//2+1)).  See parallel.halo for the plan layout."""
    if pg.tile:
        raise ValueError(
            "halo plans cover only the blocked structure; a tiled partition "
            "(tile > 0) keeps dense edges outside it — tiles require "
            "comm='all_gather'"
        )
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
    nblk = tuple(int(m["blk_src"].shape[0]) for m in shard_meta)
    return stack_padded_blocks(shard_meta, rows_per_shard, R), nblk


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


# ---------------------------------------------------------------------------
# Node → slot assignment (load balance / locality)
# ---------------------------------------------------------------------------


def _undirected_csr_np(src, dst, num_nodes: int):
    """(indptr, indices) over the undirected edge set (host-side)."""
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    order_e = np.argsort(s2, kind="stable")
    s2, d2 = s2[order_e], d2[order_e]
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(indptr, s2 + 1, 1)
    return np.cumsum(indptr), d2


def _bfs_order(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Level-synchronous BFS order over the undirected edge set, seeded per
    component at the highest-degree unvisited node.  Native C++ when
    available (csrc/graphcore.cpp bfs_order); NumPy frontier expansion
    otherwise — both produce the identical order (tests/test_native.py)."""
    indptr, d2 = _undirected_csr_np(src, dst, num_nodes)
    deg = np.diff(indptr)
    seeds = np.argsort(-deg, kind="stable")

    from plnlp_tpu import native

    if native.available():
        return native.bfs_order(indptr, d2, num_nodes, seeds)

    visited = np.zeros(num_nodes, bool)
    order = np.empty(num_nodes, np.int64)
    pos = 0
    si = 0
    while pos < num_nodes:
        while si < num_nodes and visited[seeds[si]]:
            si += 1
        frontier = seeds[si : si + 1]
        visited[frontier] = True
        while len(frontier):
            order[pos : pos + len(frontier)] = frontier
            pos += len(frontier)
            starts = indptr[frontier]
            counts = indptr[frontier + 1] - starts
            total = int(counts.sum())
            if total == 0:
                break
            # flat neighbor gather: repeat(start) + intra-run offsets
            offs = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
            )
            nbr = d2[np.repeat(starts, counts) + offs]
            nbr = np.unique(nbr)
            nbr = nbr[~visited[nbr]]
            visited[nbr] = True
            frontier = nbr
    return order


def _equal_edge_bounds(
    deg_ordered: np.ndarray, num_shards: int, cap: int
) -> np.ndarray:
    """Cut an ordered node list into ``num_shards`` contiguous ranges of
    ~equal total degree, each at most ``cap`` nodes.  Feasibility-aware
    forward walk: each cut targets an equal share of the REMAINING edges,
    clamped so every later shard can still fit its nodes under ``cap``."""
    n = len(deg_ordered)
    assert num_shards * cap >= n, "cap too small for the node count"
    cum = np.concatenate([[0], np.cumsum(deg_ordered, dtype=np.int64)])
    bounds = np.zeros(num_shards + 1, np.int64)
    bounds[num_shards] = n
    for s in range(1, num_shards):
        prev = bounds[s - 1]
        remaining = num_shards - s + 1
        target = cum[prev] + (cum[n] - cum[prev]) / remaining
        j = int(np.searchsorted(cum, target))
        lo = max(prev, n - (num_shards - s) * cap)
        hi = min(prev + cap, n)
        bounds[s] = min(max(j, lo), hi)
    return bounds


def assign_slots(
    es: np.ndarray,
    ed: np.ndarray,
    num_nodes: int,
    num_shards: int,
    R: int,
    reorder: str,
    cap_factor: float = 1.5,
    order=None,
):
    """Node → slot assignment.  Returns (node_map | None, rows_per_shard,
    resolved_mode): ``node_map[g] = slot``; None means the identity layout
    (zero relayout cost).  See the module docstring for mode semantics."""
    legacy_rps = _pad_to(_pad_to(num_nodes, num_shards) // num_shards, R)
    # S=1 keeps the identity layout EXCEPT for the community reorders,
    # whose relabel is what makes the tile sets dense (partition_graph
    # tile>0) — a single-shard tiled partition without it degenerates to
    # blocked SpMM plus tile overhead.
    if reorder in (None, "none") or (
        num_shards <= 1 and reorder not in ("labelprop", "multilevel")
    ):
        return None, legacy_rps, "none"
    deg = np.bincount(ed, minlength=num_nodes).astype(np.int64)

    if reorder == "auto":
        # naive-split imbalance: max/mean per-shard edge count
        shard_of = np.minimum(
            np.arange(num_nodes) // legacy_rps, num_shards - 1
        )
        per = np.bincount(shard_of, weights=deg, minlength=num_shards)
        imbalance = per.max() / max(per.mean(), 1.0)
        if imbalance <= 1.25:
            return None, legacy_rps, "none"
        # Measured (RESULTS.md round 3): at collab scale on the skewed
        # generator, serpentine degree balance hits 1.05 max/mean edge
        # imbalance with ZERO extra row padding, where equal-edge
        # contiguous ranges stall at 1.7-2.1 (capacity caps bind on the
        # hub head) while also inflating rows_per_shard 1.5-2x.
        reorder = "degree"

    if reorder == "degree":
        # serpentine deal by descending degree: round r hands nodes to
        # shards 0..S-1 (even r) or S-1..0 (odd r) — equal node counts,
        # near-LPT edge balance
        order = np.argsort(-deg, kind="stable")
        n = num_nodes
        S = num_shards
        pos_in_order = np.arange(n)
        rnd = pos_in_order // S
        lane = pos_in_order % S
        shard = np.where(rnd % 2 == 0, lane, S - 1 - lane)
        rows_per_shard = _pad_to(-(-n // S), R)
        node_map = np.empty(n, np.int64)
        # slot offset within shard = running count of earlier deals there
        offset = np.zeros(n, np.int64)
        for s in range(S):
            sel = shard == s
            offset[sel] = np.arange(int(sel.sum()))
        node_map[order] = shard * rows_per_shard + offset
        return node_map.astype(np.int32), rows_per_shard, "degree"

    if reorder == "bfs":
        order = _bfs_order(es, ed, num_nodes)
    elif reorder in ("labelprop", "multilevel"):
        # community-contiguous order + equal-edge contiguous ranges: the
        # assignment the multi-chip HYBRID backend needs — same-community
        # nodes share a shard AND stay contiguous within it, so the dense
        # diagonal tiles survive the partition (ops/tile_spmm); multilevel
        # adds the coarse-graph merge pass (fragmented-community graphs).
        # A caller-supplied ``order`` (e.g. estimate_hybrid's, threaded
        # through --adj_backend=auto) skips the sweep entirely.
        if order is None:
            from plnlp_tpu.ops.tile_spmm import (
                label_prop_order,
                multilevel_order,
            )

            order = (
                multilevel_order(es, ed, num_nodes)
                if reorder == "multilevel"
                else label_prop_order(es, ed, num_nodes)
            )
    elif reorder == "edges":
        order = np.arange(num_nodes, dtype=np.int64)
    else:
        raise ValueError(f"unknown reorder mode: {reorder!r}")
    cap = max(int(cap_factor * -(-num_nodes // num_shards)), 1)
    bounds = _equal_edge_bounds(deg[order], num_shards, cap)
    rows_per_shard = _pad_to(max(int(np.diff(bounds).max()), 1), R)
    node_map = np.empty(num_nodes, np.int64)
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        node_map[order[lo:hi]] = s * rows_per_shard + np.arange(hi - lo)
    return node_map.astype(np.int32), rows_per_shard, reorder


def _perms_from_node_map(node_map: np.ndarray, padded: int):
    """(perm_in, perm_out): mutually inverse padded-length permutations.
    Global positions ≥ num_nodes (the zero-padding rows of x) fill the
    unoccupied slots, so both directions stay pure gathers."""
    n = len(node_map)
    occupied = np.zeros(padded, bool)
    occupied[node_map] = True
    free_slots = np.nonzero(~occupied)[0]
    perm_out = np.concatenate([node_map.astype(np.int64), free_slots])
    perm_in = np.empty(padded, np.int64)
    perm_in[perm_out] = np.arange(padded)
    return perm_in.astype(np.int32), perm_out.astype(np.int32)


def _stack_shard_tiles(vals, trow, tcol, num_shards: int, nrl: int):
    """Split a global (row-sorted) tile set by destination shard and pad
    every shard to a common tile count.  Padding tiles are all-zero with
    shard-local row nrl-1 (keeps per-shard tile_row sorted) and col 0.
    Returns stacked (vals, local_row, col, coverage_mask_or_None,
    per_shard_real_counts)."""
    S = num_shards
    shard = trow // nrl
    counts = np.bincount(shard, minlength=S)
    ntmax = max(int(counts.max()), 1)
    out_vals = np.zeros((S, ntmax) + vals.shape[1:], vals.dtype)
    out_row = np.full((S, ntmax), nrl - 1, np.int32)
    out_col = np.zeros((S, ntmax), np.int32)
    for s in range(S):
        sel = shard == s
        k = int(counts[s])
        out_vals[s, :k] = vals[sel]
        out_row[s, :k] = (trow[sel] - s * nrl).astype(np.int32)
        out_col[s, :k] = tcol[sel].astype(np.int32)
    mask = np.zeros((S, nrl), bool)
    for s in range(S):
        mask[s, out_row[s]] = True  # padding tiles cover nrl-1 with zeros
    return (
        out_vals,
        out_row,
        out_col,
        None if mask.all() else mask,
        tuple(int(c) for c in counts),
    )


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
    reorder: Optional[str] = None,
    cap_factor: float = 1.5,
    tile: int = 0,
    min_fill: Optional[int] = None,
    tile_dtype="float32",
    max_tile_bytes: int = 2 * 1024**3,
    order=None,
) -> PartitionedGraph:
    """``tile`` > 0 composes the hybrid dense-tile SpMM (ops/tile_spmm) with
    the partition: tiles clearing ``min_fill`` run as per-shard MXU matmuls
    over the all-gathered feature buffer; residual edges stay on the blocked
    gather path.  ``min_fill`` defaults to ~0.15% of the tile area (96 at
    T=256, 384 at T=512 — the measured break-even fill density).  Use with
    reorder='labelprop' — community-contiguous slots are what make tiles
    dense (build_hybrid's single-device analog)."""
    R, B = block
    align = int(np.lcm(R, tile)) if tile else R
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, 1)
    e = csr["num_edges"]
    es = csr["senders"][:e].astype(np.int64)
    ed = csr["receivers"][:e].astype(np.int64)
    ew = csr["edge_weight"][:e]

    node_map, rows_per_shard, resolved = assign_slots(
        es, ed, num_nodes, num_shards, align, reorder, cap_factor,
        order=order,
    )
    if node_map is not None:
        es = node_map[es].astype(np.int64)
        ed = node_map[ed].astype(np.int64)
        perm_in, perm_out = _perms_from_node_map(
            node_map, num_shards * rows_per_shard
        )
    else:
        perm_in = perm_out = None

    deg = np.zeros(num_shards * rows_per_shard, np.int32)
    np.add.at(deg, ed, 1)
    shard_edges = tuple(
        int(c) for c in np.bincount(
            ed // rows_per_shard, minlength=num_shards
        )
    )

    tile_fields = {}
    blk_es, blk_ed, blk_ew = es, ed, ew
    if tile:
        from plnlp_tpu.ops.tile_spmm import _build_tiles

        if min_fill is None:
            min_fill = max(int(0.0015 * tile * tile), 1)
        padded = num_shards * rows_per_shard
        max_tiles = max(int(max_tile_bytes // (tile * tile * 4)), 1)
        vals, trow_g, tcol_g, (r_src, r_dst, r_w), n_dense = _build_tiles(
            es, ed, ew.astype(np.float32), padded, tile, min_fill,
            max_tiles=max_tiles,
        )
        if len(trow_g) == 0:
            trow_g = tcol_g = np.zeros(1, np.int64)
        # int8 tile storage when exact (see tile_spmm.build_hybrid)
        if np.all(vals == np.round(vals)) and np.abs(vals).max() <= 127:
            store_dt = np.int8
        else:
            store_dt = jnp.dtype(tile_dtype)
        vals = vals.astype(store_dt)
        nrl = rows_per_shard // tile
        fv, fr, fc, fm, f_counts = _stack_shard_tiles(
            vals, trow_g, tcol_g, num_shards, nrl
        )
        # transposed set, grouped by SOURCE shard, row-sorted per shard
        order_t = np.lexsort((trow_g, tcol_g))
        bv, br, bc, bm, _ = _stack_shard_tiles(
            vals.transpose(0, 2, 1)[order_t], tcol_g[order_t],
            trow_g[order_t], num_shards, nrl,
        )
        tile_fields = dict(
            tile_vals=jnp.asarray(fv), tile_row=jnp.asarray(fr),
            tile_col=jnp.asarray(fc),
            tile_vals_t=jnp.asarray(bv), tile_row_t=jnp.asarray(br),
            tile_col_t=jnp.asarray(bc),
            tile_row_mask=None if fm is None else jnp.asarray(fm),
            tile_row_mask_t=None if bm is None else jnp.asarray(bm),
            tile=tile, tile_dense_edges=int(n_dense),
            shard_tiles=f_counts,
        )
        blk_es, blk_ed, blk_ew = (
            r_src.astype(np.int64), r_dst.astype(np.int64), r_w
        )
        # the tiled residual is sparse by construction — cap block_edges
        # at the Pallas sub-block width to cut its gather padding
        # (single-device analog + chip A/B in ops/tile_spmm.build_hybrid)
        B = min(B, 128)

    fwd, fwd_nblk = _shard_blocks(
        blk_es, blk_ed, blk_ew, num_shards, rows_per_shard, R, B
    )
    # backward: same edges, grouped by SOURCE shard (dst becomes the "src")
    bwd, _ = _shard_blocks(
        blk_ed, blk_es, blk_ew, num_shards, rows_per_shard, R, B
    )
    bwd_map = _bwd_gather_fwd_np(fwd, bwd, num_shards, rows_per_shard, R)

    return PartitionedGraph(
        **tile_fields,
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
        perm_in=None if perm_in is None else jnp.asarray(perm_in),
        perm_out=None if perm_out is None else jnp.asarray(perm_out),
        reorder=resolved,
        shard_edges=shard_edges,
        shard_nblk=fwd_nblk,
    )
