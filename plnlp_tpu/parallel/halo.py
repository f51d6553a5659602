"""Halo exchange: boundary-row communication for the partitioned SpMM.

v1 (graph_parallel) all-gathers the full feature matrix per layer — N×D over
ICI regardless of how many remote rows a shard actually reads.  The plan
built here sends only the rows actually read across shard boundaries, and is
hardened for power-law graphs (SURVEY §2c design):

* **Local/remote split** — each shard's edges are divided into those whose
  source it owns (aggregated straight from ``x_blk``, no communication) and
  the rest.  The local blocked aggregation has NO data dependency on the
  collectives, so XLA's latency-hiding scheduler overlaps the all_to_all /
  all_gather with the local MXU work.
* **Hub replication** — rows read by ≥ ``hub_k`` remote shards are pulled
  out of the per-peer halo sets and broadcast once via a (much smaller)
  all_gather instead.  Without this, one hub node read by every shard
  inflates EVERY peer quota (quota = max over (dst, owner) pairs, since
  all_to_all needs a uniform chunk).
* **Per-peer quota after hub removal** — q = max unique non-hub boundary
  rows over (dst shard, owner shard) pairs; the halo buffer is (S·q, D) and
  the hub buffer (S·qh, D), vs the all-gather's (N, D).

Plan layout (host-side NumPy, all static):

  send_idx[s, d, :]  local rows shard s sends to shard d   (padded to q)
  hub_idx[s, :]      local rows of s that are hubs          (padded to qh)
  buffer             concat([all_to_all halo (S·q), all_gather hubs (S·qh)])
  rem blk_src        remote-edge sources remapped into the buffer
  loc blk_src        local-edge sources as shard-local rows

The same plan is built for the backward structure, so the custom VJP never
routes autodiff through the exchange.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from plnlp_tpu.graph import _blocks_np

__all__ = ["build_halo_plan", "estimate_halo_quotas"]


def _csr_blocks(src_ids, dst_local, w, rows: int, R: int, B: int):
    """Blocked metadata for one shard's edge subset (src ids already in the
    target index space: local rows or buffer slots)."""
    order = np.lexsort((src_ids, dst_local))
    s, dl, ww = src_ids[order], dst_local[order], w[order]
    indptr = np.zeros(rows + 1, np.int64)
    np.add.at(indptr, dl + 1, 1)
    csr = {
        "senders": s.astype(np.int64),
        "receivers": dl.astype(np.int64),
        "edge_weight": ww.astype(np.float32),
        "indptr": np.cumsum(indptr),
        "num_nodes": rows,
        "num_edges": int(len(s)),
    }
    return _blocks_np(csr, R, B)


def _boundary_sets(
    blk_src: np.ndarray,
    blk_weight: np.ndarray,
    rows_per_shard: int,
    num_shards: int,
    hub_k: Optional[int] = None,
):
    """Hub rows + per-(dst, owner) unique non-hub boundary sets.

    Returns (hubs, hub_owner, qh, H, q) where H[d][s] is the sorted array
    of global non-hub rows shard d reads from owner s, q the per-peer
    quota, qh the per-owner replicated-hub quota.  Shared by
    ``build_halo_plan`` (which realizes the slot maps and blocked edge
    structures) and ``estimate_halo_quotas`` (which only needs q/qh) so
    the comm='auto' volume decision can never drift from the built plan.
    """
    S = num_shards
    padded_nodes = S * rows_per_shard
    if hub_k is None:
        hub_k = max(3, S // 2 + 1)

    uniq_remote = []
    for d in range(S):
        valid = blk_weight[d] != 0
        src = blk_src[d][valid].astype(np.int64)
        owners = src // rows_per_shard
        uniq_remote.append(np.unique(src[owners != d]))

    # Hub detection: rows read remotely by >= hub_k shards.
    readers = np.zeros(padded_nodes, np.int32)
    for rem in uniq_remote:
        readers[rem] += 1
    hubs = np.nonzero(readers >= hub_k)[0]
    hub_owner = hubs // rows_per_shard
    per_owner = np.bincount(hub_owner, minlength=S)
    qh = max(int(per_owner.max()) if len(hubs) else 0, 1)
    is_hub = np.zeros(padded_nodes, bool)
    is_hub[hubs] = True

    # Per-(dst, owner) unique NON-HUB boundary sets -> quota q.
    H: List[List[np.ndarray]] = []
    q = 1
    for d in range(S):
        rem = uniq_remote[d]
        rem = rem[~is_hub[rem]]
        owners = rem // rows_per_shard
        bounds = np.searchsorted(owners, np.arange(S + 1))
        Hd = [rem[bounds[s] : bounds[s + 1]] for s in range(S)]
        H.append(Hd)
        q = max(q, max((len(h) for h in Hd), default=1))
    return hubs, hub_owner, qh, H, q


def estimate_halo_quotas(
    blk_src: np.ndarray,
    blk_weight: np.ndarray,
    rows_per_shard: int,
    num_shards: int,
    hub_k: Optional[int] = None,
) -> Tuple[int, int]:
    """(q, qh) for one direction WITHOUT building the plan — no sub-block
    expansion, no slot maps, no device arrays.  Used by comm='auto' to
    compare halo vs all-gather volume before paying for the full build."""
    _, _, qh, _, q = _boundary_sets(
        blk_src, blk_weight, rows_per_shard, num_shards, hub_k
    )
    return q, qh


def build_halo_plan(
    blk_src: np.ndarray,  # (S, nblk, B) int32 GLOBAL source ids
    blk_weight: np.ndarray,  # (S, nblk, B) f32, 0 = padding
    blk_local: np.ndarray,  # (S, nblk, B) int32 dst offsets within rowblock
    blk_rowblock: np.ndarray,  # (S, nblk) int32
    rows_per_shard: int,
    num_shards: int,
    R: int,
    B: int,
    hub_k: Optional[int] = None,
) -> Tuple[Dict[str, np.ndarray], int, int]:
    """Returns (plan dict of stacked arrays, q, qh).

    plan keys: loc_src/loc_weight/loc_local/loc_rowblock (local edges,
    shard-local src rows), rem_src/rem_weight/rem_local/rem_rowblock (remote
    edges, src = buffer slot), send_idx (S, S, q), hub_idx (S, qh).
    """
    S = num_shards
    padded_nodes = S * rows_per_shard

    # Per-shard valid edge lists (global src, local dst, weight).
    edges = []
    for d in range(S):
        valid = blk_weight[d] != 0
        src = blk_src[d][valid].astype(np.int64)
        dst_local = (
            blk_rowblock[d][:, None].astype(np.int64) * R + blk_local[d]
        )[valid]
        w = blk_weight[d][valid]
        edges.append((src, dst_local, w))

    hubs, hub_owner, qh, H, q = _boundary_sets(
        blk_src, blk_weight, rows_per_shard, S, hub_k
    )
    hub_idx = np.zeros((S, qh), np.int32)
    hub_slot = np.full(padded_nodes, -1, np.int64)
    for s in range(S):
        hs = hubs[hub_owner == s]
        hub_idx[s, : len(hs)] = (hs - s * rows_per_shard).astype(np.int32)
        hub_slot[hs] = s * qh + np.arange(len(hs))
    is_hub = hub_slot >= 0

    send_idx = np.zeros((S, S, q), np.int32)
    loc_blocks, rem_blocks = [], []
    for d in range(S):
        slot_map = np.zeros(padded_nodes, np.int64)
        for s in range(S):
            rows = H[d][s]
            send_idx[s, d, : len(rows)] = (rows - s * rows_per_shard).astype(
                np.int32
            )
            slot_map[rows] = s * q + np.arange(len(rows))
        slot_map[is_hub] = S * q + hub_slot[is_hub]

        src, dst_local, w = edges[d]
        owners = src // rows_per_shard
        loc_sel = owners == d
        loc_blocks.append(
            _csr_blocks(
                src[loc_sel] - d * rows_per_shard,
                dst_local[loc_sel],
                w[loc_sel],
                rows_per_shard,
                R,
                B,
            )
        )
        rem_sel = ~loc_sel
        rem_blocks.append(
            _csr_blocks(
                slot_map[src[rem_sel]],
                dst_local[rem_sel],
                w[rem_sel],
                rows_per_shard,
                R,
                B,
            )
        )

    # Shared padding convention (weight-0 sub-blocks on the LAST rowblock
    # to preserve sortedness) lives in partition.stack_padded_blocks.
    from plnlp_tpu.parallel.partition import stack_padded_blocks

    loc = stack_padded_blocks(loc_blocks, rows_per_shard, R)
    rem = stack_padded_blocks(rem_blocks, rows_per_shard, R)
    plan = {
        "loc_src": loc["blk_src"].astype(np.int32),
        "loc_weight": loc["blk_weight"],
        "loc_local": loc["blk_local"].astype(np.int32),
        "loc_rowblock": loc["blk_rowblock"].astype(np.int32),
        "rem_src": rem["blk_src"].astype(np.int32),
        "rem_weight": rem["blk_weight"],
        "rem_local": rem["blk_local"].astype(np.int32),
        "rem_rowblock": rem["blk_rowblock"].astype(np.int32),
        "send_idx": send_idx,
        "hub_idx": hub_idx,
    }
    return plan, q, qh
