"""Halo exchange: boundary-row communication for the partitioned SpMM.

v1 (graph_parallel) all-gathers the full feature matrix per layer — N×D over
ICI regardless of how many remote rows a shard actually reads.  The halo
plan computed here sends only the UNIQUE source rows each destination shard
needs, padded to a static per-peer quota q:

  host:   H[d][s] = unique sources of shard d's edges owned by shard s
          q        = max |H[d][s]|  (static padding quota)
          send_idx[s, d, :] = H[d][s] localized to s   (what s sends to d)
          halo_src[d]       = edge sources remapped to s·q + rank-in-H[d][s]
  device: send  = x_local[send_idx[me].flatten()]          (S·q, D) gather
          halo  = all_to_all(send, 'node')                  ICI exchange
          out   = blocked scatter-matmul over halo rows

Communication drops from N×D to S·q×D per shard; for graphs whose partition
captures locality q ≪ N.  Same plan is built for the backward structure, so
the custom VJP never routes autodiff through the exchange.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["build_halo_plan"]


def build_halo_plan(
    blk_src: np.ndarray,  # (S, nblk, B) int32 GLOBAL source ids
    blk_weight: np.ndarray,  # (S, nblk, B) f32, 0 = padding
    rows_per_shard: int,
    num_shards: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (send_idx (S, S, q) int32 local rows,
                halo_src (S, nblk, B) int32 remapped into the halo buffer,
                q)."""
    S = num_shards
    uniq_per_shard = []
    seg_bounds = []  # per shard d: indices splitting uniq by owner
    for d in range(S):
        srcs = blk_src[d][blk_weight[d] != 0].astype(np.int64)
        uniq = np.unique(srcs) if srcs.size else np.zeros(0, np.int64)
        uniq_per_shard.append(uniq)
        owners = uniq // rows_per_shard
        # segment start of each owner within uniq (owners sorted since uniq is)
        bounds = np.searchsorted(owners, np.arange(S + 1))
        seg_bounds.append(bounds)

    q = 1
    for d in range(S):
        b = seg_bounds[d]
        q = max(q, int(np.max(b[1:] - b[:-1])) if len(b) > 1 else 1)

    send_idx = np.zeros((S, S, q), np.int32)
    for d in range(S):
        uniq, b = uniq_per_shard[d], seg_bounds[d]
        for s in range(S):
            rows = uniq[b[s] : b[s + 1]] - s * rows_per_shard
            send_idx[s, d, : len(rows)] = rows

    halo_src = np.zeros_like(blk_src)
    for d in range(S):
        uniq, b = uniq_per_shard[d], seg_bounds[d]
        flat = blk_src[d].reshape(-1).astype(np.int64)
        w = blk_weight[d].reshape(-1)
        pos = np.searchsorted(uniq, flat)  # exact for real edges
        owners = flat // rows_per_shard
        within = pos - b[np.minimum(owners, len(b) - 2)]
        remapped = owners * q + within
        remapped[w == 0] = 0  # padding edges point at slot 0 (weight 0)
        halo_src[d] = remapped.reshape(blk_src[d].shape).astype(np.int32)

    return send_idx, halo_src, q
