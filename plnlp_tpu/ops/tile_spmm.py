"""Hybrid dense-tile + blocked-CSR SpMM (the tile-density experiment).

The blocked SpMM's wall is the XLA row gather: row-RATE bound at ~60-125M
rows/s regardless of width (RESULTS.md "gather wall"), so every edge pays
one gathered row.  This module attacks the wall by NOT gathering: after a
locality reordering (community/BFS — parallel.partition.assign_slots or a
caller-provided order), community-structured graphs concentrate edges into
dense diagonal tiles.  A T×T tile with k edges can instead be computed as

    out[rt*T:(rt+1)*T] += A_tile @ x[ct*T:(ct+1)*T]

which reads the x tile as ONE contiguous block (the gather unit becomes a
whole (T, D) tile — the row-rate wall amortized T×) and runs the T×T×D
matmul on the MXU.  Byte cost per tile ≈ T²·s(A) + T·D·s(x); at T=512,
D=256, f32 that is ~1.5 MB ≈ 2 µs of HBM time — cheaper than gathering k
rows once k ≳ 150-250.  Tiles with fill below ``min_fill`` stay on the
blocked gather path (the residual).

Forward/backward both run tile+residual; dX = Aᵀ dY uses the transposed
tile set (per-tile transpose + coordinate swap) and the residual's
transposed blocked structure — a custom VJP, no autodiff through either.

A/B harness: bench_tiles.py; verdict recorded in RESULTS.md (round 3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import Graph, _blocks_np, _csr_np, _pad_to
from plnlp_tpu.ops.spmm import _zero_cotangent, blocked_sum_arrays

__all__ = [
    "HybridGraph",
    "build_hybrid",
    "estimate_hybrid",
    "hybrid_spmm",
    "tile_stats",
    "tile_pass_tiles",
    "label_prop_order",
    "multilevel_order",
]


def _weighted_label_prop(ws, wd, ww, num_nodes, rounds, init=None):
    """Synchronous weighted label propagation (NumPy).  Each round every
    node adopts the neighbor label with the largest incident edge-weight
    sum (ties → smallest label, which also damps oscillation); early-stops
    at a fixed point.  With unit weights this is the mode-of-neighbor-labels
    sweep the native kernel mirrors bit-for-bit (tests/test_native.py)."""
    labels = (
        np.arange(num_nodes, dtype=np.int64) if init is None else init.copy()
    )
    for _ in range(rounds):
        lab_s = labels[ws]
        order = np.lexsort((lab_s, wd))
        dd, ll, www = wd[order], lab_s[order], ww[order]
        change = (dd[1:] != dd[:-1]) | (ll[1:] != ll[:-1])
        starts = np.concatenate([[0], np.nonzero(change)[0] + 1])
        run_dst, run_lab = dd[starts], ll[starts]
        run_w = np.add.reduceat(www, starts)
        # per-dst argmax run: lexsort by (dst, weight, -label) then take the
        # last run of each dst (largest weight; smallest label wins ties)
        o2 = np.lexsort((-run_lab, run_w, run_dst))
        rd, rl = run_dst[o2], run_lab[o2]
        last = np.nonzero(np.concatenate([rd[1:] != rd[:-1], [True]]))[0]
        new = labels.copy()
        new[rd[last]] = rl[last]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def _label_prop_labels(src, dst, num_nodes: int, rounds: int) -> np.ndarray:
    """Final label-prop labels; native C++ when available (the NumPy sweep
    costs ~2 s/round at collab scale), identical labels either way."""
    from plnlp_tpu import native

    if native.available():
        from plnlp_tpu.parallel.partition import _undirected_csr_np

        indptr, indices = _undirected_csr_np(
            np.asarray(src, np.int64), np.asarray(dst, np.int64), num_nodes
        )
        return native.label_prop(indptr, indices, num_nodes, rounds)

    s2 = np.concatenate([src, dst]).astype(np.int64)
    d2 = np.concatenate([dst, src]).astype(np.int64)
    return _weighted_label_prop(
        s2, d2, np.ones(len(s2), np.int64), num_nodes, rounds
    )


def label_prop_order(src, dst, num_nodes: int, rounds: int = 20) -> np.ndarray:
    """Community-recovery node order via label propagation (host-side).

    Each round every node adopts its most frequent neighbor label (ties →
    smallest label); the returned order sorts nodes by final label, so
    same-community nodes become contiguous ids — the locality the
    dense-tile path needs.  Both implementations early-stop at the fixed
    point, so ``rounds`` is a CAP, not a cost: the round-3 default of 5
    was under-converged (measured on the collab-scale 800-community SBM:
    5 rounds leaves 3336 fragments and 85.9% tile coverage; 20 rounds
    converges to 815 communities and 94.5% — AT the true-label ceiling,
    with 34% fewer tiles; native sweep 1.2 s)."""
    return np.argsort(
        _label_prop_labels(src, dst, num_nodes, rounds), kind="stable"
    )


def multilevel_order(
    src, dst, num_nodes: int, rounds: int = 20, coarse_rounds: int = 10
) -> np.ndarray:
    """Multilevel community order: label-prop, then contract each community
    to a supernode and label-prop the COARSE graph (edge weights = inter-
    community edge counts), ordering nodes by (coarse label, fine label).

    Plain label propagation fragments communities whose recovery stalls
    (measured: 5-round sweep on the 800-community SBM → 3336 fragments);
    the coarse pass merges fragments that share most of their edges, and
    the (merged, fine) lexsort keeps each fragment contiguous inside its
    merged span — so a WRONG merge costs little vs the arbitrary
    cross-fragment order it replaces (merged labels can still shift
    tile-boundary offsets; measured coverage jitter < 0.1% when plain
    label-prop had already converged).  It exists for real-world graphs
    with hierarchical or hard-to-recover community structure."""
    lab0 = _label_prop_labels(src, dst, num_nodes, rounds)
    u0, inv0 = np.unique(lab0, return_inverse=True)
    c0 = len(u0)
    s = np.asarray(src, np.int64)
    d = np.asarray(dst, np.int64)
    cs, cd = inv0[s], inv0[d]
    keep = cs != cd
    if not keep.any() or c0 <= 1:
        return np.argsort(lab0, kind="stable")
    key = cs[keep] * c0 + cd[keep]
    uk, cnt = np.unique(key, return_counts=True)
    ws = (uk // c0).astype(np.int64)
    wd = (uk % c0).astype(np.int64)
    # propagate along both directions (input need not be symmetric; for a
    # symmetric input this doubles every weight uniformly — harmless)
    lab1 = _weighted_label_prop(
        np.concatenate([ws, wd]),
        np.concatenate([wd, ws]),
        np.concatenate([cnt, cnt]).astype(np.int64),
        c0,
        coarse_rounds,
    )
    merged = lab1[inv0]
    return np.lexsort((lab0, merged))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "tile_vals",
        "tile_row",
        "tile_col",
        "tile_vals_t",
        "tile_row_t",
        "tile_col_t",
        "res_graph",
        "res_graph_t",
        "perm_in",
        "perm_out",
        "in_degrees",
        "row_mask",
        "row_mask_t",
    ],
    meta_fields=[
        "num_nodes", "tile", "num_tiles", "dense_edges", "res_edges",
        "reorder",
    ],
)
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    """Dense tiles (both directions) + blocked residual graphs.

    ``tile_vals``: (nt, T, T), A[rt*T+i, ct*T+j] per tile — row =
    destination.  Tiles sorted by ``tile_row`` so the output scatter is a
    sorted segment sum.  ``*_t`` fields are the transposed set (backward).

    ``perm_in``/``perm_out`` (optional, (num_nodes,) int32): an internal
    locality relabeling (label-prop order) applied as pure gathers at the
    custom-VJP boundary — callers keep ORIGINAL node ids everywhere.
    perm_in[slot] = original id; perm_out[original id] = slot.
    """

    tile_vals: jnp.ndarray
    tile_row: jnp.ndarray  # (nt,) int32, sorted
    tile_col: jnp.ndarray  # (nt,) int32
    tile_vals_t: jnp.ndarray
    tile_row_t: jnp.ndarray
    tile_col_t: jnp.ndarray
    res_graph: Optional[Graph]
    res_graph_t: Optional[Graph]
    num_nodes: int
    tile: int
    num_tiles: int
    dense_edges: int
    res_edges: int
    perm_in: Optional[jnp.ndarray] = None
    perm_out: Optional[jnp.ndarray] = None
    # (num_nodes,) f32 unweighted in-degrees in ORIGINAL id space,
    # precomputed at build time — recomputing from tile_vals would re-read
    # the whole (up to 2 GiB) tile store every mean-reduce call.
    in_degrees: Optional[jnp.ndarray] = None
    # (n_rowtiles,) bool — True where at least one dense tile maps to the
    # row tile.  None when every row tile is covered.  The Pallas tile
    # kernel leaves uncovered output row tiles undefined; these masks zero
    # them.  The XLA fallback ignores them (segment_sum zero-fills).
    row_mask: Optional[jnp.ndarray] = None
    row_mask_t: Optional[jnp.ndarray] = None
    reorder: str = "none"


def tile_stats(src, dst, num_nodes: int, tile: int = 512):
    """Histogram of edges per (row_tile, col_tile) — fill diagnostics."""
    rt = np.asarray(dst, np.int64) // tile
    ct = np.asarray(src, np.int64) // tile
    nC = _pad_to(num_nodes, tile) // tile
    key = rt * nC + ct
    uniq, counts = np.unique(key, return_counts=True)
    return counts


def _build_tiles(src, dst, w, num_nodes, tile, min_fill, max_tiles=None):
    """Split edges into dense-tile set and residual; build (vals, row, col)
    sorted by row tile.  Host-side NumPy.  ``max_tiles`` keeps only the
    densest tiles when more qualify (ties broken arbitrarily)."""
    T = tile
    nC = _pad_to(num_nodes, T) // T
    rt = dst // T
    ct = src // T
    key = rt * nC + ct
    uniq, counts = np.unique(key, return_counts=True)
    qual = counts >= min_fill
    if max_tiles is not None and int(qual.sum()) > max_tiles:
        top = np.argsort(-counts, kind="stable")[:max_tiles]
        qual = np.zeros(len(uniq), bool)
        qual[top] = True
    dense_sel_keys = uniq[qual]
    # Sorted-key membership (O(E log S)) — a dense nC*nC lookup table is
    # quadratic in node count (~47 GB host RAM at papers100M scale).
    dense_mask = np.isin(key, dense_sel_keys)

    d_src, d_dst, d_w = src[dense_mask], dst[dense_mask], w[dense_mask]
    r_src, r_dst, r_w = src[~dense_mask], dst[~dense_mask], w[~dense_mask]

    # tiles sorted by (row, col) — row-major, so tile_row is sorted
    tile_keys = np.sort(dense_sel_keys)
    nt = len(tile_keys)
    tile_row = (tile_keys // nC).astype(np.int32)
    tile_col = (tile_keys % nC).astype(np.int32)
    vals = np.zeros((max(nt, 1), T, T), np.float32)
    if nt:
        slot = np.searchsorted(tile_keys, key[dense_mask])
        np.add.at(vals, (slot, d_dst % T, d_src % T), d_w)
    return vals, tile_row, tile_col, (r_src, r_dst, r_w), int(len(d_src))


def _community_order(reorder: str, es, ed, num_nodes: int) -> np.ndarray:
    """Dispatch the locality reorder by mode name."""
    if reorder == "multilevel":
        return multilevel_order(es, ed, num_nodes)
    return label_prop_order(es, ed, num_nodes)


def estimate_hybrid(
    src,
    dst,
    *,
    num_nodes: int,
    tile: int = 512,
    min_fill: int = 192,
    symmetrize: bool = False,
    coalesce: bool = True,
    max_tile_bytes: int = 2 * 1024**3,
    reorder: Optional[str] = "labelprop",
) -> dict:
    """Cheap build-time estimate of what the hybrid backend would get.

    Runs the locality reorder and the tile-key histogram — NO tile
    materialization, no residual CSR build — so ``--adj_backend=auto``
    can decide hybrid-vs-blocked before paying the full build.  Cost is
    the reorder sweep itself (~1-2 s native at collab scale) plus one
    ``np.unique`` over E keys.

    Returns ``{"coverage", "num_tiles", "num_edges", "order"}``:
    ``coverage`` is the fraction of (coalesced) edges that would ride
    dense tiles at this tile/min_fill/budget, and ``order`` (None when
    ``reorder='none'``) can be handed to ``build_hybrid(order=...)`` so
    the chosen backend does not run the reorder a second time.
    """
    csr = _csr_np(src, dst, None, num_nodes, symmetrize, coalesce, 1)
    e = csr["num_edges"]
    es = csr["senders"][:e].astype(np.int64)
    ed = csr["receivers"][:e].astype(np.int64)

    order = None
    if reorder in ("labelprop", "cluster", "multilevel"):
        order = _community_order(reorder, es, ed, num_nodes)
        node_map = np.empty(num_nodes, np.int64)
        node_map[order] = np.arange(num_nodes)
        es, ed = node_map[es], node_map[ed]
    elif reorder not in (None, "none"):
        raise ValueError(f"unknown reorder mode: {reorder!r}")

    nC = _pad_to(num_nodes, tile) // tile
    key = (ed // tile) * nC + (es // tile)
    _, counts = np.unique(key, return_counts=True)
    qual = counts[counts >= min_fill]
    max_tiles = max(int(max_tile_bytes // (tile * tile * 4)), 1)
    if len(qual) > max_tiles:
        qual = np.sort(qual)[-max_tiles:]
    dense = int(qual.sum())
    return {
        "coverage": dense / max(e, 1),
        "num_tiles": int(len(qual)),
        "num_edges": int(e),
        "order": order,
    }


def build_hybrid(
    src,
    dst,
    weight=None,
    *,
    num_nodes: int,
    tile: int = 512,
    min_fill: int = 192,
    block: Tuple[int, int] = (512, 512),
    symmetrize: bool = False,
    coalesce: bool = True,
    max_tile_bytes: int = 2 * 1024**3,
    dtype="float32",
    reorder: Optional[str] = None,
    order: Optional[np.ndarray] = None,
) -> HybridGraph:
    """Build the hybrid operand.  ``min_fill``: minimum edges per T×T tile
    to run it dense; below that the edge stays on the blocked gather path.
    NOTE: callers should apply a locality reorder (BFS/community/label-prop)
    to the node ids FIRST — at random id order almost no tile clears
    min_fill and this degenerates to the plain blocked SpMM plus overhead.

    ``max_tile_bytes`` bounds the dense-tile storage (BOTH directions are
    kept, so the budget is per direction): when the qualifying tile set
    exceeds it, min_fill is raised to the largest-count tiles that fit —
    a safety valve, since tile memory is E_dense/fill × 4 bytes and
    low-fill regimes explode it (measured: 50-community SBM at collab
    scale = 0.22% fill = 12.7 GB — unshippable; RESULTS.md round 3).

    ``order``: a precomputed reorder permutation (order[slot] = old id),
    e.g. from ``estimate_hybrid`` — skips re-running the ``reorder``
    sweep; only consulted when ``reorder`` names a community mode."""
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, 1)
    e = csr["num_edges"]
    es = csr["senders"][:e].astype(np.int64)
    ed = csr["receivers"][:e].astype(np.int64)
    ew = csr["edge_weight"][:e].astype(np.float32)

    # unweighted in-degrees in ORIGINAL id space (before any relabel)
    in_deg = np.bincount(ed, minlength=num_nodes).astype(np.float32)

    perm_in = perm_out = None
    resolved = "none"
    if reorder in ("labelprop", "cluster", "multilevel"):
        if order is None:
            order = _community_order(reorder, es, ed, num_nodes)
        else:
            order = np.asarray(order, np.int64)  # order[slot] = old id
        resolved = "multilevel" if reorder == "multilevel" else "labelprop"
        node_map = np.empty(num_nodes, np.int64)
        node_map[order] = np.arange(num_nodes)
        es, ed = node_map[es], node_map[ed]
        perm_in = order.astype(np.int32)
        perm_out = node_map.astype(np.int32)
    elif reorder not in (None, "none"):
        raise ValueError(f"unknown reorder mode: {reorder!r}")

    max_tiles = max(int(max_tile_bytes // (tile * tile * 4)), 1)
    vals, trow, tcol, (r_src, r_dst, r_w), n_dense = _build_tiles(
        es, ed, ew, num_nodes, tile, min_fill, max_tiles=max_tiles
    )
    if len(trow) == 0:
        # zero qualifying tiles: _build_tiles keeps one all-zero tile so
        # shapes stay static — give it coordinates (0, 0); it adds nothing
        trow = tcol = np.zeros(1, np.int32)
    # transposed tile set: swap coords, transpose each tile, re-sort by row
    vals_t = vals.transpose(0, 2, 1)
    order_t = np.lexsort((trow, tcol))
    tvals_t = np.ascontiguousarray(vals_t[order_t])
    trow_t = tcol[order_t]
    tcol_t = trow[order_t]

    # row-tile coverage masks for the Pallas tile kernel (uncovered output
    # row tiles are undefined there); None when fully covered (common for
    # community-reordered graphs — skips the masking pass entirely)
    nR = _pad_to(num_nodes, tile) // tile

    def _coverage(rows):
        m = np.zeros(nR, bool)
        m[rows] = True
        return None if m.all() else m

    row_mask = _coverage(trow)
    row_mask_t = _coverage(trow_t)

    # int8 tile storage: exact for 0/1 adjacencies and small integer edge
    # weights — halves the dominant vals HBM term vs bf16 (the kernel and
    # the XLA fallback both cast to the compute dtype in-register/VMEM)
    if np.all(vals == np.round(vals)) and np.abs(vals).max() <= 127:
        store_dt = np.int8
    else:
        store_dt = jnp.dtype(dtype)

    if len(r_src):
        res_csr = _csr_np(r_src, r_dst, r_w, num_nodes, False, False, 1)
        res_csr_t = _csr_np(r_dst, r_src, r_w, num_nodes, False, False, 1)
        from plnlp_tpu.graph import _to_graph

        # The residual is sparse BY CONSTRUCTION (inter-community edges
        # only), so block_edges is capped at the Pallas sub-block width:
        # B=512 pads the residual's gathered rows 1.70x where 128 pads
        # 1.27x, and the residual gather is the hybrid step's largest
        # term.  Chip A/B (round 5): 19.4 ms @ B=512 vs 17.9-18.2 ms
        # @ B=128; B=64 gives the padding back to the kernel's internal
        # sub-block pad.  Explicit block_edges < 128 is honored.
        res_block = (block[0], min(block[1], 128))
        res_g = _to_graph(res_csr, _blocks_np(res_csr, *res_block))
        res_gt = _to_graph(res_csr_t, _blocks_np(res_csr_t, *res_block))
    else:
        res_g = res_gt = None

    # tiles stored int8 when exact (see above) else in the COMPUTE dtype
    # (bf16 halves bytes AND skips a full-array cast per pass); the matmul
    # accumulates in f32 regardless
    return HybridGraph(
        tile_vals=jnp.asarray(vals.astype(store_dt)),
        tile_row=jnp.asarray(trow, jnp.int32),
        tile_col=jnp.asarray(tcol, jnp.int32),
        tile_vals_t=jnp.asarray(tvals_t.astype(store_dt)),
        tile_row_t=jnp.asarray(trow_t, jnp.int32),
        tile_col_t=jnp.asarray(tcol_t, jnp.int32),
        res_graph=res_g,
        res_graph_t=res_gt,
        num_nodes=num_nodes,
        tile=tile,
        num_tiles=int(len(trow)),
        dense_edges=n_dense,
        res_edges=int(len(r_src)),
        perm_in=None if perm_in is None else jnp.asarray(perm_in),
        perm_out=None if perm_out is None else jnp.asarray(perm_out),
        in_degrees=jnp.asarray(in_deg),
        row_mask=None if row_mask is None else jnp.asarray(row_mask),
        row_mask_t=None if row_mask_t is None else jnp.asarray(row_mask_t),
        reorder=resolved,
    )


# Tiles processed per fori_loop chunk: bounds the gathered x-tile
# intermediate to chunk*T*D*4 bytes (128 * 512 * 256 * 4 = 64 MB at D=256).
_TILE_CHUNK = 128


def tile_pass_tiles(vals, trow, tcol, x_tiles, n_rowtiles, row_mask=None):
    """out[trow] += vals @ x_tiles[tcol]; returns (n_rowtiles * T, D).

    The core tile pass over pre-tiled features — used directly by the
    multi-chip path (parallel.graph_parallel), where ``x_tiles`` is the
    all-gathered feature buffer and ``trow`` is shard-local.  Pallas fused
    kernel on TPU (ops/pallas_tiles); chunked einsum + segment-sum in XLA
    otherwise."""
    nt, T, _ = vals.shape
    nR = n_rowtiles
    d = x_tiles.shape[-1]
    x_dt = x_tiles.dtype

    from plnlp_tpu.ops.pallas_tiles import tile_matmul, tile_pallas_supported

    d_pad = -d % 128
    if tile_pallas_supported(T, d + d_pad):
        # fused block-sparse kernel: no (nt, T, D) partials round-trip,
        # no scatter-add — vals and x tiles stream straight into the MXU.
        # Odd feature dims (citation2's 200) pad up to the 128-lane
        # boundary: ≤28% extra MXU work beats the partials round-trip the
        # XLA fallback pays.
        if d_pad:
            x_tiles = jnp.pad(x_tiles, ((0, 0), (0, 0), (0, d_pad)))
        out = tile_matmul(vals, trow, tcol, x_tiles, nR)
        if d_pad:
            out = out[:, :d]
        if row_mask is not None:
            out = jnp.where(
                jnp.repeat(row_mask, T)[:, None], out, jnp.zeros((), out.dtype)
            )
        return out

    if nt <= _TILE_CHUNK:
        xt = x_tiles[tcol]  # (nt, T, D) — ONE contiguous-tile gather
        part = jnp.einsum(
            "nuv,nvd->nud", vals.astype(x_dt), xt,
            preferred_element_type=jnp.float32,
        ).astype(x_dt)
        out = jax.ops.segment_sum(
            part, trow, num_segments=nR, indices_are_sorted=True
        )
        return out.reshape(nR * T, d)

    nchunks = -(-nt // _TILE_CHUNK)
    pad = nchunks * _TILE_CHUNK - nt
    # padding tiles: zero values -> harmless adds into row tile 0
    vals_p = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
    trow_p = jnp.pad(trow, (0, pad))
    tcol_p = jnp.pad(tcol, (0, pad))

    def body(i, acc):
        v = jax.lax.dynamic_slice_in_dim(vals_p, i * _TILE_CHUNK, _TILE_CHUNK)
        r = jax.lax.dynamic_slice_in_dim(trow_p, i * _TILE_CHUNK, _TILE_CHUNK)
        c = jax.lax.dynamic_slice_in_dim(tcol_p, i * _TILE_CHUNK, _TILE_CHUNK)
        xt = x_tiles[c]
        part = jnp.einsum(
            "nuv,nvd->nud", v.astype(x_dt), xt,
            preferred_element_type=jnp.float32,
        ).astype(x_dt)
        return acc.at[r].add(part)

    out = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((nR, T, d), x_dt)
    )
    return out.reshape(nR * T, d)


def is_padded_operand(hg: "HybridGraph", x) -> bool:
    """True iff ``x`` rides the padded-carry protocol: a PERM-FREE hybrid
    operand whose row count is exactly num_nodes rounded up to the tile
    size (and strictly above num_nodes).  The protocol is in-band by
    design — that one shape opts in; callers passing oversized feature
    matrices for any other reason must slice to num_nodes themselves
    (the pre-round-5 "arbitrary extra rows are sliced off" contract is
    narrowed to every shape EXCEPT this one).  Single source of the
    predicate for apply_encoder / hybrid_spmm / hybrid_transformer_conv
    / _hybrid_dir."""
    return (
        hg.perm_in is None
        and x.shape[0] != hg.num_nodes
        and x.shape[0] == _pad_to(hg.num_nodes, hg.tile)
    )


def _tile_pass(vals, trow, tcol, x, num_nodes, T, row_mask=None):
    """out[trow] += vals @ x_tiles[tcol]; returns (rows_pad, D)."""
    n_pad = _pad_to(num_nodes, T)
    if x.shape[0] != n_pad:
        # padded-carry callers (apply_encoder over a perm-free hybrid)
        # hand x at n_pad rows already — the pad becomes a free reshape
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    x_tiles = x.reshape(n_pad // T, T, x.shape[-1])
    return tile_pass_tiles(vals, trow, tcol, x_tiles, n_pad // T, row_mask)


def _hybrid_dir(hg: HybridGraph, x, direction: str):
    """One aggregation direction over the hybrid operand.  Output rows
    follow the INPUT rows: x at num_nodes rows -> (num_nodes, D); x already
    tile-padded to n_pad rows (padded-carry) -> (n_pad, D) with zero pad
    rows — pad sources have no edges (all-zero tile columns / absent from
    the residual's blk_src), so garbage pad-row features cannot propagate
    into real rows in either direction."""
    n = hg.num_nodes
    n_pad = _pad_to(n, hg.tile)
    padded = is_padded_operand(hg, x)
    if direction == "fwd":
        vals, trow, tcol, mask, res = (
            hg.tile_vals, hg.tile_row, hg.tile_col, hg.row_mask,
            (hg.res_graph, hg.res_graph_t),
        )
    else:
        vals, trow, tcol, mask, res = (
            hg.tile_vals_t, hg.tile_row_t, hg.tile_col_t, hg.row_mask_t,
            (hg.res_graph_t, hg.res_graph),
        )
    rows = n_pad if padded else n
    out = _tile_pass(vals, trow, tcol, x, n, hg.tile, row_mask=mask)[:rows]
    g = res[0]
    if g is not None:
        # NB: bp is NOT bounded by n_pad in general — block_rows can
        # exceed the tile size (e.g. small graphs with the default
        # block=(512,512) and a smaller tile), in which case bp > n_pad
        # and the else arm's slice handles it.  Only the strictly-shorter
        # case may use the prefix add.
        bp = _pad_to(n, g.block_rows)
        res_out = blocked_sum_arrays(
            x, g.blk_src, g.blk_weight, g.blk_local, g.blk_rowblock,
            g.block_rows, bp,
        )
        if padded and bp < n_pad:
            out = out.at[:bp].add(res_out)
        else:
            out = out + res_out[:rows]
    return out


# The internal relabeling (perm_in/perm_out) is applied HERE, inside the
# custom VJP, as pure gathers: with permutation P (x_slots = P x) the
# slot-space operator A_s computes y = Pᵀ A_s P x, so dX = Pᵀ A_sᵀ P dY —
# the same in/out sandwich both directions, never a scatter.


@jax.custom_vjp
def _hybrid_core(hg: HybridGraph, x):
    if hg.perm_in is not None:
        x = x[hg.perm_in]
    y = _hybrid_dir(hg, x, "fwd")
    return y if hg.perm_out is None else y[hg.perm_out]


def _hybrid_fwd(hg, x):
    return _hybrid_core(hg, x), hg


def _hybrid_bwd(hg, g):
    if hg.perm_in is not None:
        g = g[hg.perm_in]
    dx = _hybrid_dir(hg, g, "bwd")
    if hg.perm_out is not None:
        dx = dx[hg.perm_out]
    return (jax.tree_util.tree_map(_zero_cotangent, hg), dx)


_hybrid_core.defvjp(_hybrid_fwd, _hybrid_bwd)


def hybrid_spmm(hg: HybridGraph, x: jnp.ndarray, reduce: str = "sum"):
    """Sum/mean aggregation over the hybrid operand; x is (num_nodes, D),
    or — padded-carry, perm-free operands only — (n_pad, D) with n_pad =
    num_nodes rounded up to the tile size, in which case the output keeps
    the padded row count (pad rows zero) and the per-layer pad/slice
    copies of the encoder loop vanish (apply_encoder drives this)."""
    n = hg.num_nodes
    if is_padded_operand(hg, x):
        out = _hybrid_core(hg, x)
    else:
        out = _hybrid_core(hg, x[:n])
    if reduce == "mean":
        deg = hg.in_degrees  # precomputed, original id space
        scale = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        if out.shape[0] != scale.shape[0]:
            scale = jnp.pad(scale, (0, out.shape[0] - scale.shape[0]))
        out = out * scale[:, None].astype(out.dtype)
    elif reduce != "sum":
        raise ValueError(f"unknown reduce: {reduce}")
    return out
