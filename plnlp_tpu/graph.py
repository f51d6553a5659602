"""TPU-native graph container and host-side preprocessing.

Replaces the reference's torch_sparse ``SparseTensor`` CSR storage and its
edge-list transforms (reference: main.py:81-186, plnlp/utils.py:83-97) with an
immutable JAX pytree holding static-shape int32/float32 arrays:

* Edges are stored in COO sorted by (receiver, sender) — i.e. CSR order over
  destination rows — plus a CSR ``indptr`` over receivers.  This is the layout
  every aggregation kernel consumes (see ops/spmm.py).
* All arrays are padded to static sizes (TPU/XLA requires static shapes);
  padding edges carry ``edge_weight == 0`` so they are no-ops in every
  weighted aggregation, and ``receiver == num_nodes - 1`` so sortedness holds.
* One-time graph surgery (coalesce/dedup, symmetrization, self-loops, degree
  normalizations) happens host-side in NumPy, mirroring the reference's
  "precompute once on the adjacency" design (main.py:177-186).

Design note: unlike torch_sparse there is no dynamic sparse algebra here — the
graph is frozen after preprocessing and everything downstream is pure function
of static arrays, which is what lets XLA compile one fast train step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Graph",
    "build_graph",
    "prepare_graph",
    "coalesce_edges",
    "to_undirected_edges",
    "add_self_loop_edges",
    "gcn_normalize_edges",
    "row_normalize_edges",
    "transpose_graph",
    "with_blocks",
]

# Edge arrays are padded to a multiple of this (keeps shapes friendly for
# vectorized kernels and limits recompilation across similar graphs).
_EDGE_PAD = 512


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "senders",
        "receivers",
        "edge_weight",
        "indptr",
        "blk_src",
        "blk_weight",
        "blk_local",
        "blk_rowblock",
        "edge_mask",
        "tconv_map",
    ],
    meta_fields=[
        "num_nodes",
        "num_edges",
        "block_rows",
        "block_edges",
        "max_degree",
    ],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Immutable CSR-ordered edge set.

    ``senders[e] -> receivers[e]`` is one message edge (source -> destination),
    matching the reference convention where ``adj_t`` rows are destinations
    (torch_sparse CSR; reference main.py:81-83).  Sorted by (receiver, sender).

    The ``blk_*`` fields are optional MXU-friendly blocking metadata attached
    by :func:`with_blocks` and consumed by ``ops.spmm.spmm_blocked``.
    """

    senders: jnp.ndarray  # [E_pad] int32, source node per edge
    receivers: jnp.ndarray  # [E_pad] int32, destination node per edge (sorted)
    edge_weight: jnp.ndarray  # [E_pad] float32; padding edges have weight 0
    indptr: jnp.ndarray  # [N + 1] int32 over receivers (real edges only)
    num_nodes: int
    num_edges: int  # number of REAL (non-padding) edges

    # --- optional blocked-SpMM metadata (None until with_blocks) ---
    blk_src: Optional[jnp.ndarray] = None  # [nblk, B] int32
    blk_weight: Optional[jnp.ndarray] = None  # [nblk, B] float32 (0 = pad)
    blk_local: Optional[jnp.ndarray] = None  # [nblk, B] int32, dst - rowblock*R
    blk_rowblock: Optional[jnp.ndarray] = None  # [nblk] int32, sorted
    block_rows: int = 0  # R: rows per row-block
    block_edges: int = 0  # B: edges per sub-block
    # Bit-packed N×N adjacency mask for O(1) membership tests (small graphs
    # only; see sampling.edges_exist). [N * ceil(N/8)] uint8.
    edge_mask: Optional[jnp.ndarray] = None
    max_degree: int = 0  # bounds the CSR binary search on big graphs
    # On a graph whose TRANSPOSE is also blocked (prepare_graph with
    # couple_transpose=True): for each of the transposed structure's block
    # slots, the flat index of the SAME edge in THIS graph's (nblk*B,)
    # block slots.  Lets the TransformerConv hand-VJP re-lay per-edge
    # runtime scalars (attention weights, softmax-Jacobian terms) from fwd
    # to bwd layout with one gather (ops/transformer.py).  [nblk_t, B] i32.
    tconv_map: Optional[jnp.ndarray] = None

    @property
    def num_edges_padded(self) -> int:
        return int(self.senders.shape[0])

    @property
    def in_degrees(self) -> jnp.ndarray:
        """Number of real in-edges per destination row (unweighted count)."""
        return jnp.diff(self.indptr)

    def weighted_in_degrees(self) -> jnp.ndarray:
        """Sum of edge weights per destination row (torch_sparse sum(dim=1))."""
        return jax.ops.segment_sum(
            self.edge_weight,
            self.receivers,
            num_segments=self.num_nodes,
            indices_are_sorted=True,
        )


# ---------------------------------------------------------------------------
# Host-side (NumPy) edge-list transforms.
#
# These mirror the one-time graph surgery the reference performs with
# torch_sparse / PyG utilities before training starts:
#   coalesce        <- torch_sparse.coalesce          (main.py:8,141)
#   to_undirected   <- torch_geometric.to_undirected  (main.py:7,122,134)
#   add_self_loops  <- SparseTensor.set_diag          (utils.py:84)
#   symmetrize      <- SparseTensor.to_symmetric      (main.py:110)
# ---------------------------------------------------------------------------


def _as_np(x) -> np.ndarray:
    return np.asarray(x)


def coalesce_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
    reduce: str = "add",
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Sort edges by (dst, src) and merge duplicates (reduce: add|max|min|mean).

    Equivalent role to torch_sparse.coalesce (reference main.py:141) but runs
    once on the host; uses float64-safe int64 keys.  The common reduce='add'
    case goes through the native graphcore library when available (~10x the
    NumPy sort/unique pipeline); other reduces use NumPy.
    """
    src = _as_np(src).astype(np.int64)
    dst = _as_np(dst).astype(np.int64)
    if reduce == "add":
        from plnlp_tpu import native

        if native.available():
            ns, nd, nw = native.coalesce_add(src, dst, weight, num_nodes)
            return ns, nd, (None if weight is None else nw)
    key = dst * int(num_nodes) + src
    order = np.argsort(key, kind="stable")
    key = key[order]
    uniq_key, first_idx, inverse = np.unique(key, return_index=True, return_inverse=True)
    new_dst = (uniq_key // num_nodes).astype(np.int64)
    new_src = (uniq_key % num_nodes).astype(np.int64)
    if weight is None:
        return new_src, new_dst, None
    w = _as_np(weight).astype(np.float64)[order]
    if reduce == "add":
        new_w = np.zeros(len(uniq_key), dtype=np.float64)
        np.add.at(new_w, inverse, w)
    elif reduce == "mean":
        new_w = np.zeros(len(uniq_key), dtype=np.float64)
        cnt = np.zeros(len(uniq_key), dtype=np.float64)
        np.add.at(new_w, inverse, w)
        np.add.at(cnt, inverse, 1.0)
        new_w = new_w / cnt
    elif reduce == "max":
        new_w = np.full(len(uniq_key), -np.inf)
        np.maximum.at(new_w, inverse, w)
    elif reduce == "min":
        new_w = np.full(len(uniq_key), np.inf)
        np.minimum.at(new_w, inverse, w)
    else:
        raise ValueError(f"unknown reduce: {reduce}")
    return new_src, new_dst, new_w.astype(np.float32)


def to_undirected_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
    reduce: str = "add",
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Both directions + coalesce (PyG to_undirected; reference main.py:122,134)."""
    src = _as_np(src)
    dst = _as_np(dst)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    w2 = None if weight is None else np.concatenate([_as_np(weight)] * 2)
    return coalesce_edges(s2, d2, w2, num_nodes, reduce=reduce)


def add_self_loop_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
    fill_value: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Insert/overwrite diagonal entries (torch_sparse set_diag; utils.py:84).

    Existing (i, i) edges are replaced by ``fill_value``, matching set_diag.
    """
    src = _as_np(src).astype(np.int64)
    dst = _as_np(dst).astype(np.int64)
    off_diag = src != dst
    src = src[off_diag]
    dst = dst[off_diag]
    loops = np.arange(num_nodes, dtype=np.int64)
    new_src = np.concatenate([src, loops])
    new_dst = np.concatenate([dst, loops])
    if weight is None:
        new_w = None
    else:
        w = _as_np(weight).astype(np.float32)[off_diag]
        new_w = np.concatenate([w, np.full(num_nodes, fill_value, np.float32)])
    return coalesce_edges(new_src, new_dst, new_w, num_nodes)


def gcn_normalize_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric GCN normalization with self-loops.

    Mirrors reference utils.py:83-89: ``A <- set_diag(A)``; ``deg = A.sum(1)``;
    ``A <- D^-1/2 A D^-1/2`` (inf -> 0 on isolated nodes).
    """
    if weight is None:
        weight = np.ones(len(_as_np(src)), dtype=np.float32)
    src, dst, w = add_self_loop_edges(src, dst, weight, num_nodes, fill_value=1.0)
    deg = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(deg, dst, w.astype(np.float64))
    with np.errstate(divide="ignore"):
        dinv = np.power(deg, -0.5)
    dinv[np.isinf(dinv)] = 0.0
    new_w = (dinv[dst] * w * dinv[src]).astype(np.float32)
    return src, dst, new_w


def row_normalize_edges(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row normalization ``D^-1 A`` without self-loops (utils.py:92-97; WSAGE)."""
    src = _as_np(src)
    dst = _as_np(dst)
    if weight is None:
        weight = np.ones(len(src), dtype=np.float32)
    w = _as_np(weight).astype(np.float64)
    deg = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(deg, dst, w)
    with np.errstate(divide="ignore"):
        dinv = np.power(deg, -1.0)
    dinv[np.isinf(dinv)] = 0.0
    return src, dst, (dinv[dst] * w).astype(np.float32)


# ---------------------------------------------------------------------------
# Graph construction
# ---------------------------------------------------------------------------


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _csr_np(
    src,
    dst,
    weight,
    num_nodes: int,
    symmetrize: bool,
    coalesce: bool,
    edge_pad_multiple: int,
):
    """All-NumPy CSR assembly.  Returns a dict of HOST arrays.

    Kept strictly host-side: device→host readback over a TPU tunnel is orders
    of magnitude slower than h2d, so preprocessing never round-trips.
    """
    src = _as_np(src).astype(np.int64)
    dst = _as_np(dst).astype(np.int64)
    if weight is not None:
        weight = _as_np(weight).astype(np.float32)
    if symmetrize:
        src, dst, weight = to_undirected_edges(src, dst, weight, num_nodes)
    elif coalesce:
        src, dst, weight = coalesce_edges(src, dst, weight, num_nodes)
    else:
        order = np.argsort(dst * int(num_nodes) + src, kind="stable")
        src, dst = src[order], dst[order]
        if weight is not None:
            weight = weight[order]
    if weight is None:
        weight = np.ones(len(src), dtype=np.float32)

    num_edges = len(src)
    e_pad = max(_pad_to(num_edges, edge_pad_multiple), edge_pad_multiple)
    if edge_pad_multiple % 1024 and e_pad % 1024 == 0:
        # keep COO-length row gathers (SDDMM / edge-softmax / segment SpMM
        # gather q[receivers], kv[senders]) off the slow %1024 residue —
        # see _align_blocks
        e_pad += edge_pad_multiple
    pad = e_pad - num_edges
    senders = np.concatenate([src, np.zeros(pad, np.int64)]).astype(np.int32)
    receivers = np.concatenate(
        [dst, np.full(pad, num_nodes - 1, np.int64)]
    ).astype(np.int32)
    w = np.concatenate([weight, np.zeros(pad, np.float32)]).astype(np.float32)

    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return {
        "senders": senders,
        "receivers": receivers,
        "edge_weight": w,
        "indptr": indptr,
        "num_nodes": int(num_nodes),
        "num_edges": int(num_edges),
        "max_degree": int(np.diff(indptr).max()) if num_nodes else 0,
    }


# Graphs up to this many nodes get a bit-packed adjacency mask for O(1)
# membership tests in the negative samplers (N=20k -> 50 MB of mask).
_EDGE_MASK_MAX_NODES = 20_000


def _edge_mask_np(csr) -> Optional[np.ndarray]:
    n = csr["num_nodes"]
    if n == 0 or n > _EDGE_MASK_MAX_NODES:
        return None
    e = csr["num_edges"]
    recv = csr["receivers"][:e]
    send = csr["senders"][:e]
    # row-major bit packing: byte (u, v//8), bit v%8 (little-endian bits).
    # Packed in row chunks: a full dense N x N bool intermediate would
    # spike ~400 MB of host RAM at the 20k-node cap for a 50 MB result.
    row_bytes = (n + 7) // 8
    out = np.empty((n, row_bytes), dtype=np.uint8)
    chunk = 2048
    order = np.argsort(recv, kind="stable")
    recv_s, send_s = recv[order], send[order]
    bounds = np.searchsorted(recv_s, np.arange(0, n + chunk, chunk))
    dense = np.zeros((chunk, n), dtype=bool)
    for i, r0 in enumerate(range(0, n, chunk)):
        rows = min(chunk, n - r0)
        lo, hi = bounds[i], bounds[i + 1]
        rr, cc = recv_s[lo:hi] - r0, send_s[lo:hi]
        dense[rr, cc] = True
        out[r0 : r0 + rows] = np.packbits(
            dense[:rows], axis=1, bitorder="little"
        )
        dense[rr, cc] = False  # clear only the set bits, not the buffer
    return out.reshape(-1)


def _align_blocks(blocks):
    """Keep the flat gather length nblk*B OFF multiples of 1024.

    Measured on v5e (RESULTS.md "gather wall"): XLA's materializing row
    gather runs ~1.7x SLOWER (62 vs 105-110M rows/s at collab scale) when
    the number of gathered rows is divisible by 1024 — byte-identical
    index content, different length, reproducible interleaved.  The
    blocked SpMM gathers x[blk_src.reshape(-1)] (nblk*B rows), so append
    one all-padding sub-block (weight 0, last row-block to keep
    blk_rowblock sorted) whenever nblk*B lands on the slow residue.
    """
    nblk, B = blocks["blk_src"].shape
    if B % 1024 == 0 or (nblk * B) % 1024 != 0:
        return blocks
    pad2 = np.zeros((1, B), np.int32)
    blocks = dict(blocks)
    blocks["blk_src"] = np.concatenate([blocks["blk_src"], pad2])
    blocks["blk_weight"] = np.concatenate(
        [blocks["blk_weight"], np.zeros((1, B), np.float32)]
    )
    blocks["blk_local"] = np.concatenate([blocks["blk_local"], pad2])
    blocks["blk_rowblock"] = np.concatenate(
        [blocks["blk_rowblock"], blocks["blk_rowblock"][-1:]]
    ).astype(np.int32)
    return blocks


def _blocks_np(csr, block_rows: int, block_edges: int):
    """Blocking metadata from HOST CSR arrays (see with_blocks docstring).

    Dispatches to the native C++ builder (csrc/graphcore.cpp blocks_build)
    when available — the NumPy path costs seconds at citation2 scale."""
    R, B = int(block_rows), int(block_edges)
    from plnlp_tpu import native

    if native.available():
        e = csr["num_edges"]
        return _align_blocks(native.blocks_build(
            csr["senders"][:e],
            csr["receivers"][:e],
            csr["edge_weight"][:e],
            csr["indptr"],
            csr["num_nodes"],
            R,
            B,
        ))
    n = csr["num_nodes"]
    e = csr["num_edges"]
    indptr = csr["indptr"].astype(np.int64)
    senders = csr["senders"][:e].astype(np.int64)
    receivers = csr["receivers"][:e].astype(np.int64)
    weights = csr["edge_weight"][:e].astype(np.float32)

    n_rowblocks = _pad_to(n, R) // R
    # Per-rowblock edge counts and sub-block counts, fully vectorized.
    # Every rowblock gets ≥1 sub-block (empty ones get an all-padding block)
    # so the Pallas scatter-matmul kernel visits — and zero-fills — every
    # output row-block.
    bounds = indptr[np.minimum(np.arange(n_rowblocks + 1) * R, n)]
    cnts = np.diff(bounds)
    nbs = np.maximum((cnts + B - 1) // B, 1)
    nblk = int(nbs.sum())
    # Destination slot of each real edge: its rowblock's first sub-block slot
    # plus its offset within the rowblock.
    blk_starts = np.concatenate([[0], np.cumsum(nbs)])  # per rowblock
    edge_rb = np.repeat(np.arange(n_rowblocks), cnts)  # rowblock of each edge
    edge_off = np.arange(e) - np.repeat(bounds[:-1], cnts)  # offset in rowblock
    slot = blk_starts[edge_rb] * B + edge_off

    blk_src = np.zeros(nblk * B, np.int32)
    blk_w = np.zeros(nblk * B, np.float32)
    blk_local = np.zeros(nblk * B, np.int32)
    blk_src[slot] = senders
    blk_w[slot] = weights
    blk_local[slot] = receivers - edge_rb * R
    return _align_blocks({
        "blk_src": blk_src.reshape(nblk, B),
        "blk_weight": blk_w.reshape(nblk, B),
        "blk_local": blk_local.reshape(nblk, B),
        "blk_rowblock": np.repeat(np.arange(n_rowblocks), nbs).astype(np.int32),
        "block_rows": R,
        "block_edges": B,
    })


def _tconv_map_np(blocks, blocks_t, R: int, R_t: int) -> np.ndarray:
    """Flat fwd-slot index of each transposed-structure slot's edge.

    Both blocked structures hold exactly the real edge set once; matching
    the two key-sorted slot lists element-wise pairs every transposed slot
    with the fwd slot of the same (src, dst) edge (stable even with
    duplicate edges: identical key multisets pair k-th with k-th).  Host
    NumPy, same construction as parallel.partition._bwd_gather_fwd_np for
    the S=1 case.  Padding slots point at 0, masked by blk_weight == 0.
    """
    STRIDE = np.int64(1) << 31
    bs, bw = blocks["blk_src"], blocks["blk_weight"]
    brb, bl = blocks["blk_rowblock"], blocks["blk_local"]
    f_dst = brb[:, None].astype(np.int64) * R + bl
    keys_f = (f_dst * STRIDE + bs).reshape(-1)
    valid_f = bw.reshape(-1) != 0
    kf = keys_f[valid_f]
    ff = np.arange(keys_f.size, dtype=np.int64)[valid_f]

    ts, tw = blocks_t["blk_src"], blocks_t["blk_weight"]
    trb, tl = blocks_t["blk_rowblock"], blocks_t["blk_local"]
    t_rows = trb[:, None].astype(np.int64) * R_t + tl
    keys_t = (ts.astype(np.int64) * STRIDE + t_rows).reshape(-1)
    valid_t = tw.reshape(-1) != 0
    kt = keys_t[valid_t]
    assert kf.shape == kt.shape, "graph/transpose edge counts diverged"

    out = np.zeros(keys_t.size, np.int64)
    out[np.nonzero(valid_t)[0][np.argsort(kt, kind="stable")]] = ff[
        np.argsort(kf, kind="stable")
    ]
    return out.reshape(ts.shape).astype(np.int32)


def _to_graph(csr, blocks=None) -> Graph:
    """Single host→device push of all arrays (no readbacks ever)."""
    mask = _edge_mask_np(csr)
    fields = {
        "senders": jnp.asarray(csr["senders"]),
        "receivers": jnp.asarray(csr["receivers"]),
        "edge_weight": jnp.asarray(csr["edge_weight"]),
        "indptr": jnp.asarray(csr["indptr"]),
        "num_nodes": csr["num_nodes"],
        "num_edges": csr["num_edges"],
        "max_degree": csr.get("max_degree", 0),
        "edge_mask": None if mask is None else jnp.asarray(mask),
    }
    if blocks is not None:
        fields.update(
            blk_src=jnp.asarray(blocks["blk_src"]),
            blk_weight=jnp.asarray(blocks["blk_weight"]),
            blk_local=jnp.asarray(blocks["blk_local"]),
            blk_rowblock=jnp.asarray(blocks["blk_rowblock"]),
            block_rows=blocks["block_rows"],
            block_edges=blocks["block_edges"],
        )
    return Graph(**fields)


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray] = None,
    *,
    num_nodes: int,
    symmetrize: bool = False,
    coalesce: bool = True,
    edge_pad_multiple: int = _EDGE_PAD,
    block: Optional[Tuple[int, int]] = None,
) -> Graph:
    """Build a CSR-ordered :class:`Graph` from a COO edge list (host-side).

    ``symmetrize=True`` mirrors SparseTensor.to_symmetric (main.py:110).
    ``block=(R, B)`` attaches blocked-SpMM metadata in the same host pass.
    """
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, edge_pad_multiple)
    blocks = _blocks_np(csr, *block) if block is not None else None
    return _to_graph(csr, blocks)


def prepare_graph(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray] = None,
    *,
    num_nodes: int,
    symmetrize: bool = False,
    coalesce: bool = True,
    block: Optional[Tuple[int, int]] = (512, 512),
    edge_pad_multiple: int = _EDGE_PAD,
    couple_transpose: bool = False,
) -> Tuple[Graph, Graph]:
    """One-shot production path: (graph, transposed graph), both blocked,
    computed entirely on the host and pushed to device once each.

    ``couple_transpose=True`` additionally attaches ``graph.tconv_map`` —
    the fwd↔transpose slot pairing the blocked TransformerConv hand-VJP
    needs (ops/transformer.py).  Opt-in: it costs two host sorts of the
    edge list, pointless for encoders that never re-lay per-edge scalars.
    """
    if couple_transpose and block is None:
        raise ValueError(
            "couple_transpose=True needs blocked metadata (block=(R, B)) — "
            "the tconv slot map pairs BLOCK slots between the two graphs"
        )
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, edge_pad_multiple)
    e = csr["num_edges"]
    csr_t = _csr_np(
        csr["receivers"][:e],
        csr["senders"][:e],
        csr["edge_weight"][:e],
        num_nodes,
        False,
        False,
        edge_pad_multiple,
    )
    if block is not None:
        blocks = _blocks_np(csr, *block)
        blocks_t = _blocks_np(csr_t, *block)
        g = _to_graph(csr, blocks)
        gt = _to_graph(csr_t, blocks_t)
        if couple_transpose:
            tmap = _tconv_map_np(blocks, blocks_t, block[0], block[0])
            g = dataclasses.replace(g, tconv_map=jnp.asarray(tmap))
    else:
        g, gt = _to_graph(csr), _to_graph(csr_t)
    return g, gt


def transpose_graph(graph: Graph) -> Graph:
    """A^T: swap senders/receivers and re-sort into CSR order.

    NOTE: reads device arrays back to host — fine on CPU/tests, slow through a
    TPU tunnel.  Production code should use :func:`prepare_graph` instead.
    """
    e = graph.num_edges
    src = np.asarray(graph.senders)[:e]
    dst = np.asarray(graph.receivers)[:e]
    w = np.asarray(graph.edge_weight)[:e]
    block = (graph.block_rows, graph.block_edges) if graph.block_rows else None
    return build_graph(
        dst, src, w, num_nodes=graph.num_nodes, coalesce=False, block=block
    )


def with_blocks(graph: Graph, block_rows: int = 256, block_edges: int = 512) -> Graph:
    """Attach MXU-friendly blocking metadata for ``ops.spmm.spmm_blocked``.

    Edges (already sorted by destination) are grouped by destination row-block
    ``k = dst // R`` and each group is chopped into sub-blocks of ``B`` edges
    (zero-weight padded).  The blocked SpMM turns the scatter-add into batched
    one-hot matmuls on the MXU: for each sub-block,
    ``out[k] += one_hot(dst_local)^T @ (w * x[src])``.

    NOTE: reads device arrays back to host — prefer ``build_graph(block=...)``
    or :func:`prepare_graph` in production.
    """
    csr = {
        "senders": np.asarray(graph.senders),
        "receivers": np.asarray(graph.receivers),
        "edge_weight": np.asarray(graph.edge_weight),
        "indptr": np.asarray(graph.indptr),
        "num_nodes": graph.num_nodes,
        "num_edges": graph.num_edges,
    }
    blocks = _blocks_np(csr, block_rows, block_edges)
    return dataclasses.replace(
        graph,
        blk_src=jnp.asarray(blocks["blk_src"]),
        blk_weight=jnp.asarray(blocks["blk_weight"]),
        blk_local=jnp.asarray(blocks["blk_local"]),
        blk_rowblock=jnp.asarray(blocks["blk_rowblock"]),
        block_rows=blocks["block_rows"],
        block_edges=blocks["block_edges"],
    )
