"""Blocked TransformerConv with a hand-written VJP (single device).

The reference's TransformerConv (plnlp/layer.py:57-63, PyG semantics with
heads=1: α_ij = softmax_j(⟨W_q x_i, W_k x_j⟩/√d), out = W_skip x_i +
Σ_j α_ij W_v x_j) backpropagates — under plain XLA autodiff of the
gather/segment formulation — through feature-dimension scatters (the VJP of
``kv[senders]`` / ``q[receivers]``), the slowest op class on TPU.  This
module is the single-device port of the partitioned hand-VJP
(parallel/graph_parallel.py:350-507): every irregular backward term runs as
a blocked scatter-matmul over either the graph (dst-grouped) or its
transpose (src-grouped) structure, and per-edge scalars cross between the
two layouts via the precomputed ``graph.tconv_map`` slot pairing
(graph.prepare_graph(couple_transpose=True)).

Math per layer (d = head width, residuals save only α):

    dα_e      = v[src_e] · dout[dst_e]                 (fwd-layout SDDMM)
    dlogit_e  = α_e (dα_e − Σ_{e'∈row(dst_e)} α dα)    (softmax Jacobian;
                row sums are SCALAR segment sums — no feature scatter)
    dq[dst]   = Σ_e (dlogit_e/√d) k[src_e]      (blocked over graph)
    dk[src]   = Σ_e (dlogit_e/√d) q[dst_e]      (blocked over transpose)
    dv[src]   = Σ_e α_e dout[dst_e]             (blocked over transpose)

Gradient parity vs the segment-sum/XLA-autodiff path is asserted in
tests/test_transformer_vjp.py; the backward jaxpr is checked free of
rank-2 feature scatters there too.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph
from plnlp_tpu.nn import linear
from plnlp_tpu.ops.spmm import _zero_cotangent, blocked_sum_arrays

__all__ = ["transformer_conv_blocked"]


def _fwd_impl(graph: Graph, lp, x):
    """Returns (out, alpha) — alpha in (nblk, B) block layout, f32."""
    R = graph.block_rows
    n = graph.num_nodes
    n_rb = (n + R - 1) // R
    rows = n_rb * R
    d = lp["lin_query"]["w"].shape[1]

    q = linear(lp["lin_query"], x)
    k = linear(lp["lin_key"], x)
    v = linear(lp["lin_value"], x)

    bs, bw = graph.blk_src, graph.blk_weight
    bl, brb = graph.blk_local, graph.blk_rowblock
    dst_local = brb[:, None] * R + bl  # (nblk, B) padded-row ids
    # one widened gather for k AND v at the shared sender indices (the XLA
    # row gather is row-rate bound, flat in width — measured, RESULTS.md)
    kv_e = jnp.concatenate([k, v], axis=-1)[bs.reshape(-1)]
    k_e = kv_e[:, :d].reshape(bs.shape + (d,))
    q_pad = jnp.pad(q, ((0, rows - n), (0, 0)))
    logits = (
        jnp.sum(q_pad[dst_local] * k_e, axis=-1) / math.sqrt(d)
    ).astype(jnp.float32)
    valid = bw != 0
    flat_dst = dst_local.reshape(-1)
    flat_logits = jnp.where(valid.reshape(-1), logits.reshape(-1), -jnp.inf)
    # block layout is NOT globally dst-sorted (padding slots rewind to the
    # block's first row) — omit indices_are_sorted here
    seg_max = jax.ops.segment_max(flat_logits, flat_dst, num_segments=rows)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.where(
        valid.reshape(-1), jnp.exp(flat_logits - seg_max[flat_dst]), 0.0
    )
    seg_sum = jax.ops.segment_sum(ex, flat_dst, num_segments=rows)
    denom = jnp.maximum(seg_sum, jnp.finfo(jnp.float32).tiny)
    alpha = (ex / denom[flat_dst]).reshape(bw.shape).astype(jnp.float32)
    agg = blocked_sum_arrays(
        None, bs, alpha, bl, brb, R, rows, feats=kv_e[:, d:]
    )[:n].astype(x.dtype)
    return agg + linear(lp["lin_skip"], x), alpha


def _bwd_impl(graph: Graph, graph_t: Graph, lp, x, alpha, g):
    R = graph.block_rows
    n = graph.num_nodes
    n_rb = (n + R - 1) // R
    rows = n_rb * R
    d = lp["lin_query"]["w"].shape[1]
    inv_sqrt_d = 1.0 / math.sqrt(d)
    cdt = x.dtype
    f32 = jnp.float32

    wq, bq = lp["lin_query"]["w"].astype(cdt), lp["lin_query"]["b"].astype(cdt)
    wk, bk = lp["lin_key"]["w"].astype(cdt), lp["lin_key"]["b"].astype(cdt)
    wv, bv = lp["lin_value"]["w"].astype(cdt), lp["lin_value"]["b"].astype(cdt)
    ws = lp["lin_skip"]["w"].astype(cdt)

    q = jnp.dot(x, wq, preferred_element_type=cdt) + bq
    k = jnp.dot(x, wk, preferred_element_type=cdt) + bk
    v = jnp.dot(x, wv, preferred_element_type=cdt) + bv

    bs, bw = graph.blk_src, graph.blk_weight
    bl, brb = graph.blk_local, graph.blk_rowblock
    valid = (bw != 0).astype(f32)
    dst_local = brb[:, None] * R + bl
    g_pad = jnp.pad(g, ((0, rows - n), (0, 0)))

    # ONE widened gather for k AND v at the shared fwd sender indices
    kv_e = jnp.concatenate([k, v], axis=-1)[bs.reshape(-1)]
    v_e = kv_e[:, d:].reshape(bs.shape + (d,))

    # dα then the softmax Jacobian (row sums are scalar segment sums)
    dalpha = (
        jnp.sum(g_pad[dst_local].astype(f32) * v_e.astype(f32), axis=-1)
        * valid
    )
    flat_dst = dst_local.reshape(-1)
    row_s = jax.ops.segment_sum(
        (alpha * dalpha).reshape(-1), flat_dst, num_segments=rows
    )
    dlogit = alpha * (dalpha - row_s.reshape(-1)[flat_dst].reshape(bw.shape)) * valid

    # dq over the graph (dst-grouped) structure, k pre-gathered above
    dq_rows = blocked_sum_arrays(
        None, bs, dlogit * inv_sqrt_d, bl, brb, R, rows, feats=kv_e[:, :d]
    )[:n].astype(cdt)

    # per-edge scalars to the transposed layout: one precomputed slot map.
    # dlogit and alpha share the map — ONE 2-wide gather instead of two
    # (the row gather is row-RATE bound: two scalar gathers over ~E slots
    # cost the same as two full feature gathers)
    nbs, nbw = graph_t.blk_src, graph_t.blk_weight
    nbl, nbrb = graph_t.blk_local, graph_t.blk_rowblock
    nmap = graph.tconv_map
    nvalid = (nbw != 0).astype(f32)
    da = jnp.stack([dlogit.reshape(-1), alpha.reshape(-1)], axis=-1)
    da_t = da[nmap.reshape(-1)].reshape(nbw.shape + (2,))
    dlog_t = da_t[..., 0] * nvalid
    alpha_t = da_t[..., 1] * nvalid

    # dk / dv over the transposed (src-grouped) structure — q and dout
    # share the transposed sender indices, so one widened gather serves both
    qg_e = jnp.concatenate([q, g], axis=-1)[nbs.reshape(-1)]
    dk_rows = blocked_sum_arrays(
        None, nbs, dlog_t * inv_sqrt_d, nbl, nbrb, R, rows, feats=qg_e[:, :d]
    )[:n].astype(cdt)
    dv_rows = blocked_sum_arrays(
        None, nbs, alpha_t, nbl, nbrb, R, rows, feats=qg_e[:, d:]
    )[:n].astype(cdt)

    def wgrad(dy):
        return jnp.dot(x.T, dy, preferred_element_type=f32)

    def bgrad(dy):
        return jnp.sum(dy.astype(f32), axis=0)

    dlp = {
        "lin_query": {"w": wgrad(dq_rows), "b": bgrad(dq_rows)},
        "lin_key": {"w": wgrad(dk_rows), "b": bgrad(dk_rows)},
        "lin_value": {"w": wgrad(dv_rows), "b": bgrad(dv_rows)},
        "lin_skip": {"w": wgrad(g), "b": bgrad(g)},
    }
    dlp = jax.tree_util.tree_map(
        lambda gr, p: gr.astype(p.dtype), dlp, {kk: lp[kk] for kk in dlp}
    )
    dx = (
        jnp.dot(g, ws.T, preferred_element_type=cdt)
        + jnp.dot(dq_rows, wq.T, preferred_element_type=cdt)
        + jnp.dot(dk_rows, wk.T, preferred_element_type=cdt)
        + jnp.dot(dv_rows, wv.T, preferred_element_type=cdt)
    )
    return dx, dlp


@jax.custom_vjp
def _tconv(graph: Graph, graph_t: Graph, lp, x):
    return _fwd_impl(graph, lp, x)[0]


def _tconv_fwd(graph, graph_t, lp, x):
    out, alpha = _fwd_impl(graph, lp, x)
    return out, (graph, graph_t, lp, x, alpha)


def _tconv_bwd(res, g):
    graph, graph_t, lp, x, alpha = res
    dx, dlp = _bwd_impl(graph, graph_t, lp, x, alpha, g)
    dlp_full = {
        kk: dlp.get(kk, jax.tree_util.tree_map(_zero_cotangent, vv))
        for kk, vv in lp.items()
    }
    return (
        jax.tree_util.tree_map(_zero_cotangent, graph),
        jax.tree_util.tree_map(_zero_cotangent, graph_t),
        dlp_full,
        dx,
    )


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def transformer_conv_blocked(lp, graph: Graph, graph_t: Graph, x):
    """One TransformerConv layer over a blocked CSR graph with the
    hand-written backward.  Requires ``graph.tconv_map`` (prepare_graph
    with ``couple_transpose=True``) and blocked metadata on both graphs."""
    if graph.tconv_map is None:
        raise ValueError(
            "transformer_conv_blocked needs graph.tconv_map — build with "
            "prepare_graph(..., couple_transpose=True)"
        )
    return _tconv(graph, graph_t, lp, x)
