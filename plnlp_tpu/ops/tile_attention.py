"""TransformerConv over the hybrid tile operand: block-sparse attention.

The CSR TransformerConv pays 5-6 E-row gathers per fwd+bwd (kv fwd,
kv+qg bwd, q[dst], g[dst] — RESULTS.md round 3); on community graphs the
hybrid operand already concentrates 80-90% of edges into dense T×T tiles.
Attention over those edges becomes DENSE MASKED attention per tile —
Q_tile @ K_tileᵀ on the MXU, no per-edge gather — with the remaining
edges on the per-edge segment path.  Per-row softmax must be global over
BOTH partial sets, so the combine is two-pass (flash-attention style):

  pass A:  m[row]   = max(max over the row's tiles, max over its residual
           edges)                       [no gradient — max is plateau-flat]
  pass B:  num[row] = Σ_tiles exp(S−m)·V  +  Σ_res exp(s−m)·v[src]
           den[row] = Σ_tiles exp(S−m)    +  Σ_res exp(s−m)
  out     = num / den  (+ the skip projection)

Two implementations share the residual/merge machinery:

* **Flash path (TPU, the default)** — fused Pallas kernels
  (ops/pallas_attention.py) with a hand-written VJP: ONE sweep over the
  row-sorted tiles with an online softmax in VMEM (running max /
  denominator / numerator, one HBM write per row tile), backward as two
  sweeps (dQ over the row-sorted set, dK/dV over the transposed
  col-sorted set) recomputing scores per tile with the flash `delta =
  sum(g*y)` trick folding in the softmax Jacobian.  No score tensor and
  no gathered (C, T, D) copies ever touch HBM.
* **Scan fallback (non-TPU / odd tile sizes)** — the two-pass structure
  below: pass A computes the global row max, pass B exp-accumulates;
  tile chunks stream through jax.lax.scan with a rematerialized body so
  the (nt, T, T) score tensor never materializes in full, in either
  direction.  XLA autodiff handles the backward: every op in the body
  is a batched matmul, gather of contiguous (T, D) blocks, or
  segment/scatter-add whose VJP is the same class — no per-edge feature
  scatters appear.

Semantics match reference TransformerConv (layer.py:57-63 via PyG):
adjacency VALUES are ignored (the reference strips them, main.py:184-186)
— tile_vals act as the edge mask only.

Used by models.encoders._transformer_conv when the graph operand is a
HybridGraph (--adj_backend=hybrid).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import _pad_to
from plnlp_tpu.ops import pallas_attention as _pa
from plnlp_tpu.ops.spmm import _zero_cotangent

__all__ = ["hybrid_transformer_conv"]

# Tiles per scan step: bounds the live (chunk, T, T) score block.  At
# T=256 f32 a 64-tile chunk is 16 MB — far under HBM pressure, large
# enough that the batched matmul stays MXU-bound.
_ATTN_CHUNK = 64


def _chunked_tiles(hg):
    """tile metadata reshaped to (nchunks, C, ...) for lax.scan, padded
    with all-zero tiles (mask empty -> no contribution either pass)."""
    vals, trow, tcol = hg.tile_vals, hg.tile_row, hg.tile_col
    nt = vals.shape[0]
    C = min(_ATTN_CHUNK, nt)
    pad = -nt % C
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        trow = jnp.pad(trow, (0, pad))
        tcol = jnp.pad(tcol, (0, pad))
    nch = (nt + pad) // C
    T = vals.shape[1]
    return (
        vals.reshape(nch, C, T, T),
        trow.reshape(nch, C),
        tcol.reshape(nch, C),
    )


# ---------------------------------------------------------------------------
# Flash path: fused Pallas kernels (ops/pallas_attention.py) with a
# hand-written VJP.  The scan path below stays as the non-TPU fallback
# (and the parity oracle for the kernel tests).
# ---------------------------------------------------------------------------


def _flash_supported(hg, d: int) -> bool:
    return hg.num_tiles > 0 and _pa.attention_pallas_supported(
        hg.tile, d + (-d % 128)
    )


def _res_partials(hg, q, k, v, scale):
    """Per-edge residual softmax partials (f32): validity mask, logits,
    the gathered sender values, and the per-row max.  k and v ride ONE
    two-wide gather at the shared sender indices — the XLA row gather is
    row-RATE bound, flat in width (RESULTS.md), so the fusion halves the
    sender-side gather cost.  Row-count follows q (n, or n_pad under
    padded-carry; edge indices are < n either way)."""
    n = q.shape[0]
    g = hg.res_graph
    if g is None:
        return None, None, None, jnp.full((n,), -jnp.inf, jnp.float32)
    D = q.shape[1]
    valid = g.edge_weight != 0
    kv = jnp.concatenate([k, v], axis=-1)[g.senders].astype(jnp.float32)
    k_s, v_s = kv[:, :D], kv[:, D:]
    logits = (
        jnp.sum(q[g.receivers].astype(jnp.float32) * k_s, axis=-1) * scale
    )
    m_res = jax.ops.segment_max(
        jnp.where(valid, logits, -jnp.inf),
        g.receivers,
        num_segments=n,
        indices_are_sorted=True,
    )
    return valid, logits, v_s, m_res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attn(scale, hg, q, k, v):
    """Softmax-normalized attention aggregation y (n, D) f32 over the
    union of tile edges (flash kernels) and residual per-edge set
    (segment ops); D is the lane-padded feature width."""
    return _flash_attn_fwd(scale, hg, q, k, v)[0]


def _flash_attn_fwd(scale, hg, q, k, v):
    n, T = hg.num_nodes, hg.tile
    D = q.shape[1]
    n_pad = _pad_to(n, T)
    nR = n_pad // T
    # padded-carry: q/k/v arrive at n_pad rows -> tiles() is a free
    # reshape, the merge runs at n_pad rows, and y keeps n_pad rows (pad
    # rows land at 0/tiny = 0; every kernel access is adjacency-masked so
    # garbage pad-row features never reach real rows)
    rows = q.shape[0]

    def tiles(a):
        if rows != n_pad:
            a = jnp.pad(a, ((0, n_pad - rows), (0, 0)))
        return a.reshape(nR, T, D)

    Qp, Kp, Vp = tiles(q), tiles(k), tiles(v)
    num, stats_l = _pa.flash_tiles_fwd(
        hg.tile_vals, hg.tile_row, hg.tile_col, Qp, Kp, Vp, nR, scale
    )
    num = num[:rows]
    den_t = stats_l[:rows, 0]
    m_t = stats_l[:rows, 1]
    if hg.row_mask is not None:
        # uncovered row tiles hold undefined kernel output
        rm = jnp.repeat(hg.row_mask, T)[:rows]
        num = jnp.where(rm[:, None], num, 0.0)
        den_t = jnp.where(rm, den_t, 0.0)
        m_t = jnp.where(rm, m_t, -jnp.inf)

    valid, logits, v_s, m_res = _res_partials(hg, q, k, v, scale)
    M = jnp.maximum(m_t, m_res)
    M = jnp.where(jnp.isfinite(M), M, 0.0)  # isolated rows: exp(x-0) unused
    r = jnp.exp(m_t - M)  # m_t = -inf (no tile edge in row) -> 0
    den = den_t * r
    num = num * r[:, None]
    g = hg.res_graph
    if g is not None:
        ex = jnp.where(valid, jnp.exp(logits - M[g.receivers]), 0.0)
        den = den + jax.ops.segment_sum(
            ex, g.receivers, num_segments=rows, indices_are_sorted=True
        )
        num = num + jax.ops.segment_sum(
            v_s * ex[:, None],
            g.receivers,
            num_segments=rows,
            indices_are_sorted=True,
        )
    den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
    y = num / den[:, None]
    return y, (hg, Qp, Kp, Vp, M, den, y)


def _flash_attn_bwd(scale, res, gy):
    hg, Qp, Kp, Vp, M, den, y = res
    n, T = hg.num_nodes, hg.tile
    nR, _, D = Qp.shape
    n_pad = nR * T
    rows = M.shape[0]  # n, or n_pad under padded-carry
    cdt = Qp.dtype
    gy = gy.astype(jnp.float32)
    delta = jnp.sum(gy * y, axis=-1)  # the flash trick: sum_d g*y per row
    Gp = gy.astype(cdt)
    if rows != n_pad:
        Gp = jnp.pad(Gp, ((0, n_pad - rows), (0, 0)))
    Gp = Gp.reshape(nR, T, D)

    # per-row stats: one (rows, 3) array serves the residual gathers below
    # AND (padded) the two layouts the kernels consume.  Padding rows
    # (>= rows) get den=1: their alpha is 0/1 = 0 instead of 0/0 = nan,
    # which matters in the dkv kernel where nan destination COLUMNS would
    # poison every accumulator row through the (src,dst)@(dst,D) matmul.
    # (Under padded-carry the fwd already clamped every row's den >= tiny,
    # so there is no pad left to patch.)
    pad_n = n_pad - rows
    stat3 = jnp.stack([M, den, delta], axis=1)  # (rows, 3)
    stat = jnp.pad(stat3, ((0, pad_n), (0, 0)))
    stat = stat.at[rows:, 1].set(1.0) if pad_n else stat
    mdd = _pa.pack_mdd(stat)
    mdd_t = _pa.pack_mdd_t(stat, T)

    dq = _pa.flash_tiles_dq(
        hg.tile_vals, hg.tile_row, hg.tile_col, Qp, Kp, Vp, Gp, mdd, nR, scale
    )
    dk, dv = _pa.flash_tiles_dkv(
        hg.tile_vals_t, hg.tile_row_t, hg.tile_col_t, Qp, Kp, Vp, Gp, mdd_t,
        nR, scale,
    )
    if hg.row_mask is not None:
        dq = jnp.where(jnp.repeat(hg.row_mask, T)[:, None], dq, 0.0)
    if hg.row_mask_t is not None:
        rmt = jnp.repeat(hg.row_mask_t, T)[:, None]
        dk = jnp.where(rmt, dk, 0.0)
        dv = jnp.where(rmt, dv, 0.0)
    dq, dk, dv = dq[:rows], dk[:rows], dv[:rows]

    g, gt = hg.res_graph, hg.res_graph_t
    if g is not None:
        # FUSED residual gathers (row gathers are row-rate bound, flat in
        # width): k‖v at sender indices, q‖gy at receiver indices, and the
        # (M, den, delta) stats as one 3-wide gather — 4 feature + 2 stat
        # gathers total instead of 15 single ones.  gy rides in the
        # compute dtype, matching the kernel side (Gp is cdt too).
        qn = Qp.reshape(n_pad, D)[:rows]
        kvc = jnp.concatenate(
            [Kp.reshape(n_pad, D)[:rows], Vp.reshape(n_pad, D)[:rows]],
            axis=-1,
        )
        qgc = jnp.concatenate([qn, gy.astype(cdt)], axis=-1)
        # dq: edges in destination-sorted order (res_graph)
        valid = g.edge_weight != 0
        kv_s = kvc[g.senders].astype(jnp.float32)
        k_s, v_s = kv_s[:, :D], kv_s[:, D:]
        qg_r = qgc[g.receivers].astype(jnp.float32)
        q_r, gy_r = qg_r[:, :D], qg_r[:, D:]
        st_r = stat3[g.receivers]
        logits = jnp.sum(q_r * k_s, axis=-1) * scale
        al = jnp.where(valid, jnp.exp(logits - st_r[:, 0]), 0.0) / st_r[:, 1]
        dav = jnp.sum(gy_r * v_s, axis=-1)
        ds = al * (dav - st_r[:, 2]) * scale
        dq = dq + jax.ops.segment_sum(
            ds[:, None] * k_s,
            g.receivers,
            num_segments=rows,
            indices_are_sorted=True,
        )
        # dk/dv: the SAME edges in source-sorted order (res_graph_t:
        # senders = original dst, receivers = original src)
        validt = gt.edge_weight != 0
        qg_t = qgc[gt.senders].astype(jnp.float32)
        q_t, gy_t = qg_t[:, :D], qg_t[:, D:]
        kv_t = kvc[gt.receivers].astype(jnp.float32)
        k_t, v_t = kv_t[:, :D], kv_t[:, D:]
        st_t = stat3[gt.senders]
        logits_t = jnp.sum(q_t * k_t, axis=-1) * scale
        alt = (
            jnp.where(validt, jnp.exp(logits_t - st_t[:, 0]), 0.0)
            / st_t[:, 1]
        )
        davt = jnp.sum(gy_t * v_t, axis=-1)
        dst_ = alt * (davt - st_t[:, 2]) * scale
        dk = dk + jax.ops.segment_sum(
            dst_[:, None] * q_t,
            gt.receivers,
            num_segments=rows,
            indices_are_sorted=True,
        )
        dv = dv + jax.ops.segment_sum(
            alt[:, None] * gy_t,
            gt.receivers,
            num_segments=rows,
            indices_are_sorted=True,
        )

    zero_hg = jax.tree_util.tree_map(_zero_cotangent, hg)
    return (zero_hg, dq.astype(cdt), dk.astype(cdt), dv.astype(cdt))


_flash_attn.defvjp(_flash_attn_fwd, _flash_attn_bwd)


def hybrid_transformer_conv(lp, hg, x):
    """One TransformerConv layer over a HybridGraph; x is (num_nodes, D_in)
    in ORIGINAL node ids (the internal labelprop relabel rides perm_in/out
    as pure gathers, exactly like hybrid_spmm)."""
    from plnlp_tpu.nn import linear

    n = hg.num_nodes
    # padded-carry (apply_encoder over a perm-free operand): x arrives at
    # n_pad rows and the output keeps them — the per-layer pad/slice
    # copies vanish; pad rows carry garbage that every tile/residual
    # access masks away and whose cotangents are exactly zero (the only
    # consumer of pad rows is the encoder's final [:n] slice).
    from plnlp_tpu.ops.tile_spmm import is_padded_operand

    padded = is_padded_operand(hg, x)
    if not padded:
        x = x[:n]
    if hg.perm_in is not None:
        xs = x[hg.perm_in]
    else:
        xs = x
    d = lp["lin_query"]["w"].shape[1]
    q = linear(lp["lin_query"], xs)
    k = linear(lp["lin_key"], xs)
    v = linear(lp["lin_value"], xs)
    scale = 1.0 / math.sqrt(d)

    if _flash_supported(hg, d):
        # fused flash kernels + hand VJP; odd feature dims pad to the
        # 128-lane boundary (zero columns do not change q.k logits, and
        # the padded y columns are sliced off)
        dpad = -d % 128
        if dpad:
            q, k, v = (
                jnp.pad(a, ((0, 0), (0, dpad))) for a in (q, k, v)
            )
        y = _flash_attn(scale, hg, q, k, v)
        out = y[:, :d].astype(x.dtype) + linear(lp["lin_skip"], xs)
        if hg.perm_out is not None:
            out = out[hg.perm_out]
        return out

    T = hg.tile
    n_pad = _pad_to(n, T)
    nR = n_pad // T
    rows = xs.shape[0]  # n, or n_pad under padded-carry

    def tiles_of(a):
        if rows != n_pad:
            a = jnp.pad(a, ((0, n_pad - rows), (0, 0)))
        return a.reshape(nR, T, -1)

    Qp, Kp, Vp = tiles_of(q), tiles_of(k), tiles_of(v)
    vals_c, trow_c, tcol_c = _chunked_tiles(hg)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def scores(qt, trow, tcol, kt=None):
        """(C, T, T) masked f32 logits for one tile chunk."""
        s = jnp.einsum(
            "ctd,cud->ctu",
            qt[trow],
            (Kp if kt is None else kt)[tcol],
            preferred_element_type=jnp.float32,
        ) * scale
        return s

    # --- residual per-edge logits (small edge set; segment machinery) ---
    g = hg.res_graph
    if g is not None:
        valid = g.edge_weight != 0
        logits_res = (
            jnp.sum(
                q[g.receivers].astype(jnp.float32)
                * k[g.senders].astype(jnp.float32),
                axis=-1,
            )
            * scale
        )
        m_res = jax.ops.segment_max(
            jnp.where(valid, logits_res, neg_inf),
            g.receivers, num_segments=rows, indices_are_sorted=True,
        )
    else:
        m_res = jnp.full((rows,), -jnp.inf, jnp.float32)

    # --- pass A: global per-row max (plateau-flat -> no gradient path) ---
    QpS, KpS = jax.lax.stop_gradient(Qp), jax.lax.stop_gradient(Kp)

    def max_step(m, chunk):
        vals, trow, tcol = chunk
        s = scores(QpS, trow, tcol, kt=KpS)
        s = jnp.where(vals != 0, s, neg_inf)
        return m.at[trow].max(jnp.max(s, axis=2)), None

    m_tile, _ = jax.lax.scan(
        jax.checkpoint(max_step),
        jnp.full((nR, T), -jnp.inf, jnp.float32),
        (vals_c, trow_c, tcol_c),
    )
    m = jnp.maximum(m_tile.reshape(n_pad)[:rows], m_res)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # isolated rows: exp(x-0) unused
    m = jax.lax.stop_gradient(m)
    m_pad = jnp.pad(m, (0, n_pad - rows)).reshape(nR, T)

    # --- pass B: exp-weighted accumulation, tiles then residual ---------
    def acc_step(carry, chunk):
        den, num = carry
        vals, trow, tcol = chunk
        s = scores(Qp, trow, tcol)
        p = jnp.where(
            vals != 0, jnp.exp(s - m_pad[trow][:, :, None]), 0.0
        )
        den = den.at[trow].add(jnp.sum(p, axis=2))
        num = num.at[trow].add(
            jnp.einsum(
                "ctu,cud->ctd", p, Vp[tcol].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        )
        return (den, num), None

    (den_t, num_t), _ = jax.lax.scan(
        jax.checkpoint(acc_step),
        (
            jnp.zeros((nR, T), jnp.float32),
            jnp.zeros((nR, T, d), jnp.float32),
        ),
        (vals_c, trow_c, tcol_c),
    )
    den = den_t.reshape(n_pad)[:rows]
    num = num_t.reshape(n_pad, d)[:rows]

    if g is not None:
        ex = jnp.where(valid, jnp.exp(logits_res - m[g.receivers]), 0.0)
        den = den + jax.ops.segment_sum(
            ex, g.receivers, num_segments=rows, indices_are_sorted=True
        )
        num = num + jax.ops.segment_sum(
            v[g.senders].astype(jnp.float32) * ex[:, None],
            g.receivers, num_segments=rows, indices_are_sorted=True,
        )

    den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
    out = (num / den[:, None]).astype(x.dtype) + linear(lp["lin_skip"], xs)
    if hg.perm_out is not None:
        out = out[hg.perm_out]
    return out
