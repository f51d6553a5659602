"""Distributed block-sparse attention: TransformerConv over a TILED
partition (--adj_backend=hybrid --num_shards=N --encoder=TRANSFORMER).

Composition of the two round-4 pieces (VERDICT r4 directive 3):

* the tiled partition (parallel.partition, ``tile`` > 0) already gives
  per-shard row-sorted tile sets + transposed (col-sorted) sets over the
  labelprop slot order, plus the blocked residual structures;
* destination-row sharding makes every softmax segment shard-local —
  each destination row is wholly owned by one shard, so the per-row
  softmax over ALL of its in-edges (tile + residual) closes inside the
  shard after the one feature all-gather the tiled partition already
  pays (comm='all_gather' is pinned for tiles).

Forward, per shard (single-device analog: ops/tile_attention._flash_attn):

  1. all_gather x over 'node' -> x_full; q from local rows, k/v from the
     gathered buffer (recompute-over-communicate, like _ptc_fwd_impl).
  2. flash sweep over the shard's row-sorted tiles — Q tiles are
     SHARD-LOCAL rows, K/V tiles index the GLOBAL gathered buffer (the
     Pallas kernels in ops/pallas_attention take separate q/k tile
     arrays, so this is the same kernel, no change) -> per-row partials
     (num, den, m).
  3. per-edge residual partials over the fwd blocked structure
     (dst-local rows), then the flash merge: rescale by exp(m_a - M).

Backward (hand VJP, mirroring _ptc_bwd_impl + _flash_attn_bwd):

  * per-row stats (M, den, delta = sum(g*y)) are 3 floats/row — ONE tiny
    all_gather makes them globally visible (no per-edge alpha transfer:
    alpha is recomputed from stats, so the bwd_gather_fwd slot map the
    per-edge partitioned attention needs is not needed here).
  * dQ: flash sweep over the row-sorted tiles (local stats) + blocked
    residual accumulation over the fwd structure.
  * dK/dV: flash sweep over the TRANSPOSED (col-sorted) tile set —
    local k/v tiles, gathered q/g/stats — + blocked residual over the
    bwd (source-sharded) structure.  Gradients land pre-sharded.
  * parameter grads are per-shard partials psum'ed over 'node'.

Reference hot loop: TransformerConv (/root/reference/plnlp/layer.py:57-63).
Semantics: adjacency values are ignored (tile vals act as the edge mask),
matching the reference's stripped adj_t (main.py:184-186).

On non-TPU backends (the 8-fake-device CPU test mesh) the flash sweeps
run as vectorized batched-einsum fallbacks computing the same partials
(deliberately scan-free: see the fallback section note).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from plnlp_tpu.ops import pallas_attention as _pa
from plnlp_tpu.ops.spmm import _zero_cotangent as _zero_cot
from plnlp_tpu.ops.spmm import blocked_sum_arrays

__all__ = ["partitioned_tile_transformer_conv"]

_LANE = _pa._LANE
_NEG_INF = float("-inf")
_TINY = float(jnp.finfo(jnp.float32).tiny)


# ---------------------------------------------------------------------------
# Vectorized fallbacks (CPU mesh tests / odd tile sizes) — same partials
# as the flash kernels, batched einsums over ALL tiles at once.  NOT a
# lax.scan: a scan inside the shard_map body breaks under jax.checkpoint's
# eager replay ("closed_call inside shard_map" — hit by --remat configs in
# the fuzz matrix).  Memory is (nt, T, T) scores — fine at the non-TPU
# scales this path serves; the flash kernels carry production.
# ---------------------------------------------------------------------------


def _fallback_fwd_partials(tv, tr, tc, Qp, Kp, Vp, nrl, scale):
    """(num (nrl*T, D) f32, den (nrl*T,) f32, m (nrl*T,) f32)."""
    T = tv.shape[1]
    D = Qp.shape[-1]
    s = (
        jnp.einsum(
            "ntd,nud->ntu",
            Qp[tr].astype(jnp.float32),
            Kp[tc].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    s = jnp.where(tv != 0, s, _NEG_INF)
    m = jnp.full((nrl, T), _NEG_INF, jnp.float32).at[tr].max(
        jnp.max(s, axis=2)
    )
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(tv != 0, jnp.exp(s - m_safe[tr][:, :, None]), 0.0)
    den = jnp.zeros((nrl, T), jnp.float32).at[tr].add(jnp.sum(p, axis=2))
    num = jnp.zeros((nrl, T, D), jnp.float32).at[tr].add(
        jnp.einsum(
            "ntu,nud->ntd",
            p,
            Vp[tc].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    )
    return num.reshape(nrl * T, D), den.reshape(-1), m.reshape(-1)


def _fallback_dq(tv, tr, tc, Qp, Kp, Vp, Gp, stats, nrl, scale):
    """dQ of the tile part: (nrl*T, D) f32.  ``stats`` is (nrl*T, 3) f32
    rows of (m, den, delta) for the LOCAL rows."""
    T = tv.shape[1]
    D = Qp.shape[-1]
    st = stats.reshape(nrl, T, 3)[tr]  # (nt, T, 3)
    k = Kp[tc].astype(jnp.float32)
    s = (
        jnp.einsum(
            "ntd,nud->ntu",
            Qp[tr].astype(jnp.float32),
            k,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    al = jnp.where(tv != 0, jnp.exp(s - st[:, :, 0:1]), 0.0) / st[:, :, 1:2]
    dav = jnp.einsum(
        "ntd,nud->ntu",
        Gp[tr].astype(jnp.float32),
        Vp[tc].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ds = al * (dav - st[:, :, 2:3]) * scale
    return (
        jnp.zeros((nrl, T, D), jnp.float32)
        .at[tr]
        .add(jnp.einsum("ntu,nud->ntd", ds, k, preferred_element_type=jnp.float32))
        .reshape(nrl * T, D)
    )


def _fallback_dkv(tvt, trt, tct, Qp_full, Kp, Vp, Gp_full, stats_full, nrl, scale):
    """dK/dV of the tile part via the transposed tile set: two (nrl*T, D)
    f32.  ``stats_full`` is (nC*T, 3) rows of (m, den, delta) for the
    GLOBAL destination rows; K/V tiles are the shard's local rows."""
    T = tvt.shape[1]
    D = Kp.shape[-1]
    stf = stats_full.reshape(-1, T, 3)[tct]  # (nt, Tdst, 3)
    q = Qp_full[tct].astype(jnp.float32)
    g = Gp_full[tct].astype(jnp.float32)
    s_t = (
        jnp.einsum(
            "nsd,ncd->nsc",
            Kp[trt].astype(jnp.float32),
            q,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    al = (
        jnp.where(tvt != 0, jnp.exp(s_t - stf[:, None, :, 0]), 0.0)
        / stf[:, None, :, 1]
    )
    dav = jnp.einsum(
        "nsd,ncd->nsc",
        Vp[trt].astype(jnp.float32),
        g,
        preferred_element_type=jnp.float32,
    )
    ds = al * (dav - stf[:, None, :, 2]) * scale
    dk = (
        jnp.zeros((nrl, T, D), jnp.float32)
        .at[trt]
        .add(jnp.einsum("nsc,ncd->nsd", ds, q, preferred_element_type=jnp.float32))
    )
    dv = (
        jnp.zeros((nrl, T, D), jnp.float32)
        .at[trt]
        .add(jnp.einsum("nsc,ncd->nsd", al, g, preferred_element_type=jnp.float32))
    )
    return dk.reshape(nrl * T, D), dv.reshape(nrl * T, D)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_impl(pg, lp, x, mesh):
    """shard_map forward; returns (out, M, den, y) — all row-sharded.
    M/den are the merged (tile+residual) per-row softmax stats the hand
    backward recomputes alpha from; y is the pre-skip aggregation (f32),
    needed for the flash delta = sum(g*y) trick."""
    T, R, rows = pg.tile, pg.block_rows, pg.rows_per_shard
    nrl = rows // T
    d = lp["lin_query"]["w"].shape[1]
    scale = 1.0 / math.sqrt(d)
    dpad = -d % _LANE
    use_kernel = _pa.attention_pallas_supported(T, d + dpad)
    rm_f = pg.tile_row_mask
    from plnlp_tpu.nn import linear

    def body(x_blk, tv, tr, tc, bs, bw, bl, brb, *m_):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        q = linear(lp["lin_query"], x_blk)  # local rows only
        k_full = linear(lp["lin_key"], x_full)
        v_full = linear(lp["lin_value"], x_full)

        def tiles(a):
            if use_kernel and dpad:
                a = jnp.pad(a, ((0, 0), (0, dpad)))
            return a.reshape(-1, T, a.shape[-1])

        Qp, Kp, Vp = tiles(q), tiles(k_full), tiles(v_full)
        if use_kernel:
            num, stats = _pa.flash_tiles_fwd(
                tv[0], tr[0], tc[0], Qp, Kp, Vp, nrl, scale
            )
            den_t, m_t = stats[:, 0], stats[:, 1]
            num = num[:, :d]
        else:
            num, den_t, m_t = _fallback_fwd_partials(
                tv[0], tr[0], tc[0], Qp, Kp, Vp, nrl, scale
            )
        if m_:
            # uncovered row tiles hold undefined kernel output
            rm = jnp.repeat(m_[0][0], T)
            num = jnp.where(rm[:, None], num, 0.0)
            den_t = jnp.where(rm, den_t, 0.0)
            m_t = jnp.where(rm, m_t, _NEG_INF)

        # residual per-edge partials over the fwd blocked structure
        bs0, bw0, bl0, brb0 = bs[0], bw[0], bl[0], brb[0]
        dst_local = brb0[:, None] * R + bl0
        valid = (bw0 != 0).reshape(-1)
        flat_dst = dst_local.reshape(-1)
        # one widened gather for k AND v at the shared sender indices
        kv_e = jnp.concatenate([k_full, v_full], axis=-1)[
            bs0.reshape(-1)
        ].astype(jnp.float32)
        k_e, v_e = kv_e[:, :d], kv_e[:, d:]
        q_r = q[flat_dst].astype(jnp.float32)
        logits = jnp.sum(q_r * k_e, axis=-1) * scale
        flat_logits = jnp.where(valid, logits, _NEG_INF)
        m_res = jax.ops.segment_max(
            flat_logits, flat_dst, num_segments=rows
        )
        M = jnp.maximum(m_t, m_res)
        M = jnp.where(jnp.isfinite(M), M, 0.0)  # isolated rows: unused
        r_t = jnp.exp(m_t - M)  # m_t = -inf (no tile edge in row) -> 0
        den = den_t * r_t
        num = num * r_t[:, None]
        ex = jnp.where(valid, jnp.exp(flat_logits - M[flat_dst]), 0.0)
        den = den + jax.ops.segment_sum(ex, flat_dst, num_segments=rows)
        num = num + jax.ops.segment_sum(
            v_e * ex[:, None], flat_dst, num_segments=rows
        )
        den = jnp.maximum(den, _TINY)
        y = num / den[:, None]
        out = y.astype(x_blk.dtype) + linear(lp["lin_skip"], x_blk)
        return out, M, den, y

    specs = [
        P("node", None),
        P("node", None, None, None),
        P("node", None),
        P("node", None),
        P("node", None, None),
        P("node", None, None),
        P("node", None, None),
        P("node", None),
    ]
    args = [
        x, pg.tile_vals, pg.tile_row, pg.tile_col,
        pg.fwd_blk_src, pg.fwd_blk_weight, pg.fwd_blk_local,
        pg.fwd_blk_rowblock,
    ]
    if rm_f is not None:
        specs.append(P("node", None))
        args.append(rm_f)
    return jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # Pallas out_shape carries no vma annotation
        in_specs=tuple(specs),
        out_specs=(P("node", None), P("node"), P("node"), P("node", None)),
    )(*args)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_impl(pg, lp, x, M, den, y, g, mesh):
    T, R, rows = pg.tile, pg.block_rows, pg.rows_per_shard
    nrl = rows // T
    d = lp["lin_query"]["w"].shape[1]
    scale = 1.0 / math.sqrt(d)
    dpad = -d % _LANE
    use_kernel = _pa.attention_pallas_supported(T, d + dpad)
    rm_f, rm_b = pg.tile_row_mask, pg.tile_row_mask_t
    cdt = x.dtype

    def body(
        x_blk, g_blk, m_blk, den_blk, y_blk,
        tv, tr, tc, tvt, trt, tct,
        bs, bw, bl, brb, nbs, nbw, nbl, nbrb, *m_,
    ):
        wq = lp["lin_query"]["w"].astype(cdt)
        bq = lp["lin_query"]["b"].astype(cdt)
        wk = lp["lin_key"]["w"].astype(cdt)
        bk = lp["lin_key"]["b"].astype(cdt)
        wv = lp["lin_value"]["w"].astype(cdt)
        bv = lp["lin_value"]["b"].astype(cdt)
        ws = lp["lin_skip"]["w"].astype(cdt)

        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        g_full = jax.lax.all_gather(g_blk, "node", axis=0, tiled=True)
        q_full = jnp.dot(x_full, wq, preferred_element_type=cdt) + bq
        k_full = jnp.dot(x_full, wk, preferred_element_type=cdt) + bk
        v_full = jnp.dot(x_full, wv, preferred_element_type=cdt) + bv
        # local q/k/v are rows [idx*rows, (idx+1)*rows) of the full
        # projections — slice instead of recomputing three matmuls
        idx = jax.lax.axis_index("node")

        def local(a):
            return jax.lax.dynamic_slice_in_dim(a, idx * rows, rows)

        q_blk, k_blk, v_blk = local(q_full), local(k_full), local(v_full)

        g32 = g_blk.astype(jnp.float32)
        delta_blk = jnp.sum(g32 * y_blk, axis=-1)  # flash delta trick
        stats3 = jnp.stack([m_blk, den_blk, delta_blk], axis=1)  # (rows, 3)
        stats_full = jax.lax.all_gather(
            stats3, "node", axis=0, tiled=True
        )  # (S*rows, 3) — 12 B/row: the only extra collective the
        # backward needs (alpha is recomputed from these stats)

        def tiles(a):
            if use_kernel and dpad:
                a = jnp.pad(a, ((0, 0), (0, dpad)))
            return a.reshape(-1, T, a.shape[-1])

        Qp_l, Kp_l, Vp_l = tiles(q_blk), tiles(k_blk), tiles(v_blk)
        Gp_l = tiles(g_blk)
        Qp_f, Kp_f, Vp_f = tiles(q_full), tiles(k_full), tiles(v_full)
        Gp_f = tiles(g_full)

        if use_kernel:
            mdd = _pa.pack_mdd(stats3)
            dq_tile = _pa.flash_tiles_dq(
                tv[0], tr[0], tc[0], Qp_l, Kp_f, Vp_f, Gp_l, mdd, nrl, scale
            )[:, :d]
            mdd_t = _pa.pack_mdd_t(stats_full, T)
            dk_tile, dv_tile = _pa.flash_tiles_dkv(
                tvt[0], trt[0], tct[0], Qp_f, Kp_l, Vp_l, Gp_f, mdd_t,
                nrl, scale,
            )
            dk_tile, dv_tile = dk_tile[:, :d], dv_tile[:, :d]
        else:
            dq_tile = _fallback_dq(
                tv[0], tr[0], tc[0], Qp_l, Kp_f, Vp_f, Gp_l, stats3,
                nrl, scale,
            )
            dk_tile, dv_tile = _fallback_dkv(
                tvt[0], trt[0], tct[0], Qp_f, Kp_l, Vp_l, Gp_f,
                stats_full, nrl, scale,
            )
        mi = 0
        if rm_f is not None:
            dq_tile = jnp.where(
                jnp.repeat(m_[mi][0], T)[:, None], dq_tile, 0.0
            )
            mi += 1
        if rm_b is not None:
            rmt = jnp.repeat(m_[mi][0], T)[:, None]
            dk_tile = jnp.where(rmt, dk_tile, 0.0)
            dv_tile = jnp.where(rmt, dv_tile, 0.0)

        # residual dq over the fwd (dst-sharded) structure
        bs0, bw0, bl0, brb0 = bs[0], bw[0], bl[0], brb[0]
        dst_local = brb0[:, None] * R + bl0
        flat_dst = dst_local.reshape(-1)
        valid = (bw0 != 0).reshape(-1)
        kv_e = jnp.concatenate([k_full, v_full], axis=-1)[
            bs0.reshape(-1)
        ].astype(jnp.float32)
        k_e, v_e = kv_e[:, :d], kv_e[:, d:]
        q_r = q_blk[flat_dst].astype(jnp.float32)
        st_r = stats3[flat_dst]  # (E, 3): m, den, delta at the dst row
        logits = jnp.sum(q_r * k_e, axis=-1) * scale
        # where-guard BEFORE the exp: a padding edge's logit is unrelated
        # to its slot-0 row's stats, and valid*inf would be NaN
        al = jnp.where(valid, jnp.exp(logits - st_r[:, 0]), 0.0) / st_r[:, 1]
        dav = jnp.sum(g32[flat_dst] * v_e, axis=-1)
        ds = al * (dav - st_r[:, 2]) * scale
        dq_rows = (
            dq_tile
            + blocked_sum_arrays(
                None, bs0, ds.reshape(bw0.shape), bl0, brb0, R, rows,
                feats=k_e,
            )
        ).astype(cdt)

        # residual dk/dv over the bwd (src-sharded) structure: per-edge
        # alpha recomputed from the GATHERED stats at the destination row
        nbs0, nbw0, nbl0, nbrb0 = nbs[0], nbw[0], nbl[0], nbrb[0]
        dst_local_t = nbrb0[:, None] * R + nbl0  # local rows = orig src
        flat_src = dst_local_t.reshape(-1)
        nvalid = (nbw0 != 0).reshape(-1)
        qg_e = jnp.concatenate([q_full, g_full], axis=-1)[
            nbs0.reshape(-1)
        ].astype(jnp.float32)
        q_e, g_e = qg_e[:, :d], qg_e[:, d:]
        st_e = stats_full[nbs0.reshape(-1)]  # (E, 3) at the dst row
        k_t = k_blk[flat_src].astype(jnp.float32)
        v_t = v_blk[flat_src].astype(jnp.float32)
        logits_t = jnp.sum(q_e * k_t, axis=-1) * scale
        alt = (
            jnp.where(nvalid, jnp.exp(logits_t - st_e[:, 0]), 0.0)
            / st_e[:, 1]
        )
        davt = jnp.sum(g_e * v_t, axis=-1)
        ds_t = alt * (davt - st_e[:, 2]) * scale
        dk_rows = (
            dk_tile
            + blocked_sum_arrays(
                None, nbs0, ds_t.reshape(nbw0.shape), nbl0, nbrb0, R, rows,
                feats=q_e,
            )
        ).astype(cdt)
        dv_rows = (
            dv_tile
            + blocked_sum_arrays(
                None, nbs0, alt.reshape(nbw0.shape), nbl0, nbrb0, R, rows,
                feats=g_e,
            )
        ).astype(cdt)

        # parameter gradients: per-shard partials, psum'ed to replicated
        f32 = jnp.float32

        def wgrad(xl, dy):
            return jax.lax.psum(
                jnp.dot(xl.T, dy, preferred_element_type=f32), "node"
            )

        def bgrad(dy):
            return jax.lax.psum(jnp.sum(dy.astype(f32), axis=0), "node")

        dlp = {
            "lin_query": {"w": wgrad(x_blk, dq_rows), "b": bgrad(dq_rows)},
            "lin_key": {"w": wgrad(x_blk, dk_rows), "b": bgrad(dk_rows)},
            "lin_value": {"w": wgrad(x_blk, dv_rows), "b": bgrad(dv_rows)},
            "lin_skip": {"w": wgrad(x_blk, g_blk), "b": bgrad(g_blk)},
        }

        dx_blk = (
            jnp.dot(g_blk, ws.T, preferred_element_type=cdt)
            + jnp.dot(dq_rows, wq.T, preferred_element_type=cdt)
            + jnp.dot(dk_rows, wk.T, preferred_element_type=cdt)
            + jnp.dot(dv_rows, wv.T, preferred_element_type=cdt)
        )
        return dx_blk, dlp

    dlp_spec = {
        k: {"w": P(), "b": P()}
        for k in ("lin_query", "lin_key", "lin_value", "lin_skip")
    }
    specs = [
        P("node", None),
        P("node", None),
        P("node"),
        P("node"),
        P("node", None),
        P("node", None, None, None),
        P("node", None),
        P("node", None),
        P("node", None, None, None),
        P("node", None),
        P("node", None),
        P("node", None, None),
        P("node", None, None),
        P("node", None, None),
        P("node", None),
        P("node", None, None),
        P("node", None, None),
        P("node", None, None),
        P("node", None),
    ]
    args = [
        x, g, M, den, y,
        pg.tile_vals, pg.tile_row, pg.tile_col,
        pg.tile_vals_t, pg.tile_row_t, pg.tile_col_t,
        pg.fwd_blk_src, pg.fwd_blk_weight, pg.fwd_blk_local,
        pg.fwd_blk_rowblock,
        pg.bwd_blk_src, pg.bwd_blk_weight, pg.bwd_blk_local,
        pg.bwd_blk_rowblock,
    ]
    if rm_f is not None:
        specs.append(P("node", None))
        args.append(rm_f)
    if rm_b is not None:
        specs.append(P("node", None))
        args.append(rm_b)
    dx, dlp = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=tuple(specs),
        out_specs=(P("node", None), dlp_spec),
    )(*args)
    # cotangents must match primal param dtypes (f32 master weights)
    dlp = jax.tree_util.tree_map(
        lambda gr, p: gr.astype(p.dtype), dlp, {k: lp[k] for k in dlp}
    )
    return dx, dlp


# ---------------------------------------------------------------------------
# custom VJP + public wrapper (structure mirrors graph_parallel._ptc)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pttc(pg, lp, x, mesh):
    return _pttc_fwd(pg, lp, x, mesh)[0]


def _pttc_fwd(pg, lp, x, mesh):
    from plnlp_tpu.parallel.graph_parallel import _to_global, _to_slots

    x_slots = _to_slots(pg, x)
    out, M, den, y = _fwd_impl(pg, lp, x_slots, mesh)
    return _to_global(pg, out), (pg, lp, x_slots, M, den, y)


def _pttc_bwd(mesh, res, g):
    from plnlp_tpu.parallel.graph_parallel import _to_global, _to_slots

    pg, lp, x_slots, M, den, y = res
    dx, dlp = _bwd_impl(pg, lp, x_slots, M, den, y, _to_slots(pg, g), mesh)
    dlp_full = {
        k: dlp.get(k, jax.tree_util.tree_map(_zero_cot, v))
        for k, v in lp.items()
    }
    return (
        jax.tree_util.tree_map(_zero_cot, pg),
        dlp_full,
        _to_global(pg, dx),
    )


_pttc.defvjp(_pttc_fwd, _pttc_bwd)


def partitioned_tile_transformer_conv(gp, lp, x: jnp.ndarray):
    """One TransformerConv layer over a TILED partition: shard-local
    block-sparse flash sweeps over the per-shard tile sets + blocked
    residual, exact global softmax per destination row (rows are wholly
    owned, so the softmax closes shard-locally after the all-gather).
    Parity vs the single-device hybrid path is asserted in
    tests/test_graph_parallel.py at 2/8 shards."""
    pg = gp.pg
    if not pg.tile:
        raise ValueError(
            "partitioned_tile_transformer_conv needs a tiled partition "
            "(partition_graph(tile > 0)); use partitioned_transformer_conv "
            "for per-edge partitions"
        )
    if x.shape[0] < pg.padded_nodes:
        x = jnp.pad(x, ((0, pg.padded_nodes - x.shape[0]), (0, 0)))
    out = _pttc(pg, lp, x, gp.mesh)
    return out[: pg.num_nodes]
