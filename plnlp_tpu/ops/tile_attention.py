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

Both passes stream tile chunks through jax.lax.scan with a rematerialized
body — the (nt, T, T) score tensor never materializes in full, in either
direction (the backward recomputes each chunk's scores).  XLA autodiff
handles the backward: every op in the body is a batched matmul, gather of
contiguous (T, D) blocks, or segment/scatter-add whose VJP is the same
class — no per-edge feature scatters appear.

Semantics match reference TransformerConv (layer.py:57-63 via PyG):
adjacency VALUES are ignored (the reference strips them, main.py:184-186)
— tile_vals act as the edge mask only.

Used by models.encoders._transformer_conv when the graph operand is a
HybridGraph (--adj_backend=hybrid).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import _pad_to

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


def hybrid_transformer_conv(lp, hg, x):
    """One TransformerConv layer over a HybridGraph; x is (num_nodes, D_in)
    in ORIGINAL node ids (the internal labelprop relabel rides perm_in/out
    as pure gathers, exactly like hybrid_spmm)."""
    from plnlp_tpu.nn import linear

    n = hg.num_nodes
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

    T = hg.tile
    n_pad = _pad_to(n, T)
    nR = n_pad // T

    def tiles_of(a):
        return jnp.pad(a, ((0, n_pad - n), (0, 0))).reshape(nR, T, -1)

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
            g.receivers, num_segments=n, indices_are_sorted=True,
        )
    else:
        m_res = jnp.full((n,), -jnp.inf, jnp.float32)

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
    m = jnp.maximum(m_tile.reshape(n_pad)[:n], m_res)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # isolated rows: exp(x-0) unused
    m = jax.lax.stop_gradient(m)
    m_pad = jnp.pad(m, (0, n_pad - n)).reshape(nR, T)

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
    den = den_t.reshape(n_pad)[:n]
    num = num_t.reshape(n_pad, d)[:n]

    if g is not None:
        ex = jnp.where(valid, jnp.exp(logits_res - m[g.receivers]), 0.0)
        den = den + jax.ops.segment_sum(
            ex, g.receivers, num_segments=n, indices_are_sorted=True
        )
        num = num + jax.ops.segment_sum(
            v[g.senders].astype(jnp.float32) * ex[:, None],
            g.receivers, num_segments=n, indices_are_sorted=True,
        )

    den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
    out = (num / den[:, None]).astype(x.dtype) + linear(lp["lin_skip"], xs)
    if hg.perm_out is not None:
        out = out[hg.perm_out]
    return out
