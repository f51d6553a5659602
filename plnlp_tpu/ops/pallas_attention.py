"""Pallas TPU kernels: block-sparse FLASH attention over the hybrid tile
operand (forward + hand-VJP backward passes).

The scan-based tile attention (ops/tile_attention.py) is two-pass (global
max, then exp-accumulate) and leans on XLA autodiff: per tile chunk it
materializes gathered (C, T, D) q/k/v blocks and (C, T, T) score tensors
in HBM, and the rematerialized backward replays all of it.  These kernels
fuse the whole thing flash-attention style:

* forward — ONE sweep over the row-sorted tiles with an online softmax
  (running max `m`, denominator `den`, numerator `num` in VMEM f32);
  each output row tile is written exactly once (same first/last-visit
  pattern as ops/pallas_tiles.tile_matmul).  Emits tile-local
  (num, den, m) partials; the caller merges the per-edge residual set
  (softmax partials compose: rescale by exp(m_a - m)).
* backward dQ — a sweep over the SAME row-sorted tiles recomputing
  scores, with the softmax Jacobian folded in via the flash `delta`
  trick (delta_i = sum_d g_id * y_id, so the full-row reduction the
  Jacobian needs never touches the tile structure).
* backward dK/dV — a sweep over the TRANSPOSED tile set (tile_vals_t,
  col-sorted — already stored by build_hybrid for the SpMM backward),
  accumulating both per source tile in VMEM.

HBM traffic per tile is one (T, T) vals read (int8 when exact) plus 2-4
(T, D) feature blocks — no score tensor, no gathered copies, no
(nt, T, D) partials round-trip.  All matmuls hit the MXU with f32
accumulation.

Reference hot loop this accelerates: TransformerConv
(/root/reference/plnlp/layer.py:57-63) — per-edge dot-product attention
whose CUDA implementation (PyG) is SDDMM + segment softmax + SpMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = [
    "attention_pallas_supported",
    "flash_tiles_fwd",
    "flash_tiles_dq",
    "flash_tiles_dkv",
    "pack_mdd",
    "pack_mdd_t",
]

_LANE = 128
_NEG_INF = float("-inf")


def pack_mdd(stat3):
    """(n, 3) f32 rows of (m, den, delta) -> the (n, LANE) mdd layout
    flash_tiles_dq consumes (cols 0/1/2, rest zero).  Single source of
    the stats layout contract for both callers (tile_attention and
    parallel.tile_transformer)."""
    return jnp.pad(stat3, ((0, 0), (0, _LANE - 3)))


def pack_mdd_t(stat3, T: int):
    """(nR*T, 3) f32 stats -> the (nR*8, T) mdd_t layout flash_tiles_dkv
    consumes: per row tile an (8, T) block whose rows 0/1/2 are m/den/
    delta over the tile's T destination rows."""
    return (
        jnp.pad(stat3, ((0, 0), (0, 8 - 3)))
        .reshape(-1, T, 8)
        .transpose(0, 2, 1)
        .reshape(-1, T)
    )


def attention_pallas_supported(tile: int, d: int) -> bool:
    """Same alignment contract as the SpMM tile kernel: MXU-aligned tile
    and feature dims.  Callers pad odd feature dims up to the 128-lane
    boundary (zero columns do not change q.k logits)."""
    return (
        _HAS_PLTPU
        and jax.default_backend() == "tpu"
        and tile % _LANE == 0
        and d % _LANE == 0
    )


def _visit_flags(row_ref, i, nt):
    rt = row_ref[i]
    prev = row_ref[jnp.maximum(i - 1, 0)]
    nxt = row_ref[jnp.minimum(i + 1, nt - 1)]
    is_first = jnp.logical_or(i == 0, prev != rt)
    is_last = jnp.logical_or(i == nt - 1, nxt != rt)
    return is_first, is_last


def _fwd_kernel(
    scale,
    trow_ref,
    tcol_ref,
    vals_ref,
    q_ref,
    k_ref,
    v_ref,
    num_ref,
    stats_ref,
    acc_num,
    acc_den,
    acc_m,
):
    i = pl.program_id(0)
    is_first, is_last = _visit_flags(trow_ref, i, pl.num_programs(0))

    @pl.when(is_first)
    def _():
        acc_num[:] = jnp.zeros_like(acc_num)
        acc_den[:] = jnp.zeros_like(acc_den)
        acc_m[:] = jnp.full_like(acc_m, _NEG_INF)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    mask = vals_ref[0] != 0
    s = jnp.where(mask, s, _NEG_INF)
    m_prev = acc_m[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # rows with no edge yet: keep exp args finite (their p/r are 0 anyway)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    r = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
    acc_den[:] = acc_den[:] * r + jnp.sum(p, axis=1, keepdims=True)
    acc_num[:] = acc_num[:] * r + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    acc_m[:] = jnp.broadcast_to(m_new, acc_m.shape)

    @pl.when(is_last)
    def _():
        num_ref[:] = acc_num[:]
        # pack den (col 0) and m (col 1) into ONE lane-width output — the
        # accumulators are lane-replicated, so a column select is free and
        # halves the per-node stats HBM (ADVICE r4)
        col = jax.lax.broadcasted_iota(jnp.int32, acc_den.shape, 1)
        stats_ref[:] = jnp.where(
            col == 0, acc_den[:], jnp.where(col == 1, acc_m[:], 0.0)
        )


@functools.partial(
    jax.jit, static_argnames=("n_rowtiles", "scale", "interpret")
)
def flash_tiles_fwd(
    vals: jnp.ndarray,  # (nt, T, T) tile values — edge MASK (int8/bf16/f32)
    trow: jnp.ndarray,  # (nt,) int32 destination row-tile ids, sorted
    tcol: jnp.ndarray,  # (nt,) int32 source col-tile ids
    q_tiles: jnp.ndarray,  # (nC, T, D)
    k_tiles: jnp.ndarray,  # (nC, T, D)
    v_tiles: jnp.ndarray,  # (nC, T, D)
    n_rowtiles: int,
    scale: float,
    interpret: bool = False,
):
    """Tile-local softmax partials: returns (num (nR*T, D) f32,
    stats (nR*T, LANE) f32) — stats col 0 = den, col 1 = m, remaining
    lanes zero.  Row tiles not covered by any tile hold UNDEFINED
    content; callers mask with HybridGraph.row_mask.

    HBM for stats is LANE-padded: 512 B/node fwd (this buffer) plus
    512 B/node bwd (the caller's (n_pad, LANE) mdd) — ~1 KB/node total,
    fine at collab scale (235k nodes -> ~0.25 GB) but a real budget line
    at 1e8+ nodes; revisit the packing before using the flash path
    there."""
    nt, T, _ = vals.shape
    D = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda i, tr, tc: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tr[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((T, D), lambda i, tr, tc: (tr[i], 0)),
            pl.BlockSpec((T, _LANE), lambda i, tr, tc: (tr[i], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.float32),
            pltpu.VMEM((T, _LANE), jnp.float32),
            pltpu.VMEM((T, _LANE), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rowtiles * T, D), jnp.float32),
            jax.ShapeDtypeStruct((n_rowtiles * T, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(trow, tcol, vals, q_tiles, k_tiles, v_tiles)


def _dq_kernel(
    scale,
    trow_ref,
    tcol_ref,
    vals_ref,
    q_ref,
    k_ref,
    v_ref,
    g_ref,
    mdd_ref,
    dq_ref,
    acc_dq,
):
    i = pl.program_id(0)
    is_first, is_last = _visit_flags(trow_ref, i, pl.num_programs(0))

    @pl.when(is_first)
    def _():
        acc_dq[:] = jnp.zeros_like(acc_dq)

    q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    m = mdd_ref[:, 0:1]  # global row max (finite; see caller)
    den = mdd_ref[:, 1:2]  # global clamped denominator (>= tiny)
    delta = mdd_ref[:, 2:3]  # sum_d g * y per row
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    mask = vals_ref[0] != 0
    alpha = jnp.where(mask, jnp.exp(s - m), 0.0) / den
    dav = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = alpha * (dav - delta) * scale
    acc_dq[:] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(is_last)
    def _():
        dq_ref[:] = acc_dq[:]


@functools.partial(
    jax.jit, static_argnames=("n_rowtiles", "scale", "interpret")
)
def flash_tiles_dq(
    vals,
    trow,
    tcol,
    q_tiles,
    k_tiles,
    v_tiles,
    g_tiles,
    mdd,  # (nR*T, LANE) f32: col 0 = m (global), 1 = den (clamped), 2 = delta
    n_rowtiles: int,
    scale: float,
    interpret: bool = False,
):
    """dQ of the tile part: (nR*T, D) f32.  Uncovered row tiles hold
    UNDEFINED content (mask with row_mask)."""
    nt, T, _ = vals.shape
    D = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda i, tr, tc: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tr[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tr[i], 0, 0)),
            pl.BlockSpec((T, _LANE), lambda i, tr, tc: (tr[i], 0)),
        ],
        out_specs=pl.BlockSpec((T, D), lambda i, tr, tc: (tr[i], 0)),
        scratch_shapes=[pltpu.VMEM((T, D), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dq_kernel, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rowtiles * T, D), jnp.float32),
        interpret=interpret,
    )(trow, tcol, vals, q_tiles, k_tiles, v_tiles, g_tiles, mdd)


def _dkv_kernel(
    scale,
    trowt_ref,  # source/col tile id (sorted — the accumulation axis)
    tcolt_ref,  # destination row tile id
    valst_ref,  # transposed tile content: rows = source, cols = destination
    k_ref,
    v_ref,
    q_ref,
    g_ref,
    mddt_ref,  # (8, T): rows 0/1/2 = m/den/delta of the DESTINATION tile
    dk_ref,
    dv_ref,
    acc_dk,
    acc_dv,
):
    i = pl.program_id(0)
    is_first, is_last = _visit_flags(trowt_ref, i, pl.num_programs(0))

    @pl.when(is_first)
    def _():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    k, v, q, g = k_ref[0], v_ref[0], q_ref[0], g_ref[0]
    m = mddt_ref[0:1, :]  # (1, T) over destination columns
    den = mddt_ref[1:2, :]
    delta = mddt_ref[2:3, :]
    # source x destination orientation throughout (matches valst)
    s_t = (
        jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    mask_t = valst_ref[0] != 0
    alpha_t = jnp.where(mask_t, jnp.exp(s_t - m), 0.0) / den
    dav_t = jax.lax.dot_general(
        v, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_t = alpha_t * (dav_t - delta) * scale
    acc_dk[:] += jax.lax.dot(
        ds_t.astype(q.dtype), q, preferred_element_type=jnp.float32
    )
    acc_dv[:] += jax.lax.dot(
        alpha_t.astype(g.dtype), g, preferred_element_type=jnp.float32
    )

    @pl.when(is_last)
    def _():
        dk_ref[:] = acc_dk[:]
        dv_ref[:] = acc_dv[:]


@functools.partial(
    jax.jit, static_argnames=("n_rowtiles", "scale", "interpret")
)
def flash_tiles_dkv(
    vals_t,
    trow_t,
    tcol_t,
    q_tiles,
    k_tiles,
    v_tiles,
    g_tiles,
    mdd_t,  # (nR*8, T) f32: per row tile an (8, T) block, rows 0/1/2 = m/den/delta
    n_rowtiles: int,
    scale: float,
    interpret: bool = False,
):
    """dK and dV of the tile part, accumulated per SOURCE tile over the
    transposed (col-sorted) tile set: two (nR*T, D) f32 arrays.  Source
    tiles not covered hold UNDEFINED content (mask with row_mask_t)."""
    nt, T, _ = vals_t.shape
    D = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda i, tr, tc: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tr[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tr[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
            pl.BlockSpec((8, T), lambda i, tr, tc: (tc[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((T, D), lambda i, tr, tc: (tr[i], 0)),
            pl.BlockSpec((T, D), lambda i, tr, tc: (tr[i], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.float32),
            pltpu.VMEM((T, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dkv_kernel, scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rowtiles * T, D), jnp.float32),
            jax.ShapeDtypeStruct((n_rowtiles * T, D), jnp.float32),
        ],
        interpret=interpret,
    )(trow_t, tcol_t, vals_t, k_tiles, v_tiles, q_tiles, g_tiles, mdd_t)
