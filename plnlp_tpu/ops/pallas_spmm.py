"""Pallas TPU kernel: fused scatter-matmul for blocked SpMM.

Measured on v5e: XLA's row gather runs at a fixed ~125M rows/s regardless of
index order (latency/row-rate bound), so the gather pass x[src] is kept in
XLA — but everything after it in the pure-XLA blocked SpMM (materializing the
one-hot tensor, the batched einsum output (nblk, R, D), and the segment-sum
over row-blocks) is pure HBM waste.  This kernel fuses all of that:

  for each sub-block b (grid dim), with rb = blk_rowblock[b] (sorted):
      onehot  = 1[blk_local[b] == 0..R-1]          built in VMEM/registers
      acc    += onehotᵀ @ feats[b]                  MXU, f32 accumulator
      on the last sub-block of rb: out[rb] = acc    single HBM write

HBM traffic becomes: read feats (E×D) once + write out (N×D) once — the
minimum possible given a materialized gather.  The f32 VMEM accumulator also
fixes the bf16 precision loss the einsum path had across many sub-blocks.

TPU tiling note: 2-D int32 metadata blocks of shape (1, B) violate the
(8, 128) block-tiling rule, so blk_local/feats are reshaped to
(nblk, B/128, 128[, D]) — trailing dims then equal the array dims, which the
lowering accepts — and the one-hot contraction runs over both edge dims.

Used by ops.spmm.spmm_blocked when `pallas_available()` (TPU backend).
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

__all__ = ["scatter_matmul", "pallas_available"]

_LANE = 128


def pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _kernel(rb_ref, local_ref, weight_ref, feats_ref, out_ref, acc_ref):
    b = pl.program_id(0)
    nblk = pl.num_programs(0)
    rb = rb_ref[b]
    R = acc_ref.shape[0]

    # Branchless first/last-visit detection (lax.cond regions don't lower
    # cleanly in Mosaic here); the clamped reads are always in-bounds.
    prev_rb = rb_ref[jnp.maximum(b - 1, 0)]
    next_rb = rb_ref[jnp.minimum(b + 1, nblk - 1)]
    is_first = jnp.logical_or(b == 0, prev_rb != rb)
    is_last = jnp.logical_or(b == nblk - 1, next_rb != rb)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    local = local_ref[0]  # (B/128, 128) int32
    weight = weight_ref[0]  # (B/128, 128) f32
    feats = feats_ref[0]  # (B/128, 128, D)
    sub = local.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 0)
    # Mosaic matmuls need a single contracting dim: unroll over the edge
    # sublane groups, each a (R,128) @ (128,D) MXU matmul with a transposed
    # WEIGHTED one-hot built by lane-wise compare (folding the edge-weight
    # multiply into the one-hot saves a full E×D HBM pass outside).
    for s in range(sub):
        onehot_t = jnp.where(
            local[s : s + 1, :] == rows, weight[s : s + 1, :], 0.0
        ).astype(feats.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot_t,
            feats[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "n_rowblocks", "interpret"))
def scatter_matmul(
    feats: jnp.ndarray,  # (nblk, B, D) gathered edge features (unweighted)
    blk_local: jnp.ndarray,  # (nblk, B) int32 dst offsets within row-block
    blk_weight: jnp.ndarray,  # (nblk, B) f32 edge weights (0 = padding)
    blk_rowblock: jnp.ndarray,  # (nblk,) int32, sorted ascending
    block_rows: int,
    n_rowblocks: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (n_rowblocks * block_rows, D): row-block-accumulated output.

    Edge weights are folded into the one-hot inside the kernel, so padding
    edges (weight 0) vanish and callers pass the RAW gather output.
    """
    nblk, B, D = feats.shape
    R = block_rows
    if B % _LANE:
        # pad edge dim; padded weights are zero -> zero contribution
        pad = _LANE - B % _LANE
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        blk_local = jnp.pad(blk_local, ((0, 0), (0, pad)))
        blk_weight = jnp.pad(blk_weight, ((0, 0), (0, pad)))
        B += pad
    sub = B // _LANE
    feats4 = feats.reshape(nblk, sub, _LANE, D)
    local3 = blk_local.reshape(nblk, sub, _LANE)
    weight3 = blk_weight.reshape(nblk, sub, _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # blk_rowblock drives the output index_map
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, sub, _LANE), lambda b, rb: (b, 0, 0)),
            pl.BlockSpec((1, sub, _LANE), lambda b, rb: (b, 0, 0)),
            pl.BlockSpec((1, sub, _LANE, D), lambda b, rb: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, D), lambda b, rb: (rb[b], 0)),
        scratch_shapes=[pltpu.VMEM((R, D), jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rowblocks * R, D), feats.dtype),
        interpret=interpret,
    )(blk_rowblock, local3, weight3, feats4)
    return out
