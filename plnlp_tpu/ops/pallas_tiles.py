"""Pallas TPU kernel: fused block-sparse tile matmul for the hybrid SpMM.

The XLA tile pass (ops/tile_spmm._tile_pass) computes

    out[trow[i]] += vals[i] @ x_tiles[tcol[i]]        for i in range(nt)

as gather -> batched einsum -> segment_sum, which materializes the
(nt, T, D) partial-products tensor in HBM twice (einsum write + segment
read) and pays a scatter-add for the chunked path.  At collab scale that
partials traffic is ~2x the useful traffic.  This kernel fuses the whole
pass: tiles arrive sorted by row tile, consecutive tiles sharing a row
tile accumulate into an f32 VMEM scratch, and each output row tile is
written to HBM exactly once (same first/last-visit pattern as
ops/pallas_spmm.scatter_matmul).  HBM traffic becomes

    read vals once + read one (T, D) x tile per tile + write out once

— the minimum given the tile decomposition.  Scalar prefetch (trow, tcol)
drives the x/out index maps so the DMAs pipeline ahead of the MXU.

Tile values may be stored int8 (exact for 0/1 adjacencies and small
integer edge weights — see tile_spmm.build_hybrid): the cast to the
compute dtype happens in VMEM, halving the dominant vals HBM term vs
bf16.  The matmul always accumulates in f32 on the MXU.

Reference hot loop this accelerates: torch_sparse SpMM inside every conv
(/root/reference/plnlp/layer.py:30-63, model.py:150-151).
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

__all__ = ["tile_matmul", "tile_pallas_supported"]

_LANE = 128


def tile_pallas_supported(tile: int, d: int) -> bool:
    """The kernel requires MXU-aligned block shapes; odd feature dims
    (e.g. citation2's 200) fall back to the XLA tile pass."""
    return (
        _HAS_PLTPU
        and jax.default_backend() == "tpu"
        and tile % _LANE == 0
        and d % _LANE == 0
    )


def _kernel(trow_ref, tcol_ref, vals_ref, x_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    rt = trow_ref[i]
    prev = trow_ref[jnp.maximum(i - 1, 0)]
    nxt = trow_ref[jnp.minimum(i + 1, nt - 1)]
    is_first = jnp.logical_or(i == 0, prev != rt)
    is_last = jnp.logical_or(i == nt - 1, nxt != rt)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]
    acc_ref[:] += jax.lax.dot(
        vals_ref[0].astype(x.dtype), x, preferred_element_type=jnp.float32
    )

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_rowtiles", "interpret")
)
def tile_matmul(
    vals: jnp.ndarray,  # (nt, T, T) tile values (f32/bf16/int8)
    trow: jnp.ndarray,  # (nt,) int32 row-tile ids, sorted ascending
    tcol: jnp.ndarray,  # (nt,) int32 col-tile ids
    x_tiles: jnp.ndarray,  # (nC, T, D) node features, tiled
    n_rowtiles: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (n_rowtiles * T, D) in x's dtype.

    Row tiles that no tile maps to hold UNDEFINED content — callers mask
    them with the build-time `row_mask` (tile_spmm.HybridGraph) when the
    tile set does not cover every row tile.
    """
    nt, T, _ = vals.shape
    D = x_tiles.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # trow drives out, tcol drives x
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda i, tr, tc: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i, tr, tc: (tc[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, D), lambda i, tr, tc: (tr[i], 0)),
        scratch_shapes=[pltpu.VMEM((T, D), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rowtiles * T, D), x_tiles.dtype),
        interpret=interpret,
    )(trow, tcol, vals, x_tiles)
