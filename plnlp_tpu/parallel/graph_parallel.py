"""Graph-parallel SpMM: shard_map over row-partitioned graphs.

The multi-chip aggregation path (SURVEY §2c): destination rows — and with
them the node-embedding/feature matrix — are sharded over the mesh 'node'
axis; each chip aggregates its own rows' in-edges after an all-gather of the
source features over ICI.  The backward runs the SAME body on the
source-sharded structure (dX = Aᵀ dY), so gradients land pre-sharded and no
unsharded gradient is ever materialized.

``GraphParallel`` is a drop-in aggregation operand: ``ops.spmm.spmm`` and
the encoders accept it alongside Graph / DenseAdj, so the whole Model runs
multi-chip by just swapping the graph object.

v1 communication = full all-gather of x per layer.  A halo exchange (only
boundary rows, all_to_all with per-peer quotas) is the planned v2; the
structure here — per-shard metadata with global source ids — already
supports it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plnlp_tpu.ops.spmm import _zero_cotangent as _zero_cot
from plnlp_tpu.ops.spmm import blocked_sum_arrays
from plnlp_tpu.parallel.partition import PartitionedGraph, partition_graph

__all__ = [
    "GraphParallel",
    "make_graph_parallel",
    "partitioned_spmm",
    "shard_node_features",
]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["pg"],
    meta_fields=["mesh", "comm"],
)
@dataclasses.dataclass(frozen=True)
class GraphParallel:
    """Partitioned graph + its mesh (mesh/comm are static/hashable).

    comm: 'all_gather' (v1: full feature gather) or 'halo' (v2: per-peer
    quota-padded all_to_all of only the boundary rows each shard reads).
    """

    pg: PartitionedGraph
    mesh: Mesh
    comm: str = "all_gather"

    @property
    def num_nodes(self) -> int:
        return self.pg.num_nodes


# Default wire constant for the comm='auto' decision: the per-message
# (collective dispatch + per-peer hop) latency expressed in EQUIVALENT ROW
# TRANSFERS.  At D=256 f32 one row is 1 KiB; ~2-5 us of per-collective
# latency over ~100 GB/s ICI is a few hundred rows.  Calibrate on real
# hardware with bench_scaling.py's collective micro-bench and pass the
# measured value (CLI --comm_latency_rows).
_DEFAULT_LATENCY_ROWS = 512


def choose_comm(
    pg: PartitionedGraph, latency_rows: float = _DEFAULT_LATENCY_ROWS
) -> str:
    """Pick 'halo' vs 'all_gather' from a linear latency+bandwidth model.

    Per layer pass, with S shards and per-peer/hub quotas (q, qh):

        cost_ag   = (S-1)·LAT + (S-1)·(rows_per_shard)·t_row
        cost_halo = 2(S-1)·LAT + (S-1)·(q + qh)·t_row
                    (all_to_all chunks + the hub all_gather)

    halo wins iff  q + qh + latency_rows < rows_per_shard, where
    ``latency_rows = LAT / t_row`` is the wire constant.  Quotas are
    ESTIMATED from the boundary sets alone (halo.estimate_halo_quotas,
    the same code path the builder uses) so the losing branch never pays
    for the full plan build.
    """
    from plnlp_tpu.parallel.halo import estimate_halo_quotas

    S = pg.num_shards
    if S <= 1:
        return "all_gather"
    qf, qhf = estimate_halo_quotas(
        np.asarray(pg.fwd_blk_src), np.asarray(pg.fwd_blk_weight),
        pg.rows_per_shard, S,
    )
    qb, qhb = estimate_halo_quotas(
        np.asarray(pg.bwd_blk_src), np.asarray(pg.bwd_blk_weight),
        pg.rows_per_shard, S,
    )
    halo_rows = max(qf, qb) + max(qhf, qhb)
    return (
        "halo" if halo_rows + latency_rows < pg.rows_per_shard else "all_gather"
    )


def make_graph_parallel(
    src,
    dst,
    weight=None,
    *,
    num_nodes: int,
    mesh: Mesh,
    block=(128, 512),
    symmetrize: bool = False,
    comm: str = "auto",
    latency_rows: float = _DEFAULT_LATENCY_ROWS,
    reorder: Optional[str] = None,
    tile: int = 0,
    min_fill: Optional[int] = None,  # default: ~0.15% of tile area
    tile_dtype="float32",
    max_tile_bytes: int = 2 * 1024**3,
    order=None,
    log=None,
) -> GraphParallel:
    """``tile`` > 0 composes the hybrid dense-tile SpMM with the partition
    (per-shard tile sets over the all-gathered buffer + blocked residual).
    Tiles read the full gathered buffer, so the comm plan is pinned to
    'all_gather'; use reorder='labelprop' so communities survive the
    node->slot assignment (the default when tiles are on)."""
    num_shards = mesh.shape["node"]
    if tile:
        if reorder in (None, "auto"):
            reorder = "labelprop"
        if comm not in ("auto", "all_gather"):
            raise ValueError(
                "tile > 0 requires comm='all_gather' (tiles read the full "
                f"gathered feature buffer), got comm={comm!r}"
            )
        comm = "all_gather"
    pg = partition_graph(
        src,
        dst,
        weight,
        num_nodes=num_nodes,
        num_shards=num_shards,
        block=block,
        symmetrize=symmetrize,
        reorder=reorder,
        tile=tile,
        min_fill=min_fill,
        tile_dtype=tile_dtype,
        max_tile_bytes=max_tile_bytes,
        order=order,
    )
    if comm == "auto":
        comm = choose_comm(pg, latency_rows)
        if log is not None:
            log(
                f"partition_comm=auto -> {comm} (S={num_shards}, "
                f"rows_per_shard={pg.rows_per_shard}, "
                f"latency_rows={latency_rows})"
            )
    if comm == "halo":
        from plnlp_tpu.parallel.partition import with_halo

        pg = with_halo(pg)
    return GraphParallel(pg=pg, mesh=mesh, comm=comm)


def shard_node_features(x: jnp.ndarray, pg: PartitionedGraph, mesh: Mesh):
    """Pad x to the partition's row count and shard rows over 'node'."""
    pad = pg.padded_nodes - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return jax.device_put(x, NamedSharding(mesh, P("node", None)))


def _apply(mesh, R, rows, x, blk_src, blk_weight, blk_local, blk_rowblock):
    def body(x_blk, bs, bw, bl, brb):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        return blocked_sum_arrays(x_full, bs[0], bw[0], bl[0], brb[0], R, rows)

    return jax.shard_map(
        body,
        mesh=mesh,
        # check_vma: the Pallas scatter-matmul's out_shape carries no
        # varying-mesh-axes annotation, and jax's vma validation rejects
        # that inside shard_map on TPU backends; numerics are covered by
        # the N-vs-1-device parity tests.
        check_vma=False,
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=P("node", None),
    )(x, blk_src, blk_weight, blk_local, blk_rowblock)


def _apply_tiles(mesh, R, rows, T, x, blk_src, blk_weight, blk_local,
                 blk_rowblock, tv, tr, tc, mask):
    """Hybrid multi-chip aggregation: per-shard dense tiles over the
    all-gathered buffer (MXU, no per-edge gather) + the blocked residual.
    The tile matmuls and the residual gather both read x_full, so XLA
    schedules them independently after the one all_gather."""
    from plnlp_tpu.ops.tile_spmm import tile_pass_tiles

    nrl = rows // T
    has_mask = mask is not None

    def body(x_blk, bs, bw, bl, brb, tv, tr, tc, *m):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        res = blocked_sum_arrays(x_full, bs[0], bw[0], bl[0], brb[0], R, rows)
        x_tiles = x_full.reshape(-1, T, x_full.shape[-1])
        tile_out = tile_pass_tiles(
            tv[0], tr[0], tc[0], x_tiles, nrl, m[0][0] if m else None
        )
        return res + tile_out[:rows].astype(res.dtype)

    specs = [
        P("node", None),
        P("node", None, None),
        P("node", None, None),
        P("node", None, None),
        P("node", None),
        P("node", None, None, None),
        P("node", None),
        P("node", None),
    ]
    args = [x, blk_src, blk_weight, blk_local, blk_rowblock, tv, tr, tc]
    if has_mask:
        specs.append(P("node", None))
        args.append(mask)
    return jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # Pallas out_shape has no vma annotation (see _apply)
        in_specs=tuple(specs),
        out_specs=P("node", None),
    )(*args)


def _apply_halo(mesh, R, rows, x, plan):
    """Hardened halo aggregation (parallel.halo): local edges aggregate
    straight from x_blk with NO dependency on the collectives — XLA's
    latency-hiding scheduler overlaps the all_to_all/all_gather with the
    local MXU work — while remote edges read from the concatenated
    [per-peer halo | replicated hubs] buffer."""

    def body(x_blk, ls, lw, ll, lrb, rs, rw, rl, rrb, sidx, hidx):
        send = x_blk[sidx[0].reshape(-1)]  # (S*q, D), ordered by dest shard
        halo = jax.lax.all_to_all(
            send, "node", split_axis=0, concat_axis=0, tiled=True
        )  # (S*q, D): segment s*q.. holds the rows owned by shard s
        hubs = jax.lax.all_gather(
            x_blk[hidx[0]], "node", axis=0, tiled=True
        )  # (S*qh, D)
        buffer = jnp.concatenate([halo, hubs], axis=0)
        local_out = blocked_sum_arrays(
            x_blk, ls[0], lw[0], ll[0], lrb[0], R, rows
        )
        remote_out = blocked_sum_arrays(
            buffer, rs[0], rw[0], rl[0], rrb[0], R, rows
        )
        return local_out + remote_out

    return jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # Pallas out_shape has no vma annotation (see _apply)
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=P("node", None),
    )(
        x,
        plan["loc_src"],
        plan["loc_weight"],
        plan["loc_local"],
        plan["loc_rowblock"],
        plan["rem_src"],
        plan["rem_weight"],
        plan["rem_local"],
        plan["rem_rowblock"],
        plan["send_idx"],
        plan["hub_idx"],
    )


def _mean_scale(pg: PartitionedGraph, y: jnp.ndarray) -> jnp.ndarray:
    deg = pg.local_in_degrees.reshape(-1)
    scale = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0).astype(y.dtype)
    return y * scale[:, None]


def _direction(pg: PartitionedGraph, mesh: Mesh, comm: str, x, direction: str):
    pre = "fwd_" if direction == "fwd" else "bwd_"
    get = lambda name: getattr(pg, pre + name)
    if pg.tile:
        suf = "" if direction == "fwd" else "_t"
        t = lambda name: getattr(pg, "tile_" + name + suf)
        return _apply_tiles(
            mesh,
            pg.block_rows,
            pg.rows_per_shard,
            pg.tile,
            x,
            get("blk_src"),
            get("blk_weight"),
            get("blk_local"),
            get("blk_rowblock"),
            t("vals"),
            t("row"),
            t("col"),
            t("row_mask"),
        )
    if comm == "halo":
        return _apply_halo(
            mesh,
            pg.block_rows,
            pg.rows_per_shard,
            x,
            get("halo"),
        )
    return _apply(
        mesh,
        pg.block_rows,
        pg.rows_per_shard,
        x,
        get("blk_src"),
        get("blk_weight"),
        get("blk_local"),
        get("blk_rowblock"),
    )


# The node→slot relayout (pg.perm_in / perm_out, partition.assign_slots) is
# applied HERE, inside the custom VJPs, as two pure gathers per pass — the
# backward never autodiffs through the relayout (a gather's VJP is a scatter;
# a permutation's inverse is another gather).  The math: with permutation P
# (x_slots = P x), the slot-space operator A_s computes y = Pᵀ A_s P x, so
# dX = Pᵀ A_sᵀ P dY — identical wrapping both directions.


def _to_slots(pg: PartitionedGraph, x: jnp.ndarray) -> jnp.ndarray:
    return x if pg.perm_in is None else x[pg.perm_in]


def _to_global(pg: PartitionedGraph, y: jnp.ndarray) -> jnp.ndarray:
    return y if pg.perm_out is None else y[pg.perm_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pspmm(
    pg: PartitionedGraph, x: jnp.ndarray, mesh: Mesh, reduce: str, comm: str
):
    y = _direction(pg, mesh, comm, _to_slots(pg, x), "fwd")
    if reduce == "mean":
        y = _mean_scale(pg, y)
    return _to_global(pg, y)


def _pspmm_fwd(pg, x, mesh, reduce, comm):
    return _pspmm(pg, x, mesh, reduce, comm), pg


def _pspmm_bwd(mesh, reduce, comm, pg, g):
    g = _to_slots(pg, g)
    if reduce == "mean":
        g = _mean_scale(pg, g)
    gx = _direction(pg, mesh, comm, g, "bwd")
    return (jax.tree_util.tree_map(_zero_cot, pg), _to_global(pg, gx))


_pspmm.defvjp(_pspmm_fwd, _pspmm_bwd)


def partitioned_spmm(
    gp: GraphParallel, x: jnp.ndarray, reduce: str = "sum"
) -> jnp.ndarray:
    """Row-sharded SpMM.  ``x``: (num_nodes or padded_nodes, D); rows beyond
    the real node count are zero-padded.  Returns (num_nodes, D)."""
    pg = gp.pg
    if x.shape[0] < pg.padded_nodes:
        x = jnp.pad(x, ((0, pg.padded_nodes - x.shape[0]), (0, 0)))
    if gp.comm == "halo" and pg.fwd_halo is None:
        raise ValueError("comm='halo' requires a halo plan (with_halo / "
                         "make_graph_parallel(comm='halo'))")
    y = _pspmm(pg, x, gp.mesh, reduce, gp.comm)
    return y[: pg.num_nodes]


def _blocked_rowsum(w, bl, brb, R, n_rowblocks):
    """Per-local-row sums of per-edge scalars via the one-hot matmul trick
    (no feature-dim scatter; one tiny segment-sum over row-blocks)."""
    onehot = (
        bl[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
    ).astype(w.dtype)
    per_blk = jnp.einsum("nb,nbr->nr", w, onehot)
    out = jax.ops.segment_sum(
        per_blk, brb, num_segments=n_rowblocks, indices_are_sorted=True
    )
    return out.reshape(-1)  # (n_rowblocks * R,)


def _ptc_fwd_impl(pg: PartitionedGraph, lp, x, mesh):
    """Shard_map forward for TransformerConv; returns (out, alpha).

    Because edges are destination-sharded, the per-destination softmax
    segments are entirely shard-local: each shard computes its own edges'
    attention logits (q from local rows, k/v from the all-gathered
    features), normalizes over its local destinations, and reuses the
    blocked scatter-matmul with the attention weights as the runtime edge
    weights (single-device semantics: reference plnlp/layer.py:57-63).
    """
    import math as _math

    from plnlp_tpu.nn import linear

    R = pg.block_rows
    rows = pg.rows_per_shard
    d = lp["lin_query"]["w"].shape[1]

    def body(x_blk, bs, bw, bl, brb):
        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        q = linear(lp["lin_query"], x_blk)  # local rows only
        k = linear(lp["lin_key"], x_full)
        v = linear(lp["lin_value"], x_full)
        bs0, bw0, bl0, brb0 = bs[0], bw[0], bl[0], brb[0]
        dst_local = brb0[:, None] * R + bl0  # (nblk, B) shard-local rows
        # one widened gather for k AND v at the shared sender indices (the
        # XLA row gather is row-rate bound, flat in width — measured)
        kv_e = jnp.concatenate([k, v], axis=-1)[bs0.reshape(-1)]
        k_e = kv_e[:, :d].reshape(bs0.shape + (d,))
        logits = (
            jnp.sum(q[dst_local] * k_e, axis=-1) / _math.sqrt(d)
        ).astype(jnp.float32)
        valid = bw0 != 0
        flat_dst = dst_local.reshape(-1)
        flat_logits = jnp.where(valid.reshape(-1), logits.reshape(-1), -jnp.inf)
        seg_max = jax.ops.segment_max(flat_logits, flat_dst, num_segments=rows)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(
            valid.reshape(-1),
            jnp.exp(flat_logits - seg_max[flat_dst]),
            0.0,
        )
        seg_sum = jax.ops.segment_sum(ex, flat_dst, num_segments=rows)
        denom = jnp.maximum(seg_sum, jnp.finfo(jnp.float32).tiny)
        alpha = (ex / denom[flat_dst]).reshape(bw0.shape).astype(jnp.float32)
        agg = blocked_sum_arrays(
            None, bs0, alpha, bl0, brb0, R, rows, feats=kv_e[:, d:]
        )
        return agg + linear(lp["lin_skip"], x_blk), alpha[None]

    return jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,  # Pallas out_shape has no vma annotation (see _apply)
        in_specs=(
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
        ),
        out_specs=(P("node", None), P("node", None, None)),
    )(x, pg.fwd_blk_src, pg.fwd_blk_weight, pg.fwd_blk_local, pg.fwd_blk_rowblock)


def _ptc_bwd_impl(pg: PartitionedGraph, lp, x, alpha, g, mesh):
    """Hand-written TransformerConv backward — all irregular work runs as
    blocked scatter-matmuls over the fwd (dst-sharded) and bwd (src-sharded)
    structures; NO feature-dimension XLA scatter anywhere.

    Math per shard (dst rows owned in fwd structure, src rows in bwd):
        dagg      = g (local dst rows)
        dα_e      = v[src_e] · dagg[dst_e]                 (fwd-layout SDDMM)
        dlogit_e  = α_e (dα_e − Σ_{e'∈row(dst_e)} α dα)    (softmax Jacobian;
                    row sums via the one-hot matmul trick, no scatter)
        dq[dst]   = Σ_e (dlogit_e/√d) k[src_e]      (blocked over fwd struct)
        dk[src]   = Σ_e (dlogit_e/√d) q[dst_e]      (blocked over bwd struct)
        dv[src]   = Σ_e α_e dagg[dst_e]             (blocked over bwd struct)
    Per-edge scalars (α, dlogit) cross from fwd to bwd layout with one
    all_gather + the precomputed bwd_gather_fwd slot map.  Parameter
    gradients are per-shard partials psum'ed over 'node'; dx lands
    pre-sharded (skip/q contributions from local rows, k/v from owned rows).
    """
    import math as _math

    R = pg.block_rows
    rows = pg.rows_per_shard
    n_rb = rows // R
    d = lp["lin_query"]["w"].shape[1]
    inv_sqrt_d = 1.0 / _math.sqrt(d)
    cdt = x.dtype

    def body(x_blk, g_blk, a_blk, bs, bw, bl, brb, nbs, nbw, nbl, nbrb, nmap):
        wq, bq = lp["lin_query"]["w"].astype(cdt), lp["lin_query"]["b"].astype(cdt)
        wk, bk = lp["lin_key"]["w"].astype(cdt), lp["lin_key"]["b"].astype(cdt)
        wv, bv = lp["lin_value"]["w"].astype(cdt), lp["lin_value"]["b"].astype(cdt)
        ws = lp["lin_skip"]["w"].astype(cdt)

        x_full = jax.lax.all_gather(x_blk, "node", axis=0, tiled=True)
        g_full = jax.lax.all_gather(g_blk, "node", axis=0, tiled=True)
        a_full = jax.lax.all_gather(a_blk, "node", axis=0, tiled=True)
        a_flat = a_full.reshape(-1)  # (S*nblk_f*B,)

        q_full = jnp.dot(x_full, wq, preferred_element_type=cdt) + bq
        k_full = jnp.dot(x_full, wk, preferred_element_type=cdt) + bk
        v_full = jnp.dot(x_full, wv, preferred_element_type=cdt) + bv

        bs0, bw0, bl0, brb0 = bs[0], bw[0], bl[0], brb[0]
        alpha = a_blk[0]
        valid = (bw0 != 0).astype(jnp.float32)
        dst_local = brb0[:, None] * R + bl0

        # ONE widened gather for k AND v at the shared fwd sender indices
        # (row-rate-bound gather, flat in width — k feeds dq, v feeds dα)
        kv_e = jnp.concatenate([k_full, v_full], axis=-1)[bs0.reshape(-1)]
        v_e = kv_e[:, d:].reshape(bs0.shape + (d,))

        # dα then the softmax Jacobian (row sums without scatter)
        dalpha = (
            jnp.sum(
                g_blk[dst_local].astype(jnp.float32)
                * v_e.astype(jnp.float32),
                axis=-1,
            )
            * valid
        )
        row_s = _blocked_rowsum(alpha * dalpha, bl0, brb0, R, n_rb)
        dlogit = alpha * (dalpha - row_s[dst_local]) * valid

        # dq over the fwd structure (k pre-gathered above)
        dq_rows = blocked_sum_arrays(
            None, bs0, dlogit * inv_sqrt_d, bl0, brb0, R, rows,
            feats=kv_e[:, :d],
        ).astype(cdt)

        # per-edge scalars to bwd layout: one scalar all_gather + slot map.
        # dlogit and alpha share the map — ONE 2-wide gather instead of two
        # (row-rate-bound gather; see ops/transformer.py)
        dlog_full = jax.lax.all_gather(
            dlogit[None], "node", axis=0, tiled=True
        ).reshape(-1)
        nbs0, nbw0, nbl0, nbrb0, nmap0 = nbs[0], nbw[0], nbl[0], nbrb[0], nmap[0]
        nvalid = (nbw0 != 0).astype(jnp.float32)
        da = jnp.stack([dlog_full, a_flat], axis=-1)
        da_bwd = da[nmap0.reshape(-1)].reshape(nmap0.shape + (2,))
        dlog_bwd = da_bwd[..., 0] * nvalid
        alpha_bwd = da_bwd[..., 1] * nvalid

        # dk / dv over the bwd (src-sharded) structure — q and dout share
        # the bwd indices, so again one widened gather serves both
        qg_e = jnp.concatenate([q_full, g_full], axis=-1)[nbs0.reshape(-1)]
        dk_rows = blocked_sum_arrays(
            None, nbs0, dlog_bwd * inv_sqrt_d, nbl0, nbrb0, R, rows,
            feats=qg_e[:, :d],
        ).astype(cdt)
        dv_rows = blocked_sum_arrays(
            None, nbs0, alpha_bwd, nbl0, nbrb0, R, rows, feats=qg_e[:, d:]
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
    dx, dlp = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P("node", None),
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
            P("node", None, None),
            P("node", None, None),
            P("node", None, None),
            P("node", None),
            P("node", None, None),
        ),
        out_specs=(P("node", None), dlp_spec),
    )(
        x,
        g,
        alpha,
        pg.fwd_blk_src,
        pg.fwd_blk_weight,
        pg.fwd_blk_local,
        pg.fwd_blk_rowblock,
        pg.bwd_blk_src,
        pg.bwd_blk_weight,
        pg.bwd_blk_local,
        pg.bwd_blk_rowblock,
        pg.bwd_gather_fwd,
    )
    # cotangents must match primal param dtypes (f32 master weights)
    dlp = jax.tree_util.tree_map(
        lambda gr, p: gr.astype(p.dtype), dlp, {k: lp[k] for k in dlp}
    )
    return dx, dlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ptc(pg: PartitionedGraph, lp, x, mesh):
    # node→slot relayout at the VJP boundary, like _pspmm (gathers only)
    return _to_global(pg, _ptc_fwd_impl(pg, lp, _to_slots(pg, x), mesh)[0])


def _ptc_fwd(pg, lp, x, mesh):
    x_slots = _to_slots(pg, x)
    out, alpha = _ptc_fwd_impl(pg, lp, x_slots, mesh)
    return _to_global(pg, out), (pg, lp, x_slots, alpha)


def _ptc_bwd(mesh, res, g):
    pg, lp, x_slots, alpha = res
    dx, dlp = _ptc_bwd_impl(pg, lp, x_slots, alpha, _to_slots(pg, g), mesh)
    dlp_full = {k: dlp.get(k, jax.tree_util.tree_map(_zero_cot, v)) for k, v in lp.items()}
    return (jax.tree_util.tree_map(_zero_cot, pg), dlp_full, _to_global(pg, dx))


_ptc.defvjp(_ptc_fwd, _ptc_bwd)


def partitioned_transformer_conv(gp: GraphParallel, lp, x: jnp.ndarray):
    """One TransformerConv layer over a partitioned graph, with a
    hand-written backward mirroring the blocked-SpMM VJP structure
    (transposed blocked scatter-matmuls + edge-softmax Jacobian) instead of
    XLA autodiff gathers/scatters.  Grad parity vs the single-device path is
    asserted in tests/test_graph_parallel.py on 2/4/8 shards."""
    pg = gp.pg
    if pg.tile:
        # tiled partition: shard-local block-sparse flash sweeps over the
        # per-shard tile sets + blocked residual (parallel.tile_transformer)
        from plnlp_tpu.parallel.tile_transformer import (
            partitioned_tile_transformer_conv,
        )

        return partitioned_tile_transformer_conv(gp, lp, x)
    if x.shape[0] < pg.padded_nodes:
        x = jnp.pad(x, ((0, pg.padded_nodes - x.shape[0]), (0, 0)))
    out = _ptc(pg, lp, x, gp.mesh)
    return out[: pg.num_nodes]
