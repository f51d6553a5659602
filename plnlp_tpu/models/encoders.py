"""GNN encoders: SAGE / GCN / WSAGE (weighted GraphConv) / Transformer.

Functional TPU-first re-designs of the reference's PyG convolution stacks
(reference plnlp/layer.py:7-63).  Each layer is dense matmuls (MXU) around one
SpMM (ops/spmm.py); the graph is full-resident in HBM and every forward is a
full-graph pass, mirroring the reference's full-graph/minibatch-pairs design
(reference model.py:150-151).

Stacking semantics copied exactly from BaseGNN.forward (layer.py:18-27):
conv → relu → dropout between layers, the LAST layer is linear — except when
``num_layers == 1``, where relu+dropout apply after the single layer.

Per-convolution formulas (validated against PyG 2.0.1 sources in tests):
* SAGE    — out = lin_l(mean_{j∈N(i)} x_j) + lin_r(x_i); bias on lin_l only.
* GCN     — out = Â (x W) + b with Â precomputed (gcn_normalize_edges);
            glorot weights, zero bias (GCNConv(normalize=False), layer.py:45).
* WSAGE   — GraphConv: out = lin_rel(Σ_j w_ij x_j) + lin_root(x_i); the D⁻¹A
            row normalization is precomputed (main.py:181-182).
* Transformer — TransformerConv (heads=1, default args): per-edge softmax
            attention α_ij = softmax_j(⟨W_q x_i, W_k x_j⟩/√d), out =
            W_skip x_i + Σ_j α_ij (W_v x_j); adjacency values stripped
            beforehand (main.py:184-186).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph
from plnlp_tpu.nn import dropout as _dropout
from plnlp_tpu.nn import glorot_init, linear, torch_linear_init
from plnlp_tpu.ops.sddmm import edge_softmax
from plnlp_tpu.ops.spmm import spmm

ENCODER_NAMES = ("SAGE", "GCN", "WSAGE", "TRANSFORMER")

__all__ = ["init_encoder", "apply_encoder", "ENCODER_NAMES"]


def _layer_dims(in_ch, hidden_ch, out_ch, num_layers):
    dims = []
    for i in range(num_layers):
        first = in_ch if i == 0 else hidden_ch
        second = out_ch if i == num_layers - 1 else hidden_ch
        dims.append((first, second))
    return dims


def init_encoder(
    key,
    name: str,
    in_channels: int,
    hidden_channels: int,
    num_layers: int,
    out_channels: Optional[int] = None,
):
    """Layer topology mirrors reference layer.py:30-63 / model.py:252-260
    (out_channels == hidden_channels in the factory)."""
    name = name.upper()
    out_channels = hidden_channels if out_channels is None else out_channels
    dims = _layer_dims(in_channels, hidden_channels, out_channels, num_layers)
    layers = []
    keys = jax.random.split(key, num_layers)
    for (fan_in, fan_out), k in zip(dims, keys):
        if name == "SAGE":
            kl, kr = jax.random.split(k)
            layers.append(
                {
                    "lin_l": torch_linear_init(kl, fan_in, fan_out, bias=True),
                    "lin_r": torch_linear_init(kr, fan_in, fan_out, bias=False),
                }
            )
        elif name == "GCN":
            layers.append({"lin": glorot_init(k, fan_in, fan_out, bias=True)})
        elif name == "WSAGE":
            kl, kr = jax.random.split(k)
            layers.append(
                {
                    "lin_rel": torch_linear_init(kl, fan_in, fan_out, bias=True),
                    "lin_root": torch_linear_init(kr, fan_in, fan_out, bias=False),
                }
            )
        elif name == "TRANSFORMER":
            kq, kk, kv, ks = jax.random.split(k, 4)
            layers.append(
                {
                    "lin_query": torch_linear_init(kq, fan_in, fan_out, bias=True),
                    "lin_key": torch_linear_init(kk, fan_in, fan_out, bias=True),
                    "lin_value": torch_linear_init(kv, fan_in, fan_out, bias=True),
                    "lin_skip": torch_linear_init(ks, fan_in, fan_out, bias=True),
                }
            )
        else:
            raise ValueError(f"unknown encoder: {name}")
    return {"layers": layers}


def _sage_conv(lp, graph, graph_t, x):
    agg = spmm(graph, x, reduce="mean", graph_t=graph_t)
    return linear(lp["lin_l"], agg) + linear(lp["lin_r"], x)


def _gcn_conv(lp, graph, graph_t, x):
    # GCNConv order: out = Â (x W) + b (bias added AFTER aggregation).
    hw = jnp.dot(
        x, lp["lin"]["w"].astype(x.dtype), preferred_element_type=x.dtype
    )
    out = spmm(graph, hw, reduce="sum", graph_t=graph_t)
    return out + lp["lin"]["b"].astype(x.dtype)


def _wsage_conv(lp, graph, graph_t, x):
    agg = spmm(graph, x, reduce="sum", graph_t=graph_t)
    return linear(lp["lin_rel"], agg) + linear(lp["lin_root"], x)


def _transformer_conv(lp, graph, graph_t, x):
    from plnlp_tpu.dense import DenseAdj
    from plnlp_tpu.ops.tile_spmm import HybridGraph
    from plnlp_tpu.parallel.graph_parallel import (
        GraphParallel,
        partitioned_transformer_conv,
    )

    if isinstance(graph, GraphParallel):
        # Destination-sharded edges make every softmax segment shard-local.
        return partitioned_transformer_conv(graph, lp, x)

    if isinstance(graph, HybridGraph):
        # Block-sparse attention: dense masked QK^T/PV per community tile
        # on the MXU + per-edge residual, two-pass global softmax
        # (ops/tile_attention.py).
        from plnlp_tpu.ops.tile_attention import hybrid_transformer_conv

        return hybrid_transformer_conv(lp, graph, x)

    if (
        not isinstance(graph, DenseAdj)
        and graph.blk_src is not None
        and graph.tconv_map is not None
        and graph_t is not None
        and graph_t.blk_src is not None
    ):
        # Blocked path with the hand-written VJP (ops/transformer.py): no
        # feature-dim scatter in the backward.  Needs the fwd↔transpose
        # slot coupling from prepare_graph(couple_transpose=True).
        # Dispatched BEFORE computing q/k/v — the blocked impl derives
        # them internally.
        from plnlp_tpu.ops.transformer import transformer_conv_blocked

        return transformer_conv_blocked(lp, graph, graph_t, x)

    d = lp["lin_query"]["w"].shape[1]
    q = linear(lp["lin_query"], x)
    k = linear(lp["lin_key"], x)
    v = linear(lp["lin_value"], x)
    if isinstance(graph, DenseAdj):
        # Dense masked attention over the adjacency — all MXU; softmax in f32.
        logits = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32) / math.sqrt(d)
        )
        mask = graph.adj != 0
        logits = jnp.where(mask, logits, -jnp.inf)
        logits = logits - jnp.max(
            jnp.where(mask, logits, jnp.finfo(jnp.float32).min),
            axis=1,
            keepdims=True,
        )
        ex = jnp.where(mask, jnp.exp(logits), 0.0)
        denom = jnp.maximum(
            jnp.sum(ex, axis=1, keepdims=True), jnp.finfo(jnp.float32).tiny
        )
        agg = jnp.dot(
            (ex / denom).astype(x.dtype), v, preferred_element_type=x.dtype
        )
        return agg + linear(lp["lin_skip"], x)
    # k and v are gathered at the SAME indices — fuse into one wide gather:
    # the XLA row gather is row-RATE bound (~60M rows/s on v5e, measured
    # flat from D=64 to D=512), so one 2D-wide gather costs half of two.
    kv = jnp.concatenate([k, v], axis=-1)[graph.senders]
    k_s, v_s = kv[:, :d], kv[:, d:]
    logits = jnp.sum(q[graph.receivers] * k_s, axis=-1) / math.sqrt(d)
    alpha = edge_softmax(graph, logits)
    msgs = v_s * alpha[:, None]
    agg = jax.ops.segment_sum(
        msgs,
        graph.receivers,
        num_segments=graph.num_nodes,
        indices_are_sorted=True,
    )
    return agg + linear(lp["lin_skip"], x)


_CONVS = {
    "SAGE": _sage_conv,
    "GCN": _gcn_conv,
    "WSAGE": _wsage_conv,
    "TRANSFORMER": _transformer_conv,
}


def apply_encoder(
    params,
    name: str,
    graph: Graph,
    x: jnp.ndarray,
    *,
    graph_t: Optional[Graph] = None,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
):
    """``remat=True`` rematerializes each conv layer in the backward pass
    (jax.checkpoint) — trades FLOPs for activation memory on giant graphs.

    Padded-carry (round 5): over a perm-free HybridGraph the whole layer
    stack runs at n_pad = num_nodes rounded up to the tile size — x is
    padded ONCE here and sliced back ONCE at the end, so the per-layer
    pad/slice HBM round-trips of the tile ops vanish (hybrid_spmm /
    hybrid_transformer_conv detect the padded operand).  Pad rows carry
    garbage (bias -> relu chains); that is safe because pad nodes have no
    edges — every tile access is adjacency-masked and the residual's
    indices are < num_nodes — and their cotangents are exactly zero (the
    only consumer of pad rows is the final slice).  Only dropout masks
    shift (the mask SHAPE changes), which is seed-relabeling, not a
    semantics change."""
    from plnlp_tpu.graph import _pad_to
    from plnlp_tpu.ops.tile_spmm import HybridGraph

    name = name.upper()
    conv = _CONVS[name]
    if remat:
        conv = jax.checkpoint(conv, static_argnums=())
    # This is the padding SIDE of the protocol; the tile ops detect the
    # padded operand via tile_spmm.is_padded_operand (the single source
    # of the in-band predicate).
    pad_rows = 0
    if (
        isinstance(graph, HybridGraph)
        and graph.perm_in is None
        and x.shape[0] == graph.num_nodes
    ):
        pad_rows = _pad_to(graph.num_nodes, graph.tile) - graph.num_nodes
        if pad_rows:
            x = jnp.pad(x, ((0, pad_rows), (0, 0)))
    layers = params["layers"]
    num_layers = len(layers)
    keys = (
        jax.random.split(rng, num_layers) if rng is not None else [None] * num_layers
    )
    for i, lp in enumerate(layers[:-1]):
        x = conv(lp, graph, graph_t, x)
        x = jax.nn.relu(x)
        x = _dropout(x, dropout, keys[i], train)
    x = conv(layers[-1], graph, graph_t, x)
    if num_layers == 1:
        # Reference quirk: single-layer stacks relu+dropout the last layer
        # (layer.py:23-27) — load-bearing for the collab-RW config.
        x = jax.nn.relu(x)
        x = _dropout(x, dropout, keys[-1], train)
    if pad_rows:
        x = x[: graph.num_nodes]
    return x
