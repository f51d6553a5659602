"""SDDMM (per-edge dot products) and numerically-stable edge softmax.

These two ops plus SpMM compose PyG's ``TransformerConv`` (reference
layer.py:57-63): attention logit per edge = (q_dst · k_src)/√d, softmax over
each destination's in-edges, then weighted aggregation of values.

Edges arrive sorted by destination (Graph invariant), so the per-destination
softmax is a pair of sorted segment reductions (max, sum) — XLA-friendly,
no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph

__all__ = ["sddmm_dot", "edge_softmax"]


def sddmm_dot(graph: Graph, q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-edge dot product: out[e] = q[receivers[e]] · k[senders[e]].

    [E_pad] result; padding edges produce garbage values that every consumer
    masks via ``graph.edge_weight == 0`` or segment bounds.
    """
    return jnp.sum(q[graph.receivers] * k[graph.senders], axis=-1)


def edge_softmax(graph: Graph, logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax of per-edge logits over each destination row's in-edges.

    Stable (max-subtracted); padding edges (weight==0) are excluded and get 0.
    """
    n = graph.num_nodes
    out_dtype = logits.dtype
    logits = logits.astype(jnp.float32)  # softmax numerics always f32
    valid = graph.edge_weight != 0
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    masked = jnp.where(valid, logits, neg_inf)
    seg_max = jax.ops.segment_max(
        masked, graph.receivers, num_segments=n, indices_are_sorted=True
    )
    # Rows with no edges have -inf max; clamp so exp() below stays finite.
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.where(valid, jnp.exp(logits - seg_max[graph.receivers]), 0.0)
    seg_sum = jax.ops.segment_sum(
        ex, graph.receivers, num_segments=n, indices_are_sorted=True
    )
    denom = jnp.maximum(seg_sum, jnp.finfo(logits.dtype).tiny)
    return (ex / denom[graph.receivers]).astype(out_dtype)
