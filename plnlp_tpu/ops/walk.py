"""Uniform random walks over a CSR graph.

TPU-native replacement for torch_cluster's native ``random_walk`` kernel used
by the reference's per-epoch pair augmentation (reference main.py:9,242).
A walk step is one gather + one uniform draw per walker, scanned L times —
embarrassingly parallel on the VPU, static shapes throughout.

Semantics match torch_cluster: a walker at a node with no out-edges stays put
(self-repeat), and the result is an (S, L+1) matrix whose first column is the
start nodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph

__all__ = ["random_walk"]


@functools.partial(jax.jit, static_argnames=("walk_length",))
def _walk(indptr, indices, start, key, walk_length: int):
    def step(carry, k):
        cur = carry
        lo = indptr[cur]
        deg = indptr[cur + 1] - lo
        r = jax.random.randint(k, cur.shape, 0, jnp.maximum(deg, 1))
        nxt = indices[lo + r]
        nxt = jnp.where(deg > 0, nxt, cur)
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, cols = jax.lax.scan(step, start, keys)
    return jnp.concatenate([start[None, :], cols], axis=0).T  # (S, L+1)


def random_walk(
    graph: Graph, start: jnp.ndarray, walk_length: int, key: jax.Array
) -> jnp.ndarray:
    """Walk ``walk_length`` uniform steps from each node in ``start``.

    Uses the graph's CSR-over-receivers layout: neighbors of node v are
    ``senders[indptr[v]:indptr[v+1]]``.  For the (symmetric) adjacencies the
    reference walks on, in- and out-neighborhoods coincide (main.py:228-233).
    """
    start = jnp.asarray(start, jnp.int32)
    return _walk(graph.indptr, graph.senders, start, key, int(walk_length))
