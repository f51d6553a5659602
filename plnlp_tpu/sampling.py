"""Negative edge samplers — static-shape JAX re-designs.

Replaces reference plnlp/negative_sample.py (+ PyG's native
``negative_sampling``) with pure jax.random code.  TPU constraint: all shapes
static, so rejection sampling runs a FIXED number of rounds; the vanishing
fraction of candidates still colliding after the last round passes through
unfiltered (the reference has an analogous imperfection: PyG 'sparse' does one
rejection round and PLNLP pads undershoot by re-using sampled negatives,
negative_sample.py:14-18).

Sampler contract (matches reference): return int32 ``(num_pos, num_neg, 2)``.

Membership testing uses a vectorized binary search over each destination
row's sorted CSR column range — O(log max_degree) gathers, no host sync, no
int64 edge keys needed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph

__all__ = [
    "edges_exist",
    "global_neg_sample",
    "global_perm_neg_sample",
    "local_neg_sample",
    "local_dist_neg_sample",
    "sample_perm_copy",
    "degree_unigram_table",
]

_REJECTION_ROUNDS = 4


def edges_exist(graph: Graph, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """True where (src, dst) is a real edge.

    Small graphs carry a bit-packed adjacency mask (one gather per query);
    large graphs fall back to a vectorized binary search over
    ``senders[indptr[dst]:indptr[dst+1]]`` whose step count is bounded by the
    MAX DEGREE, not the edge count (the sampler calls this ~rounds× per
    epoch over millions of candidates — it must not be gather-pass heavy).
    """
    if graph.edge_mask is not None:
        w = (graph.num_nodes + 7) // 8
        byte = graph.edge_mask[dst * w + (src >> 3)]
        return ((byte >> (src & 7).astype(jnp.uint8)) & 1).astype(bool)
    lo = graph.indptr[dst]
    hi = graph.indptr[dst + 1]
    steps = math.ceil(math.log2(max(graph.max_degree, 1) + 1)) + 1

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        val = graph.senders[jnp.minimum(mid, graph.num_edges_padded - 1)]
        go_right = val < src
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        keep = lo < hi
        return (jnp.where(keep, new_lo, lo), jnp.where(keep, new_hi, hi))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    found = graph.senders[jnp.minimum(lo, graph.num_edges_padded - 1)]
    return (lo < graph.indptr[dst + 1]) & (found == src)


def _sample_non_edges(key, graph: Graph, count: int) -> jnp.ndarray:
    """Uniform (src, dst) pairs avoiding real edges and self-loops.

    Mirrors PyG negative_sampling with self-loops pre-added to the exclusion
    set (reference negative_sample.py:8-9): fixed-round resampling instead of
    PyG's single filter + PLNLP's pad-with-replacement.
    """
    n = graph.num_nodes

    def round_body(i, state):
        key, src, dst = state
        key, k1 = jax.random.split(key)
        bad = edges_exist(graph, src, dst) | (src == dst)
        cand = jax.random.randint(k1, (2, count), 0, n, dtype=jnp.int32)
        src = jnp.where(bad, cand[0], src)
        dst = jnp.where(bad, cand[1], dst)
        return (key, src, dst)

    key, k0 = jax.random.split(key)
    init = jax.random.randint(k0, (2, count), 0, n, dtype=jnp.int32)
    key, src, dst = jax.lax.fori_loop(
        0, _REJECTION_ROUNDS, round_body, (key, init[0], init[1])
    )
    # Final exact pass: the reference NEVER emits true edges — PyG filters
    # them and PLNLP pads any undershoot by re-using already-sampled
    # negatives with replacement (negative_sample.py:14-18).  Mirror that:
    # any candidate still colliding after the fixed rounds is replaced by a
    # random known-good candidate from this same batch (a duplicate
    # negative, exactly the reference's fallback distribution).  Only if the
    # ENTIRE batch collided (complete graph — no non-edges exist) does the
    # original candidate pass through.
    bad = edges_exist(graph, src, dst) | (src == dst)
    _, kd = jax.random.split(key)
    donor = jax.random.randint(kd, (count,), 0, count, dtype=jnp.int32)
    first_good = jnp.argmin(bad).astype(jnp.int32)  # 0 if all good/all bad
    donor = jnp.where(bad[donor], first_good, donor)
    donor_ok = ~bad[donor]
    idx = jnp.where(bad & donor_ok, donor, jnp.arange(count, dtype=jnp.int32))
    return jnp.stack([src[idx], dst[idx]], axis=-1)  # (count, 2)


@functools.partial(jax.jit, static_argnames=("num_samples", "num_neg"))
def global_neg_sample(
    key, graph: Graph, num_samples: int, num_neg: int
) -> jnp.ndarray:
    """num_samples*num_neg global non-edges, reshaped (P, num_neg, 2)
    (reference global_neg_sample, negative_sample.py:6-20)."""
    pairs = _sample_non_edges(key, graph, num_samples * num_neg)
    return pairs.reshape(num_samples, num_neg, 2)


def sample_perm_copy(key, pairs: jnp.ndarray, num_neg: int) -> jnp.ndarray:
    """Reference sample_perm_copy (negative_sample.py:61-76): keep the pool,
    append (num_neg-1) whole-pool shuffles — the SAME permutation applied to
    src and dst, so copies re-shuffle existing pairs, not new pairings — then
    flat-reshape to (P, num_neg, 2)."""
    p = pairs.shape[0]
    chunks = [pairs]
    for _ in range(num_neg - 1):
        key, k = jax.random.split(key)
        perm = jax.random.permutation(k, p)
        chunks.append(pairs[perm])
    flat = jnp.concatenate(chunks, axis=0)  # (P*num_neg, 2)
    return flat.reshape(p, num_neg, 2)


@functools.partial(jax.jit, static_argnames=("num_samples", "num_neg"))
def global_perm_neg_sample(
    key, graph: Graph, num_samples: int, num_neg: int
) -> jnp.ndarray:
    """Sample a P-sized global pool once, permute-copy it num_neg times
    (reference negative_sample.py:23-28)."""
    k1, k2 = jax.random.split(key)
    pool = _sample_non_edges(k1, graph, num_samples)
    return sample_perm_copy(k2, pool, num_neg)


def degree_unigram_table(
    graph: Graph, power: float = 0.75, table_size: int = 1_000_000
) -> jnp.ndarray:
    """Degree^power unigram sampling table (word2vec-style).

    A WORKING counterpart of the reference's dead code
    (generate_neg_dist_table, utils.py:100-117 — defined but never called,
    and its consumer local_dist_neg_sample is commented out at
    negative_sample.py:46-58).  Vectorized host-side; degrees include a
    self-loop like the reference's set_diag."""
    import numpy as np

    deg = np.asarray(graph.in_degrees).astype(np.float64) + 1.0
    p = deg**power
    cum = np.cumsum(p / p.sum())
    # table[i] = smallest node j with cum[j] > i/table_size
    grid = (np.arange(table_size) + 0.5) / table_size
    table = np.searchsorted(cum, grid).astype(np.int32)
    return jnp.asarray(np.minimum(table, graph.num_nodes - 1))


@functools.partial(jax.jit, static_argnames=("num_neg", "random_src"))
def local_dist_neg_sample(
    key,
    pos_edges: jnp.ndarray,
    neg_table: jnp.ndarray,
    num_neg: int,
    random_src: bool = True,
) -> jnp.ndarray:
    """Degree-biased local sampler — the reference's commented-out
    local_dist_neg_sample (negative_sample.py:46-58), made functional:
    destinations drawn from the unigram table instead of uniformly."""
    p = pos_edges.shape[0]
    k1, k2 = jax.random.split(key)
    if random_src:
        side = jax.random.randint(k1, (p,), 0, 2)
        neg_src = pos_edges[jnp.arange(p), side]
    else:
        neg_src = pos_edges[:, 0]
    neg_src = jnp.repeat(neg_src.reshape(-1, 1), num_neg, axis=1).reshape(-1)
    slot = jax.random.randint(k2, (num_neg * p,), 0, neg_table.shape[0])
    neg_dst = neg_table[slot].astype(pos_edges.dtype)
    return jnp.stack([neg_src, neg_dst], axis=-1).reshape(p, num_neg, 2)


@functools.partial(jax.jit, static_argnames=("num_nodes", "num_neg", "random_src"))
def local_neg_sample(
    key,
    pos_edges: jnp.ndarray,
    num_nodes: int,
    num_neg: int,
    random_src: bool = False,
) -> jnp.ndarray:
    """Keep the positive source (or a random endpoint), draw uniform random
    destinations; true edges are NOT excluded (reference
    negative_sample.py:31-43 — deliberate)."""
    p = pos_edges.shape[0]
    k1, k2 = jax.random.split(key)
    if random_src:
        side = jax.random.randint(k1, (p,), 0, 2)
        neg_src = pos_edges[jnp.arange(p), side]
    else:
        neg_src = pos_edges[:, 0]
    neg_src = jnp.repeat(neg_src.reshape(-1, 1), num_neg, axis=1).reshape(-1)
    neg_dst = jax.random.randint(
        k2, (num_neg * p,), 0, num_nodes, dtype=pos_edges.dtype
    )
    return jnp.stack([neg_src, neg_dst], axis=-1).reshape(p, num_neg, 2)
