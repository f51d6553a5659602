"""Negative sampler contracts (shapes, exclusion, permutation semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import build_graph
from plnlp_tpu.sampling import (
    edges_exist,
    global_neg_sample,
    global_perm_neg_sample,
    local_neg_sample,
    sample_perm_copy,
)
from tests.conftest import random_graph_np


def _graph(rng, n=50, e=300):
    src, dst, _ = random_graph_np(rng, n, e)
    return build_graph(src, dst, None, num_nodes=n)


def test_edges_exist(rng):
    g = _graph(rng)
    e = g.num_edges
    src = np.asarray(g.senders)[:e]
    dst = np.asarray(g.receivers)[:e]
    # all real edges found
    got = np.asarray(edges_exist(g, jnp.asarray(src), jnp.asarray(dst)))
    assert got.all()
    # dense cross-check on random queries
    a = np.zeros((50, 50), bool)
    a[dst, src] = True
    qs = rng.integers(0, 50, 500)
    qd = rng.integers(0, 50, 500)
    got = np.asarray(edges_exist(g, jnp.asarray(qs), jnp.asarray(qd)))
    np.testing.assert_array_equal(got, a[qd, qs])


def test_global_neg_sample_excludes_edges_and_loops(rng):
    g = _graph(rng, n=30, e=200)
    out = global_neg_sample(jax.random.PRNGKey(0), g, 64, 3)
    assert out.shape == (64, 3, 2)
    flat = np.asarray(out).reshape(-1, 2)
    a = np.zeros((30, 30), bool)
    e = g.num_edges
    a[np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]] = True
    # the final exact-filter pass replaces residual collisions with duplicate
    # negatives (reference pad semantics) — ZERO true edges / self loops emitted
    collisions = a[flat[:, 1], flat[:, 0]].sum() + (flat[:, 0] == flat[:, 1]).sum()
    assert collisions == 0
    assert (flat >= 0).all() and (flat < 30).all()


def test_global_neg_sample_zero_leakage_at_ddi_density(rng):
    # ddi is ~11% dense — the regime where fixed-round rejection previously
    # leaked ~(density)^rounds true edges per batch.  The exact final filter
    # must emit zero (reference contract: negative_sample.py:6-20 pads with
    # duplicate negatives, never true edges).
    n = 200
    dense = rng.random((n, n)) < 0.12
    dense |= dense.T
    np.fill_diagonal(dense, False)
    src, dst = np.nonzero(dense)
    g = build_graph(src.astype(np.int32), dst.astype(np.int32), None, num_nodes=n)
    out = global_neg_sample(jax.random.PRNGKey(7), g, 4096, 3)
    flat = np.asarray(out).reshape(-1, 2)
    leaked = dense[flat[:, 1], flat[:, 0]].sum() + (flat[:, 0] == flat[:, 1]).sum()
    assert leaked == 0
    # still covers a broad set of pairs (not collapsed onto a few donors)
    assert len({(int(s), int(d)) for s, d in flat}) > 3000


def test_sample_perm_copy_semantics(rng):
    pairs = jnp.asarray(rng.integers(0, 100, (20, 2)))
    out = sample_perm_copy(jax.random.PRNGKey(1), pairs, 4)
    assert out.shape == (20, 4, 2)
    flat = np.asarray(out).reshape(-1, 2)
    # every row of the output is one of the original pairs (copies are
    # permutations of the pool, not new pairings — negative_sample.py:61-76)
    pool = {tuple(p) for p in np.asarray(pairs)}
    assert all(tuple(r) in pool for r in flat)
    # each copy block is a whole-pool permutation: multiset preserved
    # out.reshape(-1, 2) restores the concatenated [pool; perm1; perm2; ...]
    # order, so consecutive 20-row blocks are the permutation copies
    blocks = np.asarray(out).reshape(-1, 2).reshape(4, 20, 2)
    for b in range(4):
        assert {tuple(r) for r in blocks[b]} == pool


def test_global_perm_neg_sample(rng):
    g = _graph(rng, n=40, e=150)
    out = global_perm_neg_sample(jax.random.PRNGKey(2), g, 32, 3)
    assert out.shape == (32, 3, 2)
    # the underlying pool has only 32 distinct pairs
    flat = np.asarray(out).reshape(-1, 2)
    uniq = {tuple(r) for r in flat}
    assert len(uniq) <= 32


def test_local_neg_sample(rng):
    pos = jnp.asarray(rng.integers(0, 100, (25, 2)).astype(np.int32))
    out = local_neg_sample(jax.random.PRNGKey(3), pos, 100, 5)
    assert out.shape == (25, 5, 2)
    o = np.asarray(out)
    # source preserved per positive (random_src=False)
    np.testing.assert_array_equal(
        o[:, :, 0], np.repeat(np.asarray(pos)[:, :1], 5, axis=1)
    )
    assert (o[:, :, 1] >= 0).all() and (o[:, :, 1] < 100).all()


def test_local_neg_sample_random_src(rng):
    pos = jnp.asarray(rng.integers(0, 100, (200, 2)).astype(np.int32))
    out = local_neg_sample(jax.random.PRNGKey(4), pos, 100, 2, random_src=True)
    o = np.asarray(out)
    p = np.asarray(pos)
    from_col0 = (o[:, 0, 0] == p[:, 0]).mean()
    # with random endpoint selection both columns should appear
    assert 0.2 < from_col0 <= 1.0
    src_ok = (o[:, 0, 0] == p[:, 0]) | (o[:, 0, 0] == p[:, 1])
    assert src_ok.all()


def test_degree_unigram_table_and_local_dist(rng):
    from plnlp_tpu.sampling import degree_unigram_table, local_dist_neg_sample

    g = _graph(rng, n=30, e=400)
    table = degree_unigram_table(g, table_size=30000)
    assert table.shape == (30000,)
    counts = np.bincount(np.asarray(table), minlength=30)
    deg = np.asarray(g.in_degrees) + 1.0
    p = deg**0.75
    p /= p.sum()
    # empirical table frequencies ≈ degree^0.75 distribution
    np.testing.assert_allclose(counts / 30000, p, atol=0.01)

    pos = jnp.asarray(rng.integers(0, 30, (50, 2)).astype(np.int32))
    out = local_dist_neg_sample(jax.random.PRNGKey(0), pos, table, 4)
    assert out.shape == (50, 4, 2)
    o = np.asarray(out)
    src_ok = (o[:, :, 0] == np.asarray(pos)[:, :1]) | (
        o[:, :, 0] == np.asarray(pos)[:, 1:]
    )
    assert src_ok.all()  # random_src=True picks an endpoint


def test_remat_matches_no_remat(rng):
    from plnlp_tpu.graph import build_graph
    from plnlp_tpu.models import apply_encoder, init_encoder

    src, dst, _ = random_graph_np(rng, 40, 200)
    g = build_graph(src, dst, None, num_nodes=40)
    params = init_encoder(jax.random.PRNGKey(0), "SAGE", 8, 8, 2)
    x = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)

    def loss(p, remat):
        return jnp.sum(apply_encoder(p, "SAGE", g, x, remat=remat) ** 2)

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_edges_exist_bitmask_vs_binary_search(rng):
    """Small graphs use the bitmask; force the search path and compare."""
    import dataclasses

    g = _graph(rng, n=60, e=500)
    assert g.edge_mask is not None
    qs = jnp.asarray(rng.integers(0, 60, 2000).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, 60, 2000).astype(np.int32))
    via_mask = np.asarray(edges_exist(g, qs, qd))
    g_nomask = dataclasses.replace(g, edge_mask=None)
    via_search = np.asarray(edges_exist(g_nomask, qs, qd))
    np.testing.assert_array_equal(via_mask, via_search)
    # dense oracle
    a = np.zeros((60, 60), bool)
    e = g.num_edges
    a[np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]] = True
    np.testing.assert_array_equal(via_mask, a[np.asarray(qd), np.asarray(qs)])


def test_global_neg_sample_star_graph(rng):
    # star: node 0 connected to everyone — negatives must avoid all (0, v)
    # and (v, 0) pairs plus self loops, leaving only leaf-leaf pairs
    n = 40
    src = np.concatenate([np.zeros(n - 1, np.int64), np.arange(1, n)])
    dst = np.concatenate([np.arange(1, n), np.zeros(n - 1, np.int64)])
    g = build_graph(src, dst, None, num_nodes=n)
    out = np.asarray(global_neg_sample(jax.random.PRNGKey(3), g, 512, 2)).reshape(-1, 2)
    assert (out[:, 0] != 0).all() and (out[:, 1] != 0).all()
    assert (out[:, 0] != out[:, 1]).all()


def test_global_neg_sample_near_complete_graph(rng):
    # only ONE non-edge pair exists (plus its reverse): every sample must
    # land on it — the duplicate-pad fallback taken to its extreme
    n = 12
    dense = np.ones((n, n), bool)
    np.fill_diagonal(dense, False)
    dense[3, 7] = dense[7, 3] = False
    src, dst = np.nonzero(dense)
    g = build_graph(src.astype(np.int64), dst.astype(np.int64), None, num_nodes=n)
    out = np.asarray(global_neg_sample(jax.random.PRNGKey(0), g, 256, 1)).reshape(-1, 2)
    pairs = {(int(a), int(b)) for a, b in out}
    assert pairs <= {(3, 7), (7, 3)}


def test_local_neg_sample_two_nodes(rng):
    # degenerate graph: destinations drawn from {0, 1}; sources preserved
    pos = jnp.asarray(np.array([[0, 1], [1, 0]], np.int32))
    out = np.asarray(local_neg_sample(jax.random.PRNGKey(1), pos, 2, 4))
    assert out.shape == (2, 4, 2)
    np.testing.assert_array_equal(out[:, :, 0], np.array([[0] * 4, [1] * 4]))
    assert ((out[:, :, 1] == 0) | (out[:, :, 1] == 1)).all()
