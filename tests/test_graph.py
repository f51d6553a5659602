"""Graph container & preprocessing parity vs dense NumPy reference math."""

import numpy as np
import pytest

from plnlp_tpu.graph import (
    add_self_loop_edges,
    build_graph,
    coalesce_edges,
    gcn_normalize_edges,
    row_normalize_edges,
    to_undirected_edges,
    transpose_graph,
    with_blocks,
)
from tests.conftest import random_graph_np


def dense_from_graph(g):
    a = np.zeros((g.num_nodes, g.num_nodes), np.float64)
    e = g.num_edges
    np.add.at(
        a,
        (np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]),
        np.asarray(g.edge_weight)[:e],
    )
    return a


def dense_from_coo(src, dst, w, n):
    a = np.zeros((n, n), np.float64)
    if w is None:
        w = np.ones(len(src))
    np.add.at(a, (np.asarray(dst), np.asarray(src)), np.asarray(w))
    return a


def test_coalesce_merges_duplicates(rng):
    src = np.array([0, 1, 0, 2, 0])
    dst = np.array([1, 2, 1, 0, 1])
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    s, d, wo = coalesce_edges(src, dst, w, 3, reduce="add")
    assert len(s) == 3
    a = dense_from_coo(s, d, wo, 3)
    b = dense_from_coo(src, dst, w, 3)
    np.testing.assert_allclose(a, b)


def test_to_undirected_matches_dense(rng):
    src, dst, w = random_graph_np(rng, 32, 200, weighted=True)
    s, d, wo = to_undirected_edges(src, dst, w, 32)
    a = dense_from_coo(s, d, wo, 32)
    b = dense_from_coo(src, dst, w, 32)
    np.testing.assert_allclose(a, b + b.T, rtol=1e-6)


def test_self_loops_overwrite_diagonal():
    src = np.array([0, 1, 1])
    dst = np.array([1, 1, 2])
    w = np.array([2.0, 7.0, 3.0], np.float32)
    s, d, wo = add_self_loop_edges(src, dst, w, 3, fill_value=1.0)
    a = dense_from_coo(s, d, wo, 3)
    assert a[1, 1] == 1.0  # overwritten, not 7+1
    assert a[0, 0] == 1.0 and a[2, 2] == 1.0
    assert a[1, 0] == 2.0 and a[2, 1] == 3.0


def test_gcn_normalization_matches_dense(rng):
    src, dst, w = random_graph_np(rng, 40, 300, weighted=False)
    s, d, _ = coalesce_edges(src, dst, None, 40)
    ns, nd, nw = gcn_normalize_edges(s, d, None, 40)
    a = dense_from_coo(s, d, None, 40)
    np.fill_diagonal(a, 1.0)
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, deg**-0.5, 0.0)
    expect = dinv[:, None] * a * dinv[None, :]
    got = dense_from_coo(ns, nd, nw, 40)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_row_normalization_matches_dense(rng):
    src, dst, w = random_graph_np(rng, 40, 300, weighted=True)
    s, d, wc = coalesce_edges(src, dst, w, 40)
    ns, nd, nw = row_normalize_edges(s, d, wc, 40)
    a = dense_from_coo(s, d, wc, 40)
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / deg, 0.0)
    expect = dinv[:, None] * a
    got = dense_from_coo(ns, nd, nw, 40)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_build_graph_csr_invariants(rng):
    src, dst, w = random_graph_np(rng, 50, 400, weighted=True)
    g = build_graph(src, dst, w, num_nodes=50)
    e = g.num_edges
    recv = np.asarray(g.receivers)
    send = np.asarray(g.senders)
    indptr = np.asarray(g.indptr)
    # sorted by (receiver, sender)
    key = recv[:e].astype(np.int64) * 50 + send[:e]
    assert np.all(np.diff(key) > 0)  # coalesced => strictly increasing
    # indptr consistent
    assert indptr[0] == 0 and indptr[-1] == e
    for v in range(50):
        seg = recv[indptr[v] : indptr[v + 1]]
        assert np.all(seg == v)
    # padding is weight-0 and keeps receivers sorted
    assert np.all(np.asarray(g.edge_weight)[e:] == 0)
    assert np.all(recv[e:] == 49)
    # dense equality
    np.testing.assert_allclose(
        dense_from_graph(g), dense_from_coo(src, dst, w, 50), rtol=1e-6
    )


def test_transpose_graph(rng):
    src, dst, w = random_graph_np(rng, 30, 150, weighted=True)
    g = build_graph(src, dst, w, num_nodes=30)
    gt = transpose_graph(g)
    np.testing.assert_allclose(
        dense_from_graph(gt), dense_from_graph(g).T, rtol=1e-6
    )


def test_with_blocks_covers_all_edges(rng):
    src, dst, w = random_graph_np(rng, 70, 500, weighted=True)
    g = with_blocks(build_graph(src, dst, w, num_nodes=70), 16, 32)
    # Reconstruct dense adjacency from block metadata.
    a = np.zeros((80, 70), np.float64)  # 80 = padded rows (5 rowblocks * 16)
    bs = np.asarray(g.blk_src)
    bw = np.asarray(g.blk_weight)
    bl = np.asarray(g.blk_local)
    rb = np.asarray(g.blk_rowblock)
    for b in range(bs.shape[0]):
        for j in range(bs.shape[1]):
            if bw[b, j] != 0:
                a[rb[b] * 16 + bl[b, j], bs[b, j]] += bw[b, j]
    np.testing.assert_allclose(
        a[:70], dense_from_graph(g), rtol=1e-6
    )


def test_degrees(rng):
    src, dst, w = random_graph_np(rng, 25, 120, weighted=True)
    g = build_graph(src, dst, w, num_nodes=25)
    a = dense_from_graph(g)
    np.testing.assert_allclose(
        np.asarray(g.weighted_in_degrees()), a.sum(axis=1), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(g.in_degrees), (a != 0).sum(axis=1)
    )


def test_prepare_graph_matches_separate_path(rng):
    from plnlp_tpu.graph import prepare_graph

    src, dst, w = random_graph_np(rng, 60, 400, weighted=True)
    g, gt = prepare_graph(src, dst, w, num_nodes=60, block=(16, 64))
    g2 = with_blocks(build_graph(src, dst, w, num_nodes=60), 16, 64)
    gt2 = transpose_graph(g2)
    for a, b in [(g, g2), (gt, gt2)]:
        np.testing.assert_array_equal(np.asarray(a.senders), np.asarray(b.senders))
        np.testing.assert_array_equal(np.asarray(a.receivers), np.asarray(b.receivers))
        np.testing.assert_allclose(np.asarray(a.edge_weight), np.asarray(b.edge_weight))
        np.testing.assert_array_equal(np.asarray(a.indptr), np.asarray(b.indptr))
        np.testing.assert_array_equal(np.asarray(a.blk_src), np.asarray(b.blk_src))
        np.testing.assert_allclose(np.asarray(a.blk_weight), np.asarray(b.blk_weight))
        np.testing.assert_array_equal(np.asarray(a.blk_local), np.asarray(b.blk_local))
        np.testing.assert_array_equal(np.asarray(a.blk_rowblock), np.asarray(b.blk_rowblock))


def test_couple_transpose_requires_blocks():
    import pytest as _pytest

    from plnlp_tpu.graph import prepare_graph

    with _pytest.raises(ValueError, match="couple_transpose"):
        prepare_graph(
            np.array([0, 1]), np.array([1, 2]), None, num_nodes=3,
            block=None, couple_transpose=True,
        )
