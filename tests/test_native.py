"""Native graphcore library vs the NumPy reference implementations."""

import numpy as np
import pytest

from plnlp_tpu import native
from tests.conftest import random_graph_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="graphcore lib unavailable (no g++?)"
)


def test_coalesce_add_matches_numpy(rng):
    from plnlp_tpu.graph import coalesce_edges

    src, dst, w = random_graph_np(rng, 50, 400, weighted=True)
    ns, nd, nw = native.coalesce_add(src, dst, w, 50)
    # NumPy path (force by calling internals with reduce='mean' trick is
    # awkward — rebuild it directly):
    key = dst.astype(np.int64) * 50 + src
    order = np.argsort(key, kind="stable")
    uk, inv = np.unique(key[order], return_inverse=True)
    ew = np.zeros(len(uk))
    np.add.at(ew, inv, w[order].astype(np.float64))
    np.testing.assert_array_equal(nd, uk // 50)
    np.testing.assert_array_equal(ns, uk % 50)
    np.testing.assert_allclose(nw, ew, rtol=1e-6)


def test_coalesce_add_unweighted_dedups(rng):
    src = np.array([0, 0, 1, 1, 1])
    dst = np.array([1, 1, 2, 2, 2])
    ns, nd, nw = native.coalesce_add(src, dst, None, 3)
    assert len(ns) == 2
    # multiplicities are summed in out_w (callers discard for unweighted)
    np.testing.assert_allclose(sorted(nw), [2.0, 3.0])


def test_build_indptr(rng):
    dst = np.sort(rng.integers(0, 20, 100))
    indptr = native.build_indptr(dst, 20)
    expect = np.zeros(21, np.int64)
    np.add.at(expect, dst + 1, 1)
    np.testing.assert_array_equal(indptr, np.cumsum(expect))


def test_densify_matches_numpy(rng):
    src, dst, w = random_graph_np(rng, 30, 200, weighted=True)
    a, deg = native.densify(src.astype(np.int64), dst.astype(np.int64), w, 30)
    expect = np.zeros((30, 30), np.float32)
    np.add.at(expect, (dst, src), w)
    np.testing.assert_allclose(a, expect, rtol=1e-6)
    dexp = np.zeros(30, np.int64)
    np.add.at(dexp, dst, 1)
    np.testing.assert_array_equal(deg, dexp)


def test_graph_build_uses_native_consistently(rng):
    """build_graph via native coalesce == forced-NumPy build."""
    import plnlp_tpu.graph as G

    src, dst, w = random_graph_np(rng, 64, 500, weighted=True)
    g1 = G.build_graph(src, dst, w, num_nodes=64)
    # force numpy path
    orig = native.available
    try:
        native.available = lambda: False
        g2 = G.build_graph(src, dst, w, num_nodes=64)
    finally:
        native.available = orig
    np.testing.assert_array_equal(np.asarray(g1.senders), np.asarray(g2.senders))
    np.testing.assert_array_equal(np.asarray(g1.receivers), np.asarray(g2.receivers))
    np.testing.assert_allclose(
        np.asarray(g1.edge_weight), np.asarray(g2.edge_weight), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(g1.indptr), np.asarray(g2.indptr))


def test_blocks_build_matches_numpy(rng):
    """Native blocks_build == the NumPy _blocks_np transcription."""
    import plnlp_tpu.native as native

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    import numpy as np

    from plnlp_tpu.graph import _blocks_np, _csr_np

    for n, e, R, B in ((64, 300, 8, 32), (100, 1000, 16, 64), (33, 7, 8, 16)):
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        w = rng.random(e).astype(np.float32) + 0.1
        csr = _csr_np(src, dst, w, n, False, True, 1)

        got = native.blocks_build(
            csr["senders"][: csr["num_edges"]],
            csr["receivers"][: csr["num_edges"]],
            csr["edge_weight"][: csr["num_edges"]],
            csr["indptr"],
            n,
            R,
            B,
        )

        # force the NumPy path by transcribing _blocks_np's body via a csr
        # whose native dispatch we bypass: temporarily disable the lib
        lib = native._lib
        native._lib, native._tried = None, True
        try:
            want = _blocks_np(csr, R, B)
        finally:
            native._lib, native._tried = lib, True
        for k in ("blk_src", "blk_weight", "blk_local", "blk_rowblock"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_label_prop_matches_numpy(rng):
    """Native label_prop == the NumPy sweep in ops/tile_spmm.py (mode of
    neighbor labels, smallest-label ties, synchronous rounds)."""
    import plnlp_tpu.native as native
    from plnlp_tpu.ops.tile_spmm import label_prop_order
    from plnlp_tpu.parallel.partition import _undirected_csr_np

    if not native.available():
        import pytest

        pytest.skip("no native lib")
    for seed in range(4):
        r = np.random.default_rng(100 + seed)
        n = int(r.integers(20, 200))
        e = int(r.integers(n, 6 * n))
        src = r.integers(0, n, e).astype(np.int64)
        dst = r.integers(0, n, e).astype(np.int64)
        # NumPy path, forced (monkeypatch-free: call the module internals)
        import plnlp_tpu.ops.tile_spmm as ts

        orig = native.available
        try:
            native.available = lambda: False
            order_np = ts.label_prop_order(src, dst, n)
        finally:
            native.available = orig
        order_nat = ts.label_prop_order(src, dst, n)
        np.testing.assert_array_equal(order_nat, order_np, err_msg=f"seed {seed}")


def test_bfs_order_matches_numpy(rng):
    import plnlp_tpu.native as native
    import plnlp_tpu.parallel.partition as pt

    if not native.available():
        import pytest

        pytest.skip("no native lib")
    for seed in range(4):
        r = np.random.default_rng(200 + seed)
        n = int(r.integers(20, 200))
        e = int(r.integers(n // 2, 5 * n))  # allow disconnected components
        src = r.integers(0, n, e).astype(np.int64)
        dst = r.integers(0, n, e).astype(np.int64)
        orig = native.available
        try:
            native.available = lambda: False
            order_np = pt._bfs_order(src, dst, n)
        finally:
            native.available = orig
        order_nat = pt._bfs_order(src, dst, n)
        np.testing.assert_array_equal(order_nat, order_np, err_msg=f"seed {seed}")
        # a valid permutation either way
        assert len(np.unique(order_nat)) == n
