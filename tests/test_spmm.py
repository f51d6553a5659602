"""SpMM implementations: parity vs dense matmul, gradients, mean reduce."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import build_graph, transpose_graph, with_blocks
from plnlp_tpu.ops.spmm import densify, spmm_blocked, spmm_dense, spmm_segment
from tests.conftest import random_graph_np


def _setup(rng, n=60, e=400, d=24, weighted=True):
    src, dst, w = random_graph_np(rng, n, e, weighted=weighted)
    g = build_graph(src, dst, w, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    a = np.zeros((n, n))
    ee = g.num_edges
    np.add.at(
        a,
        (np.asarray(g.receivers)[:ee], np.asarray(g.senders)[:ee]),
        np.asarray(g.edge_weight)[:ee],
    )
    return g, x, a


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_spmm_segment_matches_dense(rng, reduce):
    g, x, a = _setup(rng)
    out = spmm_segment(g, x, reduce)
    expect = a @ np.asarray(x)
    if reduce == "mean":
        cnt = (a != 0).sum(axis=1)
        expect = np.where(cnt[:, None] > 0, expect / np.maximum(cnt, 1)[:, None], 0.0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("block_rows,block_edges", [(16, 32), (8, 128)])
def test_spmm_blocked_matches_segment(rng, reduce, block_rows, block_edges):
    g, x, _ = _setup(rng)
    gb = with_blocks(g, block_rows, block_edges)
    gt = transpose_graph(gb)
    out = spmm_blocked(gb, gt, x, reduce)
    expect = spmm_segment(g, x, reduce)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_spmm_blocked_gradient(rng, reduce):
    g, x, _ = _setup(rng, n=40, e=250, d=8)
    gb = with_blocks(g, 16, 64)
    gt = transpose_graph(gb)
    cot = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)

    def f_blocked(x):
        return jnp.vdot(spmm_blocked(gb, gt, x, reduce), cot)

    def f_segment(x):
        return jnp.vdot(spmm_segment(g, x, reduce), cot)

    gx_b = jax.grad(f_blocked)(x)
    gx_s = jax.grad(f_segment)(x)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_s), rtol=1e-4, atol=1e-5)


def test_spmm_dense_matches(rng):
    g, x, a = _setup(rng)
    adj = densify(g)
    np.testing.assert_allclose(np.asarray(adj), a, rtol=1e-6)
    out = spmm_dense(adj, x)
    np.testing.assert_allclose(np.asarray(out), a @ np.asarray(x), rtol=1e-4, atol=1e-4)
    out_m = spmm_dense(adj, x, "mean", g.in_degrees)
    cnt = (a != 0).sum(axis=1)
    expect = np.where(cnt[:, None] > 0, (a @ np.asarray(x)) / np.maximum(cnt, 1)[:, None], 0.0)
    np.testing.assert_allclose(np.asarray(out_m), expect, rtol=1e-4, atol=1e-4)


def test_spmm_blocked_jits(rng):
    g, x, _ = _setup(rng, n=32, e=200, d=16)
    gb = with_blocks(g, 8, 32)
    gt = transpose_graph(gb)
    f = jax.jit(lambda x: spmm_blocked(gb, gt, x, "sum"))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(spmm_segment(g, x)), rtol=1e-4, atol=1e-5
    )


def test_isolated_nodes_mean_zero(rng):
    # Node with no in-edges must produce 0 under mean reduce (torch_sparse).
    src = np.array([0, 1])
    dst = np.array([1, 2])
    g = build_graph(src, dst, None, num_nodes=4)
    x = jnp.ones((4, 3))
    out = spmm_segment(g, x, "mean")
    np.testing.assert_allclose(np.asarray(out)[0], 0.0)
    np.testing.assert_allclose(np.asarray(out)[3], 0.0)
    np.testing.assert_allclose(np.asarray(out)[1], 1.0)


def test_spmm_blocked_chunked_path(rng, monkeypatch):
    """Force the fori_loop chunked path and check parity + gradients."""
    import sys

    spmm_mod = sys.modules["plnlp_tpu.ops.spmm"]
    monkeypatch.setattr(spmm_mod, "_CHUNK_BYTES", 4096)  # tiny chunks
    g, x, _ = _setup(rng, n=50, e=400, d=16)
    gb = with_blocks(g, 16, 32)
    gt = transpose_graph(gb)
    out = spmm_blocked(gb, gt, x, "sum")
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(spmm_blocked(gb, gt, x, "mean"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "mean"), cot))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)


def test_gather_alignment_pad(rng):
    """The flat gather length nblk*B must avoid multiples of 1024 (the XLA
    row gather runs ~1.7x slower on that residue, RESULTS.md); the pad
    block must not change values or gradients."""
    # R=16, B=256 on an n=64 graph: 4 rowblocks x 1 sub-block = 4*256
    # flat rows = 1024 exactly — the slow residue pre-fix.
    src, dst, w = random_graph_np(rng, 64, 200, weighted=True)
    g = build_graph(src, dst, w, num_nodes=64)
    gb = with_blocks(g, 16, 256)
    nblk, B = gb.blk_src.shape
    assert (nblk * B) % 1024 != 0
    # rowblock ids stay sorted after the pad
    rb = np.asarray(gb.blk_rowblock)
    assert (np.diff(rb) >= 0).all()
    gt = transpose_graph(gb)
    x = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    out = spmm_blocked(gb, gt, x, "sum")
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)
    cot = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(spmm_blocked(gb, gt, x, "sum"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)


def test_align_blocks_helper():
    from plnlp_tpu.graph import _align_blocks

    mk = lambda nblk, B: {
        "blk_src": np.zeros((nblk, B), np.int32),
        "blk_weight": np.ones((nblk, B), np.float32),
        "blk_local": np.zeros((nblk, B), np.int32),
        "blk_rowblock": np.arange(nblk, dtype=np.int32),
        "block_rows": 8,
        "block_edges": B,
    }
    # slow residue -> one pad block appended
    out = _align_blocks(mk(4, 256))
    assert out["blk_src"].shape == (5, 256)
    assert out["blk_rowblock"][-1] == out["blk_rowblock"][-2]
    assert (out["blk_weight"][-1] == 0).all()
    # already off the residue -> untouched
    out = _align_blocks(mk(5, 256))
    assert out["blk_src"].shape == (5, 256)
    # B itself a multiple of 1024 -> nothing can help; untouched
    out = _align_blocks(mk(4, 1024))
    assert out["blk_src"].shape == (4, 1024)
