"""Pallas scatter-matmul kernel (interpret mode on CPU) vs segment oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import build_graph, with_blocks
from plnlp_tpu.ops.pallas_spmm import scatter_matmul
from plnlp_tpu.ops.spmm import spmm_segment
from tests.conftest import random_graph_np


@pytest.mark.parametrize("n,e,R,B", [(70, 500, 16, 32), (40, 120, 8, 128)])
def test_scatter_matmul_interpret_matches_segment(rng, n, e, R, B):
    src, dst, w = random_graph_np(rng, n, e, weighted=True)
    g = with_blocks(build_graph(src, dst, w, num_nodes=n), R, B)
    d = 32
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    feats = x[g.blk_src]
    n_rowblocks = (n + R - 1) // R
    out = scatter_matmul(
        feats, g.blk_local, g.blk_weight, g.blk_rowblock, R, n_rowblocks,
        interpret=True,
    )[:n]
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


def test_scatter_matmul_zero_fills_empty_rowblocks(rng):
    # a graph with a hole: no edges into nodes 16..31 (rowblock 1 of R=16)
    src = np.array([0, 1, 2, 40])
    dst = np.array([3, 3, 40, 41])
    g = with_blocks(build_graph(src, dst, None, num_nodes=48), 16, 32)
    # every rowblock must appear in the metadata at least once
    assert set(np.asarray(g.blk_rowblock)) == {0, 1, 2}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((48, 8)), jnp.float32)
    feats = x[g.blk_src]
    out = scatter_matmul(
        feats, g.blk_local, g.blk_weight, g.blk_rowblock, 16, 3, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out[16:32]), 0.0)
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(np.asarray(out[:48]), np.asarray(expect), rtol=1e-4)
