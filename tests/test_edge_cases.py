"""Degenerate-input robustness: shapes a user can hit that the happy-path
tests never exercise — empty graphs, single nodes, batches larger than the
pair set, metrics on tiny negative sets."""

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import prepare_graph
from plnlp_tpu.metrics import evaluate_hits, evaluate_mrr
from plnlp_tpu.ops.spmm import spmm_blocked
from plnlp_tpu.ops.walk import random_walk
from plnlp_tpu.training import Model, ModelConfig

_EMPTY = np.array([], np.int64)


def test_zero_edge_graph_builds_and_trains():
    g, gt = prepare_graph(_EMPTY, _EMPTY, None, num_nodes=5, symmetrize=True, block=None)
    assert g.num_edges == 0 and g.indptr.shape == (6,)
    cfg = ModelConfig(
        emb_hidden_channels=8, gnn_hidden_channels=8, mlp_hidden_channels=8,
        batch_size=4, num_neg=1,
    )
    m = Model(cfg, num_nodes=5)
    p = m.init_params(jax.random.PRNGKey(0))
    o = m.init_opt_state(p)
    pos = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    p, o, loss = m.train_epoch(
        p, o, g, gt, None, pos, None, jax.random.PRNGKey(1), 1e-3, sample_graph=g
    )
    assert np.isfinite(float(loss))


def test_zero_edge_blocked_spmm_is_zero():
    g, gt = prepare_graph(_EMPTY, _EMPTY, None, num_nodes=9, symmetrize=True, block=(4, 8))
    out = spmm_blocked(g, gt, jnp.ones((9, 4)), "sum")
    assert out.shape == (9, 4)
    assert float(jnp.abs(out).max()) == 0.0


def test_single_node_graph():
    g, _ = prepare_graph(np.array([0]), np.array([0]), None, num_nodes=1, symmetrize=True, block=None)
    assert g.num_nodes == 1 and g.num_edges == 1  # the self-loop survives coalesce


def test_batch_larger_than_pair_set():
    """The padded final batch handles P < batch_size (one fully-masked-tail
    batch) without NaNs or shape errors."""
    g, gt = prepare_graph(_EMPTY, _EMPTY, None, num_nodes=5, symmetrize=True, block=None)
    cfg = ModelConfig(
        emb_hidden_channels=8, gnn_hidden_channels=8, mlp_hidden_channels=8,
        batch_size=64, num_neg=2,
    )
    m = Model(cfg, num_nodes=5)
    p = m.init_params(jax.random.PRNGKey(0))
    o = m.init_opt_state(p)
    pos = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    p, o, loss = m.train_epoch(
        p, o, g, gt, None, pos, None, jax.random.PRNGKey(1), 1e-3, sample_graph=g
    )
    assert np.isfinite(float(loss))


def test_walk_on_zero_edge_graph_self_repeats():
    """Dead-end nodes self-repeat (torch_cluster contract) — with no edges,
    every walk stays at its start."""
    g, _ = prepare_graph(_EMPTY, _EMPTY, None, num_nodes=9, symmetrize=True, block=(4, 8))
    w = np.asarray(random_walk(g, jnp.arange(9, dtype=jnp.int32), 3, jax.random.PRNGKey(0)))
    assert (w == w[:, :1]).all()


def test_mrr_single_negative_tie():
    """pos == its single neg: opt rank 0, pess rank 1 -> rank 1.5 (OGB 1.3.2)."""
    r = evaluate_mrr(
        jnp.array([1.0, 2.0]), jnp.array([[0.5], [2.5]]),
        jnp.array([1.0]), jnp.array([[1.0]]),
    )
    np.testing.assert_allclose(r["MRR"][0], 0.75)  # (1/1 + 1/2) / 2
    np.testing.assert_allclose(r["MRR"][1], 1.0 / 1.5)


def test_hits_with_empty_negative_set_is_one():
    """OGB defines Hits@K as 1.0 when there are fewer than K negatives."""
    h = evaluate_hits(jnp.array([1.0]), jnp.array([]), jnp.array([1.0]), jnp.array([]))
    assert all(v == (1.0, 1.0) for v in h.values())
