"""Encoder layers vs dense NumPy re-derivations of the PyG conv formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import (
    build_graph,
    coalesce_edges,
    gcn_normalize_edges,
    row_normalize_edges,
    transpose_graph,
    with_blocks,
)
from plnlp_tpu.models.encoders import ENCODER_NAMES, apply_encoder, init_encoder
from tests.conftest import random_graph_np


def _dense(g):
    a = np.zeros((g.num_nodes, g.num_nodes))
    e = g.num_edges
    np.add.at(
        a,
        (np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]),
        np.asarray(g.edge_weight)[:e],
    )
    return a


def _lin(p, x):
    out = x @ np.asarray(p["w"])
    if "b" in p:
        out = out + np.asarray(p["b"])
    return out


@pytest.fixture
def setup(rng):
    n, d = 40, 12
    src, dst, _ = random_graph_np(rng, n, 250)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return n, d, src, dst, x


def test_sage_layer_formula(setup, rng):
    n, d, src, dst, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "SAGE", d, 8, 1)
    got = np.asarray(
        apply_encoder(params, "SAGE", g, jnp.asarray(x))
    )
    a = _dense(g)
    cnt = np.maximum((a != 0).sum(1, keepdims=True), 1)
    mean_agg = np.where((a != 0).sum(1, keepdims=True) > 0, (a @ x) / cnt, 0.0)
    lp = params["layers"][0]
    expect = _lin(lp["lin_l"], mean_agg) + _lin(lp["lin_r"], x)
    # num_layers==1 quirk: relu applied after the single layer (layer.py:24-27)
    expect = np.maximum(expect, 0)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_gcn_layer_formula(setup, rng):
    n, d, src, dst, x = setup
    ns, nd, nw = gcn_normalize_edges(src, dst, None, n)
    g = build_graph(ns, nd, nw, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(1), "GCN", d, 8, 2)
    got = np.asarray(apply_encoder(params, "GCN", g, jnp.asarray(x)))
    a = _dense(g)
    l0, l1 = params["layers"]
    h = np.maximum(a @ (x @ np.asarray(l0["lin"]["w"])) + np.asarray(l0["lin"]["b"]), 0)
    expect = a @ (h @ np.asarray(l1["lin"]["w"])) + np.asarray(l1["lin"]["b"])
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_wsage_layer_formula(setup, rng):
    n, d, src, dst, x = setup
    w = rng.random(len(src)).astype(np.float32) + 0.1
    cs, cd, cw = coalesce_edges(src, dst, w, n)
    ns, nd, nw = row_normalize_edges(cs, cd, cw, n)
    g = build_graph(ns, nd, nw, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(2), "WSAGE", d, 8, 1)
    got = np.asarray(apply_encoder(params, "WSAGE", g, jnp.asarray(x)))
    a = _dense(g)
    lp = params["layers"][0]
    expect = np.maximum(_lin(lp["lin_rel"], a @ x) + _lin(lp["lin_root"], x), 0)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_transformer_layer_formula(setup, rng):
    n, d, src, dst, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(3), "TRANSFORMER", d, 8, 1)
    got = np.asarray(apply_encoder(params, "TRANSFORMER", g, jnp.asarray(x)))
    lp = params["layers"][0]
    q = _lin(lp["lin_query"], x)
    k = _lin(lp["lin_key"], x)
    v = _lin(lp["lin_value"], x)
    a = _dense(g)
    expect = np.zeros((n, 8))
    for i in range(n):
        nbrs = np.nonzero(a[i])[0]
        if len(nbrs) == 0:
            continue
        logits = (q[i] @ k[nbrs].T) / np.sqrt(8)
        alpha = np.exp(logits - logits.max())
        alpha = alpha / alpha.sum()
        expect[i] = alpha @ v[nbrs]
    expect = np.maximum(expect + _lin(lp["lin_skip"], x), 0)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_blocked_path_matches_segment_path(setup, rng):
    """Encoder over a blocked graph (+ transpose) == segment-sum path."""
    n, d, src, dst, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    gb = with_blocks(g, 16, 64)
    gt = transpose_graph(gb)
    params = init_encoder(jax.random.PRNGKey(4), "SAGE", d, 8, 2)
    ref = apply_encoder(params, "SAGE", g, jnp.asarray(x))
    fast = apply_encoder(params, "SAGE", gb, jnp.asarray(x), graph_t=gt)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_stacking_between_layer_relu_dropout(setup):
    """2-layer stack: last layer NOT relu'd (layer.py:18-27)."""
    n, d, src, dst, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(5), "SAGE", d, 8, 2)
    got = np.asarray(apply_encoder(params, "SAGE", g, jnp.asarray(x)))
    assert (got < 0).any()  # linear last layer -> negatives survive


def test_encoders_differentiable(setup):
    n, d, src, dst, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    for name in ENCODER_NAMES:
        params = init_encoder(jax.random.PRNGKey(6), name, d, 8, 2)

        def loss(p):
            return jnp.sum(apply_encoder(p, name, g, jnp.asarray(x)) ** 2)

        grads = jax.grad(loss)(params)
        assert all(
            np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(grads)
        )
