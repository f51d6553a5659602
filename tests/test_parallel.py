"""Multi-device sharding on the 8 fake CPU devices: N-device == 1-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.dense import to_dense
from plnlp_tpu.graph import build_graph, transpose_graph, with_blocks
from plnlp_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    shard_graph,
)
from plnlp_tpu.parallel.sharded import shard_state
from plnlp_tpu.training import Model, ModelConfig
from tests.conftest import random_graph_np


@pytest.fixture
def setup(rng):
    n = 64
    src, dst, _ = random_graph_np(rng, n, 400)
    g = build_graph(src, dst, None, num_nodes=n)
    cfg = ModelConfig(
        emb_hidden_channels=16,
        gnn_hidden_channels=16,
        mlp_hidden_channels=16,
        batch_size=64,
        dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_opt_state(params)
    pos = jnp.asarray(np.stack([src[:64], dst[:64]], 1).astype(np.int32))
    neg = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (64, 1, 2)).astype(np.int32)
    )
    return model, params, opt_state, g, pos, neg


def _copy(t):
    return jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), t)


def _run_step(model, params, opt_state, g, gt, pos, neg, step_fn=None):
    mask = jnp.ones((64,), jnp.float32)
    margin = jnp.zeros((64,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)
    key = jax.random.PRNGKey(42)
    fn = step_fn or (
        lambda *a, **kw: model._train_step(*a, False)
    )
    return fn(
        params, opt_state, g, gt, None, pos, neg, margin, mask, lr, key
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=2, node=4)
    assert mesh.shape == {"data": 2, "node": 4}


def test_shard_graph_keeps_membership_metadata(rng):
    """shard_graph must carry max_degree and edge_mask through the rebuild:
    without them edges_exist's binary search degenerates (false negatives)
    and the negative sampler would emit true edges on the sharded graph."""
    from plnlp_tpu.sampling import edges_exist

    n = 40
    src, dst, _ = random_graph_np(rng, n, 400)
    g = build_graph(src, dst, None, num_nodes=n)
    assert g.max_degree > 0
    mesh = make_mesh(data=1, node=8)
    sg = shard_graph(g, mesh)
    assert sg.max_degree == g.max_degree
    assert (sg.edge_mask is None) == (g.edge_mask is None)
    e = g.num_edges
    hits = edges_exist(sg, g.senders[:e], g.receivers[:e])
    assert bool(jnp.all(hits)), "sharded graph lost edge membership"
    # and a known non-edge stays a non-edge
    keys = set(
        (int(a) * n + int(b))
        for a, b in zip(np.asarray(g.senders[:e]), np.asarray(g.receivers[:e]))
    )
    non_edge = next(k for k in range(n * n) if k not in keys)
    assert not bool(
        edges_exist(sg, jnp.asarray([non_edge // n]), jnp.asarray([non_edge % n]))[0]
    )


@pytest.mark.parametrize("data,node", [(8, 1), (1, 8), (2, 4)])
def test_sharded_step_matches_single_device(setup, data, node):
    model, params, opt_state, g, pos, neg = setup

    # single-device reference
    p1, o1, loss1 = _run_step(
        model,
        jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
        g,
        None,
        pos,
        neg,
    )

    mesh = make_mesh(data=data, node=node)
    sp, so = shard_state(
        model, mesh, jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
    )
    sg = shard_graph(g, mesh)
    spos, sneg = shard_batch((pos, neg), mesh)
    step = make_sharded_train_step(model, mesh)
    mask = jnp.ones((64,), jnp.float32)
    margin = jnp.zeros((64,), jnp.float32)
    p2, o2, loss2 = step(
        sp, so, sg, None, None, spos, sneg, margin, mask,
        jnp.asarray(1e-2, jnp.float32), jax.random.PRNGKey(42),
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # Gradient-level parity is the tight check: the sharded layout only
    # changes batch-axis reduction ORDER, so grads must agree to f32
    # cancellation noise (atol covers ~128 O(1)-term cancellations).
    loss_of = lambda p, g_, pos_, neg_: model._loss_impl(
        p, g_, None, None, pos_, neg_, None, mask, jax.random.PRNGKey(42)
    )
    grads = jax.grad(loss_of)(
        jax.tree_util.tree_map(jnp.asarray, _copy(params)), g, pos, neg
    )
    sp_g, _ = shard_state(
        model, mesh, jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
    )
    sgrads = jax.jit(jax.grad(loss_of))(sp_g, sg, spos, sneg)
    for (path, ga), gb in zip(
        jax.tree_util.tree_flatten_with_path(grads)[0],
        jax.tree_util.tree_leaves(sgrads),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5,
            err_msg=f"grad {jax.tree_util.keystr(path)}",
        )
    # Param-level parity after ONE Adam step: Adam rescales each grad by
    # 1/sqrt(v), so a direction whose ANALYTIC gradient is zero (e.g. the
    # final predictor bias under pairwise AUC losses — it cancels in
    # pos-neg) turns reduction-order noise into a full ±lr step.  Those
    # noise-driven directions are excluded; everything with a real
    # gradient must match tightly.
    for (path, a), b, gl in zip(
        jax.tree_util.tree_flatten_with_path(p1)[0],
        jax.tree_util.tree_leaves(p2),
        jax.tree_util.tree_leaves(grads),
    ):
        a, b, gl = np.asarray(a), np.asarray(b), np.asarray(gl)
        real = np.abs(gl) > 1e-5
        np.testing.assert_allclose(
            a[real], b[real], rtol=1e-4, atol=1e-6,
            err_msg=f"{jax.tree_util.keystr(path)} (significant-grad entries)",
        )
        # Noise directions still move by at most one Adam step either way.
        np.testing.assert_allclose(
            a[~real], b[~real], atol=2.5e-2,
            err_msg=f"{jax.tree_util.keystr(path)} (zero-grad entries)",
        )


def test_sharded_dense_graph(setup):
    model, params, opt_state, g, pos, neg = setup
    da = to_dense(g)
    p1, o1, loss1 = _run_step(
        model,
        jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
        da,
        None,
        pos,
        neg,
    )
    mesh = make_mesh(data=2, node=4)
    sp, so = shard_state(
        model, mesh, jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
    )
    sda = shard_graph(da, mesh)
    spos, sneg = shard_batch((pos, neg), mesh)
    step = make_sharded_train_step(model, mesh)
    p2, o2, loss2 = step(
        sp, so, sda, None, None, spos, sneg,
        jnp.zeros((64,), jnp.float32), jnp.ones((64,), jnp.float32),
        jnp.asarray(1e-2, jnp.float32), jax.random.PRNGKey(42),
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_sharded_blocked_graph(setup, rng):
    model, params, opt_state, g, pos, neg = setup
    gb = with_blocks(g, 16, 64)
    gt = transpose_graph(gb)
    p1, o1, loss1 = _run_step(
        model,
        jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
        gb,
        gt,
        pos,
        neg,
    )
    mesh = make_mesh(data=1, node=8)
    sp, so = shard_state(
        model, mesh, jax.tree_util.tree_map(jnp.asarray, _copy(params)),
        model.init_opt_state(params),
    )
    sgb = shard_graph(gb, mesh)
    sgt = shard_graph(gt, mesh)
    step = make_sharded_train_step(model, mesh)
    p2, o2, loss2 = step(
        sp, so, sgb, sgt, None, pos, neg,
        jnp.zeros((64,), jnp.float32), jnp.ones((64,), jnp.float32),
        jnp.asarray(1e-2, jnp.float32), jax.random.PRNGKey(42),
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_sharded_batch_predict_matches_single(setup, rng):
    """Mesh-sharded eval scoring == single-device lax.map scoring."""
    import jax.numpy as jnp

    model, params, opt_state, g, pos, neg = setup
    h = model._encode(params, g, None, None)
    edges = jnp.asarray(rng.integers(0, 64, (1000, 2)).astype(np.int64))
    single = model.batch_predict(params, h, edges)
    mesh = make_mesh(data=8, node=1)
    sharded = model.batch_predict(params, h, edges, mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    # 2-D mesh: data axis shards, node axis replicated
    mesh2 = make_mesh(data=4, node=2)
    sharded2 = model.batch_predict(params, h, edges, mesh=mesh2)
    np.testing.assert_allclose(sharded2, single, rtol=1e-5, atol=1e-6)
