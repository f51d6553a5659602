"""Single-device blocked TransformerConv hand-VJP (ops/transformer.py):
gradient parity vs the segment-sum/XLA-autodiff path, dispatch through
apply_encoder, and a backward jaxpr free of feature-dimension scatters.
Reference semantics: TransformerConv heads=1 (plnlp/layer.py:57-63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import build_graph, prepare_graph
from plnlp_tpu.models.encoders import apply_encoder, init_encoder
from tests.conftest import random_graph_np


@pytest.fixture
def setup(rng):
    n, d = 90, 16
    src, dst, _ = random_graph_np(rng, n, 500)
    g_seg = build_graph(src, dst, None, num_nodes=n)  # segment-path oracle
    gb, gbt = prepare_graph(
        src, dst, None, num_nodes=n, block=(8, 32), couple_transpose=True
    )
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    return n, d, g_seg, gb, gbt, x, params


def test_blocked_tconv_dispatch_and_fwd_parity(setup):
    n, d, g_seg, gb, gbt, x, params = setup
    assert gb.tconv_map is not None
    ref = apply_encoder(params, "TRANSFORMER", g_seg, x)
    out = apply_encoder(params, "TRANSFORMER", gb, x, graph_t=gbt)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_blocked_tconv_grad_parity(setup):
    """Hand VJP == XLA autodiff of the segment path, for x AND every
    parameter, through a non-symmetric downstream loss."""
    n, d, g_seg, gb, gbt, x, params = setup
    tgt = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )

    def loss(graph_op, gt):
        def f(params, x):
            h = apply_encoder(params, "TRANSFORMER", graph_op, x, graph_t=gt)
            return jnp.sum((h - tgt) ** 2) + jnp.sum(jnp.sin(h))

        return f

    g1p, g1x = jax.grad(loss(g_seg, None), argnums=(0, 1))(params, x)
    g2p, g2x = jax.grad(loss(gb, gbt), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(g2x), np.asarray(g1x), rtol=1e-3, atol=1e-4
    )
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1p)
    flat2 = jax.tree_util.tree_leaves(g2p)
    assert len(flat1) == len(flat2)
    for (path, a), b in zip(flat1, flat2):
        # atol floor: the lin_key bias grad is mathematically zero (softmax
        # cancels per-row logit shifts) — f32 noise on both sides
        scale = float(np.abs(np.asarray(a)).max())
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3,
            atol=max(1e-4 * scale, 1e-6),
            err_msg=jax.tree_util.keystr(path),
        )


def test_blocked_tconv_duplicate_and_self_edges(rng):
    """The tconv_map slot pairing survives duplicate edges and self-loops
    (coalesce off) — the k-th duplicate pairs with the k-th."""
    n, d = 24, 8
    src = np.array([0, 0, 0, 1, 2, 3, 3, 5, 5, 5, 7, 23] * 3)
    dst = np.array([1, 1, 2, 0, 0, 3, 4, 6, 6, 6, 7, 0] * 3)
    g_seg = build_graph(src, dst, None, num_nodes=n, coalesce=False)
    gb, gbt = prepare_graph(
        src, dst, None, num_nodes=n, block=(8, 16), coalesce=False,
        couple_transpose=True,
    )
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = init_encoder(jax.random.PRNGKey(1), "TRANSFORMER", d, 8, 1)

    def f(graph_op, gt):
        return lambda x: jnp.sum(
            apply_encoder(params, "TRANSFORMER", graph_op, x, graph_t=gt) ** 2
        )

    np.testing.assert_allclose(
        float(f(gb, gbt)(x)), float(f(g_seg, None)(x)), rtol=1e-4
    )
    gx_ref = jax.grad(f(g_seg, None))(x)
    gx = jax.grad(f(gb, gbt))(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-5
    )


def _collect_scatter_eqns(jaxpr, out):
    for eqn in jaxpr.eqns:
        if "scatter" in eqn.primitive.name:
            out.append(eqn)
        for p in eqn.params.values():
            stack = [p]
            while stack:
                q = stack.pop()
                if hasattr(q, "jaxpr"):  # ClosedJaxpr
                    _collect_scatter_eqns(q.jaxpr, out)
                elif hasattr(q, "eqns"):  # Jaxpr
                    _collect_scatter_eqns(q, out)
                elif isinstance(q, (list, tuple)):
                    stack.extend(q)
    return out


def test_blocked_tconv_bwd_has_no_edge_feature_scatter(setup):
    """The whole point of the hand VJP: the backward jaxpr contains NO
    rank-2 feature scatters (XLA autodiff of the segment path emits them
    for the kv[senders]/q[receivers] gathers)."""
    n, d, g_seg, gb, gbt, x, params = setup

    def loss(params, x):
        return jnp.sum(
            apply_encoder(params, "TRANSFORMER", gb, x, graph_t=gbt) ** 2
        )

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(params, x)
    bad = [
        eqn
        for eqn in _collect_scatter_eqns(jaxpr.jaxpr, [])
        if len(eqn.invars[2].aval.shape) == 2
        and eqn.invars[2].aval.shape[-1] in (d, 16)
    ]
    assert not bad, f"edge-feature scatters survived: {bad}"
    # sanity: the segment path DOES emit them (the problem is real)
    def loss_seg(params, x):
        return jnp.sum(apply_encoder(params, "TRANSFORMER", g_seg, x) ** 2)

    jaxpr_seg = jax.make_jaxpr(jax.grad(loss_seg, argnums=(0, 1)))(params, x)
    seg_scatters = [
        eqn
        for eqn in _collect_scatter_eqns(jaxpr_seg.jaxpr, [])
        if len(eqn.invars[2].aval.shape) == 2
        and eqn.invars[2].aval.shape[-1] in (d, 16)
    ]
    assert seg_scatters, "oracle path unexpectedly scatter-free"


def test_blocked_tconv_in_full_model(rng):
    """CLI-shaped end-to-end: a TRANSFORMER Model over coupled blocked
    graphs trains and matches the segment-path loss trajectory."""
    from plnlp_tpu.training import Model, ModelConfig

    n = 64
    src, dst, _ = random_graph_np(rng, n, 300)
    g_seg, g_seg_t = prepare_graph(src, dst, None, num_nodes=n, block=None)
    gb, gbt = prepare_graph(
        src, dst, None, num_nodes=n, block=(8, 16), couple_transpose=True
    )
    cfg = ModelConfig(
        encoder="TRANSFORMER", emb_hidden_channels=16,
        gnn_hidden_channels=16, mlp_hidden_channels=16, batch_size=32,
        dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(rng.integers(0, n, (32, 2)).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, n, (32, 1, 2)).astype(np.int32))
    margin = jnp.zeros((32,), jnp.float32)
    mask = jnp.ones((32,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)

    losses = {}
    for name, (g, gt) in {
        "segment": (g_seg, g_seg_t), "blocked": (gb, gbt)
    }.items():
        p, o = copy(params), model.init_opt_state(params)
        ls = []
        for i in range(3):
            p, o, l = model._train_step(
                p, o, g, gt, None, pos, neg, margin, mask, lr,
                jax.random.PRNGKey(i), False,
            )
            ls.append(float(l))
        losses[name] = ls
    np.testing.assert_allclose(
        losses["blocked"], losses["segment"], rtol=2e-3, atol=1e-4
    )
