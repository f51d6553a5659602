"""Partitioned shard_map SpMM == single-device SpMM on the 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import build_graph
from plnlp_tpu.ops.spmm import spmm_segment
from plnlp_tpu.parallel.graph_parallel import (
    GraphParallel,
    partitioned_spmm,
    shard_node_features,
)
from plnlp_tpu.parallel.mesh import make_mesh
from plnlp_tpu.parallel.partition import partition_graph
from tests.conftest import random_graph_np


@pytest.fixture
def setup(rng):
    n, d = 100, 16
    src, dst, w = random_graph_np(rng, n, 600, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    return n, d, src, dst, w, g, x


@pytest.mark.parametrize("shards", [2, 8])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_partitioned_spmm_matches_single(setup, shards, reduce):
    n, d, src, dst, w, g, x = setup
    pg = partition_graph(
        src, dst, w, num_nodes=n, num_shards=shards, block=(8, 128)
    )
    mesh = make_mesh(data=1, node=shards)
    gp = GraphParallel(pg=pg, mesh=mesh)
    xs = shard_node_features(x, pg, mesh)
    out = partitioned_spmm(gp, xs, reduce)[:n]
    expect = spmm_segment(g, x, reduce)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_partitioned_spmm_gradient(setup, reduce):
    n, d, src, dst, w, g, x = setup
    shards = 4
    pg = partition_graph(
        src, dst, w, num_nodes=n, num_shards=shards, block=(8, 128)
    )
    mesh = make_mesh(data=1, node=shards)
    gp = GraphParallel(pg=pg, mesh=mesh)
    xs = shard_node_features(x, pg, mesh)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, d)),
        jnp.float32,
    )

    gx = jax.grad(lambda x: jnp.vdot(partitioned_spmm(gp, x, reduce), cot))(xs)
    gx_ref = jax.grad(
        lambda x: jnp.vdot(spmm_segment(g, x, reduce), cot)
    )(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    # padded rows receive zero gradient
    np.testing.assert_allclose(np.asarray(gx)[n:], 0.0, atol=1e-6)


def test_partitioned_spmm_jits(setup):
    n, d, src, dst, w, g, x = setup
    pg = partition_graph(src, dst, w, num_nodes=n, num_shards=8, block=(8, 128))
    mesh = make_mesh(data=1, node=8)
    gp = GraphParallel(pg=pg, mesh=mesh)
    xs = shard_node_features(x, pg, mesh)
    f = jax.jit(lambda x: jnp.sum(partitioned_spmm(gp, x, "sum") ** 2))
    v1 = float(f(xs))
    v2 = float(jnp.sum(spmm_segment(g, x, "sum") ** 2))
    np.testing.assert_allclose(v1, v2, rtol=1e-4)


def test_full_train_step_with_graph_parallel(setup, rng):
    """The whole Model train step over a GraphParallel operand matches the
    single-device Graph path (8-shard mesh, SAGE+MLP+AUC+Adam)."""
    from plnlp_tpu.training import Model, ModelConfig

    n, d, src, dst, w, g, x = setup
    cfg = ModelConfig(
        emb_hidden_channels=d,
        gnn_hidden_channels=d,
        mlp_hidden_channels=d,
        batch_size=64,
        dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(np.stack([src[:64], dst[:64]], 1).astype(np.int32))
    neg = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (64, 1, 2)).astype(np.int32)
    )
    margin = jnp.zeros((64,), jnp.float32)
    mask = jnp.ones((64,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)

    p1, _, l1 = model._train_step(
        copy(params), model.init_opt_state(params), g, None, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )

    mesh = make_mesh(data=1, node=8)
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e],
        np.asarray(g.edge_weight)[:e], num_nodes=n, mesh=mesh, block=(8, 128),
        # edges already coalesced in g
    )
    p2, _, l2 = model._train_step(
        copy(params), model.init_opt_state(params), gp, None, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.parametrize("shards", [2, 8])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_halo_spmm_matches_single(setup, shards, reduce):
    from plnlp_tpu.parallel.partition import with_halo

    n, d, src, dst, w, g, x = setup
    pg = with_halo(
        partition_graph(src, dst, w, num_nodes=n, num_shards=shards, block=(8, 128))
    )
    mesh = make_mesh(data=1, node=shards)
    gp = GraphParallel(pg=pg, mesh=mesh, comm="halo")
    xs = shard_node_features(x, pg, mesh)
    out = partitioned_spmm(gp, xs, reduce)[:n]
    expect = spmm_segment(g, x, reduce)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


def test_halo_gradient_matches_single(setup):
    from plnlp_tpu.parallel.partition import with_halo

    n, d, src, dst, w, g, x = setup
    pg = with_halo(
        partition_graph(src, dst, w, num_nodes=n, num_shards=4, block=(8, 128))
    )
    mesh = make_mesh(data=1, node=4)
    gp = GraphParallel(pg=pg, mesh=mesh, comm="halo")
    xs = shard_node_features(x, pg, mesh)
    cot = jnp.asarray(np.random.default_rng(3).standard_normal((n, d)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(partitioned_spmm(gp, x, "mean"), cot))(xs)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "mean"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )


def test_halo_quota_smaller_than_allgather(setup):
    """For a partition-local graph the halo volume must be < full gather."""
    from plnlp_tpu.parallel.partition import with_halo

    n = 128
    # ring graph: each node only talks to neighbors -> tiny halos
    src = np.arange(n)
    dst = (np.arange(n) + 1) % n
    pg = with_halo(
        partition_graph(src, dst, None, num_nodes=n, num_shards=8, block=(8, 32))
    )
    # comm rows per shard = S*(q + qh); must be well under N
    assert pg.num_shards * (pg.halo_quota + pg.halo_hubs) < n


def test_halo_powerlaw_hub_replication(rng):
    """On a power-law graph, hub replication must (a) keep halo volume below
    the all-gather and (b) beat the no-hub plan's quota — the failure mode
    VERDICT flagged: one hub node read by every shard inflating every peer
    buffer (quota was a global max)."""
    from plnlp_tpu.ops.spmm import spmm_segment
    from plnlp_tpu.parallel.partition import with_halo

    # Power-law-with-locality graph: ring-local edges (small true halos)
    # plus 8 global hub sources read by every node — the exact scenario
    # where a global-max quota blows every peer buffer up.
    n = 1024
    ring_src = np.concatenate([np.arange(n), np.arange(n)])
    ring_dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) + 2) % n])
    hubs = rng.integers(0, n, 8)
    hub_src = np.repeat(hubs, n // 8)
    hub_dst = rng.integers(0, n, len(hub_src))
    src = np.concatenate([ring_src, hub_src])
    dst = np.concatenate([ring_dst, hub_dst])
    shards = 8
    pg0 = partition_graph(src, dst, None, num_nodes=n, num_shards=shards, block=(8, 128))
    # no-hub plan: threshold above S disables replication
    pg_nohub = with_halo(pg0, hub_k=shards + 1)
    pg_hub = with_halo(pg0, hub_k=3)
    assert pg_nohub.halo_hubs <= 1  # padding row only
    # hub replication shrinks the per-peer quota
    assert pg_hub.halo_quota < pg_nohub.halo_quota
    # and total comm volume stays below the all-gather volume per shard
    comm_rows = shards * (pg_hub.halo_quota + pg_hub.halo_hubs)
    assert comm_rows < pg_hub.padded_nodes
    # parity on the hubbed plan
    mesh = make_mesh(data=1, node=shards)
    gp = GraphParallel(pg=pg_hub, mesh=mesh, comm="halo")
    g = build_graph(src, dst, None, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    xs = shard_node_features(x, pg_hub, mesh)
    out = partitioned_spmm(gp, xs, "sum")[:n]
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)
    # gradient through the hubbed halo path still matches
    cot = jnp.asarray(np.random.default_rng(3).standard_normal((n, 16)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(partitioned_spmm(gp, x, "sum"), cot))(xs)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )


def test_partitioned_transformer_matches_single(setup, rng):
    """TransformerConv over GraphParallel == single-device encoder."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    # transformer strips edge values (main.py:184-186): unweighted graph
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    ref = apply_encoder(params, "TRANSFORMER", g, x)

    mesh = make_mesh(data=1, node=8)
    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e], None,
        num_nodes=n, mesh=mesh, block=(8, 128),
    )
    out = apply_encoder(params, "TRANSFORMER", gp, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    # differentiable end-to-end
    gx = jax.grad(lambda x: jnp.sum(apply_encoder(params, "TRANSFORMER", gp, x) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(gx)))


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_partitioned_transformer_grad_matches_single(setup, shards):
    """The hand-written TransformerConv VJP (softmax Jacobian + transposed
    blocked scatter-matmuls) == single-device XLA autodiff, for BOTH the
    input features and every layer parameter, on 2/4/8 shards."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    mesh = make_mesh(data=1, node=shards)
    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e], None,
        num_nodes=n, mesh=mesh, block=(8, 128),
    )
    # non-symmetric downstream so every grad path (q/k/v/skip) is exercised
    tgt = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )

    def loss(graph_op):
        def f(params, x):
            h = apply_encoder(params, "TRANSFORMER", graph_op, x)
            return jnp.sum((h - tgt) ** 2) + jnp.sum(jnp.sin(h))

        return f

    g1p, g1x = jax.grad(loss(g), argnums=(0, 1))(params, x)
    g2p, g2x = jax.grad(loss(gp), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g2x), np.asarray(g1x), rtol=1e-3, atol=1e-4)
    flat1, tree1 = jax.tree_util.tree_flatten_with_path(g1p)
    flat2 = jax.tree_util.tree_leaves(g2p)
    assert len(flat1) == len(flat2)
    for (path, a), b in zip(flat1, flat2):
        # atol floor 1e-6: the lin_key bias grad is mathematically zero
        # (softmax cancels per-row logit shifts) — f32 noise on both sides
        scale = float(np.abs(np.asarray(a)).max())
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3,
            atol=max(1e-4 * scale, 1e-6),
            err_msg=jax.tree_util.keystr(path),
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


def test_partitioned_transformer_bwd_has_no_edge_feature_scatter(setup):
    """The expensive class the custom VJP eliminates: autodiff gather
    transposes — scatter-adds with RANK-2 (num_edge_slots, D) updates.  The
    only scatters left are the CPU-fallback row-block segment-sums (rank-3
    (nblk, R, D), which the TPU Pallas kernel replaces) and per-edge SCALAR
    softmax segment ops (rank-1)."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    mesh = make_mesh(data=1, node=4)
    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e], None,
        num_nodes=n, mesh=mesh, block=(8, 128),
    )

    def loss(params, x):
        return jnp.sum(apply_encoder(params, "TRANSFORMER", gp, x) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(params, x)
    bad = [
        eqn
        for eqn in _collect_scatter_eqns(jaxpr.jaxpr, [])
        if len(eqn.invars[2].aval.shape) == 2
        and eqn.invars[2].aval.shape[-1] in (d, 16)
    ]
    assert not bad, f"edge-feature scatters survived: {bad}"


def test_comm_auto_selection(rng):
    """comm='auto' (cost model: q + qh + latency_rows < rows_per_shard)
    picks halo on ring locality, all_gather on dense boundaries, and
    all_gather whenever the per-message latency term dominates."""
    import numpy as np

    from plnlp_tpu.parallel import make_mesh
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    mesh = make_mesh(node=4)
    # ring: each shard only reads its two neighbors' boundary rows
    n = 64
    ring_src = np.arange(n, dtype=np.int64)
    ring_dst = (ring_src + 1) % n
    gp_ring = make_graph_parallel(
        ring_src, ring_dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        symmetrize=True, comm="auto", latency_rows=0,
    )
    assert gp_ring.comm == "halo"
    assert gp_ring.pg.fwd_halo is not None

    # dense random: boundary sets approach every remote row
    e = 1500
    gp_dense = make_graph_parallel(
        rng.integers(0, n, e), rng.integers(0, n, e), None, num_nodes=n,
        mesh=mesh, block=(8, 32), symmetrize=True, comm="auto",
        latency_rows=0,
    )
    assert gp_dense.comm == "all_gather"

    # latency branch: halo's extra collective costs more than it saves
    # when the wire constant rivals rows_per_shard (16 here)
    gp_lat = make_graph_parallel(
        ring_src, ring_dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        symmetrize=True, comm="auto", latency_rows=16,
    )
    assert gp_lat.comm == "all_gather"
    # the DEFAULT wire constant (512 rows) also rejects halo at toy scale
    gp_def = make_graph_parallel(
        ring_src, ring_dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        symmetrize=True, comm="auto",
    )
    assert gp_def.comm == "all_gather"


def test_estimate_halo_quotas_matches_built_plan(rng):
    """comm='auto' decides from estimate_halo_quotas — it must agree
    exactly with what with_halo subsequently builds."""
    from plnlp_tpu.parallel.halo import estimate_halo_quotas
    from plnlp_tpu.parallel.partition import with_halo

    src, dst, _ = random_graph_np(rng, 256, 2048)
    pg = partition_graph(
        src, dst, None, num_nodes=256, num_shards=4, block=(32, 64)
    )
    qf, qhf = estimate_halo_quotas(
        np.asarray(pg.fwd_blk_src), np.asarray(pg.fwd_blk_weight),
        pg.rows_per_shard, 4,
    )
    qb, qhb = estimate_halo_quotas(
        np.asarray(pg.bwd_blk_src), np.asarray(pg.bwd_blk_weight),
        pg.rows_per_shard, 4,
    )
    pgh = with_halo(pg)
    assert max(qf, qb) == pgh.halo_quota
    assert max(qhf, qhb) == pgh.halo_hubs


# ---------------------------------------------------------------------------
# Node→slot reordering (edge balance / locality) — round-3 scope
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reorder", ["edges", "degree", "bfs"])
@pytest.mark.parametrize("shards", [2, 8])
def test_reordered_spmm_matches_single(setup, reorder, shards):
    """Every reorder mode is value-neutral: fwd and grad match the
    single-device SpMM exactly (the perms are pure relayout)."""
    n, d, src, dst, w, g, x = setup
    pg = partition_graph(
        src, dst, w, num_nodes=n, num_shards=shards, block=(8, 128),
        reorder=reorder,
    )
    assert pg.perm_in is not None and pg.reorder == reorder
    mesh = make_mesh(data=1, node=shards)
    gp = GraphParallel(pg=pg, mesh=mesh)
    xs = shard_node_features(x, pg, mesh)
    for reduce in ("sum", "mean"):
        out = partitioned_spmm(gp, xs, reduce)[:n]
        expect = spmm_segment(g, x, reduce)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
        )
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, d)), jnp.float32
    )
    gx = jax.grad(lambda x: jnp.vdot(partitioned_spmm(gp, x, "sum"), cot))(xs)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(gx)[n:], 0.0, atol=1e-6)


@pytest.mark.parametrize("reorder", ["edges", "bfs"])
def test_reordered_halo_matches_single(setup, reorder):
    """Reordering composes with the halo exchange (plans are built in slot
    space)."""
    from plnlp_tpu.parallel.partition import with_halo

    n, d, src, dst, w, g, x = setup
    pg = with_halo(partition_graph(
        src, dst, w, num_nodes=n, num_shards=4, block=(8, 128),
        reorder=reorder,
    ))
    mesh = make_mesh(data=1, node=4)
    gp = GraphParallel(pg=pg, mesh=mesh, comm="halo")
    xs = shard_node_features(x, pg, mesh)
    out = partitioned_spmm(gp, xs, "sum")[:n]
    expect = spmm_segment(g, x, "sum")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )
    gx = jax.grad(lambda x: jnp.sum(partitioned_spmm(gp, x, "sum") ** 2))(xs)
    gx_ref = jax.grad(lambda x: jnp.sum(spmm_segment(g, x, "sum") ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-3, atol=1e-4
    )


def test_reordered_transformer_matches_single(setup):
    """The partitioned TransformerConv hand-VJP composes with reordering
    (slot relayout wraps the custom VJP as gathers)."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    mesh = make_mesh(data=1, node=4)
    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e], None,
        num_nodes=n, mesh=mesh, block=(8, 128), reorder="degree",
    )
    assert gp.pg.perm_in is not None
    ref = apply_encoder(params, "TRANSFORMER", g, x)
    out = apply_encoder(params, "TRANSFORMER", gp, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    gp_ref, gx_ref = jax.grad(
        lambda p, x: jnp.sum(apply_encoder(p, "TRANSFORMER", g, x) ** 2),
        argnums=(0, 1),
    )(params, x)
    gp_got, gx_got = jax.grad(
        lambda p, x: jnp.sum(apply_encoder(p, "TRANSFORMER", gp, x) ** 2),
        argnums=(0, 1),
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-3, atol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gp_ref), jax.tree_util.tree_leaves(gp_got)
    ):
        scale = float(np.abs(np.asarray(a)).max())
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3,
            atol=max(1e-4 * scale, 1e-6),
        )


def test_reorder_balances_skewed_graph(rng):
    """On the skewed generator (hubs at LOW ids — worst case for contiguous
    ranges): 'degree' lands per-shard edge counts within 10% of the mean at
    ZERO extra row padding; 'edges'/'bfs' at least halve the naive split's
    hub-bound imbalance (capacity caps bound what contiguous ranges can do
    on this hub-head id order — measured, RESULTS.md round 3)."""
    from plnlp_tpu.data.synthetic import make_skewed_graph

    src, dst = make_skewed_graph(rng, 2000, 30000)
    S = 4
    stats, rps = {}, {}
    for mode in ("none", "edges", "degree", "bfs"):
        pg = partition_graph(
            src, dst, None, num_nodes=2000, num_shards=S, block=(8, 128),
            symmetrize=True, reorder=mode,
        )
        edges = np.asarray(pg.shard_edges, np.float64)
        assert len(edges) == S and len(pg.shard_nblk) == S
        stats[mode] = edges.max() / edges.mean()
        rps[mode] = pg.rows_per_shard
    assert stats["none"] > 1.5, f"skewed generator not skewed? {stats}"
    assert stats["degree"] <= 1.10, f"degree: {stats}"
    assert rps["degree"] == rps["none"]  # no padding cost
    for mode in ("edges", "bfs"):
        assert stats[mode] <= 0.65 * stats["none"], f"{mode}: {stats}"


def test_assign_slots_auto_mode(rng):
    """'auto' keeps the zero-cost identity layout on balanced graphs and
    switches to equal-edge ranges on skewed ones."""
    from plnlp_tpu.data.synthetic import make_skewed_graph
    from plnlp_tpu.parallel.partition import assign_slots

    # balanced: uniform random graph
    src, dst, _ = random_graph_np(rng, 512, 8192)
    deg_dst = np.sort(dst.astype(np.int64))
    nm, rps, mode = assign_slots(
        src.astype(np.int64), deg_dst, 512, 4, 8, "auto"
    )
    assert nm is None and mode == "none"

    # skewed: hubs concentrate edges in shard 0
    s2, d2 = make_skewed_graph(rng, 512, 8192, alpha=1.0)
    nm, rps, mode = assign_slots(
        s2.astype(np.int64), np.sort(d2.astype(np.int64)), 512, 4, 8, "auto"
    )
    assert nm is not None and mode == "degree"
    # node_map is a valid injection into slot space
    assert len(np.unique(nm)) == 512 and nm.max() < 4 * rps


def test_reorder_full_train_step_parity(setup, rng):
    """Whole-model train step over a REORDERED GraphParallel == the
    single-device step (the strongest end-to-end relayout check)."""
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel
    from plnlp_tpu.training import Model, ModelConfig

    n, d, src, dst, w, g, x = setup
    cfg = ModelConfig(
        emb_hidden_channels=d, gnn_hidden_channels=d, mlp_hidden_channels=d,
        batch_size=64, dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(np.stack([src[:64], dst[:64]], 1).astype(np.int32))
    neg = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (64, 1, 2)).astype(np.int32)
    )
    margin = jnp.zeros((64,), jnp.float32)
    mask = jnp.ones((64,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)

    p1, _, l1 = model._train_step(
        copy(params), model.init_opt_state(params), g, None, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )
    mesh = make_mesh(data=1, node=8)
    e = g.num_edges
    gp = make_graph_parallel(
        np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e],
        np.asarray(g.edge_weight)[:e], num_nodes=n, mesh=mesh,
        block=(8, 128), reorder="degree",
    )
    p2, _, l2 = model._train_step(
        copy(params), model.init_opt_state(params), gp, None, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5
        )


# --- round 4: hybrid dense tiles composed with the partition ----------------


@pytest.mark.parametrize("shards", [2, 8])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_tiled_partition_matches_single(setup, shards, reduce):
    """tile>0: per-shard dense tiles + blocked residual == the segment
    oracle, with the labelprop slot assignment riding the custom VJP."""
    n, d, src, dst, w, g, x = setup
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    mesh = make_mesh(data=1, node=shards)
    gp = make_graph_parallel(
        src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    assert gp.pg.tile == 16 and gp.comm == "all_gather"
    assert gp.pg.tile_dense_edges > 0
    assert gp.pg.reorder == "labelprop"
    xs = shard_node_features(x, gp.pg, mesh)
    out = partitioned_spmm(gp, xs, reduce)[:n]
    expect = spmm_segment(g, x, reduce)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


def test_tiled_partition_gradient(setup):
    n, d, src, dst, w, g, x = setup
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    mesh = make_mesh(data=1, node=4)
    gp = make_graph_parallel(
        src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    xs = shard_node_features(x, gp.pg, mesh)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, d)), jnp.float32
    )
    gx = jax.grad(lambda x: jnp.vdot(partitioned_spmm(gp, x, "sum"), cot))(xs)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx)[:n], np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(gx)[n:], 0.0, atol=1e-6)


def test_tiled_partition_all_residual_and_all_dense(setup):
    """min_fill extremes: everything residual (zero filler tiles) and
    everything tiled (empty-ish residual) both match the oracle."""
    n, d, src, dst, w, g, x = setup
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    mesh = make_mesh(data=1, node=2)
    expect = spmm_segment(g, x, "sum")
    for mf, check in ((1, "dense"), (10**9, "residual")):
        gp = make_graph_parallel(
            src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
            tile=16, min_fill=mf,
        )
        if check == "dense":
            assert gp.pg.tile_dense_edges == g.num_edges
        else:
            assert gp.pg.tile_dense_edges == 0
        xs = shard_node_features(x, gp.pg, mesh)
        out = partitioned_spmm(gp, xs, "sum")[:n]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5,
            err_msg=check,
        )


def test_tiled_partition_int8_store(rng):
    """Unweighted graphs store per-shard tiles int8; parity holds."""
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d = 120, 8
    src, dst, _ = random_graph_np(rng, n, 900, weighted=False)
    g = build_graph(src, dst, None, num_nodes=n)
    mesh = make_mesh(data=1, node=2)
    gp = make_graph_parallel(
        src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=2,
    )
    assert gp.pg.tile_vals.dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    xs = shard_node_features(x, gp.pg, mesh)
    np.testing.assert_allclose(
        np.asarray(partitioned_spmm(gp, xs, "sum")[:n]),
        np.asarray(spmm_segment(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )


def test_tiled_partition_rejects_halo_and_transformer(setup):
    n, d, src, dst, w, g, x = setup
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel
    from plnlp_tpu.parallel.partition import with_halo

    mesh = make_mesh(data=1, node=2)
    with pytest.raises(ValueError, match="all_gather"):
        make_graph_parallel(
            src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
            tile=16, comm="halo",
        )
    gp = make_graph_parallel(
        src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32), tile=16,
    )
    with pytest.raises(ValueError, match="all_gather"):
        with_halo(gp.pg)
    # the tiled-attention entry point conversely rejects UNTILED partitions
    from plnlp_tpu.parallel.tile_transformer import (
        partitioned_tile_transformer_conv,
    )

    gp_plain = make_graph_parallel(
        src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
    )
    with pytest.raises(ValueError, match="tiled partition"):
        partitioned_tile_transformer_conv(gp_plain, None, x)


def test_tiled_full_train_step_parity(setup, rng):
    """A full Model train step over the tiled partition matches the
    single-device blocked path step (same seeds/batch)."""
    n, d, src, dst, w, g, x = setup
    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel
    from plnlp_tpu.training import Model, ModelConfig

    cfg = ModelConfig(
        encoder="SAGE", predictor="MLP", loss_func="AUC",
        gnn_hidden_channels=16, mlp_hidden_channels=16,
        emb_hidden_channels=16, batch_size=256, num_neg=2, dropout=0.0,
        lr=0.01,
    )
    pos = jnp.asarray(np.stack([src, dst], 1).astype(np.int32))

    def one_epoch(graph, graph_t, sample_graph):
        model = Model(cfg, num_nodes=n)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = model.init_opt_state(params)
        params, opt_state, loss = model.train_epoch(
            params, opt_state, graph, graph_t, None, pos, None,
            jax.random.PRNGKey(1), cfg.lr, sample_graph=sample_graph,
        )
        return float(loss)

    g1, gt1 = prepare_graph(src, dst, w, num_nodes=n, block=(8, 32))
    sample_g, _ = prepare_graph(src, dst, w, num_nodes=n, block=None)
    base = one_epoch(g1, gt1, sample_g)

    mesh = make_mesh(data=1, node=2)
    gp = make_graph_parallel(
        src, dst, w, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    tiled = one_epoch(gp, None, sample_g)
    np.testing.assert_allclose(tiled, base, rtol=1e-4)


def test_tiled_partition_single_shard_still_reorders(rng):
    """S=1 + tile>0 must still run the labelprop relabel — without it the
    tile sets are built on the original id order and degenerate to ~zero
    coverage (code-review finding, round 4)."""
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n = 400
    comm = rng.integers(0, 8, n)
    srcs, dsts = [], []
    for c in range(8):
        m = np.nonzero(comm == c)[0]
        srcs.append(rng.choice(m, 400))
        dsts.append(rng.choice(m, 400))
    src, dst = np.concatenate(srcs), np.concatenate(dsts)
    g = build_graph(src, dst, None, num_nodes=n)
    mesh = make_mesh(data=1, node=1)
    gp = make_graph_parallel(
        src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32), tile=16,
    )
    assert gp.pg.reorder == "labelprop"
    assert gp.pg.tile_dense_edges > 0
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    xs = shard_node_features(x, gp.pg, mesh)
    np.testing.assert_allclose(
        np.asarray(partitioned_spmm(gp, xs, "sum")[:n]),
        np.asarray(spmm_segment(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )


# --- round 5: distributed block-sparse attention over the tiled partition ---


@pytest.mark.parametrize("shards", [2, 8])
def test_tiled_partitioned_transformer_matches_single(setup, shards):
    """TransformerConv over a TILED partition (shard-local flash/scan
    sweeps + blocked residual, parallel.tile_transformer) == the
    single-device encoder.  The softmax is exact: destination rows are
    wholly owned, so tile+residual partials merge shard-locally."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    # transformer strips edge values (main.py:184-186): unweighted graph
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    ref = apply_encoder(params, "TRANSFORMER", g, x)

    mesh = make_mesh(data=1, node=shards)
    gp = make_graph_parallel(
        src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    assert gp.pg.tile == 16 and gp.pg.tile_dense_edges > 0
    out = apply_encoder(params, "TRANSFORMER", gp, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("shards", [2, 8])
def test_tiled_partitioned_transformer_grad_matches_single(setup, shards):
    """The hand VJP of the tiled attention (flash/scan dQ + transposed
    dK/dV sweeps, stats all-gather, blocked residual accumulations) ==
    single-device XLA autodiff for input features AND every parameter."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    mesh = make_mesh(data=1, node=shards)
    gp = make_graph_parallel(
        src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    assert gp.pg.tile_dense_edges > 0
    tgt = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )

    def loss(graph_op):
        def f(params, x):
            h = apply_encoder(params, "TRANSFORMER", graph_op, x)
            return jnp.sum((h - tgt) ** 2) + jnp.sum(jnp.sin(h))

        return f

    g1p, g1x = jax.grad(loss(g), argnums=(0, 1))(params, x)
    g2p, g2x = jax.grad(loss(gp), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(g2x), np.asarray(g1x), rtol=1e-3, atol=1e-4
    )
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1p)
    flat2 = jax.tree_util.tree_leaves(g2p)
    assert len(flat1) == len(flat2)
    for (path, a), b in zip(flat1, flat2):
        scale = float(np.abs(np.asarray(a)).max())
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3,
            atol=max(1e-4 * scale, 1e-6),
            err_msg=jax.tree_util.keystr(path),
        )


def test_tiled_partitioned_transformer_extremes(setup):
    """min_fill extremes: all edges tiled (empty residual) and all
    residual (zero real tiles) both match the single-device encoder."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    ref = apply_encoder(params, "TRANSFORMER", g, x)
    mesh = make_mesh(data=1, node=2)
    for mf, check in ((1, "dense"), (10**9, "residual")):
        gp = make_graph_parallel(
            src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
            tile=16, min_fill=mf,
        )
        out = apply_encoder(params, "TRANSFORMER", gp, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4,
            err_msg=check,
        )
        gx = jax.grad(
            lambda x: jnp.sum(
                apply_encoder(params, "TRANSFORMER", gp, x) ** 2
            )
        )(x)
        gx_ref = jax.grad(
            lambda x: jnp.sum(
                apply_encoder(params, "TRANSFORMER", g, x) ** 2
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-4,
            err_msg=check,
        )


def test_tiled_partitioned_transformer_kernel_branch(setup, monkeypatch):
    """The use_kernel=True branches of tile_transformer (flash kernels
    inside shard_map: mdd/mdd_t packing, local-Q x global-K/V wiring)
    via interpret-mode kernels on the CPU mesh — without this, the
    kernel branch would only ever execute on real TPU (review finding)."""
    import functools

    import plnlp_tpu.ops.pallas_attention as pa
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    monkeypatch.setattr(pa, "attention_pallas_supported", lambda t, d: True)
    for name in ("flash_tiles_fwd", "flash_tiles_dq", "flash_tiles_dkv"):
        orig = getattr(pa, name)
        monkeypatch.setattr(pa, name, functools.partial(orig, interpret=True))

    n, d, src, dst, w, _, x = setup
    g = build_graph(src, dst, None, num_nodes=n)
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, 16, 2)
    mesh = make_mesh(data=1, node=2)
    gp = make_graph_parallel(
        src, dst, None, num_nodes=n, mesh=mesh, block=(8, 32),
        tile=16, min_fill=3,
    )
    assert gp.pg.tile_dense_edges > 0
    ref = apply_encoder(params, "TRANSFORMER", g, x)
    out = apply_encoder(params, "TRANSFORMER", gp, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    gx = jax.grad(
        lambda x: jnp.sum(apply_encoder(params, "TRANSFORMER", gp, x) ** 2)
    )(x)
    gx_ref = jax.grad(
        lambda x: jnp.sum(apply_encoder(params, "TRANSFORMER", g, x) ** 2)
    )(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-4
    )
