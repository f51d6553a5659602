"""Randomized cross-backend training parity.

Three independent compute paths implement the same model math:

* dense adjacency (``prepare_dense`` — MXU matmul path, reference ddi config),
* blocked CSR (``prepare_graph(block=...)`` — the Pallas/einsum scatter-matmul
  path carrying collab/citation2),
* plain CSR (``prepare_graph(block=None)`` — segment-sum oracle path).

Each fuzz case draws a random small graph (isolated nodes, duplicate and
self edges included), a random model surface (encoder x predictor x loss x
layers x num_neg x optimizer x input-layer mode incl. frozen pretrained
tables x remat, reference main.py:16-55 axes), runs THREE full
train steps (fwd + bwd + clip + optimizer) from identical initial params on
every backend, and requires the loss trajectory and final parameters to
agree.  This is an integration-level oracle the per-module tests can't give:
block padding edge cases, mean-reduce on isolated rows, the num_layers==1
ReLU quirk (reference layer.py:23-27), and margin plumbing all interact here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.dense import prepare_dense
from plnlp_tpu.graph import (
    gcn_normalize_edges,
    prepare_graph,
    row_normalize_edges,
    to_undirected_edges,
)
from plnlp_tpu.training import Model, ModelConfig

ENCODERS = ["SAGE", "GCN", "WSAGE", "TRANSFORMER"]
PREDICTORS = ["MLP", "MLPCAT", "MLPDOT", "MLPBIL", "DOT", "BIL"]
LOSSES = [
    "AUC",
    "HingeAUC",
    "WeightedAUC",
    "AdaAUC",
    "WeightedHingeAUC",
    "AdaHingeAUC",
    "LogRank",
    "CE",
    "InfoNCE",
]
OPTIMIZERS = ["Adam", "AdamW", "SGD"]


def _run_steps(model, params, opt_state, graph, graph_t, node_feats, batches):
    losses = []
    for pos, neg, margin, mask, key, use_margin in batches:
        params, opt_state, loss = model._train_step(
            params, opt_state, graph, graph_t, node_feats,
            pos, neg, margin, mask, jnp.asarray(1e-2, jnp.float32), key,
            use_margin,
        )
        losses.append(float(loss))
    return losses, params


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_train_parity_across_backends(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(8, 60))
    e = int(rng.integers(n, 4 * n))
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    weights = (
        rng.uniform(0.5, 2.0, e).astype(np.float32)
        if rng.integers(2)
        else None
    )

    # Input-layer mode — the full create_input_layer surface (reference
    # model.py:229-249): fresh trainable table, frozen pretrained table,
    # and both concat'd with raw node features.
    input_mode = str(
        rng.choice(["fresh", "pretrained", "feats_fresh", "feats_pretrained"])
    )
    # gnn and mlp widths must match: the predictor's input IS the encoder
    # output, and the reference factory sizes it from mlp_hidden_channels
    # (model.py:75, layer.py:66-87) — its configs always set them equal.
    width = 8 * int(rng.integers(1, 3))
    cfg = ModelConfig(
        encoder=str(rng.choice(ENCODERS)),
        predictor=str(rng.choice(PREDICTORS)),
        optimizer=str(rng.choice(OPTIMIZERS)),
        loss_func=str(rng.choice(LOSSES)),
        gnn_num_layers=int(rng.integers(1, 4)),
        mlp_num_layers=int(rng.integers(1, 3)),
        emb_hidden_channels=8 * int(rng.integers(1, 3)),
        gnn_hidden_channels=width,
        mlp_hidden_channels=width,
        dropout=0.0,  # the only stochastic op; keys differ per backend jit
        grad_clip_norm=float(rng.choice([-1.0, 1.0, 2.0])),
        num_neg=int(rng.integers(1, 4)),
        batch_size=16,
        use_node_feats=input_mode.startswith("feats"),
        train_node_emb=input_mode.endswith("fresh"),
        remat=bool(rng.integers(2)),  # must be a pure memory/FLOPs trade
    )
    num_feats = 6 if cfg.use_node_feats else 0
    node_feats = (
        jnp.asarray(rng.standard_normal((n, num_feats)).astype(np.float32))
        if cfg.use_node_feats
        else None
    )
    pretrain_emb = (
        rng.standard_normal((n, 8 * int(rng.integers(1, 3)))).astype(np.float32)
        if "pretrained" in input_mode
        else None
    )

    # Encoder-appropriate adjacency normalization, exactly as the CLI
    # applies it (cli.py adj-normalization dispatch; reference
    # main.py:177-186 + utils.py:83-97) — raw sum aggregation would make
    # GCN/WSAGE fuzz configs genuinely divergent, which the product never
    # runs.
    src, dst, weights = to_undirected_edges(src, dst, weights, n)
    if cfg.encoder == "GCN":
        src, dst, weights = gcn_normalize_edges(src, dst, weights, n)
    elif cfg.encoder == "WSAGE":
        src, dst, weights = row_normalize_edges(src, dst, weights, n)
    elif cfg.encoder == "TRANSFORMER":
        weights = None  # values stripped (reference main.py:184-186)

    dense = prepare_dense(src, dst, weights, num_nodes=n, symmetrize=False)
    gb, gbt = prepare_graph(
        src, dst, weights, num_nodes=n, symmetrize=False, block=(8, 16)
    )
    gs, gst = prepare_graph(
        src, dst, weights, num_nodes=n, symmetrize=False, block=None
    )
    # Fourth backend: the multi-chip partitioned path on the 8-CPU mesh.
    # One (shards × comm × reorder) variant per seed keeps the matrix
    # bounded while the 16 seeds jointly sweep 2/8 shards, halo/all_gather,
    # and every node→slot assignment mode through the same randomized
    # encoder×predictor×loss×optimizer surface.
    from plnlp_tpu.parallel import make_mesh
    from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

    p_shards = 2 if seed % 2 else 8
    p_comm = "halo" if seed % 4 < 2 else "all_gather"
    p_reorder = ["none", "degree", "edges", "bfs"][seed % 4]
    gp = make_graph_parallel(
        src, dst, weights, num_nodes=n,
        mesh=make_mesh(data=1, node=p_shards), block=(8, 16),
        comm=p_comm, reorder=p_reorder,
    )

    # Fifth/sixth backends: the hybrid dense-tile path, single-device and
    # composed with the partition — ALL encoders, incl. TRANSFORMER
    # (block-sparse attention single-device round 4; the distributed
    # tiled-attention composition round 5).  min_fill sweeps all-dense /
    # mixed / all-residual across seeds.
    from plnlp_tpu.ops.tile_spmm import build_hybrid

    h_fill = [1, 3, 10**9][seed % 3]
    extra = {
        "hybrid": (
            build_hybrid(
                src, dst, weights, num_nodes=n, symmetrize=False,
                tile=16, min_fill=h_fill, block=(8, 16),
                reorder="labelprop" if seed % 2 else None,
            ),
            None,
        ),
        # 2 shards here: 8-shard tiled coverage lives in the dedicated
        # test_graph_parallel tests; an 8-way shard_map compile per fuzz
        # seed doubles the whole suite's wall time on CPU
        "tiled-partitioned": (
            make_graph_parallel(
                src, dst, weights, num_nodes=n,
                mesh=make_mesh(data=1, node=2), block=(8, 16),
                tile=16, min_fill=h_fill,
            ),
            None,
        ),
    }

    # identical batch stream for every backend
    use_margin = cfg.loss_func in (
        "WeightedAUC", "AdaAUC", "WeightedHingeAUC", "AdaHingeAUC"
    )
    batches = []
    for i in range(3):
        b = cfg.batch_size
        pos = jnp.asarray(rng.integers(0, n, (b, 2)).astype(np.int32))
        neg = jnp.asarray(
            rng.integers(0, n, (b, cfg.num_neg, 2)).astype(np.int32)
        )
        margin = jnp.asarray(rng.uniform(0.2, 1.5, b).astype(np.float32))
        mask = jnp.asarray(
            (rng.uniform(size=b) < 0.9).astype(np.float32)
        )
        batches.append((pos, neg, margin, mask, jax.random.PRNGKey(i), use_margin))

    model = Model(
        cfg, num_nodes=n, num_node_feats=num_feats, pretrain_emb=pretrain_emb
    )
    backends = {
        "dense": (dense, None),
        "blocked": (gb, gbt),
        "segment": (gs, gst),
        "partitioned": (gp, None),
        **extra,
    }
    compare = [name for name in backends if name != "segment"]

    # Tight check: gradients at identical initial params.  (Final params
    # after optimizer steps are NOT comparable elementwise: Adam rescales a
    # zero-analytic-gradient direction's f32 reduction-order noise into a
    # full ±lr step — see tests/test_parallel.py's sharded parity notes.)
    pos, neg, margin, mask, key, _ = batches[0]

    def loss_of(p, g, gt):
        return model._loss_impl(
            p, g, gt, node_feats, pos, neg,
            margin if use_margin else None, mask, key,
        )

    grads = {}
    for name, (g, gt) in backends.items():
        params = model.init_params(jax.random.PRNGKey(7))
        grads[name] = jax.grad(loss_of)(params, g, gt)
    for name in compare:
        for (path, ga), gb_leaf in zip(
            jax.tree_util.tree_flatten_with_path(grads[name])[0],
            jax.tree_util.tree_leaves(grads["segment"]),
        ):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb_leaf), rtol=1e-3, atol=1e-4,
                err_msg=f"{name} grad {jax.tree_util.keystr(path)}: {cfg}",
            )

    # Trajectory check: three full optimizer steps keep the losses aligned.
    results = {}
    for name, (g, gt) in backends.items():
        params = model.init_params(jax.random.PRNGKey(7))
        opt_state = model.init_opt_state(params)
        results[name] = _run_steps(
            model, params, opt_state, g, gt, node_feats, batches
        )
    ref_losses, _ = results["segment"]
    assert all(np.isfinite(ref_losses)), (cfg, ref_losses)
    for name in compare:
        losses, _ = results[name]
        np.testing.assert_allclose(
            losses, ref_losses, rtol=2e-3, atol=1e-4,
            err_msg=f"{name} loss trajectory diverged: {cfg}",
        )


def test_bf16_backends_track_f32(rng=None):
    """compute_dtype=bfloat16 integration across backends: both sparse
    backends track the f32 segment-sum reference loss to bf16 tolerance
    over 3 train steps (master weights stay f32)."""
    rng = np.random.default_rng(77)
    n, e = 48, 160
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dense = prepare_dense(src, dst, None, num_nodes=n, symmetrize=True)
    gb, gbt = prepare_graph(src, dst, None, num_nodes=n, symmetrize=True, block=(8, 16))
    gs, gst = prepare_graph(src, dst, None, num_nodes=n, symmetrize=True, block=None)

    def losses_for(compute_dtype, g, gt):
        cfg = ModelConfig(
            emb_hidden_channels=16, gnn_hidden_channels=16,
            mlp_hidden_channels=16, batch_size=16, num_neg=2,
            dropout=0.0, compute_dtype=compute_dtype,
        )
        model = Model(cfg, num_nodes=n)
        params = model.init_params(jax.random.PRNGKey(3))
        opt_state = model.init_opt_state(params)
        batches = []
        brng = np.random.default_rng(5)
        for i in range(3):
            pos = jnp.asarray(brng.integers(0, n, (16, 2)).astype(np.int32))
            neg = jnp.asarray(brng.integers(0, n, (16, 2, 2)).astype(np.int32))
            batches.append(
                (pos, neg, jnp.zeros((16,)), jnp.ones((16,)),
                 jax.random.PRNGKey(i), False)
            )
        out, params = _run_steps(model, params, opt_state, g, gt, None, batches)
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree_util.tree_leaves(params)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        ), "master weights must stay f32 under bf16 compute"
        return out

    ref = losses_for("float32", gs, gst)
    for g, gt in ((dense, None), (gb, gbt), (gs, gst)):
        bf = losses_for("bfloat16", g, gt)
        np.testing.assert_allclose(bf, ref, rtol=3e-2, atol=1e-2)
