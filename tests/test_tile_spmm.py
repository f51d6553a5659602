"""Hybrid dense-tile + residual SpMM (ops/tile_spmm.py): value and gradient
parity vs the segment-sum oracle across fill regimes and tile sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import build_graph
from plnlp_tpu.ops.spmm import spmm_segment
from plnlp_tpu.ops.tile_spmm import build_hybrid, hybrid_spmm
from tests.conftest import random_graph_np


@pytest.mark.parametrize("min_fill", [1, 4, 10**9])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_hybrid_matches_segment(rng, min_fill, reduce):
    """min_fill=1: everything dense-tiled; huge min_fill: everything on the
    residual blocked path; min_fill=4: a genuine mix."""
    n, d = 100, 16
    src, dst, w = random_graph_np(rng, n, 600, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=16, min_fill=min_fill, block=(8, 32)
    )
    if min_fill == 1:
        assert hg.res_edges == 0
    if min_fill == 10**9:
        assert hg.dense_edges == 0
    assert hg.dense_edges + hg.res_edges == g.num_edges
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    out = hybrid_spmm(hg, x, reduce)
    expect = spmm_segment(g, x, reduce)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5
    )


def test_hybrid_gradient_matches_segment(rng):
    n, d = 90, 8
    src, dst, w = random_graph_np(rng, n, 700, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=16, min_fill=4, block=(8, 32)
    )
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(hybrid_spmm(hg, x, "sum"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )


def test_hybrid_chunked_tile_loop(rng):
    """More tiles than _TILE_CHUNK exercises the fori_loop accumulation."""
    import plnlp_tpu.ops.tile_spmm as ts

    n, d = 64, 8
    src, dst, w = random_graph_np(rng, n, 800, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    hg = build_hybrid(src, dst, w, num_nodes=n, tile=8, min_fill=1, block=(8, 16))
    assert hg.num_tiles > 4
    orig = ts._TILE_CHUNK
    try:
        ts._TILE_CHUNK = 4
        out = hybrid_spmm(hg, x, "sum")
    finally:
        ts._TILE_CHUNK = orig
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_segment(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )


def test_hybrid_jits_and_trains(rng):
    n, d = 80, 8
    src, dst, w = random_graph_np(rng, n, 500, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(src, dst, w, num_nodes=n, tile=16, min_fill=3, block=(8, 16))
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    f = jax.jit(jax.value_and_grad(lambda x: jnp.sum(hybrid_spmm(hg, x) ** 2)))
    v, gx = f(x)
    v_ref = float(jnp.sum(spmm_segment(g, x, "sum") ** 2))
    np.testing.assert_allclose(float(v), v_ref, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(gx)))


def test_hybrid_labelprop_reorder_matches_segment(rng):
    """Internal label-prop relabeling is value-neutral (perm sandwich is
    pure relayout): fwd, mean reduce, and gradient all match the oracle
    in ORIGINAL node ids."""
    n, d = 120, 8
    src, dst, w = random_graph_np(rng, n, 900, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=16, min_fill=3, block=(8, 32),
        reorder="labelprop",
    )
    assert hg.perm_in is not None and hg.reorder == "labelprop"
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    for reduce in ("sum", "mean"):
        out = hybrid_spmm(hg, x, reduce)
        expect = spmm_segment(g, x, reduce)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5,
            err_msg=reduce,
        )
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(hybrid_spmm(hg, x, "sum"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )


def test_hybrid_full_train_step_parity(rng):
    """Whole-model train step over the hybrid operand == blocked-CSR path."""
    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.training import Model, ModelConfig

    n, d = 100, 16
    src, dst, w = random_graph_np(rng, n, 700, weighted=True)
    g, gt = prepare_graph(src, dst, w, num_nodes=n, block=(8, 32))
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=16, min_fill=4, block=(8, 32),
        reorder="labelprop",
    )
    cfg = ModelConfig(
        emb_hidden_channels=d, gnn_hidden_channels=d, mlp_hidden_channels=d,
        batch_size=64, dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(rng.integers(0, n, (64, 2)).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, n, (64, 1, 2)).astype(np.int32))
    margin = jnp.zeros((64,), jnp.float32)
    mask = jnp.ones((64,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)

    p1, _, l1 = model._train_step(
        copy(params), model.init_opt_state(params), g, gt, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )
    p2, _, l2 = model._train_step(
        copy(params), model.init_opt_state(params), hg, None, None,
        pos, neg, margin, mask, lr, jax.random.PRNGKey(2), False,
    )
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5
        )


def test_hybrid_tile_budget_guard():
    """max_tile_bytes raises min_fill instead of materializing an
    infeasible tile set (the 12.7GB lesson, RESULTS.md round 3)."""
    rng = np.random.default_rng(5)
    n = 256
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=1, block=(8, 32),
        max_tile_bytes=8 * 16 * 16 * 4,  # room for 8 tiles only
    )
    assert hg.num_tiles <= 8
    # still exact
    import jax.numpy as jnp

    from plnlp_tpu.graph import build_graph

    g = build_graph(src, dst, None, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hybrid_spmm(hg, x, "sum")),
        np.asarray(spmm_segment(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )


def test_cli_hybrid_backend_smoke():
    from plnlp_tpu.cli import argument, run_experiment

    argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=600,num_edges=6000",
        "--epochs=2", "--eval_steps=1", "--runs=1", "--batch_size=256",
        "--emb_hidden_channels=16", "--gnn_hidden_channels=16",
        "--mlp_hidden_channels=16", "--adj_backend=hybrid",
        "--tile_min_fill=4", "--block_rows=8", "--block_edges=32",
    ]
    loggers = run_experiment(argument(argv), log=lambda *_: None)
    assert loggers["Hits@20"].results[0]


def test_cli_hybrid_transformer_smoke():
    """TRANSFORMER over the hybrid backend (block-sparse attention,
    ops/tile_attention.py) runs end-to-end and produces finite metrics."""
    from plnlp_tpu.cli import argument, run_experiment

    argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=600,num_edges=6000",
        "--epochs=2", "--eval_steps=1", "--runs=1", "--batch_size=256",
        "--emb_hidden_channels=16", "--gnn_hidden_channels=16",
        "--mlp_hidden_channels=16", "--adj_backend=hybrid",
        "--encoder=TRANSFORMER", "--tile_size=64", "--tile_min_fill=4",
        "--block_rows=8", "--block_edges=32",
    ]
    loggers = run_experiment(argument(argv), log=lambda *_: None)
    res = np.asarray(loggers["Hits@50"].results[0])
    assert np.isfinite(res).all()


def test_cli_hybrid_multichip_smoke():
    """--adj_backend=hybrid composes with --num_shards: labelprop slot
    assignment, per-shard tile sets, residual blocked path — the full
    experiment runs on the fake-device mesh and produces finite metrics."""
    from plnlp_tpu.cli import argument, run_experiment

    argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=800,num_edges=8000",
        "--epochs=2", "--eval_steps=1", "--runs=1", "--batch_size=512",
        "--emb_hidden_channels=16", "--gnn_hidden_channels=16",
        "--mlp_hidden_channels=16", "--adj_backend=hybrid",
        "--num_shards=2", "--tile_size=64", "--tile_min_fill=4",
        "--block_rows=8", "--block_edges=32",
    ]
    logs = []
    loggers = run_experiment(argument(argv), log=logs.append)
    assert any("tiles/shard=" in ln for ln in logs)
    res = np.asarray(loggers["Hits@50"].results[0])
    assert np.isfinite(res).all()


def test_cli_hybrid_multichip_transformer_runs():
    """Round 5 closed the old reject: --adj_backend=hybrid --num_shards
    --encoder=TRANSFORMER runs the distributed block-sparse attention
    (parallel.tile_transformer) end-to-end from the CLI."""
    from plnlp_tpu.cli import argument, run_experiment

    argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=800,num_edges=8000",
        "--epochs=1", "--eval_steps=1", "--runs=1", "--batch_size=512",
        "--emb_hidden_channels=16", "--gnn_hidden_channels=16",
        "--mlp_hidden_channels=16", "--adj_backend=hybrid",
        "--num_shards=2", "--encoder=TRANSFORMER",
        "--tile_size=64", "--tile_min_fill=4",
        "--block_rows=8", "--block_edges=32",
    ]
    loggers = run_experiment(argument(argv), log=lambda *_: None)
    res = np.asarray(loggers["Hits@50"].results[0])
    assert np.isfinite(res).all()


def test_hybrid_mean_uses_precomputed_degrees(rng):
    """in_degrees is stored at build time (original id space) — the mean
    path must not re-derive it from the tile store per call."""
    src, dst, w = random_graph_np(rng, 60, 400, weighted=True)
    hg = build_hybrid(
        src, dst, w, num_nodes=60, tile=16, min_fill=3, block=(8, 16),
        reorder="labelprop",
    )
    assert hg.in_degrees is not None and hg.in_degrees.shape == (60,)
    from plnlp_tpu.graph import build_graph

    g = build_graph(src, dst, w, num_nodes=60)
    np.testing.assert_array_equal(
        np.asarray(hg.in_degrees), np.asarray(g.in_degrees)
    )


def test_cli_hybrid_serving_mode(tmp_path, rng):
    """--score_pairs works over the hybrid backend: the cached encode runs
    through the tile path, scoring through the common predictor machinery."""
    from plnlp_tpu.cli import argument, run_experiment, run_scoring

    ck = str(tmp_path / "ck")
    base = [
        "--data_name=synthetic:hits-sbm:num_nodes=600,num_edges=6000",
        "--epochs=1", "--eval_steps=1", "--runs=1", "--batch_size=256",
        "--emb_hidden_channels=16", "--gnn_hidden_channels=16",
        "--mlp_hidden_channels=16", "--adj_backend=hybrid",
        "--tile_min_fill=4", "--block_rows=8", "--block_edges=32",
        f"--checkpoint_dir={ck}", "--checkpoint_every=1",
    ]
    run_experiment(argument(base), log=lambda *_: None)
    pairs = rng.integers(0, 600, (17, 2)).astype(np.int64)
    pin = str(tmp_path / "pairs.npy")
    np.save(pin, pairs)
    scores = run_scoring(
        argument(base + [f"--score_pairs={pin}",
                         f"--score_out={tmp_path / 's.npy'}"]),
        log=lambda *_: None,
    )
    assert scores.shape == (17,) and np.isfinite(scores).all()


# --- round 4: Pallas fused tile kernel + int8 tile storage ------------------


def test_tile_matmul_kernel_interpret_parity(rng):
    """The fused block-sparse kernel (interpret mode on CPU) must match the
    per-tile matmul reference on covered row tiles; uncovered row tiles are
    undefined by contract (masked by row_mask in _tile_pass)."""
    from plnlp_tpu.ops.pallas_tiles import tile_matmul

    T, D, nR, nC, nt = 128, 128, 5, 5, 9
    trow = np.sort(rng.integers(0, nR - 1, nt)).astype(np.int32)
    tcol = rng.integers(0, nC, nt).astype(np.int32)
    vals = rng.standard_normal((nt, T, T)).astype(np.float32)
    x_tiles = rng.standard_normal((nC, T, D)).astype(np.float32)
    out = np.asarray(
        tile_matmul(
            jnp.asarray(vals), jnp.asarray(trow), jnp.asarray(tcol),
            jnp.asarray(x_tiles), nR, interpret=True,
        )
    ).reshape(nR, T, D)
    expect = np.zeros((nR, T, D), np.float32)
    for i in range(nt):
        expect[trow[i]] += vals[i] @ x_tiles[tcol[i]]
    covered = np.zeros(nR, bool)
    covered[trow] = True
    assert not covered.all()  # the contract under test includes a hole
    np.testing.assert_allclose(
        out[covered], expect[covered], rtol=1e-4, atol=1e-4
    )


def test_tile_matmul_int8_vals_interpret(rng):
    """int8-stored tiles cast to the compute dtype inside the kernel."""
    from plnlp_tpu.ops.pallas_tiles import tile_matmul

    T, D, nR, nC, nt = 128, 128, 3, 3, 4
    trow = np.sort(rng.integers(0, nR, nt)).astype(np.int32)
    tcol = rng.integers(0, nC, nt).astype(np.int32)
    vals = rng.integers(-3, 4, (nt, T, T)).astype(np.int8)
    x_tiles = rng.standard_normal((nC, T, D)).astype(np.float32)
    out = np.asarray(
        tile_matmul(
            jnp.asarray(vals), jnp.asarray(trow), jnp.asarray(tcol),
            jnp.asarray(x_tiles), nR, interpret=True,
        )
    ).reshape(nR, T, D)
    expect = np.zeros((nR, T, D), np.float32)
    for i in range(nt):
        expect[trow[i]] += vals[i].astype(np.float32) @ x_tiles[tcol[i]]
    covered = np.zeros(nR, bool)
    covered[trow] = True
    np.testing.assert_allclose(
        out[covered], expect[covered], rtol=1e-4, atol=1e-4
    )


def test_hybrid_pallas_path_end_to_end_interpret(rng, monkeypatch):
    """Route _tile_pass through the Pallas kernel (interpret mode) and check
    full hybrid_spmm fwd+grad parity vs the segment oracle — exercises the
    row_mask zeroing of uncovered row tiles and the custom VJP."""
    import functools

    import plnlp_tpu.ops.pallas_tiles as pt
    from plnlp_tpu.ops.spmm import spmm_segment as oracle

    orig = pt.tile_matmul
    monkeypatch.setattr(
        pt, "tile_pallas_supported", lambda t, d: t % 128 == 0 and d % 128 == 0
    )
    monkeypatch.setattr(
        pt, "tile_matmul", functools.partial(orig, interpret=True)
    )

    n, d = 300, 128
    # sparse background + one dense 128x128 corner block: min_fill between
    # the two fills guarantees a genuine dense/residual mix
    s_bg, d_bg, _ = random_graph_np(rng, n, 800, weighted=False)
    s_blk = rng.integers(0, 128, 600)
    d_blk = rng.integers(0, 128, 600)
    src = np.concatenate([s_bg, s_blk])
    dst = np.concatenate([d_bg, d_blk])
    w = rng.uniform(0.2, 1.5, len(src)).astype(np.float32)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=128, min_fill=400, block=(8, 32)
    )
    assert hg.dense_edges > 0 and hg.res_edges > 0  # a genuine mix
    assert hg.row_mask is not None  # uncovered row tiles exist -> mask path
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    out = hybrid_spmm(hg, x, "sum")
    expect = oracle(g, x, "sum")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4
    )
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(hybrid_spmm(hg, x, "sum"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(oracle(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
    )


def test_hybrid_int8_store_for_integer_weights(rng):
    """Unweighted/integer-weighted graphs store tiles int8 (exact); float
    weights keep the compute dtype.  Parity holds either way."""
    from plnlp_tpu.ops.spmm import spmm_segment as oracle

    n, d = 120, 16
    src, dst, _ = random_graph_np(rng, n, 900, weighted=False)
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(src, dst, None, num_nodes=n, tile=16, min_fill=2,
                      block=(8, 32))
    assert hg.tile_vals.dtype == jnp.int8
    assert hg.tile_vals_t.dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hybrid_spmm(hg, x, "sum")),
        np.asarray(oracle(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )

    wf = rng.uniform(0.1, 2.0, len(src)).astype(np.float32)
    hg_f = build_hybrid(src, dst, wf, num_nodes=n, tile=16, min_fill=2,
                        block=(8, 32))
    assert hg_f.tile_vals.dtype == jnp.float32


def test_hybrid_zero_qualifying_tiles_static_shapes(rng):
    """min_fill beyond any tile's fill: the single zero filler tile keeps
    shapes static and contributes nothing."""
    n, d = 80, 8
    src, dst, w = random_graph_np(rng, n, 400, weighted=True)
    from plnlp_tpu.ops.spmm import spmm_segment as oracle

    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(src, dst, w, num_nodes=n, tile=16, min_fill=10**9,
                      block=(8, 32))
    assert hg.dense_edges == 0
    assert hg.tile_row.shape == (1,)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hybrid_spmm(hg, x, "sum")),
        np.asarray(oracle(g, x, "sum")),
        rtol=1e-4, atol=1e-5,
    )


def test_hybrid_pallas_odd_feature_dim_pads(rng, monkeypatch):
    """Feature dims off the 128-lane boundary (citation2's 200) pad up,
    run the kernel, and slice back — parity vs the oracle."""
    import functools

    import plnlp_tpu.ops.pallas_tiles as pt
    from plnlp_tpu.ops.spmm import spmm_segment as oracle

    orig = pt.tile_matmul
    monkeypatch.setattr(
        pt, "tile_pallas_supported", lambda t, d: t % 128 == 0 and d % 128 == 0
    )
    monkeypatch.setattr(
        pt, "tile_matmul", functools.partial(orig, interpret=True)
    )
    n, d = 300, 72  # pads to 128
    src, dst, w = random_graph_np(rng, n, 2500, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=128, min_fill=4, block=(8, 32)
    )
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hybrid_spmm(hg, x, "sum")),
        np.asarray(oracle(g, x, "sum")),
        rtol=1e-4, atol=1e-4,
    )


# --- round 4: block-sparse attention (hybrid TransformerConv) ---------------


@pytest.mark.parametrize("min_fill", [1, 3, 10**9])
def test_hybrid_transformer_matches_segment(rng, min_fill):
    """hybrid_transformer_conv == the per-edge segment TransformerConv
    across fill regimes (all-dense / mixed / all-residual), values and
    input gradients, through apply_encoder's 2-layer stack."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 150, 16
    src, dst, _ = random_graph_np(rng, n, 1200)
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=min_fill,
        block=(8, 32), reorder="labelprop",
    )
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, d, 2)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    ref = apply_encoder(params, "TRANSFORMER", g, x)
    out = apply_encoder(params, "TRANSFORMER", hg, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    cot = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    gr = jax.grad(
        lambda x: jnp.vdot(apply_encoder(params, "TRANSFORMER", g, x), cot)
    )(x)
    gh = jax.grad(
        lambda x: jnp.vdot(apply_encoder(params, "TRANSFORMER", hg, x), cot)
    )(x)
    np.testing.assert_allclose(
        np.asarray(gh), np.asarray(gr), rtol=1e-4, atol=1e-5
    )


def test_hybrid_transformer_param_grads_match(rng):
    """q/k/v/skip projection gradients flow correctly through the
    two-pass tile softmax (stop_gradient only on the max)."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 120, 8
    src, dst, _ = random_graph_np(rng, n, 900)
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=3, block=(8, 32),
        reorder="labelprop",
    )
    params = init_encoder(jax.random.PRNGKey(1), "TRANSFORMER", d, d, 1)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    pr = jax.grad(
        lambda p: jnp.vdot(apply_encoder(p, "TRANSFORMER", g, x), cot)
    )(params)
    ph = jax.grad(
        lambda p: jnp.vdot(apply_encoder(p, "TRANSFORMER", hg, x), cot)
    )(params)
    for (kp, a), b in zip(
        jax.tree_util.tree_flatten_with_path(pr)[0],
        jax.tree_util.tree_leaves(ph),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_hybrid_transformer_chunked_scan(rng, monkeypatch):
    """More tiles than the scan chunk exercises the padded multi-chunk
    path (zero filler tiles must contribute nothing to max or sum)."""
    import plnlp_tpu.ops.tile_attention as ta
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    monkeypatch.setattr(ta, "_ATTN_CHUNK", 3)
    n, d = 100, 8
    src, dst, _ = random_graph_np(rng, n, 800)
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(src, dst, None, num_nodes=n, tile=8, min_fill=1,
                      block=(8, 16))
    assert hg.num_tiles > 6  # multiple chunks + padding
    params = init_encoder(jax.random.PRNGKey(2), "TRANSFORMER", d, d, 1)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(apply_encoder(params, "TRANSFORMER", hg, x)),
        np.asarray(apply_encoder(params, "TRANSFORMER", g, x)),
        rtol=1e-4, atol=1e-5,
    )


def test_hybrid_multilevel_reorder_matches_segment(rng):
    """reorder='multilevel' (coarse-graph merge over label-prop fragments)
    is value-neutral exactly like 'labelprop': the perm sandwich is pure
    relayout.  fwd, mean reduce, and gradient vs the oracle."""
    n, d = 120, 8
    src, dst, w = random_graph_np(rng, n, 900, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    hg = build_hybrid(
        src, dst, w, num_nodes=n, tile=16, min_fill=3, block=(8, 32),
        reorder="multilevel",
    )
    assert hg.perm_in is not None and hg.reorder == "multilevel"
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    for reduce in ("sum", "mean"):
        np.testing.assert_allclose(
            np.asarray(hybrid_spmm(hg, x, reduce)),
            np.asarray(spmm_segment(g, x, reduce)),
            rtol=1e-4, atol=1e-5, err_msg=reduce,
        )
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gx = jax.grad(lambda x: jnp.vdot(hybrid_spmm(hg, x, "sum"), cot))(x)
    gx_ref = jax.grad(lambda x: jnp.vdot(spmm_segment(g, x, "sum"), cot))(x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )


def test_multilevel_order_contiguity_and_merge():
    """multilevel_order is a permutation; every fine label-prop community
    stays contiguous (each fine label maps to exactly ONE merged label, and
    the (merged, fine) lexsort never splits it); and on a graph built so
    label-prop fragments — two cliques bridged by a single edge converge to
    two labels — the coarse pass merges fragments that share most edges."""
    from plnlp_tpu.ops.tile_spmm import (
        _label_prop_labels, label_prop_order, multilevel_order,
    )

    rng = np.random.default_rng(3)
    # 8 cliques of 12; cliques 2k and 2k+1 heavily bridged (true community
    # = the PAIR), but label-prop seeds per-clique and stalls there
    n, k = 96, 12
    src, dst = [], []
    for c in range(8):
        lo = c * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(lo + i)
                dst.append(lo + j)
    for c in range(4):  # bridge each pair with k//2 edges
        lo = 2 * c * k
        for i in range(k // 2):
            src.append(lo + i)
            dst.append(lo + k + i)
    src, dst = np.asarray(src), np.asarray(dst)
    order = multilevel_order(src, dst, n)
    assert sorted(order.tolist()) == list(range(n))  # permutation
    lab0 = _label_prop_labels(src, dst, n, 20)
    slot = np.empty(n, np.int64)
    slot[order] = np.arange(n)
    for lab in np.unique(lab0):
        s = np.sort(slot[lab0 == lab])
        assert np.array_equal(s, np.arange(s[0], s[0] + len(s))), (
            f"fine community {lab} split across slots"
        )
    # merged locality: bridged clique pairs are adjacent in slot space —
    # every within-pair slot distance is < the pair width (2k)
    for c in range(4):
        pair = np.arange(2 * c * k, 2 * (c + 1) * k)
        ss = slot[pair]
        assert ss.max() - ss.min() == 2 * k - 1, (
            f"pair {c} not contiguous: spread {ss.max() - ss.min()}"
        )


def test_multilevel_coverage_not_worse_than_labelprop():
    """On a fragmented-community SBM, tile coverage under multilevel is
    within noise of plain labelprop or better (the merge moves fragments
    next to the fragments they share edges with; when labelprop already
    converged, merged labels only shift tile-boundary OFFSETS — measured
    jitter < 0.1%)."""
    from plnlp_tpu.data.synthetic import make_sbm_graph
    from plnlp_tpu.graph import _csr_np, _pad_to
    from plnlp_tpu.ops.tile_spmm import label_prop_order, multilevel_order

    n, e, T, min_fill = 4000, 30000, 32, 8
    src, dst = make_sbm_graph(
        np.random.default_rng(5), n, e, num_communities=100
    )
    csr = _csr_np(src, dst, None, n, True, True, 1)
    ne = csr["num_edges"]
    s = csr["senders"][:ne].astype(np.int64)
    d = csr["receivers"][:ne].astype(np.int64)

    def coverage(order):
        node_map = np.empty(n, np.int64)
        node_map[order] = np.arange(n)
        es_, ed_ = node_map[s], node_map[d]
        nC = _pad_to(n, T) // T
        key = (ed_ // T) * nC + (es_ // T)
        _, counts = np.unique(key, return_counts=True)
        return counts[counts >= min_fill].sum() / ne

    cov_lp = coverage(label_prop_order(s, d, n))
    cov_ml = coverage(multilevel_order(s, d, n))
    assert cov_ml >= cov_lp - 0.01, (cov_ml, cov_lp)


def test_estimate_hybrid_matches_build(rng):
    """estimate_hybrid predicts EXACTLY what build_hybrid then builds
    (same coverage, same tile count) and its order, passed back via
    build_hybrid(order=...), reproduces the full structure bit-for-bit."""
    from plnlp_tpu.data.synthetic import make_sbm_graph
    from plnlp_tpu.ops.tile_spmm import estimate_hybrid

    n = 600
    src, dst = make_sbm_graph(rng, n, 4000, num_communities=20)
    est = estimate_hybrid(
        src, dst, num_nodes=n, tile=32, min_fill=8, reorder="labelprop"
    )
    assert 0.0 < est["coverage"] <= 1.0 and est["order"] is not None
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=32, min_fill=8, block=(8, 32),
        reorder="labelprop",
    )
    total = hg.dense_edges + hg.res_edges
    assert est["num_edges"] == total
    assert est["num_tiles"] == hg.num_tiles
    assert est["coverage"] == pytest.approx(hg.dense_edges / total)
    hg2 = build_hybrid(
        src, dst, None, num_nodes=n, tile=32, min_fill=8, block=(8, 32),
        reorder="labelprop", order=est["order"],
    )
    np.testing.assert_array_equal(
        np.asarray(hg.tile_vals), np.asarray(hg2.tile_vals)
    )
    np.testing.assert_array_equal(
        np.asarray(hg.perm_in), np.asarray(hg2.perm_in)
    )
    assert hg2.dense_edges == hg.dense_edges


def test_estimate_hybrid_low_on_random_graph(rng):
    """A sparse uniform-random graph has no community structure for the
    reorder to recover: estimated coverage stays far below the auto
    threshold (this is the power-law/random kill-list regime)."""
    from plnlp_tpu.ops.tile_spmm import estimate_hybrid

    n, e = 4000, 6000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    est = estimate_hybrid(
        src, dst, num_nodes=n, tile=16, min_fill=8, reorder="labelprop"
    )
    assert est["coverage"] < 0.3, est
