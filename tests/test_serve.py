"""Serving scorer: cached-encode pair scoring + candidate ranking +
checkpoint restore round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import build_graph
from plnlp_tpu.serve import Scorer
from plnlp_tpu.training import Model, ModelConfig
from tests.conftest import random_graph_np


def _setup(rng, n=80, e=500):
    src, dst, _ = random_graph_np(rng, n, e)
    g = build_graph(src, dst, None, num_nodes=n)
    cfg = ModelConfig(
        emb_hidden_channels=16, gnn_hidden_channels=16,
        mlp_hidden_channels=16, batch_size=64,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, g


def test_score_matches_model_test_path(rng):
    """Scorer.score == the eval loop's batch_predict over the same encode."""
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    pairs = rng.integers(0, 80, (37, 2)).astype(np.int32)
    got = sc.score(pairs)
    h = model._encode(params, g, None, None)
    expect = np.asarray(model.batch_predict(params, h, jnp.asarray(pairs)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    assert got.shape == (37,)


def test_unseen_node_resolves_to_mean_row(rng):
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    # -1 maps to the appended mean row (reference model.py:191-194)
    s_neg = sc.score(np.array([[-1, 3]], np.int32))
    h = np.asarray(sc.h)
    assert h.shape[0] == model.num_nodes + 1
    np.testing.assert_allclose(
        h[-1], h[:-1].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    assert np.isfinite(s_neg).all()


def test_rank_candidates_orders_by_score(rng):
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    ids, scores = sc.rank_candidates(5, k=7)
    assert len(ids) == 7 and len(scores) == 7
    assert (np.diff(scores) <= 1e-7).all()  # descending
    # the reported top-1 really is the argmax over all candidates
    all_pairs = np.stack(
        [np.full(80, 5), np.arange(80)], axis=1
    ).astype(np.int32)
    all_scores = sc.score(all_pairs)
    assert np.isclose(scores[0], all_scores.max())
    # explicit candidate subsets restrict the ranking
    subset = np.array([2, 4, 9], np.int32)
    ids_s, _ = sc.rank_candidates(5, candidates=subset, k=2)
    assert set(ids_s.tolist()) <= set(subset.tolist())


def test_rank_candidates_batch_matches_per_source(rng):
    """The fused multi-source pass returns exactly what per-source calls do."""
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    srcs = [0, 5, 17]
    ids_b, scores_b = sc.rank_candidates_batch(srcs, k=6)
    assert ids_b.shape == (3, 6) and scores_b.shape == (3, 6)
    assert (np.diff(scores_b, axis=1) <= 1e-7).all()  # rows descending
    # independent oracle: each row's top-k against raw flat scoring
    for i, s in enumerate(srcs):
        flat = sc.score(
            np.stack([np.full(80, s), np.arange(80)], 1).astype(np.int32)
        )
        want = np.argsort(-flat)[:6]
        np.testing.assert_allclose(scores_b[i], flat[want], rtol=1e-6)
        assert set(ids_b[i].tolist()) == set(want.tolist())


def _neighbors_of(g, s):
    indptr = np.asarray(g.indptr)
    return set(np.asarray(g.senders)[indptr[s] : indptr[s + 1]].tolist())


def test_exclude_edges_removes_known_neighbors(rng):
    """exclude_edges=True: a trained node's existing neighbors are absent
    from the top-k (the standard serving filter); other rankings intact."""
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    src = 5
    nbrs = _neighbors_of(g, src)
    assert nbrs, "test graph must give node 5 some neighbors"
    k = 20
    ids_x, scores_x = sc.rank_candidates(src, k=k, exclude_edges=True)
    assert not (set(ids_x.tolist()) & nbrs)
    assert np.isfinite(scores_x).all()  # 80 nodes >> deg + k
    # non-excluded ranking unchanged, and excluded == non-excluded with
    # neighbor entries dropped
    ids_a, scores_a = sc.rank_candidates(src, k=80)
    kept = [
        (i, s) for i, s in zip(ids_a.tolist(), scores_a.tolist())
        if i not in nbrs
    ][:k]
    np.testing.assert_array_equal(ids_x, [i for i, _ in kept])
    np.testing.assert_allclose(scores_x, [s for _, s in kept], rtol=1e-6)


def test_exclude_edges_with_candidate_subset(rng):
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    src = 5
    nbrs = sorted(_neighbors_of(g, src))
    non = [i for i in range(80) if i not in nbrs]
    subset = np.array(nbrs[:2] + non[:5], np.int32)
    ids, scores = sc.rank_candidates(
        src, candidates=subset, k=7, exclude_edges=True
    )
    # the 2 neighbor candidates rank LAST with -inf scores
    assert set(ids[:5].tolist()) == set(non[:5])
    assert np.isinf(scores[5:]).all() and (scores[5:] < 0).all()


def test_exclude_edges_dense_backend(rng):
    from plnlp_tpu.dense import prepare_dense
    from tests.conftest import random_graph_np

    src_e, dst_e, _ = random_graph_np(rng, 80, 500)
    dense = prepare_dense(src_e, dst_e, None, num_nodes=80)
    cfg = ModelConfig(
        emb_hidden_channels=16, gnn_hidden_channels=16,
        mlp_hidden_channels=16, batch_size=64,
    )
    model = Model(cfg, num_nodes=80)
    params = model.init_params(jax.random.PRNGKey(0))
    sc = Scorer(model, params, dense)
    adj = np.asarray(dense.adj)
    nbrs = set(np.nonzero(adj[5])[0].tolist())
    ids, _ = sc.rank_candidates(5, k=20, exclude_edges=True)
    assert not (set(ids.tolist()) & nbrs)


def test_from_checkpoint_round_trip(rng, tmp_path):
    model, params, g = _setup(rng)
    from plnlp_tpu.checkpoint import CheckpointManager

    opt_state = model.init_opt_state(params)
    CheckpointManager(str(tmp_path)).save(3, params, opt_state)
    sc = Scorer.from_checkpoint(model, str(tmp_path), g)
    pairs = rng.integers(0, 80, (11, 2)).astype(np.int32)
    np.testing.assert_allclose(
        sc.score(pairs), Scorer(model, params, g).score(pairs), rtol=1e-6
    )


def test_scorer_with_data_mesh(rng):
    """Scorer with a data-axis mesh shards query scoring like eval."""
    from plnlp_tpu.parallel import make_mesh

    model, params, g = _setup(rng)
    mesh = make_mesh(data=8, node=1)
    sc_plain = Scorer(model, params, g)
    sc_mesh = Scorer(model, params, g, mesh=mesh)
    pairs = rng.integers(0, 80, (41, 2)).astype(np.int32)
    np.testing.assert_allclose(
        sc_mesh.score(pairs), sc_plain.score(pairs), rtol=1e-6
    )


def test_cli_scoring_mode(rng, tmp_path):
    """--score_pairs: train with checkpoints, then score pairs from a .npy
    through the CLI serving mode."""
    from plnlp_tpu.cli import argument, run_experiment, run_scoring

    ck = str(tmp_path / "ck")
    base = dict(
        data_name="synthetic:hits", epochs=1, eval_steps=1, runs=1,
        batch_size=512, emb_hidden_channels=16, gnn_hidden_channels=16,
        mlp_hidden_channels=16, checkpoint_dir=ck, checkpoint_every=1,
    )
    argv = [f"--{k}={v}" for k, v in base.items()]
    run_experiment(argument(argv), log=lambda *_: None)

    pairs = rng.integers(0, 500, (23, 2)).astype(np.int64)
    pin = str(tmp_path / "pairs.npy")
    pout = str(tmp_path / "scores.npy")
    np.save(pin, pairs)
    scores = run_scoring(
        argument(argv + [f"--score_pairs={pin}", f"--score_out={pout}"]),
        log=lambda *_: None,
    )
    assert scores.shape == (23,) and np.isfinite(scores).all()
    np.testing.assert_allclose(np.load(pout), scores)


def test_rank_candidates_batch_chunked_matches_unchunked(rng, monkeypatch):
    """Source chunking (the OOM guard for citation2-scale C) is
    value-neutral: a 1-pair grid cap (per-source passes) returns exactly
    what the single fused grid returns."""
    model, params, g = _setup(rng)
    sc = Scorer(model, params, g)
    srcs = rng.integers(0, 80, 9).astype(np.int32)
    ids_a, sc_a = sc.rank_candidates_batch(srcs, k=7)
    monkeypatch.setattr(Scorer, "_MAX_GRID_PAIRS", 1)
    ids_b, sc_b = sc.rank_candidates_batch(srcs, k=7)
    assert ids_a.shape == ids_b.shape == (9, 7)
    np.testing.assert_allclose(sc_b, sc_a, rtol=1e-6)
    np.testing.assert_array_equal(ids_b, ids_a)


def test_factorized_grid_matches_pairwise(rng):
    """DOT/BIL/MLPDOT/MLPBIL rank through the one-matmul factorized grid
    (predictors.grid_scores) — scores must match the pairwise scorer."""
    src, dst, _ = random_graph_np(rng, 80, 500)
    g = build_graph(src, dst, None, num_nodes=80)
    srcs = rng.integers(0, 80, 9).astype(np.int32)
    cands = rng.permutation(80)[:33].astype(np.int32)
    for pred in ("DOT", "BIL", "MLPDOT", "MLPBIL", "MLP", "MLPCAT"):
        cfg = ModelConfig(
            emb_hidden_channels=16, gnn_hidden_channels=16,
            mlp_hidden_channels=16, batch_size=64, predictor=pred,
        )
        model = Model(cfg, num_nodes=80)
        params = model.init_params(jax.random.PRNGKey(0))
        sc = Scorer(model, params, g)
        ids, scores = sc.rank_candidates_batch(srcs, cands, k=5)
        # oracle: explicit pair scoring + host top-k
        grid = sc.score(
            np.stack(
                [np.repeat(srcs, len(cands)), np.tile(cands, len(srcs))], 1
            )
        ).reshape(len(srcs), len(cands))
        order = np.argsort(-grid, axis=1, kind="stable")[:, :5]
        np.testing.assert_allclose(
            scores, np.take_along_axis(grid, order, 1), rtol=1e-4,
            atol=1e-5, err_msg=pred,
        )


def test_grid_scores_factorization_coverage():
    """The factorized path covers exactly the factorizable predictors."""
    from plnlp_tpu.models.predictors import grid_scores, init_predictor

    h = jnp.asarray(np.random.default_rng(0).standard_normal((6, 8)), jnp.float32)
    for pred in ("DOT", "BIL", "MLPDOT", "MLPBIL"):
        p = init_predictor(jax.random.PRNGKey(0), pred, 8, 2)
        assert grid_scores(p, pred, h, h) is not None, pred
    for pred in ("MLP", "MLPCAT"):
        p = init_predictor(jax.random.PRNGKey(0), pred, 8, 2)
        assert grid_scores(p, pred, h, h) is None, pred
