"""CLI driver end-to-end on synthetic datasets (tiny epochs, CPU)."""

import numpy as np
import pytest

from plnlp_tpu.cli import (
    apply_dataset_surgery,
    argument,
    get_eval_edges,
    get_train_edges,
    prepare_experiment,
    run_experiment,
)
from plnlp_tpu.data import load_dataset, make_synthetic_dataset


def _args(**overrides):
    base = dict(
        data_name="synthetic:hits",
        epochs=2,
        eval_steps=1,
        runs=1,
        batch_size=512,
        emb_hidden_channels=16,
        gnn_hidden_channels=16,
        mlp_hidden_channels=16,
    )
    base.update(overrides)
    argv = [f"--{k}={v}" for k, v in base.items()]
    return argument(argv)


def test_flag_surface_matches_reference():
    """All 33 reference flags parse with reference defaults."""
    a = argument([])
    assert a.encoder == "SAGE" and a.predictor == "MLP"
    assert a.optimizer == "Adam" and a.loss_func == "AUC"
    assert a.neg_sampler == "global" and a.data_name == "ogbl-ddi"
    assert a.batch_size == 65536 and a.lr == 0.001
    assert a.epochs == 500 and a.runs == 10 and a.eval_steps == 5
    assert a.grad_clip_norm == 2.0 and a.num_neg == 1
    assert a.walk_length == 5 and a.year == -1
    assert a.train_node_emb is True and a.use_node_feats is False


def test_run_experiment_hits_smoke():
    loggers = run_experiment(_args(), log=lambda *_: None)
    assert "Hits@20" in loggers
    assert len(loggers["Hits@20"].results[0]) == 2  # 2 epochs, eval every 1


def test_run_experiment_mrr_smoke():
    loggers = run_experiment(
        _args(
            data_name="synthetic:mrr",
            eval_metric="mrr",
            neg_sampler="local",
            encoder="GCN",
            num_neg=3,
        ),
        log=lambda *_: None,
    )
    assert "MRR" in loggers


def test_run_experiment_rw_augment_smoke():
    loggers = run_experiment(
        _args(
            random_walk_augment=True,
            walk_length=3,
            loss_func="WeightedHingeAUC",
            gnn_num_layers=1,
            use_lr_decay=True,
            predictor="DOT",
        ),
        log=lambda *_: None,
    )
    assert "Hits@20" in loggers


@pytest.mark.parametrize("encoder", ["SAGE", "GCN", "WSAGE", "TRANSFORMER"])
def test_all_encoders_run(encoder):
    run_experiment(
        _args(encoder=encoder, epochs=1),
        log=lambda *_: None,
    )


@pytest.mark.parametrize(
    "predictor", ["DOT", "BIL", "MLP", "MLPDOT", "MLPBIL", "MLPCAT"]
)
def test_all_predictors_run(predictor):
    run_experiment(
        _args(predictor=predictor, epochs=1),
        log=lambda *_: None,
    )


def test_dense_backend_smoke():
    run_experiment(_args(adj_backend="dense", epochs=1), log=lambda *_: None)


def test_surgery_valedges_as_input():
    ds = make_synthetic_dataset("hits", weighted=True, with_year=True)
    args = _args(use_valedges_as_input=True, year=2005, data_name="ogbl-collab")
    out = apply_dataset_surgery(ds, args)
    se = out["split_edge"]
    n_train = len(ds["split_edge"]["train"]["edge"])
    # year filter applied first, then valid edges appended
    assert (se["train"]["year"] >= 2005).all()
    n_filtered = int((ds["split_edge"]["train"]["year"] >= 2005).sum())
    assert len(se["train"]["edge"]) == n_filtered + len(ds["split_edge"]["valid"]["edge"])
    # degree-normalized weights present and finite
    assert np.isfinite(se["train"]["weight"]).all()
    # adjacency includes validation edges (undirected)
    va = ds["split_edge"]["valid"]["edge"][0]
    adj_pairs = set(zip(out["adj_src"].tolist(), out["adj_dst"].tolist()))
    assert (va[0], va[1]) in adj_pairs and (va[1], va[0]) in adj_pairs


def test_surgery_gating_matches_reference():
    """Reference gates year filter AND use_valedges_as_input inside
    `data_name == 'ogbl-collab'` (main.py:112-130): on other ogbl-* names
    both flags are silent no-ops.  Non-OGB datasets keep the broader
    behavior (documented deviation, docs/MIGRATION.md)."""
    ds = make_synthetic_dataset("hits", weighted=True, with_year=True)

    # ogbl non-collab name: flags must be no-ops like the reference
    args = _args(use_valedges_as_input=True, year=2005, data_name="ogbl-ddi")
    out = apply_dataset_surgery(ds, args)
    np.testing.assert_array_equal(
        out["split_edge"]["train"]["edge"], ds["split_edge"]["train"]["edge"]
    )
    base = apply_dataset_surgery(
        ds, _args(data_name="ogbl-ddi", year=-1)
    )
    np.testing.assert_array_equal(out["adj_src"], base["adj_src"])
    np.testing.assert_array_equal(out["adj_dst"], base["adj_dst"])

    # non-OGB dataset (synthetic/npz): surgeries APPLY when keys exist
    args_c = _args(use_valedges_as_input=True, year=2005, data_name="synthetic:hits")
    out_c = apply_dataset_surgery(ds, args_c)
    n_filtered = int((ds["split_edge"]["train"]["year"] >= 2005).sum())
    assert len(out_c["split_edge"]["train"]["edge"]) == n_filtered + len(
        ds["split_edge"]["valid"]["edge"]
    )


def test_get_eval_edges_mrr_layout():
    ds = make_synthetic_dataset("mrr", neg_per_source=7)
    ee = get_eval_edges(ds["split_edge"], "valid")
    npos = len(ds["split_edge"]["valid"]["source_node"])
    assert ee["pos"].shape == (npos, 2)
    assert ee["neg"].shape == (npos * 7, 2)
    # negs repeat each source 7 times (utils.py:36-40 repeat_interleave)
    np.testing.assert_array_equal(
        ee["neg"][:7, 0], np.full(7, ee["pos"][0, 0])
    )


def test_train_on_subgraph_is_noop():
    """Reference quirk: flag accepted, does nothing (main.py:152-173)."""
    l1 = run_experiment(_args(seed=7), log=lambda *_: None)
    l2 = run_experiment(_args(seed=7, train_on_subgraph=True), log=lambda *_: None)
    np.testing.assert_allclose(
        l1["Hits@20"].results[0], l2["Hits@20"].results[0]
    )


def test_checkpoint_resume_cli(tmp_path):
    """Interrupt after run 0 and resume: epochs continue, results restored."""
    ck = str(tmp_path / "ck")
    run_experiment(
        _args(epochs=2, checkpoint_dir=ck, checkpoint_every=1, runs=1),
        log=lambda *_: None,
    )
    # resume: should detect completed state and re-run remaining (none for
    # run 0 epoch 2 -> starts at epoch 3 > epochs, so just finalizes)
    loggers = run_experiment(
        _args(epochs=2, checkpoint_dir=ck, checkpoint_every=1, runs=1, resume=True),
        log=lambda *_: None,
    )
    assert len(loggers["Hits@20"].results[0]) >= 2  # restored results present


def test_resume_matches_uninterrupted_run(tmp_path):
    """Epoch keys are positional (fold_in(seed, run, epoch)), so a run
    interrupted at epoch 2 and resumed reproduces the uninterrupted run's
    results EXACTLY — no replay of pre-interruption negative samples or
    shuffles (that replay was a real bug: a split-chain key restarted from
    PRNGKey(seed) on --resume)."""
    common = dict(epochs=4, runs=1, seed=11)
    full = run_experiment(_args(**common), log=lambda *_: None)

    ck = str(tmp_path / "ck")
    run_experiment(
        _args(epochs=2, checkpoint_dir=ck, checkpoint_every=2, runs=1, seed=11),
        log=lambda *_: None,
    )
    resumed = run_experiment(
        _args(checkpoint_dir=ck, resume=True, **common), log=lambda *_: None
    )
    assert resumed["Hits@20"].results[0] == full["Hits@20"].results[0]


def test_multi_run_resume_matches_uninterrupted(tmp_path):
    """Resume landing INSIDE run 1 of 2: later runs' init and epoch keys are
    positional too, so both runs' series match the uninterrupted protocol."""
    common = dict(epochs=2, runs=2, seed=5)
    full = run_experiment(_args(**common), log=lambda *_: None)

    ck = str(tmp_path / "ck")
    # checkpoint_every=3 fires once at run 1 epoch 1 (global step 3): the
    # interrupted run stops there via a small epochs trick is not possible
    # across runs, so emulate the interruption with a preemption signal.
    import os
    import signal

    from plnlp_tpu.resilience import Preempted

    def preempt_at_run1_epoch1(msg):
        if "Run: 02, Epoch: 01" in str(msg):
            os.kill(os.getpid(), signal.SIGTERM)

    with pytest.raises(Preempted):
        run_experiment(
            _args(checkpoint_dir=ck, checkpoint_every=99, **common),
            log=preempt_at_run1_epoch1,
        )
    resumed = run_experiment(
        _args(checkpoint_dir=ck, resume=True, **common), log=lambda *_: None
    )
    for k in full:
        assert resumed[k].results == full[k].results


def test_metrics_file_written(tmp_path):
    mf = str(tmp_path / "metrics.jsonl")
    run_experiment(_args(epochs=2, metrics_file=mf), log=lambda *_: None)
    import json

    lines = [json.loads(l) for l in open(mf)]
    assert len(lines) == 2
    assert {"run", "epoch", "loss", "agg_edges_per_sec"} <= set(lines[0])
    assert lines[0]["agg_edges_per_sec"] > 0


def test_log_steps_gates_printing():
    """Metric lines print only when epoch % log_steps == 0 (reference
    main.py:269); eval still happens every eval_steps."""
    lines = []
    loggers = run_experiment(
        _args(epochs=4, eval_steps=1, log_steps=2), log=lines.append
    )
    assert len(loggers["Hits@20"].results[0]) == 4  # eval every epoch
    printed = [l for l in lines if "Run: 01, Epoch:" in str(l)]
    assert printed and all("Epoch: 02" in l or "Epoch: 04" in l for l in printed)


def test_dense_threshold_auto_dispatch():
    """adj_backend=auto picks the dense backend at/below --dense_threshold
    nodes; above it, blocked CSR when the estimated tile coverage misses
    --tile_auto_coverage (forced here with an unreachable 1.5)."""
    from plnlp_tpu.cli import prepare_experiment
    from plnlp_tpu.dense import DenseAdj
    from plnlp_tpu.graph import Graph

    small = prepare_experiment(
        _args(adj_backend="auto", dense_threshold=5000)  # 2000 nodes <= 5000
    )
    assert isinstance(small["graph"], DenseAdj)
    big = prepare_experiment(
        _args(adj_backend="auto", dense_threshold=10, tile_auto_coverage=1.5)
    )
    assert isinstance(big["graph"], Graph)


def test_auto_backend_picks_hybrid_on_community_graph():
    """adj_backend=auto above the dense threshold estimates post-reorder
    tile coverage and picks the hybrid backend when it clears the
    threshold; the decision is logged with the estimate."""
    from plnlp_tpu.cli import prepare_experiment
    from plnlp_tpu.ops.tile_spmm import HybridGraph

    lines = []
    exp = prepare_experiment(
        _args(
            data_name="synthetic:hits-sbm",
            adj_backend="auto",
            dense_threshold=10,
            tile_size=64,
            tile_min_fill=16,
        ),
        log=lines.append,
    )
    assert isinstance(exp["graph"], HybridGraph)
    decision = [l for l in map(str, lines) if "auto backend" in l]
    assert decision and "-> hybrid" in decision[0], lines


def test_auto_backend_multichip_picks_tiled_partition():
    """adj_backend=auto with --num_shards: high estimated coverage turns
    the dense-tile sets on inside the partition (pg.tile > 0) — for ALL
    encoders since round 5: TRANSFORMER runs the distributed block-sparse
    attention over the per-shard tile sets (parallel.tile_transformer)."""
    from plnlp_tpu.cli import prepare_experiment

    common = dict(
        data_name="synthetic:hits-sbm",
        adj_backend="auto",
        dense_threshold=10,
        tile_size=64,
        tile_min_fill=4,
        num_shards=2,
    )
    lines = []
    exp = prepare_experiment(_args(**common), log=lines.append)
    assert exp["graph"].pg.tile > 0
    assert any("-> hybrid" in str(l) for l in lines), lines

    exp_t = prepare_experiment(
        _args(encoder="TRANSFORMER", **common), log=lambda *_: None
    )
    assert exp_t["graph"].pg.tile > 0


def test_auto_backend_threshold_boundary():
    """The auto decision at the --tile_auto_coverage boundary (round-5
    chip A/B: hybrid wins 1.13x at 0.40 measured coverage, so the
    default is 0.35): an estimate just above the threshold picks
    hybrid, just below picks csr — pinned by overriding the flag around
    the same graph's estimate."""
    from plnlp_tpu.cli import prepare_experiment
    from plnlp_tpu.ops.tile_spmm import estimate_hybrid

    common = dict(
        data_name="synthetic:hits-sbm",
        adj_backend="auto",
        dense_threshold=10,
        tile_size=64,
        tile_min_fill=4,
    )
    # measure this graph's estimate once through the same estimator
    from plnlp_tpu.data import load_dataset

    a = _args(**common)
    ds = load_dataset(a.data_name, a.data_path)
    tr = ds["split_edge"]["train"]["edge"]
    est = estimate_hybrid(
        tr[:, 0], tr[:, 1], num_nodes=ds["num_nodes"], tile=64,
        min_fill=4, symmetrize=True, reorder="labelprop",
    )
    assert est["coverage"] > 0.05  # SBM: meaningful coverage
    lo, hi = est["coverage"] * 0.9, est["coverage"] * 1.1
    exp = prepare_experiment(
        _args(tile_auto_coverage=lo, **common), log=lambda *_: None
    )
    from plnlp_tpu.ops.tile_spmm import HybridGraph

    assert isinstance(exp["graph"], HybridGraph)
    exp2 = prepare_experiment(
        _args(tile_auto_coverage=hi, **common), log=lambda *_: None
    )
    assert not isinstance(exp2["graph"], HybridGraph)


def test_auto_backend_serving_skips_estimation():
    """Serving mode resolves auto->csr without paying the reorder sweep
    (the Scorer encodes once, so aggregation throughput is irrelevant)."""
    from plnlp_tpu.cli import prepare_experiment

    lines = []
    exp = prepare_experiment(
        _args(
            data_name="synthetic:hits-sbm",
            adj_backend="auto",
            dense_threshold=10,
        ),
        log=lines.append,
        serving=True,
    )
    from plnlp_tpu.ops.tile_spmm import HybridGraph

    assert not isinstance(exp["graph"], HybridGraph)
    assert any("serving mode -> csr" in str(l) for l in lines), lines


def test_hybrid_relabel_mrr_layout_runs():
    """The hybrid id-space relabel (round 5) maps BOTH split layouts:
    the mrr (citation2-style) split carries source_node/target_node/
    target_node_neg arrays — a run over it must complete with finite
    MRR (guards _relabel_split_edge's key coverage)."""
    loggers = run_experiment(
        _args(
            data_name="synthetic:mrr-sbm:num_nodes=1000,num_edges=12000",
            eval_metric="mrr",
            adj_backend="hybrid",
            tile_size=64,
            tile_min_fill=4,
            epochs=2,
            batch_size=2048,
        ),
        log=lambda *_: None,
    )
    res = np.asarray(loggers["MRR"].results[0], np.float64)
    assert res.size > 0 and np.isfinite(res).all()


def test_auto_backend_hybrid_runs_end_to_end():
    """A 1-epoch training run completes on the auto-chosen hybrid backend
    (the order computed by the estimator is reused by build_hybrid)."""
    loggers = run_experiment(
        _args(
            data_name="synthetic:hits-sbm",
            adj_backend="auto",
            dense_threshold=10,
            tile_size=64,
            tile_min_fill=16,
            epochs=1,
        ),
        log=lambda *_: None,
    )
    assert "Hits@20" in loggers


def test_profile_dir_cli(tmp_path):
    """--profile_dir captures a trace of epoch 2 and the run completes; the
    per-op summary lands in the emitted log (or a graceful unavailable
    note, depending on the jax build)."""
    import os

    pd = str(tmp_path / "trace")
    lines = []
    run_experiment(_args(epochs=2, profile_dir=pd), log=lines.append)
    # the capture produced trace files (CPU traces may legitimately yield
    # zero device rows for the printed summary, so only the dir is asserted)
    files = [os.path.join(r, f) for r, _, fs in os.walk(pd) for f in fs]
    assert files, f"no trace files under {pd}"


def test_prng_impl_threefry():
    run_experiment(_args(epochs=1, prng_impl="threefry2x32"), log=lambda *_: None)


def test_reset_optimizer_multi_run():
    """--reset_optimizer gives run 2 a fresh optimizer (the reference
    carries Adam moments across runs, model.py:85-96); both modes complete
    and differ in run-2 trajectories."""
    l_carry = run_experiment(_args(runs=2, seed=9), log=lambda *_: None)
    l_reset = run_experiment(
        _args(runs=2, seed=9, reset_optimizer=True), log=lambda *_: None
    )
    # run 1 identical (same init, fresh optimizer either way)...
    assert l_carry["Hits@20"].results[0] == l_reset["Hits@20"].results[0]
    # ...run 2 diverges because carried Adam moments change the updates
    assert l_carry["Hits@20"].results[1] != l_reset["Hits@20"].results[1]


def test_res_dir_text_log(tmp_path):
    """--res_dir writes the reference's append-only text log: args line,
    param-count line, per-eval metric lines, final statistics
    (reference main.py:100-103,212-213,296-305)."""
    rd = str(tmp_path / "res")
    run_experiment(_args(res_dir=rd), log=lambda *_: None)
    import glob

    files = glob.glob(rd + "/log_*.txt")
    assert len(files) == 1
    text = open(files[0]).read()
    assert "data_name" in text  # args dump
    assert "Total number of model parameters is" in text
    assert "Highest Valid:" in text and "Final Test:" in text


@pytest.mark.parametrize("fmt", ["npy", "pt"])
def test_pretrain_emb_cli(tmp_path, fmt):
    """--pretrain_emb loads a .npy or torch-pickled table; with
    train_node_emb=False the table is used frozen (from_pretrained
    semantics, reference model.py:235-247)."""
    import jax
    import torch

    from plnlp_tpu.cli import prepare_experiment

    n = 300  # matches synthetic:hits default num_nodes
    table = np.random.default_rng(0).standard_normal((n, 12)).astype(np.float32)
    path = tmp_path / f"emb.{fmt}"
    if fmt == "npy":
        np.save(path, table)
    else:
        torch.save(torch.tensor(table), path)
    args = _args(
        data_name="synthetic:hits:num_nodes=300,num_edges=3000",
        pretrain_emb=str(path),
        train_node_emb=False,
        epochs=1,
    )
    exp = prepare_experiment(args)
    model = exp["model"]
    assert model.use_pretrained and model.emb_dim == 12
    params = model.init_params(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(params["emb"]), table)
    run_experiment(args, log=lambda *_: None)  # trains end-to-end


def test_sbm_dataset_learnable():
    """SBM synthetic graphs carry learnable structure: a few epochs should
    beat the untrained baseline clearly."""
    loggers = run_experiment(
        _args(data_name="synthetic:hits-sbm", epochs=10, eval_steps=10,
              predictor="DOT", emb_hidden_channels=32, lr=0.01,
              gnn_hidden_channels=32, mlp_hidden_channels=32),
        log=lambda *_: None,
    )
    valid, test = loggers["Hits@50"].results[0][-1]
    assert valid > 0.15  # random scoring gives ~Hits@50 ≈ 50/2000 ≈ 0.025


def test_ogb_loader_directory_format(tmp_path):
    """Loader reads the published OGB on-disk layout (fabricated here)."""
    import gzip
    import os

    import torch

    from plnlp_tpu.data.ogb import load_ogb_dataset

    base = tmp_path / "ogbl_fake"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "target").mkdir(parents=True)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    with gzip.open(base / "raw" / "edge.csv.gz", "wt") as f:
        for u, v in edges:
            f.write(f"{u},{v}\n")
    with gzip.open(base / "raw" / "num-node-list.csv.gz", "wt") as f:
        f.write("4\n")
    for name in ("train", "valid", "test"):
        torch.save(
            {"edge": torch.tensor(edges), "edge_neg": torch.tensor(edges[::-1].copy())},
            base / "split" / "target" / f"{name}.pt",
        )
    ds = load_ogb_dataset("ogbl-fake", str(tmp_path))
    assert ds["num_nodes"] == 4
    assert ds["edge_index"].shape == (2, 4)
    assert ds["split_edge"]["valid"]["edge_neg"].shape == (4, 2)


def test_no_eval_points_does_not_crash():
    """epochs < eval_steps -> zero eval points; summary must not crash."""
    loggers = run_experiment(_args(epochs=1, eval_steps=5), log=lambda *_: None)
    vm, vs, tm, ts = loggers["Hits@20"].summary()
    assert np.isnan(vm)


def test_use_node_feats_end_to_end():
    run_experiment(
        _args(
            data_name="synthetic:hits:num_node_feats=8",
            use_node_feats=True,
            epochs=1,
        ),
        log=lambda *_: None,
    )
    run_experiment(
        _args(
            data_name="synthetic:hits:num_node_feats=8",
            use_node_feats=True,
            train_node_emb=False,
            epochs=1,
        ),
        log=lambda *_: None,
    )


def test_walk_start_type_node():
    run_experiment(
        _args(
            random_walk_augment=True,
            walk_start_type="node",
            walk_length=2,
            epochs=1,
        ),
        log=lambda *_: None,
    )


def test_year_filter_without_weight_key():
    """A train split can carry 'year' without 'weight' — the year filter
    must not KeyError; unit weights are substituted."""
    loggers = run_experiment(
        _args(
            data_name="synthetic:hits:with_year=1",
            year=2005,
            epochs=1,
        ),
        log=lambda *_: None,
    )
    assert loggers["Hits@20"].results[0]


def test_surgery_use_coalesce():
    """--use_coalesce dedups the train pair set before weight normalization
    (reference main.py:140-141)."""
    ds = make_synthetic_dataset("hits", weighted=True, with_year=True)
    a1 = _args(use_valedges_as_input=True, data_name="ogbl-collab")
    a2 = _args(use_valedges_as_input=True, use_coalesce=True, data_name="ogbl-collab")
    out1 = apply_dataset_surgery(ds, a1)
    out2 = apply_dataset_surgery(ds, a2)
    e1 = out1["split_edge"]["train"]["edge"]
    e2 = out2["split_edge"]["train"]["edge"]
    # coalesced pair set has no duplicate (u,v) rows
    keys2 = e2[:, 0] * ds["num_nodes"] + e2[:, 1]
    assert len(np.unique(keys2)) == len(keys2)
    assert len(e2) <= len(e1)
    assert np.isfinite(out2["split_edge"]["train"]["weight"]).all()


def test_num_shards_cli_matches_single_device():
    """--num_shards=8 routes the SAME CLI command through GraphParallel
    (row-sharded mesh, sharded emb + optimizer moments); losses and metrics
    must match the single-device CLI run to fp-reduction tolerance
    (VERDICT round-1 item 4: multi-chip reachable from the product surface)."""
    common = dict(
        epochs=2,
        seed=3,
        batch_size=256,
        adj_backend="csr",
        block_rows=8,
        block_edges=128,
        dropout=0.0,
    )
    l1 = run_experiment(_args(**common), log=lambda *_: None)
    l8 = run_experiment(_args(num_shards=8, **common), log=lambda *_: None)
    for k in l1:
        r1 = np.asarray(l1[k].results[0], np.float64)
        r8 = np.asarray(l8[k].results[0], np.float64)
        assert r1.shape == r8.shape and r1.size > 0
        np.testing.assert_allclose(r1, r8, rtol=2e-3, atol=5e-3)  # atol: a few 1/1000-rank quanta may flip under reordered f32 reductions


def test_mesh_data_cli_matches_single_device():
    """--mesh_data=8 WITHOUT --num_shards builds a data-only mesh: training
    pair batches and eval chunks shard over 'data' (code-review round-2
    finding: the flag used to be silently ignored unless num_shards>1).
    Sharding is value-neutral, so losses/metrics match the plain run."""
    common = dict(
        epochs=2,
        seed=3,
        batch_size=256,
        adj_backend="csr",
        block_rows=8,
        block_edges=128,
        dropout=0.0,
    )
    l1 = run_experiment(_args(**common), log=lambda *_: None)
    l8 = run_experiment(_args(mesh_data=8, **common), log=lambda *_: None)
    for k in l1:
        r1 = np.asarray(l1[k].results[0], np.float64)
        r8 = np.asarray(l8[k].results[0], np.float64)
        assert r1.shape == r8.shape and r1.size > 0
        np.testing.assert_allclose(r1, r8, rtol=2e-3, atol=5e-3)  # atol: a few 1/1000-rank quanta may flip under reordered f32 reductions


def test_mesh_data_indivisible_batch_falls_back():
    """batch_size not divisible by the data axis: batches stay replicated
    (eval chunks still shard) — the run must complete and stay correct."""
    common = dict(
        epochs=1, seed=3, batch_size=100, adj_backend="csr",
        block_rows=8, block_edges=128, dropout=0.0,
    )
    l1 = run_experiment(_args(**common), log=lambda *_: None)
    l3 = run_experiment(_args(mesh_data=3, **common), log=lambda *_: None)
    for k in l1:
        np.testing.assert_allclose(
            np.asarray(l1[k].results[0], np.float64),
            np.asarray(l3[k].results[0], np.float64),
            rtol=2e-3, atol=2e-3,
        )


def test_num_shards_hybrid_transformer_matches_single_device():
    """--adj_backend=hybrid --num_shards=2 --encoder=TRANSFORMER: the
    distributed block-sparse attention (round 5, parallel.tile_transformer)
    reachable from the product surface, with metrics matching the
    single-device hybrid-attention CLI run."""
    common = dict(
        data_name="synthetic:hits-sbm:num_nodes=800,num_edges=8000",
        encoder="TRANSFORMER",
        adj_backend="hybrid",
        tile_size=64,
        tile_min_fill=4,
        epochs=2,
        seed=3,
        batch_size=256,
        block_rows=64,
        block_edges=256,
        dropout=0.0,
    )
    l1 = run_experiment(_args(**common), log=lambda *_: None)
    l2 = run_experiment(_args(num_shards=2, **common), log=lambda *_: None)
    for k in l1:
        r1 = np.asarray(l1[k].results[0], np.float64)
        r2 = np.asarray(l2[k].results[0], np.float64)
        assert r1.shape == r2.shape and r1.size > 0
        np.testing.assert_allclose(r1, r2, rtol=2e-3, atol=5e-3)


def test_num_shards_halo_cli_smoke():
    run_experiment(
        _args(
            num_shards=4,
            partition_comm="halo",
            epochs=1,
            batch_size=256,
            block_rows=8,
            block_edges=128,
        ),
        log=lambda *_: None,
    )


README_COMMANDS = {
    # reference README.md:24 — ogbl-ddi
    "ddi": "--emb_hidden_channels=512 --gnn_hidden_channels=512 "
    "--mlp_hidden_channels=512 --num_neg=3 --dropout=0.3",
    # README.md:31 — ogbl-collab (val as input)
    "collab": "--predictor=DOT --use_valedges_as_input=True --year=2010 "
    "--epochs=800 --eval_last_best=True --dropout=0.3",
    # README.md:35 — ogbl-collab (random walk aug.)
    "collab-rw": "--predictor=DOT --use_valedges_as_input=True --year=2010 "
    "--train_on_subgraph=True --epochs=800 --eval_last_best=True "
    "--dropout=0.3 --gnn_num_layers=1 --grad_clip_norm=1 "
    "--use_lr_decay=True --random_walk_augment=True --walk_length=10 "
    "--loss_func=WeightedHingeAUC",
    # README.md:40 — ogbl-citation2.  NOTE: the README writes
    # --use_node_feat (singular) but the flag is --use_node_feats
    # (reference main.py:47) — argparse rejects the README spelling
    # verbatim in the reference too; we test the corrected form.
    "citation2": "--use_node_feats=True --encoder=GCN "
    "--emb_hidden_channels=50 --mlp_hidden_channels=200 "
    "--gnn_hidden_channels=200 --grad_clip_norm=1 --eval_steps=1 "
    "--num_neg=3 --eval_metric=mrr --epochs=100 --neg_sampler=local",
}


@pytest.mark.parametrize("config", sorted(README_COMMANDS))
def test_readme_commands_translate_verbatim(config):
    """The reference README repro commands (README.md:24,31,35,40) parse
    flag-for-flag through our CLI and run end-to-end on a same-shaped
    synthetic dataset (epochs shrunk; all other flags untouched)."""
    from plnlp_tpu.cli import argument

    argv = README_COMMANDS[config].split()
    if config == "ddi":
        data = "synthetic:hits:num_nodes=300,num_edges=4000"
    elif config.startswith("collab"):
        data = "synthetic:hits:num_nodes=300,num_edges=4000,weighted=1,with_year=1"
    else:
        data = "synthetic:mrr:num_nodes=300,num_edges=4000,num_node_feats=16"
    argv = [f"--data_name={data}"] + argv
    args = argument(argv)
    # shrink the run for CI; every behavioral flag stays as the README set it
    args.epochs, args.runs, args.eval_steps, args.batch_size = 2, 1, 1, 512
    if config == "citation2":
        args.use_coalesce = False
    loggers = run_experiment(args, log=lambda *_: None)
    assert all(lg.results[0] for lg in loggers.values())


def test_block_rows_autotune_smoke():
    """--block_rows=0 autotunes on the actual graph (CPU: functional path)."""
    loggers = run_experiment(
        _args(adj_backend="csr", block_rows=0, epochs=1, batch_size=512),
        log=lambda *_: None,
    )
    assert all(lg.results[0] for lg in loggers.values())


def test_ogb_citation2_layout_end_to_end(tmp_path):
    """Fabricated ogbl-citation2 on-disk layout (directed edges, node feats,
    source/target/target_node_neg splits) through the FULL CLI pipeline:
    loader -> symmetrize -> GCN normalize -> train -> MRR eval."""
    import gzip

    import torch

    rng = np.random.default_rng(0)
    n, e, p, negs = 60, 400, 30, 20
    base = tmp_path / "ogbl_citation2"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "time").mkdir(parents=True)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    with gzip.open(base / "raw" / "edge.csv.gz", "wt") as f:
        for u, v in zip(src, dst):
            f.write(f"{u},{v}\n")
    with gzip.open(base / "raw" / "num-node-list.csv.gz", "wt") as f:
        f.write(f"{n}\n")
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    with gzip.open(base / "raw" / "node-feat.csv.gz", "wt") as f:
        for row in feats:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    torch.save(
        {
            "source_node": torch.tensor(src[:p].astype(np.int64)),
            "target_node": torch.tensor(dst[:p].astype(np.int64)),
        },
        base / "split" / "time" / "train.pt",
    )
    for name in ("valid", "test"):
        torch.save(
            {
                "source_node": torch.tensor(src[:p].astype(np.int64)),
                "target_node": torch.tensor(dst[:p].astype(np.int64)),
                "target_node_neg": torch.tensor(
                    rng.integers(0, n, (p, negs)).astype(np.int64)
                ),
            },
            base / "split" / "time" / f"{name}.pt",
        )

    args = _args(
        data_name="ogbl-citation2",
        data_path=str(tmp_path),
        use_node_feats=True,
        encoder="GCN",
        eval_metric="mrr",
        neg_sampler="local",
        num_neg=2,
        epochs=2,
        batch_size=64,
    )
    loggers = run_experiment(args, log=lambda *_: None)
    assert "MRR" in loggers and loggers["MRR"].results[0]
    for v, t in loggers["MRR"].results[0]:
        assert 0.0 <= v <= 1.0 and 0.0 <= t <= 1.0


def test_ogb_collab_layout_end_to_end(tmp_path):
    """Fabricated ogbl-collab on-disk layout (edge_weight.csv.gz +
    edge_year.csv.gz in raw/, year/weight keys in the split .pt files)
    through the FULL CLI pipeline with the README collab flags: loader ->
    year filter -> val-as-input + degree-normalized weights -> DOT/WSAGE ->
    Hits eval (reference README.md:31, main.py:112-150)."""
    import gzip

    import torch

    rng = np.random.default_rng(1)
    n, e = 80, 600
    base = tmp_path / "ogbl_collab"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "time").mkdir(parents=True)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    years = rng.integers(2000, 2012, e)
    weights = rng.integers(1, 5, e).astype(np.float32)
    with gzip.open(base / "raw" / "edge.csv.gz", "wt") as f:
        for u, v in zip(src, dst):
            f.write(f"{u},{v}\n")
    with gzip.open(base / "raw" / "num-node-list.csv.gz", "wt") as f:
        f.write(f"{n}\n")
    with gzip.open(base / "raw" / "edge_weight.csv.gz", "wt") as f:
        for w in weights:
            f.write(f"{w:.1f}\n")
    with gzip.open(base / "raw" / "edge_year.csv.gz", "wt") as f:
        for y in years:
            f.write(f"{y}\n")

    def split_dict(sl, with_neg):
        d = {
            "edge": torch.tensor(np.stack([src[sl], dst[sl]], 1).astype(np.int64)),
            "weight": torch.tensor(weights[sl]),
            "year": torch.tensor(years[sl].astype(np.int64)),
        }
        if with_neg:
            d["edge_neg"] = torch.tensor(
                rng.integers(0, n, (40, 2)).astype(np.int64)
            )
        return d

    torch.save(split_dict(slice(0, 400), False), base / "split" / "time" / "train.pt")
    torch.save(split_dict(slice(400, 500), True), base / "split" / "time" / "valid.pt")
    torch.save(split_dict(slice(500, 600), True), base / "split" / "time" / "test.pt")

    args = _args(
        data_name="ogbl-collab",
        data_path=str(tmp_path),
        predictor="DOT",
        use_valedges_as_input=True,
        year=2006,
        encoder="WSAGE",
        eval_last_best=True,
        epochs=2,
        batch_size=256,
    )
    loggers = run_experiment(args, log=lambda *_: None)
    assert loggers["Hits@50"].results[0]
    for v, t in loggers["Hits@50"].results[0]:
        assert 0.0 <= v <= 1.0 and 0.0 <= t <= 1.0


def test_serving_prepare_skips_training_only_work(monkeypatch):
    """prepare_experiment(serving=True): no on-device autotune sweep, no
    eval negative-set construction — serving startup must be encode-only."""
    import plnlp_tpu.tuning as tuning

    def boom(*a, **k):  # any autotune call in serving mode is a bug
        raise AssertionError("autotune ran in serving mode")

    monkeypatch.setattr(tuning, "autotune_block", boom)
    args = _args(adj_backend="csr", block_rows=0)
    exp = prepare_experiment(args, log=lambda *_: None, serving=True)
    assert exp["eval_edges"] is None
    assert args.block_rows == 512  # the non-autotuned default
    assert exp["model"] is not None and exp["graph"] is not None


def test_autotune_fallback_respects_node_count():
    """When every sweep candidate is skipped (R > num_nodes), the fallback
    must itself satisfy the constraint it enforced — not hard-code 512."""
    from plnlp_tpu.tuning import autotune_block

    rng = np.random.default_rng(3)
    src = rng.integers(0, 100, 400)
    dst = rng.integers(0, 100, 400)
    r, b = autotune_block(src, dst, None, num_nodes=100, dim=8)
    assert r <= 100 and b == 512
    assert r == 64  # largest power of two <= 100


def test_mesh_data_indivisible_batch_warns():
    """Requested data parallelism must never be dropped silently: an odd
    batch under --mesh_data=2 runs unsharded and says so."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any swallowed warning -> failure
        with pytest.raises(UserWarning, match="UNSHARDED"):
            run_experiment(
                _args(mesh_data=2, batch_size=333, epochs=1),
                log=lambda *_: None,
            )


def test_eval_metric_mismatch_warns():
    """An mrr-layout dataset run without --eval_metric mrr evaluates as
    hits (reference flag-default parity) — but now warns loudly."""
    import warnings

    args = _args(data_name="synthetic:mrr", neg_sampler="local", epochs=1)
    with pytest.warns(UserWarning, match="eval_metric"):
        loggers = run_experiment(args, log=lambda *_: None)
    assert "Hits@20" in loggers  # flag default wins, as documented

    # with the flag passed, no metric warning
    args2 = _args(
        data_name="synthetic:mrr", neg_sampler="local", epochs=1,
        eval_metric="mrr",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        loggers2 = run_experiment(args2, log=lambda *_: None)
    assert "MRR" in loggers2


def test_mrr_quality_on_learnable_graph():
    """MRR-path quality check (the bench gate covers hits only): a short
    fixed-seed run on an SBM mrr dataset must rank true targets well above
    the random-negative floor (~0.09 MRR with 50 negatives per source).
    Calibrated: this config measures test MRR ≈ 0.53 at epoch 20 (0.69 by
    30); the 0.30 floor catches real learning regressions with margin."""
    args = _args(
        data_name="synthetic:mrr-sbm:num_nodes=2000,num_edges=30000,seed=5",
        eval_metric="mrr",
        neg_sampler="local",
        epochs=20,
        eval_steps=5,
        lr=0.003,
        batch_size=8192,
        emb_hidden_channels=64,
        gnn_hidden_channels=64,
        mlp_hidden_channels=64,
        num_neg=3,
        dropout=0.3,
        seed=0,
    )
    loggers = run_experiment(args, log=lambda *_: None)
    traj = np.asarray(loggers["MRR"].results[0])
    best_test = traj[traj[:, 0].argmax(), 1]
    assert best_test > 0.30, f"MRR quality floor: {traj}"


def test_hybrid_quality_on_learnable_graph():
    """End-to-end learning quality THROUGH the hybrid tile path (the bench
    quality gate runs the dense backend): adj_backend=auto on a learnable
    SBM must pick hybrid and train to well above the random floor.
    Calibrated: this config measures valid-selected test Hits@50 = 11.4%
    (valid 13.8%) — the 6% floor matches the bench gate's anchored
    threshold and catches tile-path learning regressions with margin."""
    lines = []
    args = _args(
        data_name="synthetic:hits-sbm:num_nodes=2000,num_edges=30000,seed=5",
        adj_backend="auto",
        dense_threshold=10,
        tile_size=64,
        tile_min_fill=16,
        epochs=20,
        eval_steps=5,
        lr=0.003,
        batch_size=8192,
        emb_hidden_channels=64,
        gnn_hidden_channels=64,
        mlp_hidden_channels=64,
        num_neg=3,
        dropout=0.3,
        seed=0,
    )
    loggers = run_experiment(args, log=lambda *a: lines.append(" ".join(map(str, a))))
    assert any("-> hybrid" in l for l in lines), lines
    traj = np.asarray(loggers["Hits@50"].results[0])
    best_test = traj[traj[:, 0].argmax(), 1]
    assert best_test > 0.06, f"hybrid-path quality floor: {traj}"
