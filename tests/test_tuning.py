"""Hyperparameter grid search over the full experiment protocol."""

import pytest

from plnlp_tpu.tuning import grid_search, random_search

from test_cli import _args


def test_grid_search_selects_best_valid():
    logs = []
    best, results = grid_search(
        _args(data_name="synthetic:hits:num_nodes=200,num_edges=2000"),
        {"lr": [1e-3, 1e-2], "num_neg": [1, 2]},
        log=logs.append,
    )
    assert len(results) == 4  # full cartesian product, sweep order
    assert [(r["lr"], r["num_neg"]) for r in results] == [
        (1e-3, 1), (1e-3, 2), (1e-2, 1), (1e-2, 2)
    ]
    # best is the argmax-valid entry of the results
    assert best == max(results, key=lambda r: r["valid"])
    assert {"valid", "valid_std", "test", "test_std"} <= set(best)
    assert len(logs) == 5  # one line per point + the best line


def test_grid_search_rejects_unknown_flag():
    with pytest.raises(ValueError, match="unknown CLI flag"):
        grid_search(_args(), {"not_a_flag": [1]}, log=None)


def test_random_search_samples_and_dedupes():
    base = _args(data_name="synthetic:hits:num_nodes=200,num_edges=2000")
    best, results = random_search(
        base, {"lr": [1e-3, 1e-2]}, num_trials=6, seed=1, log=None
    )
    # 6 draws from a 2-point space must collapse to <= 2 unique trials
    assert 1 <= len(results) <= 2
    assert len({r["lr"] for r in results}) == len(results)
    assert best == max(results, key=lambda r: r["valid"])
    with pytest.raises(ValueError, match="unknown CLI flag"):
        random_search(base, {"nope": [1]}, num_trials=1, log=None)
    with pytest.raises(ValueError, match="num_trials"):
        random_search(base, {"lr": [1e-3]}, num_trials=0, log=None)


def test_grid_search_metric_default_tracks_eval_metric():
    args = _args(
        data_name="synthetic:mrr:num_nodes=150,num_edges=1500",
        eval_metric="mrr",
        neg_sampler="local",
        num_neg=2,
        epochs=1,
    )
    best, results = grid_search(args, {"lr": [1e-3]}, log=None)
    assert len(results) == 1 and "valid" in best  # selected by MRR
