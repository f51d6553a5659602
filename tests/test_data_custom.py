"""Custom ``.npz`` dataset format: round-trip, validation, CLI parity.

The reference can only train on published OGB datasets (main.py:74-95);
``data/custom.py`` is the bring-your-own-graph entry point.  The strongest
check here: a synthetic dataset exported to ``.npz`` and re-loaded through
``--data_name npz:<path>`` must produce the EXACT same experiment results
as running on the original in-memory dataset.
"""

import numpy as np
import pytest

from plnlp_tpu.cli import run_experiment
from plnlp_tpu.data import (
    export_npz_dataset,
    load_dataset,
    load_npz_dataset,
    make_synthetic_dataset,
    save_npz_dataset,
)

from test_cli import _args


def _tree_equal(a, b, path=""):
    assert type(a) is type(b) or (
        isinstance(a, np.ndarray) and isinstance(b, np.ndarray)
    ), f"{path}: {type(a)} vs {type(b)}"
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} vs {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b, err_msg=path)
    else:
        assert a == b, f"{path}: {a} vs {b}"


def test_npz_round_trip_hits(tmp_path):
    ds = make_synthetic_dataset("hits", num_nodes=200, num_edges=2000, seed=3)
    p = str(tmp_path / "g.npz")
    save_npz_dataset(
        p,
        num_nodes=ds["num_nodes"],
        split_edge=ds["split_edge"],
        edge_index=ds["edge_index"],
        eval_metric="hits",
    )
    out = load_npz_dataset(p)
    assert out["num_nodes"] == ds["num_nodes"]
    assert out["eval_metric"] == "hits" and out["directed"] is False
    assert out["node_feat"] is None and out["edge_weight"] is None
    np.testing.assert_array_equal(out["edge_index"], ds["edge_index"])
    _tree_equal(
        {k: dict(v) for k, v in ds["split_edge"].items()},
        out["split_edge"],
    )


def test_npz_round_trip_mrr_with_extras(tmp_path):
    ds = make_synthetic_dataset(
        "mrr", num_nodes=150, num_edges=1500, num_node_feats=5, seed=4
    )
    weights = np.random.default_rng(0).uniform(
        0.5, 2.0, ds["edge_index"].shape[1]
    ).astype(np.float32)
    p = str(tmp_path / "g.npz")
    save_npz_dataset(
        p,
        num_nodes=ds["num_nodes"],
        split_edge=ds["split_edge"],
        edge_index=ds["edge_index"],
        node_feat=ds["node_feat"],
        edge_weight=weights,
        eval_metric="mrr",
        directed=True,
    )
    out = load_npz_dataset(p)
    assert out["eval_metric"] == "mrr" and out["directed"] is True
    np.testing.assert_array_equal(out["node_feat"], ds["node_feat"])
    np.testing.assert_array_equal(out["edge_weight"], weights)
    _tree_equal(
        {k: dict(v) for k, v in ds["split_edge"].items()},
        out["split_edge"],
    )


def test_npz_edge_index_derived_from_train_split(tmp_path):
    ds = make_synthetic_dataset("hits", num_nodes=100, num_edges=800, seed=5)
    p = str(tmp_path / "g.npz")
    save_npz_dataset(
        p, num_nodes=ds["num_nodes"], split_edge=ds["split_edge"]
    )
    out = load_npz_dataset(p)
    np.testing.assert_array_equal(
        out["edge_index"], ds["split_edge"]["train"]["edge"].T
    )


def test_npz_validation_errors(tmp_path):
    ds = make_synthetic_dataset("hits", num_nodes=100, num_edges=800, seed=6)
    bad = {k: dict(v) for k, v in ds["split_edge"].items()}
    del bad["valid"]["edge_neg"]
    with pytest.raises(ValueError, match="edge_neg"):
        save_npz_dataset(
            str(tmp_path / "a.npz"), num_nodes=ds["num_nodes"], split_edge=bad
        )
    with pytest.raises(ValueError, match="num_nodes"):
        save_npz_dataset(
            str(tmp_path / "b.npz"),
            num_nodes=5,  # train edges reference higher node ids
            split_edge=ds["split_edge"],
        )
    with pytest.raises(ValueError, match="eval_metric"):
        save_npz_dataset(
            str(tmp_path / "c.npz"),
            num_nodes=ds["num_nodes"],
            split_edge=ds["split_edge"],
            eval_metric="auc",
        )
    with pytest.raises(FileNotFoundError):
        load_npz_dataset(str(tmp_path / "missing.npz"))


def test_load_dataset_dispatches_npz(tmp_path):
    ds = make_synthetic_dataset("hits", num_nodes=100, num_edges=800, seed=7)
    p = str(tmp_path / "g.npz")
    save_npz_dataset(
        p, num_nodes=ds["num_nodes"], split_edge=ds["split_edge"]
    )
    for name in (f"npz:{p}", p):  # both the prefix and the bare .npz path
        out = load_dataset(name)
        assert out["num_nodes"] == ds["num_nodes"]


def test_export_round_trips_full_contract(tmp_path):
    """export_npz_dataset on a weighted, year-carrying dataset reproduces
    the whole contract dict — so the collab-style year filter and
    val-edges-as-input surgery run identically from the .npz."""
    ds = make_synthetic_dataset(
        "hits", num_nodes=150, num_edges=1200, seed=8,
        weighted=True, with_year=True, num_node_feats=4,
    )
    out = load_npz_dataset(export_npz_dataset(ds, str(tmp_path / "g.npz")))
    for k in ("num_nodes", "eval_metric", "directed"):
        assert out[k] == ds[k], k
    for k in ("edge_index", "node_feat", "edge_weight"):
        if ds.get(k) is None:
            assert out.get(k) is None, k
        else:
            np.testing.assert_array_equal(out[k], ds[k], err_msg=k)
    _tree_equal(
        {k: dict(v) for k, v in ds["split_edge"].items()},
        out["split_edge"],
    )


def test_converter_main(tmp_path):
    """python -m plnlp_tpu.data.custom <spec> <out.npz> round-trips."""
    from plnlp_tpu.data.custom import _main

    out = str(tmp_path / "conv.npz")
    _main(["synthetic:hits:num_nodes=120,num_edges=900", out])
    ds = load_npz_dataset(out)
    assert ds["num_nodes"] == 120 and "train" in ds["split_edge"]


def test_cli_npz_matches_in_memory_dataset(tmp_path):
    """Exporting the default synthetic:hits dataset and training from the
    .npz must reproduce the in-memory run exactly (same seeds, same
    arrays -> bit-identical logger results)."""
    ds = make_synthetic_dataset("hits")  # synthetic:hits defaults
    p = str(tmp_path / "hits.npz")
    save_npz_dataset(
        p,
        num_nodes=ds["num_nodes"],
        split_edge=ds["split_edge"],
        edge_index=ds["edge_index"],
    )
    ref = run_experiment(_args(), log=lambda *_: None)
    got = run_experiment(_args(data_name=f"npz:{p}"), log=lambda *_: None)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k].results), np.asarray(got[k].results), err_msg=k
        )


def test_synthetic_spec_num_communities():
    """The CLI spec can set the SBM community scale (round 4: lets the
    quality gates and benches pick the community regime the hybrid
    backend exists for).  More communities at fixed nodes/edges ->
    smaller, denser communities -> higher peak tile fill."""
    from plnlp_tpu.ops.tile_spmm import tile_stats

    small = load_dataset(
        "synthetic:hits-sbm:num_nodes=4000,num_edges=40000,seed=3,"
        "num_communities=20"
    )
    big = load_dataset(
        "synthetic:hits-sbm:num_nodes=4000,num_edges=40000,seed=3,"
        "num_communities=800"
    )
    assert small["num_nodes"] == big["num_nodes"] == 4000
    # community scale must actually differ: compare peak tile fill after
    # a community sort (tile_stats is order-sensitive, so sort by the
    # generator's own structure via a label-prop order).  MORE communities
    # at fixed nodes/edges = SMALLER, denser communities -> a 5-node
    # community's edges land inside one 64-wide tile, so peak fill rises.
    from plnlp_tpu.ops.tile_spmm import label_prop_order

    def max_fill(ds):
        src, dst = ds["edge_index"]
        order = label_prop_order(src, dst, ds["num_nodes"])
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        counts = tile_stats(inv[src], inv[dst], ds["num_nodes"], tile=64)
        return counts.max()

    assert max_fill(big) > max_fill(small)
