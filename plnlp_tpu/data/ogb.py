"""Torch-free(ish) loader for on-disk OGB link-prediction datasets.

Replaces ogb.linkproppred.PygLinkPropPredDataset + get_edge_split (reference
main.py:74,95) by reading the published OGB directory layout directly:

    <root>/<ogbl_name>/
        raw/edge.csv.gz                 (E rows: "src,dst")
        raw/num-node-list.csv.gz        (single integer)
        raw/node-feat.csv.gz            (optional, N rows of floats)
        raw/edge_weight.csv.gz          (optional)
        raw/edge_year.csv.gz            (optional)
        split/<split_type>/{train,valid,test}.pt   (torch-pickled dicts)

The ``.pt`` split files are read via torch.load (torch-cpu is available in
the image); everything is converted to NumPy immediately.  There is NO
download path — OGB data must already be on disk (zero-egress environment);
otherwise use ``synthetic:*`` datasets.
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, Optional

import numpy as np

__all__ = ["load_ogb_dataset"]

_METRIC = {
    "ogbl-ddi": "hits",
    "ogbl-collab": "hits",
    "ogbl-ppa": "hits",
    "ogbl-citation2": "mrr",
    "ogbl-wikikg2": "mrr",
}

_DIRECTED = {"ogbl-citation2", "ogbl-wikikg2"}


def _read_csv_gz(path: str, dtype) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    try:
        # pandas parses citation2's 30M-row edge file in seconds where
        # np.loadtxt takes minutes.
        import pandas as pd

        return pd.read_csv(path, header=None, dtype=dtype).to_numpy()
    except ImportError:
        with gzip.open(path, "rt") as f:
            return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def _to_numpy(obj):
    """Recursively convert torch tensors inside split dicts to numpy."""
    try:
        import torch

        if isinstance(obj, torch.Tensor):
            return obj.cpu().numpy()
    except ImportError:
        pass
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def _load_split(split_dir: str) -> Dict:
    import torch

    out = {}
    for name in ("train", "valid", "test"):
        path = os.path.join(split_dir, f"{name}.pt")
        out[name] = _to_numpy(torch.load(path, map_location="cpu", weights_only=False))
    return out


def load_ogb_dataset(name: str, root: str = "dataset") -> Dict:
    dir_name = name.replace("-", "_")
    base = os.path.join(root, dir_name)
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"OGB dataset directory not found: {base}. This environment has "
            f"no network access — place the extracted OGB dataset there, or "
            f"use a synthetic dataset (--data_name synthetic:hits)."
        )
    raw = os.path.join(base, "raw")
    edge = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int64)
    if edge is None:
        raise FileNotFoundError(f"missing {raw}/edge.csv.gz")
    edge_index = edge.T  # (2, E)
    nn_list = _read_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), np.int64)
    num_nodes = int(nn_list.ravel()[0]) if nn_list is not None else int(edge.max()) + 1
    node_feat = _read_csv_gz(os.path.join(raw, "node-feat.csv.gz"), np.float32)
    ew = _read_csv_gz(os.path.join(raw, "edge_weight.csv.gz"), np.float32)
    edge_weight = ew.ravel().astype(np.float32) if ew is not None else None
    ey = _read_csv_gz(os.path.join(raw, "edge_year.csv.gz"), np.int64)
    edge_year = ey.ravel() if ey is not None else None

    split_root = os.path.join(base, "split")
    # sorted: os.listdir order is filesystem-dependent; a directory with
    # more than one split type must resolve identically on every machine.
    split_types = (
        sorted(os.listdir(split_root)) if os.path.isdir(split_root) else []
    )
    if not split_types:
        raise FileNotFoundError(f"missing split dir under {base}")
    split_edge = _load_split(os.path.join(split_root, split_types[0]))

    return {
        "name": name,
        "num_nodes": num_nodes,
        "node_feat": node_feat,
        "edge_index": edge_index,
        "edge_weight": edge_weight,
        "edge_year": edge_year,
        "split_edge": split_edge,
        "eval_metric": _METRIC.get(name, "hits"),
        "directed": name in _DIRECTED,
    }
