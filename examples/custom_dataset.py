"""Train on your own graph: export an edge list to the .npz dataset format
and run the full CLI experiment protocol on it.

The reference framework only trains on published OGB datasets (reference
main.py:74-95); plnlp_tpu accepts any graph through
``data.save_npz_dataset`` + ``--data_name npz:<path>``.  This example
fabricates a community graph from raw src/dst arrays — stand-ins for
whatever edge dump your production system produces — builds train/valid/
test splits with sampled negatives, saves one portable file, and trains
from it.

    python examples/custom_dataset.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plnlp_tpu.cli import argument, run_experiment
from plnlp_tpu.data import save_npz_dataset
from plnlp_tpu.data.synthetic import make_sbm_graph


def main():
    # --- your graph: any (src, dst) int arrays ---------------------------
    rng = np.random.default_rng(0)
    n = 2000
    src, dst = make_sbm_graph(rng, num_nodes=n, num_edges=12000, num_communities=4)
    edges = np.stack([src, dst], axis=1).astype(np.int64)
    rng.shuffle(edges, axis=0)

    # --- splits: 80/10/10 positives + uniform negative pools -------------
    e = len(edges)
    n_hold = e // 10
    split_edge = {
        "train": {"edge": edges[: e - 2 * n_hold]},
        "valid": {
            "edge": edges[e - 2 * n_hold : e - n_hold],
            "edge_neg": rng.integers(0, n, (2000, 2)).astype(np.int64),
        },
        "test": {
            "edge": edges[e - n_hold :],
            "edge_neg": rng.integers(0, n, (2000, 2)).astype(np.int64),
        },
    }

    path = os.path.join(tempfile.mkdtemp(), "mygraph.npz")
    save_npz_dataset(path, num_nodes=n, split_edge=split_edge)
    print(f"saved {path} ({os.path.getsize(path) // 1024} KiB)")

    # --- the full reference experiment protocol, from the file -----------
    args = argument([
        f"--data_name=npz:{path}",
        "--epochs=8", "--eval_steps=2", "--runs=1", "--batch_size=2048",
        "--emb_hidden_channels=64", "--gnn_hidden_channels=64",
        "--mlp_hidden_channels=64", "--num_neg=2",
    ])
    loggers = run_experiment(args, log=lambda *a: None)
    best_valid, final_test, _ = loggers["Hits@50"].best(run=0)
    print(f"Hits@50 from npz dataset: valid {best_valid:.1f} test {final_test:.1f}")


if __name__ == "__main__":
    main()
