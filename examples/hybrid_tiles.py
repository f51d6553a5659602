"""The hybrid dense-tile SpMM backend on a community-structured graph.

The blocked-CSR sparse path is bound by the XLA row gather (~9 ns/row on
v5e — every edge pays one gathered row).  On graphs with tile-scale dense
communities, `--adj_backend=hybrid` reorders nodes by label-propagation
communities and runs the dense diagonal tiles as contiguous-read MXU
matmuls instead — measured 3.8× over blocked CSR at ogbl-collab scale (rounds 4-5: fused Pallas tile kernel + int8 storage + CLI id-space relabel)
(RESULTS.md round 3).  This example shows both the CLI flag and the
library objects, and prints the tile coverage the reorder achieved.

    python examples/hybrid_tiles.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plnlp_tpu.cli import argument, run_experiment
from plnlp_tpu.data.synthetic import make_sbm_graph
from plnlp_tpu.ops.tile_spmm import build_hybrid


def main():
    # --- library level: inspect what the reorder + tiling finds ---------
    rng = np.random.default_rng(0)
    n = 3000
    src, dst = make_sbm_graph(rng, n, 40000, num_communities=20)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=128, min_fill=32,
        symmetrize=True, block=(64, 128), reorder="labelprop",
    )
    total = hg.dense_edges + hg.res_edges
    print(
        f"label-prop reorder: {hg.num_tiles} dense {hg.tile}x{hg.tile} "
        f"tiles cover {hg.dense_edges}/{total} edges "
        f"({100 * hg.dense_edges / total:.0f}%); "
        f"{hg.res_edges} residual edges stay on the gather path"
    )
    assert hg.dense_edges / total > 0.5, "SBM communities should tile densely"

    # --- product level: the same thing through the CLI ------------------
    argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=3000,num_edges=40000",
        "--adj_backend=hybrid", "--tile_min_fill=32",
        "--block_rows=64", "--block_edges=128",
        "--epochs=3", "--eval_steps=1", "--runs=1", "--batch_size=8192",
        "--emb_hidden_channels=32", "--gnn_hidden_channels=32",
        "--mlp_hidden_channels=32", "--num_neg=3", "--dropout=0.3",
    ]
    loggers = run_experiment(argument(argv), log=lambda *_: None)
    traj = np.asarray(loggers["Hits@50"].results[0])
    best = traj[traj[:, 0].argmax()]
    print(
        f"hybrid backend Hits@50: valid {100 * best[0]:.1f}%, "
        f"test {100 * best[1]:.1f}%"
    )


if __name__ == "__main__":
    main()
