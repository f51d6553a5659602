"""Train -> checkpoint -> serve: the inference path the reference lacks.

Trains briefly on a synthetic graph with checkpointing enabled, then
restores the checkpoint into a `Scorer` (one cached full-graph encode) and
answers pair-scoring and top-k candidate-ranking queries:

    python examples/serving.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plnlp_tpu.cli import argument, prepare_experiment, run_experiment
from plnlp_tpu.serve import Scorer


def main():
    ckpt = tempfile.mkdtemp(prefix="plnlp_serve_")
    argv = [
        "--data_name=synthetic:hits:num_nodes=2000,num_edges=12000",
        "--epochs=5",
        "--eval_steps=5",
        "--runs=1",
        "--batch_size=4096",
        "--emb_hidden_channels=64",
        "--gnn_hidden_channels=64",
        "--mlp_hidden_channels=64",
        "--lr=0.01",
        f"--checkpoint_dir={ckpt}",
        "--checkpoint_every=5",
    ]
    run_experiment(argument(argv))

    # Rebuild the experiment surface (same graph + normalization) and
    # restore the trained params into a frozen scorer.
    exp = prepare_experiment(argument(argv), serving=True)
    scorer = Scorer.from_checkpoint(
        exp["model"], ckpt, exp["graph"], exp["graph_t"], exp["node_feats"]
    )

    pairs = np.array([[0, 1], [0, 1999], [5, 7]], dtype=np.int32)
    print("pair scores:", scorer.score(pairs))
    ids, scores = scorer.rank_candidates(src=0, k=5)
    print("top-5 candidates for node 0:", list(zip(ids.tolist(), scores.round(3))))


if __name__ == "__main__":
    main()
