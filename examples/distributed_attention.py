"""Distributed block-sparse attention on a VIRTUAL 8-device CPU mesh.

`--adj_backend=hybrid --num_shards=N --encoder=TRANSFORMER` composes the
hybrid dense-tile operand with the row partition (round 5): each shard
runs flash-attention sweeps over its per-shard community tile set (local
Q tiles x the all-gathered K/V buffer) plus the blocked per-edge
residual, and the per-destination softmax closes shard-locally because
every destination row is wholly owned.  On TPU the sweeps are the fused
Pallas kernels (ops/pallas_attention.py); on this CPU demo mesh the
vectorized fallbacks run the same math.

    python examples/distributed_attention.py

On an actual v5e slice, delete the fake-device lines — the identical CLI
command picks up the real chips.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Must be set BEFORE jax initializes. On a real slice, delete these lines.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from plnlp_tpu.cli import argument, run_experiment


def main():
    args = argument(
        [
            # 16 communities -> dense diagonal tiles after the labelprop
            # slot assignment (community-contiguous AND edge-balanced)
            "--data_name=synthetic:hits-sbm:num_nodes=2000,"
            "num_edges=24000,num_communities=16",
            "--encoder=TRANSFORMER",
            "--adj_backend=hybrid",   # per-shard tile sets + blocked residual
            "--num_shards=8",
            "--tile_size=64",
            "--tile_min_fill=8",
            "--epochs=3",
            "--eval_steps=1",
            "--runs=1",
            "--batch_size=4096",
            "--emb_hidden_channels=32",
            "--gnn_hidden_channels=32",
            "--mlp_hidden_channels=32",
        ]
    )
    loggers = run_experiment(args)
    print("devices:", jax.device_count())
    print("final:", {k: lg.results[0][-1] for k, lg in loggers.items()})


if __name__ == "__main__":
    main()
