"""Multi-chip training demo on a VIRTUAL 8-device CPU mesh.

The same `--num_shards` flag drives a real TPU slice; here XLA fakes 8 CPU
devices so the full partitioned path (row-partitioned CSR, sharded
embedding table + optimizer moments, shard_map SpMM with all-gather or halo
comm) runs anywhere:

    python examples/multichip_cpu_mesh.py

On an actual v5e slice, drop the fake-device env and run the identical CLI
command — the mesh picks up the real chips.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Must be set BEFORE jax initializes. On a real slice, delete these two lines.
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
            "--data_name=synthetic:hits:num_nodes=4000,num_edges=30000",
            "--num_shards=8",          # row-partition the graph over 8 devices
            "--partition_comm=auto",   # halo vs all-gather by measured plan volume
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
