"""Multi-chip scaling harness for the partitioned SpMM (edges/s vs shards).

On a real multi-chip TPU slice this measures the north-star scaling metric
(BASELINE: ≥80% edges/s efficiency).  On a single-chip or CPU machine it
still runs — set JAX_PLATFORMS=cpu with
XLA_FLAGS=--xla_force_host_platform_device_count=N for a functional (not
performance-meaningful) check of the same code path.

Prints one JSON line per (shards, comm) configuration.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=235_000)
    ap.add_argument("--num_edges", type=int, default=1_285_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--comm", type=str, default="all_gather,halo")
    args = ap.parse_args()

    import os

    import jax

    # This box's sitecustomize force-registers the axon TPU platform OVER the
    # JAX_PLATFORMS=cpu env var; honor the env explicitly so the documented
    # forced-multi-CPU invocation actually lands on CPU devices.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from plnlp_tpu.data.synthetic import make_skewed_graph
    from plnlp_tpu.parallel import make_mesh
    from plnlp_tpu.parallel.graph_parallel import (
        GraphParallel,
        partitioned_spmm,
        shard_node_features,
    )
    from plnlp_tpu.parallel.partition import partition_graph, with_halo

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    src, dst = make_skewed_graph(rng, args.num_nodes, args.num_edges)

    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    base = None
    # Efficiency is only meaningful on real accelerator devices with a
    # 1-shard anchor; on a forced-multi-CPU host the "devices" share the same
    # cores and any efficiency figure is noise — emit null there so the
    # numbers can't be quoted as scaling results.
    platform = jax.devices()[0].platform
    efficiency_valid = platform == "tpu" and shard_counts[0] == 1
    if not efficiency_valid:
        print(
            json.dumps(
                {
                    "warning": "scaling_efficiency reported as null: "
                    f"platform={platform!r}, first_shards={shard_counts[0]} "
                    "(needs tpu devices and a 1-shard anchor)"
                }
            )
        )
    for comm in args.comm.split(","):
        for shards in shard_counts:
            pg = partition_graph(
                src, dst, None, num_nodes=args.num_nodes, num_shards=shards,
                block=(128, 512), symmetrize=True,
            )
            if comm == "halo":
                pg = with_halo(pg)
            mesh = make_mesh(data=1, node=shards)
            gp = GraphParallel(pg=pg, mesh=mesh, comm=comm)
            x = jnp.asarray(
                rng.standard_normal((args.num_nodes, args.dim)), jnp.float32
            )
            xs = shard_node_features(x, pg, mesh)

            f = jax.jit(
                jax.value_and_grad(
                    lambda x: jnp.sum(partitioned_spmm(gp, x, "sum") ** 2)
                )
            )
            v, g = f(xs)
            float(v)  # readback sync (block_until_ready lies on axon)
            t0 = time.time()
            for _ in range(args.iters):
                v, g = f(xs)
            float(v)
            float(jnp.sum(g))
            dt = (time.time() - t0) / args.iters
            edges_per_sec = 2 * args.num_edges * 2 / dt  # sym edges, fwd+bwd
            if shards == shard_counts[0]:
                base = edges_per_sec
            print(
                json.dumps(
                    {
                        "comm": comm,
                        "shards": shards,
                        "spmm_fwd_bwd_ms": round(dt * 1000, 1),
                        "edges_per_sec": round(edges_per_sec),
                        "scaling_efficiency": (
                            round(edges_per_sec / (base * shards), 3)
                            if efficiency_valid
                            else None
                        ),
                        "halo_quota": pg.halo_quota,
                        "halo_hubs": pg.halo_hubs,
                    }
                )
            )


if __name__ == "__main__":
    main()
