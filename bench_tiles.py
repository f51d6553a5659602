"""A/B harness for the tile-density hybrid SpMM (VERDICT r2 directive #2).

Interleaved A/B at collab scale: blocked-CSR SpMM (the production sparse
path) vs the hybrid dense-tile + residual SpMM (ops/tile_spmm.py) on

* an SBM graph (community structure — the case tiles exist for), with the
  node order (a) raw/random, (b) BFS-reordered, (c) oracle community-sorted;
* the skewed power-law generator with a degree-sort reorder (hub-hub
  corner density).

Each JSON line reports wall time, edges/s, tile count and the dense-edge
fraction.  The go/no-go verdict lives in RESULTS.md (round 3).
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=236_000)
    ap.add_argument("--num_edges", type=int, default=1_300_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--min_fill", type=str, default="96,192,384")
    ap.add_argument("--communities", type=int, default=50)
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument(
        "--cases", type=str,
        default="sbm/raw,sbm/bfs,sbm/labelprop,sbm-dense/labelprop,"
        "skewed/raw,skewed/degsort",
        help="comma list; sbm-dense uses ~295-node communities (the "
        "memory-feasible tile regime)",
    )
    args = ap.parse_args()
    cases = set(args.cases.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from plnlp_tpu.data.synthetic import make_sbm_graph, make_skewed_graph
    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.ops.spmm import spmm_blocked
    from plnlp_tpu.ops.tile_spmm import build_hybrid, hybrid_spmm
    from plnlp_tpu.parallel.partition import _bfs_order

    rng = np.random.default_rng(0)
    n, e, d = args.num_nodes, args.num_edges, args.dim
    x = jax.random.normal(
        jax.random.PRNGKey(0), (n, d), jnp.dtype(args.dtype)
    )

    def timed(f, op, x):
        # the graph operand is a jit ARGUMENT (already on device), not a
        # closure capture — capturing multi-GB tile pytrees as lowering
        # constants stalls compilation for tens of minutes (measured)
        v, g = f(op, x)
        v, g = f(op, x + 0.0 * v)  # warm the eager chain
        float(v)
        t0 = time.time()
        xi = x
        for _ in range(args.iters):
            v, g = f(op, xi)
            xi = x + 0.0 * v
        float(v)
        return (time.time() - t0) / args.iters

    def run_case(name, src, dst):
        g, gt = prepare_graph(
            src, dst, None, num_nodes=n, symmetrize=True, block=(512, 512)
        )
        E = g.num_edges
        f_blocked = jax.jit(
            lambda op, x: jax.value_and_grad(
                lambda x: jnp.sum(spmm_blocked(op[0], op[1], x, "sum") ** 2)
            )(x)
        )
        dt_b = timed(f_blocked, (g, gt), x)
        print(
            json.dumps(
                {
                    "case": name,
                    "impl": "blocked",
                    "ms": round(dt_b * 1e3, 1),
                    "edges_per_sec": round(E * 2 / dt_b),
                }
            ),
            flush=True,
        )
        for mf in (int(v) for v in args.min_fill.split(",")):
            hg = build_hybrid(
                src, dst, None, num_nodes=n, tile=args.tile, min_fill=mf,
                symmetrize=True, block=(512, 512), dtype=args.dtype,
            )
            f_h = jax.jit(
                lambda op, x: jax.value_and_grad(
                    lambda x: jnp.sum(hybrid_spmm(op, x, "sum") ** 2)
                )(x)
            )
            dt_h = timed(f_h, hg, x)
            print(
                json.dumps(
                    {
                        "case": name,
                        "impl": f"hybrid(min_fill={mf})",
                        "ms": round(dt_h * 1e3, 1),
                        "edges_per_sec": round(E * 2 / dt_h),
                        "tiles": hg.num_tiles,
                        "dense_edge_frac": round(hg.dense_edges / E, 3),
                        "tile_mb": round(hg.num_tiles * args.tile**2 * 4 / 2**20),
                        "speedup_vs_blocked": round(dt_b / dt_h, 3),
                    }
                ),
                flush=True,
            )
            del hg, f_h

    def relabel(src, dst, order):
        """order[i] = old id at new position i -> new ids."""
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return inv[src], inv[dst]

    # --- SBM cases ---
    from plnlp_tpu.ops.tile_spmm import label_prop_order

    if cases & {"sbm/raw", "sbm/bfs", "sbm/labelprop"}:
        sbm_src, sbm_dst = make_sbm_graph(
            rng, n, e, num_communities=args.communities
        )
        if "sbm/raw" in cases:
            run_case("sbm/raw", sbm_src, sbm_dst)
        if "sbm/bfs" in cases:
            order = _bfs_order(sbm_src, sbm_dst, n)
            run_case("sbm/bfs", *relabel(sbm_src, sbm_dst, order))
        if "sbm/labelprop" in cases:
            t0 = time.time()
            order = label_prop_order(sbm_src, sbm_dst, n)
            print(json.dumps({"label_prop_seconds": round(time.time() - t0, 1)}))
            run_case("sbm/labelprop", *relabel(sbm_src, sbm_dst, order))

    if "sbm-dense/labelprop" in cases:
        # ~295-node communities: each community's intra edges land in a
        # handful of diagonal tiles — the regime where tile memory is sane
        d_src, d_dst = make_sbm_graph(
            rng, n, e, num_communities=max(n // 295, 1)
        )
        t0 = time.time()
        order = label_prop_order(d_src, d_dst, n)
        print(json.dumps({"label_prop_seconds": round(time.time() - t0, 1)}))
        run_case("sbm-dense/labelprop", *relabel(d_src, d_dst, order))

    # --- skewed case with degree-sort reorder (hub-hub corner) ---
    if cases & {"skewed/raw", "skewed/degsort"}:
        sk_src, sk_dst = make_skewed_graph(rng, n, e)
        if "skewed/raw" in cases:
            run_case("skewed/raw", sk_src, sk_dst)
        if "skewed/degsort" in cases:
            deg = np.bincount(np.concatenate([sk_src, sk_dst]), minlength=n)
            order = np.argsort(-deg, kind="stable")
            run_case("skewed/degsort", *relabel(sk_src, sk_dst, order))


if __name__ == "__main__":
    main()
