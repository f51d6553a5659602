"""CLI driver — the reference's main.py re-built for TPU.

Flag surface mirrors reference main.py:16-66 one-to-one (all 33 flags, same
names/defaults) so the three README repro commands translate verbatim, plus
a few TPU-specific extras (--adj_backend, --block_rows/--block_edges,
--seed, --reset_optimizer).

Pipeline (reference main.py:69-305):
  load dataset → per-dataset graph surgery (citation2 symmetrize; collab
  year-filter / val-edges-as-input with degree-normalized train weights) →
  encoder-specific adjacency normalization → build device graph (dense or
  blocked CSR, chosen per graph) → multi-run train/eval protocol with
  Logger, optional per-epoch random-walk augmentation and linear LR decay.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.augment import random_walk_pairs
from plnlp_tpu.data import load_dataset
from plnlp_tpu.dense import prepare_dense
from plnlp_tpu.graph import (
    coalesce_edges,
    gcn_normalize_edges,
    prepare_graph,
    row_normalize_edges,
    to_undirected_edges,
)
from plnlp_tpu.logger import Logger
from plnlp_tpu.training import Model, ModelConfig, adjust_lr

__all__ = ["argument", "main", "run_experiment", "prepare_experiment"]


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def argument(argv=None):
    """All 33 reference flags (main.py:16-55) + TPU extras."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", type=str, default="SAGE")
    parser.add_argument("--predictor", type=str, default="MLP")
    parser.add_argument("--optimizer", type=str, default="Adam")
    parser.add_argument("--loss_func", type=str, default="AUC")
    parser.add_argument("--neg_sampler", type=str, default="global")
    parser.add_argument("--data_name", type=str, default="ogbl-ddi")
    parser.add_argument("--data_path", type=str, default="dataset")
    parser.add_argument("--eval_metric", type=str, default="hits")
    parser.add_argument("--walk_start_type", type=str, default="edge")
    parser.add_argument("--res_dir", type=str, default="")
    parser.add_argument("--pretrain_emb", type=str, default="")
    parser.add_argument("--gnn_num_layers", type=int, default=2)
    parser.add_argument("--mlp_num_layers", type=int, default=2)
    parser.add_argument("--emb_hidden_channels", type=int, default=256)
    parser.add_argument("--gnn_hidden_channels", type=int, default=256)
    parser.add_argument("--mlp_hidden_channels", type=int, default=256)
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--grad_clip_norm", type=float, default=2.0)
    parser.add_argument("--batch_size", type=int, default=64 * 1024)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--num_neg", type=int, default=1)
    parser.add_argument("--walk_length", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--log_steps", type=int, default=1)
    parser.add_argument("--eval_steps", type=int, default=5)
    parser.add_argument("--runs", type=int, default=10)
    parser.add_argument("--year", type=int, default=-1)
    parser.add_argument("--device", type=int, default=0)
    parser.add_argument("--use_lr_decay", type=str2bool, default=False)
    parser.add_argument("--use_node_feats", type=str2bool, default=False)
    parser.add_argument("--use_coalesce", type=str2bool, default=False)
    parser.add_argument("--train_node_emb", type=str2bool, default=True)
    # --train_on_subgraph is accepted for CLI parity but is a no-op, exactly
    # like the reference (code commented out at main.py:152-173).
    parser.add_argument("--train_on_subgraph", type=str2bool, default=False)
    parser.add_argument("--use_valedges_as_input", type=str2bool, default=False)
    parser.add_argument("--eval_last_best", type=str2bool, default=False)
    parser.add_argument("--random_walk_augment", type=str2bool, default=False)
    # --- TPU-native extras (no reference counterpart) ---
    parser.add_argument(
        "--adj_backend",
        type=str,
        default="auto",
        choices=["auto", "dense", "csr", "hybrid"],
        help="dense adjacency (MXU path, small graphs), blocked CSR, or "
        "hybrid dense-tile+CSR (label-prop reordered community tiles on "
        "the MXU, gather residual; 3.8x over blocked CSR on "
        "community-structured graphs — RESULTS.md rounds 4-5; all four "
        "encoders — TRANSFORMER runs block-sparse tile attention). "
        "'auto' picks dense below --dense_threshold nodes, then "
        "estimates post-reorder tile coverage (ops.tile_spmm."
        "estimate_hybrid — no tile build) and picks hybrid when it "
        "clears --tile_auto_coverage, blocked CSR otherwise",
    )
    parser.add_argument(
        "--tile_auto_coverage", type=float, default=0.35,
        help="adj_backend=auto: minimum estimated dense-tile edge "
        "coverage to choose the hybrid backend.  Default 0.35 from the "
        "round-5 chip A/B (RESULTS.md): hybrid still wins 1.13x at "
        "0.40 measured coverage, and below ~0.4 the labelprop reorder "
        "collapses on noisy graphs so estimates cliff to ~0 rather "
        "than landing in 0.1-0.3 — power-law graphs estimate ~0 and "
        "stay on blocked CSR (the round-3 kill list).  With "
        "--num_shards>1 the estimate is a GLOBAL single-shard proxy: "
        "the multichip build tiles per shard after the equal-edge "
        "range split, which can cut communities at shard boundaries, "
        "so actual per-shard coverage may land somewhat below the "
        "estimate near the threshold",
    )
    parser.add_argument(
        "--tile_min_fill", type=int, default=96,
        help="hybrid backend: minimum edges per tile to run it "
        "dense on the MXU; below that the edge stays on the gather path. "
        "Scale with tile area (~0.15%% fill): 96 at T=256, 384 at T=512",
    )
    parser.add_argument(
        "--tile_size", type=int, default=256,
        help="hybrid backend: dense tile edge length T (TxT tiles); 256 "
        "measured best at collab scale (finer tiles capture more edges at "
        "the same fill density — RESULTS.md round 4); shrink only for "
        "tiny test graphs",
    )
    parser.add_argument(
        "--tile_reorder", type=str, default="labelprop",
        choices=["labelprop", "multilevel", "none"],
        help="hybrid backend: locality reorder that concentrates edges "
        "into dense tiles.  'labelprop' = converged label propagation "
        "(20-round cap, early-stops); 'multilevel' adds a coarse-graph "
        "merge pass for graphs where plain label-prop fragments (~1s "
        "extra host time; within noise of labelprop when it had already "
        "converged); 'none' for pre-ordered ids",
    )
    parser.add_argument("--dense_threshold", type=int, default=20000)
    parser.add_argument(
        "--block_rows", type=int, default=512,
        help="scatter-matmul row-block size; 0 = autotune on this graph",
    )
    parser.add_argument("--block_edges", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--compute_dtype",
        type=str,
        default="float32",
        choices=["float32", "bfloat16"],
        help="encoder/predictor matmul dtype (master weights stay f32)",
    )
    parser.add_argument(
        "--remat", type=str2bool, nargs="?", const=True, default=False,
        help="rematerialize encoder layers in the backward pass "
        "(activation memory for FLOPs; giant graphs)",
    )
    parser.add_argument(
        "--profile_dir", type=str, default="",
        help="capture a jax.profiler trace of the first profiled epoch here",
    )
    parser.add_argument(
        "--metrics_file", type=str, default="",
        help="append per-epoch JSON-lines metrics (loss, edges/s, results)",
    )
    parser.add_argument(
        "--checkpoint_dir", type=str, default="",
        help="save params/opt-state/progress here (orbax); empty = off",
    )
    parser.add_argument("--checkpoint_every", type=int, default=50,
                        help="epochs between checkpoints")
    parser.add_argument("--resume", type=str2bool, nargs="?", const=True, default=False,
                        help="resume from the latest checkpoint in "
                        "--checkpoint_dir")
    parser.add_argument(
        "--prng_impl",
        type=str,
        default="rbg",
        choices=["rbg", "threefry2x32"],
        help="JAX PRNG implementation; rbg is ~10x faster for the big "
        "dropout masks on TPU (threefry costs ~13ms/step at ddi scale)",
    )
    parser.add_argument(
        "--max_restarts", type=int, default=0,
        help="supervise the run: on failure, restart from the latest "
        "checkpoint up to this many times (needs --checkpoint_dir)",
    )
    parser.add_argument("--reset_optimizer", type=str2bool, nargs="?", const=True, default=False,
                        help="re-init optimizer state per run (the reference "
                        "carries Adam moments across runs, model.py:85-96)")
    # --- multi-chip (no reference counterpart; SURVEY §2c scope) ---
    parser.add_argument(
        "--num_shards", type=int, default=0,
        help="shard the graph (rows + embedding table) over this many "
        "devices on a 'node' mesh axis; 0/1 = single device",
    )
    parser.add_argument(
        "--mesh_data", type=int, default=1,
        help="size of the 'data' mesh axis: training pair batches and eval "
        "scoring chunks are sharded over it (works alone or combined with "
        "--num_shards); num_shards × mesh_data must not exceed the device "
        "count",
    )
    parser.add_argument(
        "--partition_comm", type=str, default="auto",
        choices=["auto", "all_gather", "halo"],
        help="per-layer feature exchange: quota-padded halo all_to_all of "
        "only the boundary rows, full all-gather, or auto (linear "
        "latency+bandwidth model; see --comm_latency_rows)",
    )
    parser.add_argument(
        "--comm_latency_rows", type=float, default=512.0,
        help="wire constant for --partition_comm=auto: per-collective "
        "latency expressed in equivalent row transfers; calibrate with "
        "bench_scaling.py's collective micro-bench",
    )
    parser.add_argument(
        "--partition_reorder", type=str, default="auto",
        choices=["auto", "none", "edges", "degree", "bfs"],
        help="node->slot assignment for --num_shards>1: equal-EDGE "
        "contiguous ranges ('edges'), degree-serpentine balance "
        "('degree'), BFS locality + equal-edge ranges ('bfs'), legacy "
        "equal-node ranges ('none'); 'auto' reorders only when the naive "
        "split is >25% edge-imbalanced",
    )
    # --- serving (no reference counterpart) ---
    parser.add_argument(
        "--score_pairs", type=str, default="",
        help="serving mode: skip training, restore --checkpoint_dir, score "
        "the (M, 2) int pairs in this .npy file and exit",
    )
    parser.add_argument(
        "--score_out", type=str, default="scores.npy",
        help="output .npy for --score_pairs scores",
    )
    return parser.parse_args(argv)


# ---------------------------------------------------------------------------
# Dataset surgery (reference main.py:105-186), all host-side NumPy
# ---------------------------------------------------------------------------


def apply_dataset_surgery(ds: Dict, args) -> Dict:
    """Returns {adj_src, adj_dst, adj_weight, split_edge, ...} after the
    per-dataset tricks.  Mutates a copy of split_edge only."""
    split_edge = {
        k: dict(v) if isinstance(v, dict) else v
        for k, v in ds["split_edge"].items()
    }
    num_nodes = ds["num_nodes"]
    adj_src, adj_dst = ds["edge_index"][0], ds["edge_index"][1]
    adj_weight = ds.get("edge_weight")
    if adj_weight is not None:
        adj_weight = np.asarray(adj_weight, np.float32).reshape(-1)
    symmetrize = bool(ds.get("directed"))  # citation2: to_symmetric (main.py:109-110)

    # GATING (documented deviation, see MIGRATION.md): the reference wraps
    # BOTH the year filter and use_valedges_as_input inside
    # `args.data_name == 'ogbl-collab'` (reference main.py:112-130).  For
    # ogbl-* names we gate identically — the flags are silent no-ops off
    # collab, like the reference.  NON-OGB datasets (synthetic:*, npz:*)
    # have no reference counterpart, so the collab surgeries apply there
    # whenever the split carries the needed keys (custom-data support).
    is_ogb = args.data_name.startswith("ogbl-")
    collab_like = args.data_name.startswith("ogbl-collab") or not is_ogb

    if collab_like:
        # Year filter (main.py:113-127)
        if args.year > 0 and "year" in split_edge["train"]:
            sel = split_edge["train"]["year"] >= args.year
            split_edge["train"]["edge"] = split_edge["train"]["edge"][sel]
            # A split can carry 'year' without 'weight' (collab has both;
            # synthetic generators may not) — default to unit weights like
            # the adjacency builders do.
            if "weight" not in split_edge["train"]:
                split_edge["train"]["weight"] = np.ones(
                    int(sel.sum()), np.float32
                )
            else:
                split_edge["train"]["weight"] = split_edge["train"]["weight"][sel]
            split_edge["train"]["year"] = split_edge["train"]["year"][sel]
            tr = split_edge["train"]["edge"]
            s, d, w = to_undirected_edges(
                tr[:, 0], tr[:, 1], split_edge["train"]["weight"], num_nodes
            )
            adj_src, adj_dst, adj_weight = s, d, w
            symmetrize = False
    if args.use_valedges_as_input and collab_like and "edge" in split_edge["train"]:
        # Use training + validation edges (main.py:129-150).
        tr = split_edge["train"]["edge"]
        va = split_edge["valid"]["edge"]
        full_edge = np.concatenate([va, tr], axis=0)  # [valid, train]
        # NOTE: the reference concatenates the WEIGHTS in the opposite order
        # ([train, valid], main.py:134-135) — a misalignment bug preserved
        # verbatim for parity (harmless for the README configs: SAGE ignores
        # edge weights and the RW config overwrites weights per epoch).
        full_weight = np.concatenate(
            [
                np.asarray(split_edge["train"].get("weight", np.ones(len(tr)))),
                np.asarray(split_edge["valid"].get("weight", np.ones(len(va)))),
            ]
        ).astype(np.float32)
        s, d, w = to_undirected_edges(
            full_edge[:, 0], full_edge[:, 1], full_weight, num_nodes
        )
        adj_src, adj_dst, adj_weight = s, d, w
        symmetrize = False
        if args.use_coalesce:
            fe_s, fe_d, fw = coalesce_edges(
                full_edge[:, 0], full_edge[:, 1], full_weight, num_nodes
            )
            full_edge = np.stack([fe_s, fe_d], axis=1)
            full_weight = fw
        # Degree-normalized train weights d_u^-1/2 · w · d_v^-1/2
        # (main.py:144-150); degrees from the merged adjacency.
        deg = np.zeros(num_nodes, np.float64)
        np.add.at(deg, d, w.astype(np.float64))
        with np.errstate(divide="ignore"):
            dinv = np.power(deg, -0.5)
        dinv[np.isinf(dinv)] = 0.0
        split_edge["train"]["edge"] = full_edge.astype(np.int64)
        split_edge["train"]["weight"] = (
            dinv[full_edge[:, 0]] * full_weight * dinv[full_edge[:, 1]]
        ).astype(np.float32)

    if symmetrize:
        adj_src, adj_dst, adj_weight = to_undirected_edges(
            adj_src, adj_dst, adj_weight, num_nodes
        )

    # Encoder-specific adjacency normalization (main.py:177-186).
    enc = args.encoder.upper()
    if enc == "GCN":
        adj_src, adj_dst, adj_weight = gcn_normalize_edges(
            adj_src, adj_dst, adj_weight, num_nodes
        )
    elif enc == "WSAGE":
        adj_src, adj_dst, adj_weight = row_normalize_edges(
            adj_src, adj_dst, adj_weight, num_nodes
        )
    elif enc == "TRANSFORMER":
        adj_weight = None  # strip values (main.py:184-186)

    return {
        "adj_src": np.asarray(adj_src, np.int64),
        "adj_dst": np.asarray(adj_dst, np.int64),
        "adj_weight": None
        if adj_weight is None
        else np.asarray(adj_weight, np.float32),
        "split_edge": split_edge,
    }


def get_train_edges(split_edge) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Training positives + optional weights (reference utils.py:8-13)."""
    tr = split_edge["train"]
    if "edge" in tr:
        pos = np.asarray(tr["edge"], np.int64)
    else:
        pos = np.stack(
            [np.asarray(tr["source_node"]), np.asarray(tr["target_node"])], axis=1
        ).astype(np.int64)
    w = tr.get("weight")
    return pos, (None if w is None else np.asarray(w, np.float32).reshape(-1))


def get_eval_edges(split_edge, split: str) -> Dict[str, np.ndarray]:
    """Valid/test pos+neg pairs in both OGB formats (utils.py:33-40)."""
    se = split_edge[split]
    if "edge" in split_edge["train"]:
        return {
            "pos": np.asarray(se["edge"], np.int64),
            "neg": np.asarray(se["edge_neg"], np.int64),
        }
    source = np.asarray(se["source_node"])
    target = np.asarray(se["target_node"])
    target_neg = np.asarray(se["target_node_neg"])
    k = target_neg.shape[1]
    neg = np.stack(
        [np.repeat(source, k), target_neg.reshape(-1)], axis=1
    ).astype(np.int64)
    return {"pos": np.stack([source, target], axis=1).astype(np.int64), "neg": neg}


# ---------------------------------------------------------------------------
# Experiment assembly + run protocol (reference main.py:188-305)
# ---------------------------------------------------------------------------


_SPLIT_ID_KEYS = (
    "edge",
    "edge_neg",
    "source_node",
    "target_node",
    "target_node_neg",
)


def _relabel_split_edge(split_edge, node_relabel):
    """Map every node-id-bearing array of a split dict (both OGB layouts,
    utils.py:7-41) through ``node_relabel`` (old id -> slot id); weights
    and other payloads pass through untouched."""
    out = {}
    for split, d in split_edge.items():
        nd = dict(d)
        for k in list(nd):
            if k in _SPLIT_ID_KEYS and nd[k] is not None:
                nd[k] = node_relabel[np.asarray(nd[k])]
        out[split] = nd
    return out


def prepare_experiment(args, log=print, serving=False):
    """Everything up to (but excluding) the run loop; returns a dict.

    ``serving=True`` (the --score_pairs path) skips the training-only work:
    the on-device block autotune sweep (the block must match the trained
    run, so serving defaults to the same 512 a non-autotuned run gets and
    the user passes the trained value explicitly) and the eval negative-set
    construction.
    """
    ds = load_dataset(args.data_name, args.data_path)
    num_nodes = ds["num_nodes"]
    node_feat = ds.get("node_feat")
    num_node_feats = 0 if node_feat is None else node_feat.shape[1]

    surg = apply_dataset_surgery(ds, args)
    split_edge = surg["split_edge"]

    mesh = None
    num_shards = getattr(args, "num_shards", 0) or 0
    use_dense = args.adj_backend == "dense" or (
        args.adj_backend == "auto" and num_nodes <= args.dense_threshold
    )
    if args.block_rows == 0 and not use_dense and not serving:
        from plnlp_tpu.tuning import autotune_block

        args.block_rows, args.block_edges = autotune_block(
            surg["adj_src"], surg["adj_dst"], surg["adj_weight"],
            num_nodes=num_nodes, dim=args.gnn_hidden_channels,
            block_edges=args.block_edges,
            dtype=getattr(args, "compute_dtype", "float32"), log=log,
        )
        log(f"autotuned block = ({args.block_rows}, {args.block_edges})")
    elif args.block_rows == 0:
        args.block_rows = 512
    # auto above the dense threshold: estimate post-reorder tile coverage
    # (no tile build) and pick hybrid when community structure makes the
    # dense-tile path a measured win; blocked CSR otherwise.  The computed
    # order feeds build_hybrid so the reorder sweep runs once.
    backend = args.adj_backend
    auto_order = None
    node_relabel = None  # old id -> slot id (hybrid id-space relabel)
    order = None  # slot id -> old id (its inverse)
    if backend == "auto" and not use_dense:
        if serving:
            # Serving computes h once per restore (serve.Scorer caches the
            # encode), so the aggregation backend's throughput is
            # irrelevant — skip the ~1-20 s reorder sweep the estimator
            # costs at collab scale and take blocked CSR.
            backend = "csr"
            log("auto backend: serving mode -> csr (encode runs once; "
                "estimator skipped)")
        else:
            from plnlp_tpu.ops.tile_spmm import estimate_hybrid

            est = estimate_hybrid(
                surg["adj_src"],
                surg["adj_dst"],
                num_nodes=num_nodes,
                tile=getattr(args, "tile_size", 512),
                min_fill=getattr(args, "tile_min_fill", 384),
                reorder=getattr(args, "tile_reorder", "labelprop"),
            )
            thr = getattr(args, "tile_auto_coverage", 0.35)
            backend = "hybrid" if est["coverage"] >= thr else "csr"
            if backend == "hybrid":
                # the dataset id-space relabel below consumes the
                # estimator's order, so the reorder sweep runs once
                auto_order = est["order"]
            log(
                f"auto backend: estimated tile coverage "
                f"{est['coverage']:.1%} ({est['num_tiles']} tiles at "
                f"T={getattr(args, 'tile_size', 512)}"
                f"/min_fill={getattr(args, 'tile_min_fill', 384)}, "
                f"threshold {thr:.0%}) -> {backend}"
            )
    if backend == "hybrid":
        # Host-side ID-SPACE relabel (round 5): apply the community
        # reorder to the DATASET once — node ids BECOME slot ids, so the
        # per-call feature permutations of the library-level build
        # (perm_in/perm_out: FOUR full-matrix row gathers per fwd+bwd)
        # vanish from the hot path.  Chip A/B: hybrid SpMM 19.5 -> 13.1
        # ms, attention 64.6 -> 57.1 ms (RESULTS.md round 5).  Edges,
        # splits, features and the pretrained table relabel on host once
        # per run; metrics are id-agnostic.  Serving rebuilds the same
        # deterministic order and translates user pairs (run_scoring).
        # Applies at ANY shard count — the tiled partition then receives
        # the IDENTITY order (communities already contiguous).
        from plnlp_tpu.ops.tile_spmm import estimate_hybrid

        reorder_mode = getattr(args, "tile_reorder", "labelprop")
        order = auto_order
        if order is None and reorder_mode != "none":
            order = estimate_hybrid(
                surg["adj_src"],
                surg["adj_dst"],
                num_nodes=num_nodes,
                tile=getattr(args, "tile_size", 512),
                min_fill=getattr(args, "tile_min_fill", 384),
                symmetrize=True,
                reorder=reorder_mode,
            )["order"]
        if order is not None:
            node_relabel = np.empty(num_nodes, np.int64)
            node_relabel[order] = np.arange(num_nodes)
            surg["adj_src"] = node_relabel[np.asarray(surg["adj_src"])]
            surg["adj_dst"] = node_relabel[np.asarray(surg["adj_dst"])]
            split_edge = _relabel_split_edge(split_edge, node_relabel)
            surg["split_edge"] = split_edge
            if node_feat is not None:
                node_feat = np.asarray(node_feat)[order]
            log("hybrid backend: id space relabeled to slot order "
                f"({reorder_mode}; per-call feature perms removed)")
    # hybrid x multi-chip composes with ALL encoders: TRANSFORMER runs the
    # distributed block-sparse flash attention (parallel.tile_transformer)
    # over the per-shard tile sets + blocked residual (round 5).
    hybrid_multichip = num_shards > 1 and backend == "hybrid"
    mesh_data = getattr(args, "mesh_data", 1) or 1
    if num_shards > 1 or mesh_data > 1:
        from plnlp_tpu.parallel import make_mesh

        mesh = make_mesh(data=mesh_data, node=max(num_shards, 1))
    if num_shards > 1:
        # Multi-chip: destination rows + embedding table sharded over the
        # 'node' mesh axis; the same Model/step code runs unchanged because
        # GraphParallel is a drop-in aggregation operand (graph_parallel.py).
        from plnlp_tpu.parallel.graph_parallel import make_graph_parallel

        graph = make_graph_parallel(
            surg["adj_src"],
            surg["adj_dst"],
            surg["adj_weight"],
            num_nodes=num_nodes,
            mesh=mesh,
            block=(args.block_rows, args.block_edges),
            comm=getattr(args, "partition_comm", "auto"),
            latency_rows=getattr(args, "comm_latency_rows", 512.0),
            # tiled partitions need a community-contiguous slot order —
            # --tile_reorder governs there; --partition_reorder otherwise
            reorder=(
                getattr(args, "tile_reorder", "labelprop")
                if hybrid_multichip
                else getattr(args, "partition_reorder", "auto")
            ),
            # --adj_backend=hybrid composes the dense-tile SpMM with the
            # partition: labelprop slot assignment + per-shard tile sets
            tile=getattr(args, "tile_size", 512) if hybrid_multichip else 0,
            min_fill=getattr(args, "tile_min_fill", 384),
            tile_dtype=getattr(args, "compute_dtype", "float32"),
            # relabeled dataset -> communities already slot-contiguous:
            # the identity order skips the partition's own reorder sweep
            # (equal-edge range split still applies on top)
            order=(
                np.arange(num_nodes, dtype=np.int64)
                if (hybrid_multichip and order is not None)
                else auto_order
            ),
            log=log,
        )
        pg = graph.pg
        log(
            f"partition: S={pg.num_shards} reorder={pg.reorder} "
            f"comm={graph.comm} rows_per_shard={pg.rows_per_shard} "
            f"shard_edges={pg.shard_edges} shard_nblk={pg.shard_nblk}"
            + (
                f" halo_quota={pg.halo_quota} halo_hubs={pg.halo_hubs}"
                if graph.comm == "halo"
                else ""
            )
            + (
                f" tiles/shard={pg.shard_tiles} "
                f"dense_edges={pg.tile_dense_edges} "
                f"store={pg.tile_vals.dtype}"
                if pg.tile
                else ""
            )
        )
        graph_t = None
    elif use_dense:
        graph = prepare_dense(
            surg["adj_src"], surg["adj_dst"], surg["adj_weight"], num_nodes=num_nodes
        )
        graph_t = None
    elif backend == "hybrid":
        # TRANSFORMER included: block-sparse attention over the tiles
        # (ops/tile_attention.py, round 4).  The id-space relabel already
        # happened above, so the build needs no internal reorder and
        # carries NO perm_in/perm_out.
        from plnlp_tpu.ops.tile_spmm import build_hybrid

        graph = build_hybrid(
            surg["adj_src"],
            surg["adj_dst"],
            surg["adj_weight"],
            num_nodes=num_nodes,
            tile=getattr(args, "tile_size", 512),
            min_fill=getattr(args, "tile_min_fill", 384),
            block=(args.block_rows, args.block_edges),
            dtype=getattr(args, "compute_dtype", "float32"),
            reorder=None,
        )
        graph_t = None
        log(
            f"hybrid backend: {graph.num_tiles} dense tiles "
            f"({graph.dense_edges}/{graph.dense_edges + graph.res_edges} "
            # x2: tile_vals AND the transposed tile_vals_t (backward) are
            # both resident in HBM; itemsize from the STORED dtype (int8
            # when exact, else the compute dtype).
            f"edges, {2 * graph.num_tiles * graph.tile**2 * graph.tile_vals.dtype.itemsize >> 20} MB incl. transpose, store={graph.tile_vals.dtype}"
            + (", id space relabeled to slot order" if order is not None else "")
            + ")"
        )
    else:
        graph, graph_t = prepare_graph(
            surg["adj_src"],
            surg["adj_dst"],
            surg["adj_weight"],
            num_nodes=num_nodes,
            block=(args.block_rows, args.block_edges),
            # the blocked TransformerConv hand-VJP needs the fwd↔transpose
            # slot coupling (ops/transformer.py)
            couple_transpose=args.encoder.upper() == "TRANSFORMER",
        )
    if (num_shards > 1 or use_dense or backend == "hybrid") and not serving:
        # Replicated CSR twin for negative-sampler exclusion + random walks
        # (host-built once; cheap relative to the main structure).
        sample_graph, _ = prepare_graph(
            surg["adj_src"],
            surg["adj_dst"],
            surg["adj_weight"],
            num_nodes=num_nodes,
            block=None,
        )
    else:
        sample_graph = graph

    pretrain_emb = None
    if args.pretrain_emb:
        if args.pretrain_emb.endswith(".npy"):
            pretrain_emb = np.load(args.pretrain_emb)
        else:
            import torch

            pretrain_emb = (
                torch.load(args.pretrain_emb, map_location="cpu").cpu().numpy()
            )
        if order is not None:
            # rows follow the id-space relabel: new_emb[slot] = old[order[slot]]
            pretrain_emb = np.asarray(pretrain_emb)[np.asarray(order)]

    cfg = ModelConfig(
        encoder=args.encoder,
        predictor=args.predictor,
        optimizer=args.optimizer,
        loss_func=args.loss_func,
        neg_sampler=args.neg_sampler,
        gnn_num_layers=args.gnn_num_layers,
        mlp_num_layers=args.mlp_num_layers,
        emb_hidden_channels=args.emb_hidden_channels,
        gnn_hidden_channels=args.gnn_hidden_channels,
        mlp_hidden_channels=args.mlp_hidden_channels,
        dropout=args.dropout,
        grad_clip_norm=args.grad_clip_norm,
        lr=args.lr,
        num_neg=args.num_neg,
        batch_size=args.batch_size,
        use_node_feats=args.use_node_feats,
        train_node_emb=args.train_node_emb,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        remat=getattr(args, "remat", False),
    )
    model = Model(cfg, num_nodes, num_node_feats, pretrain_emb)

    eval_edges = None
    if not serving:
        eval_edges = {
            "valid": {
                k: jnp.asarray(v)
                for k, v in get_eval_edges(split_edge, "valid").items()
            },
            "test": {
                k: jnp.asarray(v)
                for k, v in get_eval_edges(split_edge, "test").items()
            },
        }
    return {
        "dataset": ds,
        "split_edge": split_edge,
        "graph": graph,
        "graph_t": graph_t,
        "sample_graph": sample_graph,
        "model": model,
        "eval_edges": eval_edges,
        "node_feats": None if node_feat is None else jnp.asarray(node_feat),
        "num_nodes": num_nodes,
        "mesh": mesh,
        # hybrid id-space relabel (old id -> slot id) or None; serving
        # translates user-facing node ids through it (run_scoring)
        "node_relabel": node_relabel,
    }


def run_experiment(args, log=print):
    """Full experiment driver (reference main.py:69-305).  SIGTERM during
    the run (TPU preemption notice) checkpoints at the next epoch boundary
    and exits with code 75 so a scheduler relaunch with --resume continues
    — see plnlp_tpu.resilience.PreemptionGuard."""
    from plnlp_tpu.resilience import PreemptionGuard

    with PreemptionGuard() as guard:
        return _run_experiment(args, log, guard)


def _run_experiment(args, log, guard):
    from plnlp_tpu.resilience import Preempted

    exp = prepare_experiment(args, log=log)
    model: Model = exp["model"]
    graph, graph_t = exp["graph"], exp["graph_t"]
    sample_graph = exp["sample_graph"]
    node_feats = exp["node_feats"]
    split_edge = exp["split_edge"]
    eval_metric = (
        args.eval_metric
        if args.eval_metric
        else exp["dataset"].get("eval_metric", "hits")
    )
    ds_metric = exp["dataset"].get("eval_metric")
    if ds_metric and eval_metric != ds_metric:
        # --eval_metric defaults to 'hits' (reference flag parity,
        # main.py:24), so an mrr-layout dataset silently evaluates as hits
        # unless the flag is passed — make that loud.
        import warnings

        warnings.warn(
            f"dataset stores eval_metric={ds_metric!r} but this run uses "
            f"{eval_metric!r}; pass --eval_metric {ds_metric} if that is "
            f"unintended (the flag default is 'hits' for reference parity)",
            stacklevel=2,
        )

    log_file = None
    if args.res_dir:
        os.makedirs(args.res_dir, exist_ok=True)
        log_file = os.path.join(
            args.res_dir, f"log_{args.data_name}_{int(time.time())}.txt"
        )
        with open(log_file, "a") as f:
            f.write(str(vars(args)) + "\n")

    def emit(msg):
        log(msg)
        if log_file:
            with open(log_file, "a") as f:
                f.write(str(msg) + "\n")

    if eval_metric == "hits":
        loggers = {k: Logger(args.runs, args) for k in ("Hits@20", "Hits@50", "Hits@100")}
    else:
        loggers = {"MRR": Logger(args.runs, args)}

    pos_edges_np, weights_np = get_train_edges(split_edge)
    base_pos = jnp.asarray(pos_edges_np)
    base_weights = None if weights_np is None else jnp.asarray(weights_np)

    # RW augmentation start nodes — fixed before the run loop (main.py:228-233).
    rw_start = None
    if args.random_walk_augment:
        if args.walk_start_type == "edge":
            rw_start = base_pos.reshape(-1)
        else:
            rw_start = jnp.arange(exp["num_nodes"], dtype=jnp.int32)

    mesh = exp.get("mesh")

    def place_state(params, opt_state):
        """Multi-chip: emb table + matching optimizer moments sharded
        P('node', None); everything else replicated on the mesh."""
        if mesh is None:
            return params, opt_state
        from plnlp_tpu.parallel.sharded import shard_state

        return shard_state(model, mesh, params, opt_state)

    # Keys are derived POSITIONALLY — fold_in(fold_in(seed, run), epoch) —
    # not by threading one split chain through the loop: a --resume restart
    # must continue with exactly the keys an uninterrupted run would have
    # used at that (run, epoch), never replay the pre-preemption epochs'
    # negative samples / shuffles / dropout masks.
    base_key = jax.random.PRNGKey(args.seed)

    def run_epoch_key(run, epoch):
        """epoch 0 is reserved for param init; train epochs start at 1."""
        return jax.random.fold_in(jax.random.fold_in(base_key, run), epoch)
    # Reference quirk: optimizer state is created ONCE and carries across
    # runs (model.py:85-96); --reset_optimizer restores the clean behavior.
    params = model.init_params(jax.random.PRNGKey(args.seed))
    opt_state = model.init_opt_state(params)
    params, opt_state = place_state(params, opt_state)
    emit(
        f"Total number of model parameters is {model.param_count(params)}"
    )

    from plnlp_tpu.profiling import MetricsWriter, ThroughputMeter, profile_trace

    num_graph_edges = (
        exp["sample_graph"].num_edges
        if exp["sample_graph"] is not None
        else 0
    )
    meter = ThroughputMeter(
        num_graph_edges, args.gnn_num_layers, args.batch_size
    )
    metrics = MetricsWriter(getattr(args, "metrics_file", "") or None)

    ckpt_mgr = None
    start_run, start_epoch = 0, 1

    def save_ckpt(run, epoch, params, opt_state):
        ckpt_mgr.save(
            run * args.epochs + epoch,
            params,
            opt_state,
            {
                "run": run,
                "epoch": epoch,
                "results": {
                    k: [list(map(list, r)) for r in lg.results]
                    for k, lg in loggers.items()
                },
            },
        )

    if getattr(args, "checkpoint_dir", ""):
        from plnlp_tpu.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(args.checkpoint_dir)
        if getattr(args, "resume", False) and ckpt_mgr.latest_step() is not None:
            params, opt_state, extra = ckpt_mgr.restore(
                template={"params": params, "opt_state": opt_state}
            )
            params, opt_state = place_state(params, opt_state)
            if extra:
                start_run = int(extra.get("run", 0))
                start_epoch = int(extra.get("epoch", 0)) + 1
                for lk, res in extra.get("results", {}).items():
                    if lk in loggers:
                        loggers[lk].results = [list(map(tuple, r)) for r in res]
                emit(f"Resumed from run {start_run + 1}, epoch {start_epoch}")

    for run in range(start_run, args.runs):
        if run != start_run or start_epoch == 1:
            params = model.init_params(run_epoch_key(run, 0))
            if args.reset_optimizer:
                opt_state = model.init_opt_state(params)
            params, opt_state = place_state(params, opt_state)
        first_epoch = start_epoch if run == start_run else 1
        cur_lr = (
            adjust_lr(args.lr, (first_epoch - 1) / args.epochs)
            if args.use_lr_decay and first_epoch > 1
            else args.lr
        )
        start_time = time.time()
        for epoch in range(first_epoch, 1 + args.epochs):
            k_epoch = run_epoch_key(run, epoch)
            if args.random_walk_augment:
                k_epoch, k_walk = jax.random.split(k_epoch)
                pos, weights, valid = random_walk_pairs(
                    sample_graph, rw_start, args.walk_length, k_walk
                )
                pos_mask = valid
            else:
                pos, weights, pos_mask = base_pos, base_weights, None
            meter.start()
            with profile_trace(
                args.profile_dir
                if getattr(args, "profile_dir", "") and run == 0 and epoch == 2
                else None
            ):
                params, opt_state, loss = model.train_epoch(
                    params,
                    opt_state,
                    graph,
                    graph_t,
                    node_feats,
                    pos,
                    weights,
                    k_epoch,
                    cur_lr,
                    sample_graph=sample_graph,
                    pos_mask=pos_mask,
                    mesh=mesh,
                )
            epoch_s = meter.stop(pos.shape[0])
            if getattr(args, "profile_dir", "") and run == 0 and epoch == 2:
                # Emit the top device ops from the captured epoch so the
                # breakdown lands in the text log without TensorBoard.
                try:
                    from plnlp_tpu.profiling import summarize_trace

                    for row in summarize_trace(args.profile_dir, top=10):
                        emit(
                            f"[profile] {row['total_ms']:9.3f} ms "
                            f"x{row['count']:<4d} {row['name']}  "
                            f"{row['hlo'][:80]}"
                        )
                except Exception as exc:  # format varies across jax builds
                    emit(f"[profile] trace summary unavailable: {exc!r}")
            metrics.write(
                run=run,
                epoch=epoch,
                loss=float(loss),
                lr=cur_lr,
                epoch_seconds=epoch_s,
                agg_edges_per_sec=meter.last_edges_per_sec,
                useful_agg_edges_per_sec=meter.last_useful_edges_per_sec,
                pairs_per_sec=meter.last_pairs_per_sec,
            )
            if epoch % args.eval_steps == 0:
                results = model.test(
                    params, graph, graph_t, node_feats, exp["eval_edges"],
                    eval_metric, mesh=mesh,
                )
                for k, res in results.items():
                    loggers[k].add_result(run, res)
                if epoch % args.log_steps == 0:
                    spent = time.time() - start_time
                    for k, (vres, tres) in results.items():
                        emit(k)
                        emit(
                            f"Run: {run + 1:02d}, Epoch: {epoch:02d}, "
                            f"Loss: {loss:.4f}, Learning Rate: {cur_lr:.4f}, "
                            f"Valid: {100 * vres:.2f}%, Test: {100 * tres:.2f}%"
                        )
                    emit("---")
                    emit(
                        f"Training Time Per Epoch: {spent / args.eval_steps: .4f} s "
                        f"({meter.last_edges_per_sec / 1e6:.1f}M agg-edges/s)"
                    )
                    emit("---")
                    start_time = time.time()
            if args.use_lr_decay:
                cur_lr = adjust_lr(args.lr, epoch / args.epochs)
            if ckpt_mgr is not None and epoch % args.checkpoint_every == 0:
                save_ckpt(run, epoch, params, opt_state)
            if guard is not None and guard.preempted:
                # Preemption notice arrived mid-epoch: persist NOW (unless
                # the periodic save above just did) and exit cleanly with
                # the resume recipe in the log.
                if ckpt_mgr is not None:
                    if epoch % args.checkpoint_every != 0:
                        save_ckpt(run, epoch, params, opt_state)
                    emit(
                        f"Preemption signal ({guard.signum}) — checkpointed "
                        f"run {run + 1} epoch {epoch}; relaunch with "
                        f"--resume to continue"
                    )
                else:
                    emit(
                        f"Preemption signal ({guard.signum}) at run "
                        f"{run + 1} epoch {epoch} — no --checkpoint_dir, "
                        f"progress is lost"
                    )
                raise Preempted(run, epoch)
        for k in loggers:
            emit(k)
            loggers[k].print_statistics(run, last_best=args.eval_last_best)
            if log_file:
                with open(log_file, "a") as f:
                    loggers[k].print_statistics(
                        run, f=f, last_best=args.eval_last_best
                    )

    for k in loggers:
        emit(k)
        loggers[k].print_statistics(last_best=args.eval_last_best)
        if log_file:
            with open(log_file, "a") as f:
                loggers[k].print_statistics(f=f, last_best=args.eval_last_best)
    return loggers


def run_scoring(args, log=print):
    """Serving mode (--score_pairs): restore the checkpoint, encode once,
    score the given pairs, write the scores.  Returns the scores array."""
    if not getattr(args, "checkpoint_dir", ""):
        raise SystemExit("--score_pairs needs --checkpoint_dir")
    from plnlp_tpu.serve import Scorer

    exp = prepare_experiment(args, log=log, serving=True)
    sc = Scorer.from_checkpoint(
        exp["model"],
        args.checkpoint_dir,
        exp["graph"],
        exp["graph_t"],
        exp["node_feats"],
        mesh=exp["mesh"],
    )
    pairs = np.load(args.score_pairs)
    if exp["node_relabel"] is not None:
        # the hybrid backend relabels the id space at build time (same
        # deterministic order as the trained run); user pairs arrive in
        # ORIGINAL ids — translate before scoring.  Scores come back in
        # input order, so no inverse mapping is needed.
        pairs = exp["node_relabel"][np.asarray(pairs)]
    scores = sc.score(pairs)
    np.save(args.score_out, scores)
    log(f"scored {len(pairs)} pairs -> {args.score_out}")
    return scores


def main(argv=None):
    args = argument(argv)
    if getattr(args, "prng_impl", None):
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    print(args)
    if getattr(args, "score_pairs", ""):
        return run_scoring(args)
    if getattr(args, "max_restarts", 0) > 0:
        from plnlp_tpu.resilience import run_resilient

        return run_resilient(args, max_restarts=args.max_restarts)
    return run_experiment(args)


if __name__ == "__main__":
    main()
