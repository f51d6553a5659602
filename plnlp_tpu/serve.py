"""Inference / serving: score link candidates from a trained model.

The reference has no serving path at all — after training, its predictions
exist only inside ``BaseModel.test`` (reference model.py:175-226).  For
production deployment this module packages the eval machinery into a
standalone scorer: restore a checkpoint, run the full-graph encode ONCE,
then answer arbitrary pair-scoring and candidate-ranking queries from the
cached node representations.

TPU notes: the encode is the expensive part (one full-graph pass); queries
after it are chunked predictor calls on the MXU via the same jitted
``batch_predict`` the eval loop uses, so serving throughput matches the
measured eval rate (~36M pairs/s at citation2 scale, RESULTS.md).  A
``mesh`` shards query scoring over the 'data' axis exactly like eval.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.training import Model

__all__ = ["Scorer"]


class Scorer:
    """Frozen-model pair scorer over a cached full-graph encoding.

    ``graph``/``graph_t``/``node_feats`` must match what the model was
    trained with (same adjacency normalization — reference main.py:177-186).
    """

    def __init__(
        self,
        model: Model,
        params,
        graph,
        graph_t=None,
        node_feats=None,
        mesh=None,
        exclude_graph=None,
    ):
        self.model = model
        self.params = params
        self.mesh = mesh
        self._rank_fns = {}  # (mask kind, k) -> jitted factorized chunk fn
        # Known-edge exclusion source for rank_candidates(exclude_edges=True):
        # defaults to the scoring graph itself; multi-chip callers whose
        # ``graph`` is a GraphParallel pass the replicated CSR twin here.
        self.exclude_graph = exclude_graph if exclude_graph is not None else graph
        # Encode once in eval mode (no dropout).  Row N is the mean
        # representation — the unseen-node convention (reference
        # model.py:191-194), reachable by passing index -1 in queries.
        self.h = model._encode(params, graph, graph_t, node_feats)

    @classmethod
    def from_checkpoint(
        cls,
        model: Model,
        checkpoint_dir: str,
        graph,
        graph_t=None,
        node_feats=None,
        mesh=None,
        step: Optional[int] = None,
    ) -> "Scorer":
        """Restore the latest (or ``step``) checkpoint saved by the trainer
        (cli --checkpoint_dir) and build a scorer from it."""
        import jax

        from plnlp_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = model.init_opt_state(params)
        params, _, _ = mgr.restore(
            step=step, template={"params": params, "opt_state": opt_state}
        )
        return cls(model, params, graph, graph_t, node_feats, mesh=mesh)

    def score(self, pairs) -> np.ndarray:
        """Scores for (M, 2) int node pairs; -1 = unseen-node mean row."""
        pairs = jnp.asarray(np.asarray(pairs, np.int32))
        out = self.model.batch_predict(
            self.params, self.h, pairs, mesh=self.mesh
        )
        return np.asarray(out)

    def rank_candidates(
        self,
        src: int,
        candidates: Optional[np.ndarray] = None,
        k: int = 10,
        exclude_edges: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k destination candidates for ``src`` by predicted score.

        ``candidates`` defaults to every node.  Returns (node_ids, scores),
        both sorted by descending score — the serving analog of the
        link-prediction task the eval metrics rank.

        ``exclude_edges=True`` masks candidates already linked to ``src``
        in the adjacency (score −inf) — the standard recommendation-serving
        filter: predicting a node's EXISTING neighbors as new links is
        useless output.
        """
        ids, scores = self.rank_candidates_batch(
            [src], candidates, k, exclude_edges=exclude_edges
        )
        return ids[0], scores[0]

    def _neighbor_mask_fn(self, candidates: np.ndarray):
        """Returns (apply_fn, ops): ``apply_fn(ops, srcs_dev, scores)`` sets
        known-edge candidate columns to −inf.  All device arrays ride in
        ``ops`` (jit ARGUMENTS, never closure constants — a closure-captured
        adjacency would be baked into every compile payload); ``apply_fn``
        is pure and cacheable, so the factorized ranking path can jit the
        whole score→mask→top-k chunk around it."""
        from plnlp_tpu.dense import DenseAdj
        from plnlp_tpu.graph import Graph

        g = self.exclude_graph
        n = self.model.num_nodes
        c = len(candidates)
        identity = c == n and np.array_equal(candidates, np.arange(n))
        if identity:
            cand_pos = None
        else:
            # node id -> column in the candidate list; c (out of bounds,
            # dropped by the scatter) for non-candidates.
            pos = np.full(n, c, np.int32)
            pos[candidates] = np.arange(c, dtype=np.int32)
            cand_pos = jnp.asarray(pos)

        if isinstance(g, DenseAdj):
            cand_idx = None if cand_pos is None else jnp.asarray(candidates)

            def mask_dense(ops, srcs_d, scores):
                adj, cand_idx = ops
                rows = adj[srcs_d]  # (sc, N)
                if cand_idx is not None:
                    rows = rows[:, cand_idx]
                return jnp.where(rows != 0, -jnp.inf, scores)

            return mask_dense, (g.adj, cand_idx)
        if isinstance(g, Graph):
            # Static-shape neighbor window per source: senders of the
            # in-edges of src (== its neighbors on the symmetric graphs
            # link prediction serves; for directed adjacencies this masks
            # v with edge v->src).
            md = max(int(g.max_degree), 1)

            def mask_csr(ops, srcs_d, scores):
                indptr, senders, cand_pos = ops
                offs = jnp.arange(md, dtype=jnp.int32)
                lo = indptr[srcs_d]  # (sc,)
                deg = indptr[srcs_d + 1] - lo
                idx = lo[:, None] + offs[None, :]  # (sc, md)
                valid = offs[None, :] < deg[:, None]
                nbr = senders[jnp.clip(idx, 0, senders.shape[0] - 1)]
                col = nbr if cand_pos is None else cand_pos[nbr]
                # invalid window slots -> out-of-bounds column, dropped
                col = jnp.where(valid, col, scores.shape[1])
                rows = jnp.broadcast_to(
                    jnp.arange(scores.shape[0])[:, None], col.shape
                )
                return scores.at[rows, col].set(-jnp.inf, mode="drop")

            return mask_csr, (g.indptr, g.senders, cand_pos)
        raise ValueError(
            f"exclude_edges needs a CSR Graph or DenseAdj to read known "
            f"edges from; got {type(g).__name__} — pass exclude_graph= to "
            f"Scorer (e.g. the replicated sample graph on multi-chip runs)"
        )

    # Upper bound on the on-device S×C pair grid per scoring pass.  8M pairs
    # = 64 MB of int32 indices + 32 MB of f32 scores — far from HBM limits
    # even with the cached h resident, yet large enough that the MXU stays
    # saturated (eval measured flat beyond ~64Ki pairs/chunk, RESULTS.md).
    _MAX_GRID_PAIRS = 8 * 1024 * 1024

    def rank_candidates_batch(
        self,
        srcs,
        candidates: Optional[np.ndarray] = None,
        k: int = 10,
        exclude_edges: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k candidates for MANY source nodes in fused scoring passes.

        Scores all S×C pairs through chunked device computation (one round
        trip per ~8M-pair source chunk instead of one per source) — the
        recommendation-serving shape.  Returns (node_ids, scores), both
        (S, k), rows sorted by descending score.

        ``exclude_edges=True``: candidates with a known edge to the source
        score −inf and fall out of the top-k (if a source has fewer than k
        unlinked candidates the tail comes back with −inf scores).
        """
        srcs = np.asarray(srcs, np.int32).reshape(-1)
        if candidates is None:
            candidates = np.arange(self.model.num_nodes, dtype=np.int32)
        else:
            candidates = np.asarray(candidates, np.int32)
        s, c = len(srcs), len(candidates)
        k = min(k, c)
        if exclude_edges:
            mask_fn, mask_ops = self._neighbor_mask_fn(candidates)
        else:
            mask_fn = mask_ops = None
        # Build the pair grid ON DEVICE and top-k ON DEVICE: only the (S,)
        # sources go up and only the (S, k) results come back — the S×C×2
        # index grid and S×C scores never cross the host link (measured:
        # the host-built grid was transfer-bound, ~8x slower over a
        # remote-tunnel device).  Sources are processed in chunks so the
        # grid stays bounded: at citation2 scale (C≈2.9M) an unchunked
        # 256-source grid would be ~6 GB of indices alone and OOM a v5e.
        cand_d = jnp.asarray(candidates)
        per = max(1, self._MAX_GRID_PAIRS // max(c, 1))
        ids_out, scores_out = [], []
        from plnlp_tpu.models.predictors import grid_factorizable

        # Factorizable predictors (DOT/BIL/MLPDOT/MLPBIL — incl. the collab
        # flagship DOT config): the candidate-side transform runs ONCE per
        # call, then each source chunk is a source transform + ONE matmul +
        # mask + top-k in a single jitted dispatch (measured: the eager
        # chain's per-op round trips over a tunneled device dominated the
        # factorized path, 71 ms/pass of which the compute was
        # microseconds).  A data mesh routes through the sharded pairwise
        # eval path instead — the factorized grid is not sharded (yet).
        data_sharded = (
            self.mesh is not None and self.mesh.shape.get("data", 1) > 1
        )
        if grid_factorizable(self.model.cfg.predictor) and not data_sharded:
            right_fn, rank_fn = self._grid_rank_fns(mask_fn, k)
            right = right_fn(self.params["predictor"], self.h, cand_d)
            for lo in range(0, s, per):
                srcs_d = jnp.asarray(srcs[lo : lo + per])
                ids, top = rank_fn(
                    self.params["predictor"], self.h, srcs_d, right, cand_d,
                    mask_ops,
                )
                ids_out.append(np.asarray(ids))
                scores_out.append(np.asarray(top))
            return np.concatenate(ids_out), np.concatenate(scores_out)

        # Pairwise predictors (MLP/MLPCAT): without a data mesh the whole
        # chunk (pair grid + predict + mask + top-k) runs as one jitted
        # dispatch; the sharded-eval path keeps its own jit structure.
        rank_fn = (
            self._pairwise_rank_fn(mask_fn, k) if not data_sharded else None
        )
        for lo in range(0, s, per):
            srcs_d = jnp.asarray(srcs[lo : lo + per])
            if rank_fn is not None:
                ids, top_scores = rank_fn(
                    self.params, self.h, srcs_d, cand_d, mask_ops
                )
                ids_out.append(np.asarray(ids))
                scores_out.append(np.asarray(top_scores))
                continue
            sc = srcs_d.shape[0]
            pairs = jnp.stack(
                [jnp.repeat(srcs_d, c), jnp.tile(cand_d, sc)], axis=1
            )
            scores = (
                self.model.batch_predict(
                    self.params, self.h, pairs, mesh=self.mesh
                )
                .reshape(sc, c)
                .astype(jnp.float32)
            )
            if mask_fn is not None:
                scores = mask_fn(mask_ops, srcs_d, scores)
            # Per-source top-k is independent across chunks — no merge.
            top_scores, top_idx = jax.lax.top_k(scores, k)  # sorted desc
            ids_out.append(np.asarray(cand_d[top_idx]))
            scores_out.append(np.asarray(top_scores))
        return np.concatenate(ids_out), np.concatenate(scores_out)

    def _pairwise_rank_fn(self, mask_fn, k: int):
        """Cached jit of the pairwise chunk (MLP/MLPCAT): pair grid +
        batch_predict + optional mask + top-k, one device dispatch."""
        key = ("pairwise", getattr(mask_fn, "__name__", None), k)
        fn = self._rank_fns.get(key)
        if fn is None:

            def raw(params, h, srcs_d, cand_d, mask_ops):
                sc = srcs_d.shape[0]
                c = cand_d.shape[0]
                pairs = jnp.stack(
                    [jnp.repeat(srcs_d, c), jnp.tile(cand_d, sc)], axis=1
                )
                scores = (
                    self.model.batch_predict(params, h, pairs)
                    .reshape(sc, c)
                    .astype(jnp.float32)
                )
                if mask_fn is not None:
                    scores = mask_fn(mask_ops, srcs_d, scores)
                top_scores, top_idx = jax.lax.top_k(scores, k)
                return cand_d[top_idx], top_scores

            fn = jax.jit(raw)
            self._rank_fns[key] = fn
        return fn

    def _grid_rank_fns(self, mask_fn, k: int):
        """Cached jits of the factorized path: (right_fn, rank_fn).
        right_fn transforms the candidate side once per call; rank_fn is
        the per-chunk source transform + matmul + optional mask + top-k —
        one device dispatch each.  Cache key = (mask kind, k); chunk-shape
        changes retrace within the same jit entry."""
        key = (getattr(mask_fn, "__name__", None), k)
        fns = self._rank_fns.get(key)
        if fns is None:
            from plnlp_tpu.models.predictors import (
                grid_scores_left,
                grid_transform_right,
            )

            name = self.model.cfg.predictor

            def right_raw(pred_params, h, cand_d):
                return grid_transform_right(pred_params, name, h[cand_d])

            def raw(pred_params, h, srcs_d, right, cand_d, mask_ops):
                scores = grid_scores_left(
                    pred_params, name, h[srcs_d], right
                ).astype(jnp.float32)
                if mask_fn is not None:
                    scores = mask_fn(mask_ops, srcs_d, scores)
                top_scores, top_idx = jax.lax.top_k(scores, k)
                return cand_d[top_idx], top_scores

            fns = (jax.jit(right_raw), jax.jit(raw))
            self._rank_fns[key] = fns
        return fns
