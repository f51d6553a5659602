"""Training runtime: model assembly, one jitted train step, epoch/eval drivers.

TPU-first re-design of reference plnlp/model.py (BaseModel + factories).  The
reference's structure — full-graph encoder forward inside every pair
mini-batch, pairwise scoring, AUC-family loss, per-group grad clipping
(model.py:128-173) — is preserved exactly, but expressed as ONE jit-compiled
pure function ``train_step(params, opt_state, ...)`` with donated state,
static shapes (padded final batch + loss masks), and an explicit PRNG chain.

Key differences from the reference, all deliberate:
* optimizer state is a pytree updated functionally (optax-style transforms
  written against the same math as torch.optim Adam/AdamW/SGD);
* the learning rate enters the step as a scalar argument, so LR decay
  (reference adjust_lr, model.py:279-286) never triggers a recompile;
* evaluation computes the encoder output once and reuses it for valid and
  test scoring — the reference recomputes identically in eval mode
  (model.py:190,204), a pure 2× cost artifact with bit-identical results.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from plnlp_tpu.graph import Graph
from plnlp_tpu.losses import calculate_loss
from plnlp_tpu.metrics import evaluate_hits, evaluate_mrr
from plnlp_tpu.models import (
    apply_encoder,
    apply_predictor,
    init_encoder,
    init_predictor,
)
from plnlp_tpu.nn import xavier_uniform
from plnlp_tpu.sampling import (
    global_neg_sample,
    global_perm_neg_sample,
    local_neg_sample,
)

__all__ = ["ModelConfig", "Model"]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """The model/optimization surface of the reference CLI (main.py:16-55)."""

    encoder: str = "SAGE"
    predictor: str = "MLP"
    optimizer: str = "Adam"
    loss_func: str = "AUC"
    neg_sampler: str = "global"
    gnn_num_layers: int = 2
    mlp_num_layers: int = 2
    emb_hidden_channels: int = 256
    gnn_hidden_channels: int = 256
    mlp_hidden_channels: int = 256
    dropout: float = 0.0
    grad_clip_norm: float = 2.0
    lr: float = 1e-3
    num_neg: int = 1
    batch_size: int = 64 * 1024
    use_node_feats: bool = False
    train_node_emb: bool = True
    eval_batch_size: Optional[int] = None  # defaults to batch_size
    # TPU-native extra: run encoder/predictor matmuls in bf16 (master weights
    # stay f32; losses/metrics accumulate in f32). ~6-10x MXU throughput.
    compute_dtype: str = "float32"
    # Rematerialize encoder layers in the backward (memory for FLOPs).
    remat: bool = False


# ---------------------------------------------------------------------------
# Optimizers (torch.optim-parity transforms; reference model.py:85-90)
# ---------------------------------------------------------------------------


def _make_optimizer(name: str) -> optax.GradientTransformation:
    """LR-less optimizer core; the step multiplies updates by -lr."""
    name = name.lower()
    if name == "adamw":
        # torch.optim.AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(0.01),
        )
    if name == "sgd":
        # torch.optim.SGD(momentum=0.9, weight_decay=1e-5, nesterov=True):
        # wd folds into the gradient BEFORE the momentum buffer.
        return optax.chain(
            optax.add_decayed_weights(1e-5),
            optax.trace(decay=0.9, nesterov=True),
        )
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def _clip_subtree(tree, max_norm: float):
    """torch clip_grad_norm_ on one param group: global-norm scale-down."""
    leaves = jax.tree_util.tree_leaves(tree)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda l: l * scale, tree)


class Model:
    """Functional counterpart of reference BaseModel (model.py:9-226).

    Holds only static configuration; all state (params, opt_state) flows
    through the pure jitted functions this class builds.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        num_nodes: int,
        num_node_feats: int = 0,
        pretrain_emb: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        self.num_nodes = num_nodes
        self.num_node_feats = num_node_feats
        self.pretrain_emb = pretrain_emb

        # Input layer sizing — reference create_input_layer (model.py:229-249):
        # with node feats, a fresh trainable table is ADDED when
        # train_node_emb, else a frozen pretrained one if provided; without
        # node feats a pretrained table (frozen, from_pretrained semantics)
        # wins over a fresh one whenever given.
        self.use_emb = False
        self.use_pretrained = False
        emb_dim = 0
        if cfg.use_node_feats:
            input_dim = num_node_feats
            if cfg.train_node_emb:
                self.use_emb = True
                emb_dim = cfg.emb_hidden_channels
                input_dim += emb_dim
            elif pretrain_emb is not None:
                self.use_emb = True
                self.use_pretrained = True
                emb_dim = pretrain_emb.shape[1]
                input_dim += emb_dim
        else:
            self.use_emb = True
            if pretrain_emb is not None:
                self.use_pretrained = True
                emb_dim = pretrain_emb.shape[1]
            else:
                emb_dim = cfg.emb_hidden_channels
            input_dim = emb_dim
        self.emb_dim = emb_dim
        self.input_dim = input_dim
        self.emb_trainable = self.use_emb and not self.use_pretrained

        self.compute_dtype = jnp.dtype(cfg.compute_dtype)
        self._opt = _make_optimizer(cfg.optimizer)
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0, 1),
            static_argnums=(11,),  # use_margin
        )
        self._encode = jax.jit(self._encode_impl)
        self._predict_chunk = jax.jit(self._predict_chunk_impl)
        self._predict_mapped = jax.jit(self._predict_mapped_impl)
        self._sharded_predict_fns: Dict[Any, Any] = {}

    # -- parameters ---------------------------------------------------------

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        """Fresh parameters — reference param_init (model.py:92-96):
        xavier-uniform embedding, torch-default resets elsewhere."""
        k_emb, k_enc, k_pred = jax.random.split(key, 3)
        params: Dict[str, Any] = {
            "encoder": init_encoder(
                k_enc,
                self.cfg.encoder,
                self.input_dim,
                self.cfg.gnn_hidden_channels,
                self.cfg.gnn_num_layers,
            ),
            "predictor": init_predictor(
                k_pred,
                self.cfg.predictor,
                self.cfg.mlp_hidden_channels,
                self.cfg.mlp_num_layers,
            ),
        }
        if self.use_emb:
            if self.use_pretrained:
                params["emb"] = jnp.asarray(self.pretrain_emb, jnp.float32)
            else:
                params["emb"] = xavier_uniform(
                    k_emb, (self.num_nodes, self.emb_dim)
                )
        return params

    def param_count(self, params=None) -> int:
        """Total parameter count, frozen embeddings included — matching the
        reference's para_list accounting (model.py:80-83, main.py:209-212)."""
        if params is None:
            params = self.init_params(jax.random.PRNGKey(0))
        return sum(
            int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
        )

    def init_opt_state(self, params):
        return self._opt.init(params)

    def _input_feat(self, params, node_feats):
        """emb ⊕ raw features — reference create_input_feat (model.py:98-105)."""
        if self.cfg.use_node_feats:
            assert node_feats is not None
            if self.use_emb:
                return jnp.concatenate([params["emb"], node_feats], axis=-1)
            return node_feats
        return params["emb"]

    # -- training -----------------------------------------------------------

    def _loss_impl(
        self, params, graph, graph_t, node_feats, pos, neg, margin, mask, key
    ):
        """Forward + loss for one pair batch (reference model.py:147-160)."""
        cfg = self.cfg
        k_enc, k_pos, k_neg = jax.random.split(key, 3)
        x = self._input_feat(params, node_feats).astype(self.compute_dtype)
        h = apply_encoder(
            params["encoder"],
            cfg.encoder,
            graph,
            x,
            graph_t=graph_t,
            dropout=cfg.dropout,
            train=True,
            rng=k_enc,
            remat=cfg.remat,
        )
        # Score pos and neg pairs in ONE predictor call: two fused gathers
        # instead of four and a single larger MXU batch (row-count is what
        # the gather costs; op count and matmul batching still matter).
        # NB: factoring the local sampler's shared source row out of the
        # gather (reusing the positive rows, 37.5% fewer gathered/scattered
        # rows at num_neg=3) was measured OUT on v5e: every variant
        # (broadcast product, separate matmuls, fused gather+slices) lost
        # 3-11 ms to this generic form because XLA:TPU fuses the
        # gather->compute->scatter chain here better than any manual
        # row-dedup graph — see RESULTS.md "pair-scoring wall".
        del k_neg  # one rng drives the fused batch's dropout masks
        # NB: the %1024 gather residue (RESULTS.md "gather wall") does NOT
        # apply here — padding the pair batch off the residue was A/B'd on
        # chip and LOSES ~11% (14.6 -> 16.3 ms at ddi shape) because this
        # gather fuses into the predictor chain instead of materializing;
        # the residue penalty only exists for materialized gathers like the
        # blocked SpMM's x[blk_src] (graph._align_blocks, which stays).
        b = pos.shape[0]
        all_pairs = jnp.concatenate([pos, neg.reshape(-1, 2)], axis=0)
        npairs = all_pairs.shape[0]
        out = apply_predictor(
            params["predictor"], cfg.predictor,
            h[all_pairs[:, 0]], h[all_pairs[:, 1]],
            dropout=cfg.dropout, train=True, rng=k_pos,
        )
        out = out.reshape(out.shape[0], -1)[:npairs]
        pos_out, neg_out = out[:b], out[b:]
        # Loss math always accumulates in f32 regardless of compute dtype.
        return calculate_loss(
            cfg.loss_func,
            pos_out.astype(jnp.float32),
            neg_out.astype(jnp.float32),
            cfg.num_neg,
            margin=margin,
            mask=mask,
        )

    def _train_step_impl(
        self,
        params,
        opt_state,
        graph,
        graph_t,
        node_feats,
        pos,
        neg,
        margin,
        mask,
        lr,
        key,
        use_margin: bool,
    ):
        loss, grads = jax.value_and_grad(self._loss_impl)(
            params,
            graph,
            graph_t,
            node_feats,
            pos,
            neg,
            margin if use_margin else None,
            mask,
            key,
        )
        if self.cfg.grad_clip_norm >= 0:
            # Reference clips encoder and predictor groups separately and
            # does NOT clip the embedding (model.py:163-165).
            grads = dict(grads)
            grads["encoder"] = _clip_subtree(
                grads["encoder"], self.cfg.grad_clip_norm
            )
            grads["predictor"] = _clip_subtree(
                grads["predictor"], self.cfg.grad_clip_norm
            )
        if self.use_emb and not self.emb_trainable:
            grads = dict(grads)
            grads["emb"] = jnp.zeros_like(grads["emb"])
        updates, opt_state = self._opt.update(grads, opt_state, params)
        if self.use_emb and not self.emb_trainable:
            # A zero GRADIENT is not enough to freeze the table: decoupled
            # weight decay (AdamW wd=0.01, SGD wd=1e-5) adds wd*param to the
            # update regardless of the gradient.  The reference excludes a
            # frozen from_pretrained embedding from the optimizer entirely
            # (model.py:80-90, 235-247) — zero the UPDATE to match.
            updates = dict(updates)
            updates["emb"] = jnp.zeros_like(updates["emb"])
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def sample_negatives(
        self, key, graph: Graph, pos_edges: jnp.ndarray
    ) -> jnp.ndarray:
        """Dispatch by sampler name — reference utils.py:16-32 (default:
        anything ∉ {local, global} falls through to global-perm)."""
        cfg = self.cfg
        p = pos_edges.shape[0]
        if cfg.neg_sampler == "local":
            return local_neg_sample(key, pos_edges, self.num_nodes, cfg.num_neg)
        if cfg.neg_sampler == "global":
            return global_neg_sample(key, graph, p, cfg.num_neg)
        return global_perm_neg_sample(key, graph, p, cfg.num_neg)

    def train_epoch(
        self,
        params,
        opt_state,
        graph,
        graph_t,
        node_feats,
        pos_edges: jnp.ndarray,
        weights: Optional[jnp.ndarray],
        key: jax.Array,
        lr: float,
        sample_graph: Optional[Graph] = None,
        num_pos: Optional[int] = None,
        pos_mask: Optional[jnp.ndarray] = None,
        mesh=None,
    ):
        """One epoch — reference BaseModel.train (model.py:128-173).

        ``pos_edges`` may be capacity-padded; ``num_pos`` is the real count
        (padded tail is masked out of every loss).  ``pos_mask`` additionally
        invalidates arbitrary entries (static-shape random-walk augmentation
        marks self-pairs invalid instead of compacting — same loss content as
        the reference's dynamic removal at main.py:250-252).
        ``sample_graph`` is the edge set used for negative-sampling exclusion
        (the reference passes data.edge_index there, main.py:133).
        """
        cfg = self.cfg
        p_cap = pos_edges.shape[0]
        p_real = num_pos if num_pos is not None else p_cap
        use_margin = weights is not None
        k_neg, k_perm, k_steps = jax.random.split(key, 3)

        sg = sample_graph if sample_graph is not None else graph
        neg_edges = self.sample_negatives(k_neg, sg, pos_edges)

        # Shuffle real positives; padded tail stays at the end, masked.
        perm = jax.random.permutation(k_perm, p_real)
        if p_cap > p_real:
            perm = jnp.concatenate(
                [perm, jnp.arange(p_real, p_cap, dtype=perm.dtype)]
            )
        pos_edges = pos_edges[perm]
        neg_edges = neg_edges[perm]
        valid = (jnp.arange(p_cap) < p_real).astype(jnp.float32)
        if pos_mask is not None:
            valid = valid * pos_mask[perm].astype(jnp.float32)
        if use_margin:
            weights = weights[perm]
        else:
            weights = jnp.zeros((p_cap,), jnp.float32)

        b = min(cfg.batch_size, p_cap)
        num_batches = max(1, math.ceil(p_real / b))
        step_keys = jax.random.split(k_steps, num_batches)
        lr_arr = jnp.asarray(lr, jnp.float32)
        # Pair-batch data parallelism: with a mesh whose 'data' axis > 1,
        # place each batch sharded over 'data' so XLA SPMD splits the pair
        # scoring (the step's dominant cost) across those devices.  Sharding
        # is value-neutral — losses match the replicated run exactly.
        shard_b = None
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            ndata = mesh.shape["data"]
            if b % ndata == 0:
                from jax.sharding import NamedSharding, PartitionSpec

                def shard_b(x, spec_dims):
                    spec = PartitionSpec("data", *([None] * spec_dims))
                    return jax.device_put(x, NamedSharding(mesh, spec))
            else:
                # Never drop requested parallelism silently: the run would
                # complete at single-device throughput with the 'data'
                # devices idle and nothing in the log saying why.
                import warnings

                warnings.warn(
                    f"batch_size {b} is not divisible by the mesh 'data' "
                    f"axis ({ndata}); pair batches run UNSHARDED this "
                    f"epoch — pad batch_size to a multiple of {ndata} to "
                    f"use data parallelism",
                    stacklevel=2,
                )
        losses = []
        counts = []
        for i in range(num_batches):
            lo = i * b
            hi = min(lo + b, p_cap)
            fresh_lo = lo
            if hi - lo < b:
                # Static-shape final batch: take the LAST b entries; entries
                # overlapping the previous batch are masked out of the loss.
                lo = p_cap - b
            mask = jax.lax.dynamic_slice_in_dim(valid, lo, b)
            if fresh_lo > lo:
                mask = mask * (jnp.arange(b) + lo >= fresh_lo)
            pos_b = jax.lax.dynamic_slice_in_dim(pos_edges, lo, b)
            neg_b = jax.lax.dynamic_slice_in_dim(neg_edges, lo, b)
            w_b = jax.lax.dynamic_slice_in_dim(weights, lo, b)
            # Count valid pairs BEFORE sharding: eager reductions over a
            # mesh-sharded operand abort XLA:CPU when several meshes have
            # existed in one process, and the count is mesh-independent.
            cnt = jnp.sum(mask)
            if shard_b is not None:
                pos_b = shard_b(pos_b, 1)
                neg_b = shard_b(neg_b, 2)
                w_b = shard_b(w_b, 0)
                mask = shard_b(mask, 0)
            params, opt_state, loss = self._train_step(
                params,
                opt_state,
                graph,
                graph_t,
                node_feats,
                pos_b,
                neg_b,
                w_b,
                mask,
                lr_arr,
                step_keys[i],
                use_margin,
            )
            # Keep loss/count on device until the end — no per-step sync.
            losses.append(loss)
            counts.append(cnt)
        losses, counts = jax.device_get((losses, counts))
        total = float(sum(l * c for l, c in zip(losses, counts)))
        return params, opt_state, total / max(float(sum(counts)), 1.0)

    # -- evaluation ---------------------------------------------------------

    def _encode_impl(self, params, graph, graph_t, node_feats):
        x = self._input_feat(params, node_feats).astype(self.compute_dtype)
        h = apply_encoder(
            params["encoder"], self.cfg.encoder, graph, x,
            graph_t=graph_t, train=False,
        )
        # Unseen-node convention: index -1 (mapped to row N) resolves to the
        # mean representation (reference model.py:191-194).
        h = h.astype(jnp.float32)  # metrics rank in f32
        mean_h = jnp.mean(h, axis=0, keepdims=True)
        return jnp.concatenate([h, mean_h], axis=0)

    def _predict_chunk_impl(self, params, h, edges):
        n = self.num_nodes
        c = edges.shape[0]
        # (%1024-residue padding was tried here too and A/B'd as a no-op:
        # the eval-chunk gather fuses into the predictor — see _loss_impl.)
        e0 = jnp.where(edges[:, 0] < 0, n, edges[:, 0])
        e1 = jnp.where(edges[:, 1] < 0, n, edges[:, 1])
        out = apply_predictor(
            params["predictor"], self.cfg.predictor, h[e0], h[e1], train=False
        )
        return out.reshape(-1)[:c].astype(jnp.float32)

    def _predict_mapped_impl(self, params, h, chunks):
        # lax.map keeps per-chunk memory bounded while staying in ONE
        # compiled computation — a single host sync for the whole edge set
        # (the per-chunk-python-loop version costs one device round-trip per
        # 64Ki chunk, which dominates eval at citation2 scale).
        return jax.lax.map(
            lambda c: self._predict_chunk_impl(params, h, c), chunks
        )

    def batch_predict(self, params, h, edges: jnp.ndarray, mesh=None) -> jnp.ndarray:
        """Chunked pair scoring — reference batch_predict (model.py:175-182).

        With ``mesh``, chunks are sharded over the 'data' axis and each
        device lax.maps its own share (data-parallel eval for the 86M-pair
        citation2 sets); without, a single-device lax.map.

        Returns a DEVICE array: predictions feed straight into the jitted
        Hits@K/MRR metrics.  (The reference copies each chunk to CPU,
        model.py:180, because the OGB evaluator is NumPy — here a
        device->host round trip of the 344 MB citation2 prediction sets
        would dominate eval, so only the final metric scalars leave the
        device.)"""
        bs = self.cfg.eval_batch_size or self.cfg.batch_size
        m = edges.shape[0]
        if m == 0:
            return jnp.zeros((0,), jnp.float32)
        nchunks = max(1, -(-m // bs))
        if mesh is not None:
            ndata = mesh.shape.get("data", 1)
            nchunks = -(-nchunks // ndata) * ndata
        pad = nchunks * bs - m
        if pad:
            edges = jnp.concatenate([edges, jnp.zeros((pad, 2), edges.dtype)])
        chunks = edges.reshape(nchunks, bs, 2)
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            out = self._predict_sharded(params, h, chunks, mesh)
        else:
            out = self._predict_mapped(params, h, chunks)
        return out.reshape(-1)[:m]

    def _predict_sharded(self, params, h, chunks, mesh):
        # Cache the jitted shard_map per mesh: rebuilding the closure every
        # call would defeat the jit cache and recompile on each of the 4
        # batch_predict calls per eval epoch.
        fn = self._sharded_predict_fns.get(mesh)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            def body(params, h, chunks_local):
                return jax.lax.map(
                    lambda c: self._predict_chunk_impl(params, h, c),
                    chunks_local,
                )

            # params and h replicated (h may arrive node-sharded from a
            # GraphParallel encode — pairs index arbitrary rows, so scoring
            # wants the full table per device); chunks split over 'data'.
            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(), P("data", None, None)),
                    out_specs=P("data", None),
                )
            )
            self._sharded_predict_fns[mesh] = fn
        return fn(params, h, chunks)

    def test(
        self,
        params,
        graph,
        graph_t,
        node_feats,
        split_edges: Dict[str, Dict[str, jnp.ndarray]],
        eval_metric: str = "hits",
        mesh=None,
    ):
        """Reference BaseModel.test (model.py:184-226): encode full graph,
        score valid/test pos+neg pairs, Hits@K or MRR.  ``mesh`` shards the
        pair scoring over the 'data' axis (multi-chip eval)."""
        h = self._encode(params, graph, graph_t, node_feats)
        preds = {}
        for split in ("valid", "test"):
            preds[split] = {
                "pos": self.batch_predict(
                    params, h, split_edges[split]["pos"], mesh=mesh
                ),
                "neg": self.batch_predict(
                    params, h, split_edges[split]["neg"], mesh=mesh
                ),
            }
        if eval_metric == "mrr":
            npos_v = preds["valid"]["pos"].shape[0]
            npos_t = preds["test"]["pos"].shape[0]
            return evaluate_mrr(
                preds["valid"]["pos"],
                preds["valid"]["neg"].reshape(npos_v, -1),
                preds["test"]["pos"],
                preds["test"]["neg"].reshape(npos_t, -1),
            )
        return evaluate_hits(
            preds["valid"]["pos"],
            preds["valid"]["neg"],
            preds["test"]["pos"],
            preds["test"]["neg"],
        )


def adjust_lr(base_lr: float, decay_ratio: float) -> float:
    """Linear LR decay floored at lr·1e-4 (reference model.py:279-286)."""
    return max(base_lr * (1 - decay_ratio), base_lr * 1e-4)
