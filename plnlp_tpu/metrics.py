"""OGB-exact link-prediction metrics: Hits@K and MRR.

Replaces ogb.linkproppred.Evaluator (reference main.py:10,215 and
plnlp/utils.py:44-80) with JAX/NumPy implementations of the OGB 1.3.2
definitions:

* Hits@K — fraction of positives scoring strictly above the K-th best SHARED
  negative: ``kth = topk(neg, K)[-1]; hits = mean(pos > kth)``; defined as 1.0
  when there are fewer than K negatives.
* MRR — each positive is ranked among ITS OWN row of negatives
  (citation2: 1000 per source).  OGB 1.3.2's ``_eval_mrr`` averages the
  optimistic and pessimistic rank to break ties deterministically:
  ``rank = 0.5 * (#{neg > pos} + #{neg >= pos}) + 1`` — under exact score
  ties (bf16 eval, duplicate embeddings) the positive is credited with the
  MIDDLE of its tie group, exactly as the oracle the reference calls at
  plnlp/utils.py:63-76 does.

``evaluate_hits`` / ``evaluate_mrr`` reproduce the shapes of reference
utils.py:44-80 (Hits at K ∈ {20,50,100}; MRR averages the per-positive list).
Both run as ONE jitted device computation per prediction set — no per-K
top_k/host-float round trips.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["hits_at_k", "mrr", "evaluate_hits", "evaluate_mrr"]


@functools.partial(jax.jit, static_argnames=("ks",))
def _hits_many(pos_pred, neg_pred, ks: Tuple[int, ...]):
    """One fused device computation for every K: a single top_k at max(K)
    yields each K-th threshold; Ks larger than #neg are resolved host-side
    (OGB defines them as 1.0) before tracing, so `ks` here all satisfy
    K <= #neg."""
    pos = jnp.reshape(pos_pred, (-1,)).astype(jnp.float32)
    neg = jnp.reshape(neg_pred, (-1,)).astype(jnp.float32)
    top = jax.lax.top_k(neg, max(ks))[0]
    return tuple(jnp.mean((pos > top[k - 1]).astype(jnp.float32)) for k in ks)


def hits_at_k(pos_pred: jnp.ndarray, neg_pred: jnp.ndarray, k: int) -> float:
    if jnp.reshape(neg_pred, (-1,)).shape[0] < k:
        return 1.0
    return float(_hits_many(pos_pred, neg_pred, (k,))[0])


@jax.jit
def _mrr_device(pos, neg):
    pos = jnp.reshape(pos, (-1, 1)).astype(jnp.float32)
    neg = jnp.reshape(neg, (pos.shape[0], -1)).astype(jnp.float32)
    # OGB 1.3.2 _eval_mrr: optimistic rank #{neg > pos}, pessimistic
    # #{neg >= pos}; final rank is their mean + 1.
    opt = jnp.sum((neg > pos).astype(jnp.float32), axis=1)
    pess = jnp.sum((neg >= pos).astype(jnp.float32), axis=1)
    rank = 0.5 * (opt + pess) + 1.0
    return jnp.mean(1.0 / rank)


def mrr(pos_pred: jnp.ndarray, neg_pred: jnp.ndarray) -> float:
    """neg_pred: (P, num_neg_per_pos); returns mean reciprocal rank with OGB
    1.3.2 tie semantics (mean of optimistic and pessimistic rank)."""
    return float(_mrr_device(pos_pred, neg_pred))


def evaluate_hits(
    pos_val_pred,
    neg_val_pred,
    pos_test_pred,
    neg_test_pred,
    ks=(20, 50, 100),
) -> Dict[str, Tuple[float, float]]:
    """Reference utils.py:44-61 shape: {'Hits@K': (valid, test)}.

    Each prediction set is scored by ONE device call covering every K (the
    old per-K path synced to host three times per set)."""
    out: Dict[str, Tuple[float, float]] = {}
    results = []
    for pos, neg in ((pos_val_pred, neg_val_pred), (pos_test_pred, neg_test_pred)):
        n = int(jnp.reshape(neg, (-1,)).shape[0])
        live = tuple(k for k in ks if k <= n)
        vals = _hits_many(pos, neg, live) if live else ()
        by_k = dict(zip(live, vals))
        results.append({k: float(by_k[k]) if k in by_k else 1.0 for k in ks})
    for k in ks:
        out[f"Hits@{k}"] = (results[0][k], results[1][k])
    return out


def evaluate_mrr(
    pos_val_pred,
    neg_val_pred,
    pos_test_pred,
    neg_test_pred,
) -> Dict[str, Tuple[float, float]]:
    """Reference utils.py:64-80 shape: {'MRR': (valid, test)}; neg preds are
    reshaped to (num_pos, -1) exactly as there."""
    return {
        "MRR": (
            mrr(pos_val_pred, neg_val_pred),
            mrr(pos_test_pred, neg_test_pred),
        )
    }
