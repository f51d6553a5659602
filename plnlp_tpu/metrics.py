"""OGB-exact link-prediction metrics: Hits@K and MRR.

Replaces ogb.linkproppred.Evaluator (reference main.py:10,215 and
plnlp/utils.py:44-80) with JAX/NumPy implementations of the OGB 1.3.2
definitions:

* Hits@K — fraction of positives scoring strictly above the K-th best SHARED
  negative: ``kth = topk(neg, K)[-1]; hits = mean(pos > kth)``; defined as 1.0
  when there are fewer than K negatives.
* MRR — each positive is ranked among ITS OWN row of negatives
  (citation2: 1000 per source).  OGB computes the rank as the position of the
  positive in a descending argsort of [pos | negs]; absent ties this equals
  ``1 + #{neg > pos}``, which is what we compute (deterministic, sort-free —
  OGB's argsort is unstable under ties anyway).

``evaluate_hits`` / ``evaluate_mrr`` reproduce the shapes of reference
utils.py:44-80 (Hits at K ∈ {20,50,100}; MRR averages the per-positive list).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hits_at_k", "mrr", "evaluate_hits", "evaluate_mrr"]


def hits_at_k(pos_pred: jnp.ndarray, neg_pred: jnp.ndarray, k: int) -> float:
    pos_pred = jnp.reshape(pos_pred, (-1,))
    neg_pred = jnp.reshape(neg_pred, (-1,))
    if neg_pred.shape[0] < k:
        return 1.0
    kth = jax.lax.top_k(neg_pred, k)[0][-1]
    return float(jnp.mean((pos_pred > kth).astype(jnp.float32)))


def mrr(pos_pred: jnp.ndarray, neg_pred: jnp.ndarray) -> float:
    """neg_pred: (P, num_neg_per_pos); returns mean reciprocal rank."""
    pos = jnp.reshape(pos_pred, (-1, 1))
    neg = jnp.reshape(neg_pred, (pos.shape[0], -1))
    rank = 1 + jnp.sum((neg > pos).astype(jnp.int32), axis=1)
    return float(jnp.mean(1.0 / rank.astype(jnp.float32)))


def evaluate_hits(
    pos_val_pred,
    neg_val_pred,
    pos_test_pred,
    neg_test_pred,
    ks=(20, 50, 100),
) -> Dict[str, Tuple[float, float]]:
    """Reference utils.py:44-61 shape: {'Hits@K': (valid, test)}."""
    return {
        f"Hits@{k}": (
            hits_at_k(pos_val_pred, neg_val_pred, k),
            hits_at_k(pos_test_pred, neg_test_pred, k),
        )
        for k in ks
    }


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
