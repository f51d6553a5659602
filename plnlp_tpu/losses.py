"""The nine pairwise ranking losses (reference plnlp/loss.py:5-62) in JAX.

Shape contract (identical to the reference): ``pos_out`` flattens to (P, 1),
``neg_out`` to (P, num_neg); every loss broadcasts positive-vs-its-own-
negatives.  AUC-family losses are SUMS over the (P, num_neg) matrix;
LogRank/CE/InfoNCE are MEANS — preserved exactly since gradient scale affects
training dynamics.

Extension over the reference: each loss takes an optional ``mask`` of shape
(P,) so that a zero-padded final mini-batch (static-shape TPU batching)
contributes nothing — masked entries are dropped from sums and from mean
denominators.  With ``mask=None`` the math is bit-for-bit the reference
formula.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "auc_loss",
    "hinge_auc_loss",
    "weighted_auc_loss",
    "adaptive_auc_loss",
    "weighted_hinge_auc_loss",
    "adaptive_hinge_auc_loss",
    "log_rank_loss",
    "ce_loss",
    "info_nce_loss",
    "calculate_loss",
    "LOSS_NAMES",
]

_EPS = 1e-15


def _pair(pos_out, neg_out, num_neg):
    pos = jnp.reshape(pos_out, (-1, 1))
    neg = jnp.reshape(neg_out, (pos.shape[0], num_neg))
    return pos, neg


def _masked_sum(x, mask):
    if mask is None:
        return jnp.sum(x)
    return jnp.sum(x * mask.reshape(-1, 1))

def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    m = mask.reshape(-1, 1)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m) * x.shape[1], 1.0)


def auc_loss(pos_out, neg_out, num_neg, mask=None):
    """Σ (1 − (pos − neg))² (reference loss.py:5-8)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    return _masked_sum(jnp.square(1 - (pos - neg)), mask)


def hinge_auc_loss(pos_out, neg_out, num_neg, mask=None):
    """Σ clamp(1 − (pos − neg), 0)² (reference loss.py:11-14)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    return _masked_sum(jnp.square(jnp.maximum(1 - (pos - neg), 0)), mask)


def weighted_auc_loss(pos_out, neg_out, num_neg, weight, mask=None):
    """Σ w·(1 − (pos − neg))² (reference loss.py:17-21)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    w = jnp.reshape(weight, (-1, 1))
    return _masked_sum(w * jnp.square(1 - (pos - neg)), mask)


def adaptive_auc_loss(pos_out, neg_out, num_neg, margin, mask=None):
    """Σ (m − (pos − neg))² (reference loss.py:24-28)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    m = jnp.reshape(margin, (-1, 1))
    return _masked_sum(jnp.square(m - (pos - neg)), mask)


def weighted_hinge_auc_loss(pos_out, neg_out, num_neg, weight, mask=None):
    """Σ w·clamp(w − (pos − neg), 0)² — weight doubles as margin
    (reference loss.py:31-35; quirk noted in SURVEY §2a)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    w = jnp.reshape(weight, (-1, 1))
    return _masked_sum(w * jnp.square(jnp.maximum(w - (pos - neg), 0)), mask)


def adaptive_hinge_auc_loss(pos_out, neg_out, num_neg, weight, mask=None):
    """Σ clamp(w − (pos − neg), 0)² (reference loss.py:38-42)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    w = jnp.reshape(weight, (-1, 1))
    return _masked_sum(jnp.square(jnp.maximum(w - (pos - neg), 0)), mask)


def log_rank_loss(pos_out, neg_out, num_neg, mask=None):
    """−mean log σ(pos − neg) — BPR (reference loss.py:45-48)."""
    pos, neg = _pair(pos_out, neg_out, num_neg)
    return -_masked_mean(jnp.log(_sigmoid(pos - neg) + _EPS), mask)


def ce_loss(pos_out, neg_out, mask=None, neg_mask=None):
    """Independent binary CE on pos and neg scores (reference loss.py:51-54).

    Note: the reference applies NO pairing/reshape here; pos and neg batches
    are averaged separately.  ``neg_mask`` masks the flattened neg batch.
    """
    ps = _sigmoid(jnp.reshape(pos_out, (-1,)))
    ns = _sigmoid(jnp.reshape(neg_out, (-1,)))
    pl = -jnp.log(ps + _EPS)
    nl = -jnp.log(1 - ns + _EPS)
    if mask is None:
        pos_loss = jnp.mean(pl)
    else:
        m = mask.reshape(-1)
        pos_loss = jnp.sum(pl * m) / jnp.maximum(jnp.sum(m), 1.0)
    if neg_mask is None and mask is None:
        neg_loss = jnp.mean(nl)
    else:
        if neg_mask is None:
            # neg batch is (P*num_neg,) grouped per positive
            rep = nl.shape[0] // mask.shape[0]
            neg_mask = jnp.repeat(mask.reshape(-1), rep)
        nm = neg_mask.reshape(-1)
        neg_loss = jnp.sum(nl * nm) / jnp.maximum(jnp.sum(nm), 1.0)
    return pos_loss + neg_loss


def info_nce_loss(pos_out, neg_out, num_neg, mask=None, stable=False):
    """−mean log(eᵖ/(eᵖ + Σeⁿ)) (reference loss.py:57-62).

    ``stable=False`` keeps the reference's unstabilized ``exp`` exactly:
    it OVERFLOWS to nan once any score exceeds ~88 in f32 (exp(88) ≈
    1.7e38 ≈ f32 max) — a faithful parity quirk, not a feature.
    ``stable=True`` (loss name ``StableInfoNCE``) computes the identical
    quantity as logsumexp([0, neg − pos]) — finite for any score
    magnitude, and equal to the reference formula (within _EPS) wherever
    the reference formula is finite.
    """
    pos, neg = _pair(pos_out, neg_out, num_neg)
    if stable:
        # −log σ-style form: log(1 + Σ e^(neg−pos)) via max-subtracted
        # logsumexp over the (num_neg + 1)-way [0, neg − pos] columns.
        z = jnp.concatenate([jnp.zeros_like(pos), neg - pos], axis=1)
        zmax = jnp.max(z, axis=1, keepdims=True)
        x = (zmax + jnp.log(jnp.sum(jnp.exp(z - zmax), axis=1, keepdims=True)))
    else:
        pos_exp = jnp.exp(pos)
        neg_exp = jnp.sum(jnp.exp(neg), axis=1, keepdims=True)
        x = -jnp.log(pos_exp / (pos_exp + neg_exp) + _EPS)
    if mask is None:
        return jnp.mean(x)
    m = mask.reshape(-1, 1)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


LOSS_NAMES = (
    "AUC",
    "HingeAUC",
    "WeightedAUC",
    "AdaAUC",
    "WeightedHingeAUC",
    "AdaHingeAUC",
    "LogRank",
    "CE",
    "InfoNCE",
    # beyond-reference: logsumexp-stable InfoNCE (same math, no f32
    # overflow at |score| ≳ 88 — see info_nce_loss docstring)
    "StableInfoNCE",
)


def calculate_loss(
    loss_name: str,
    pos_out,
    neg_out,
    num_neg: int,
    margin=None,
    mask=None,
):
    """Name → loss dispatch, replicating reference model.py:107-126 exactly:
    margin-taking losses fall back to plain AUC when ``margin is None``."""
    if loss_name == "CE":
        return ce_loss(pos_out, neg_out, mask=mask)
    if loss_name == "InfoNCE":
        return info_nce_loss(pos_out, neg_out, num_neg, mask=mask)
    if loss_name == "StableInfoNCE":
        return info_nce_loss(pos_out, neg_out, num_neg, mask=mask, stable=True)
    if loss_name == "LogRank":
        return log_rank_loss(pos_out, neg_out, num_neg, mask=mask)
    if loss_name == "HingeAUC":
        return hinge_auc_loss(pos_out, neg_out, num_neg, mask=mask)
    if loss_name == "AdaAUC" and margin is not None:
        return adaptive_auc_loss(pos_out, neg_out, num_neg, margin, mask=mask)
    if loss_name == "WeightedAUC" and margin is not None:
        return weighted_auc_loss(pos_out, neg_out, num_neg, margin, mask=mask)
    if loss_name == "AdaHingeAUC" and margin is not None:
        return adaptive_hinge_auc_loss(pos_out, neg_out, num_neg, margin, mask=mask)
    if loss_name == "WeightedHingeAUC" and margin is not None:
        return weighted_hinge_auc_loss(pos_out, neg_out, num_neg, margin, mask=mask)
    return auc_loss(pos_out, neg_out, num_neg, mask=mask)
