"""Hits@K / MRR vs hand-built cases + NumPy transcription of OGB 1.3.2."""

import jax.numpy as jnp
import numpy as np

from plnlp_tpu.metrics import evaluate_hits, evaluate_mrr, hits_at_k, mrr


def _np_hits(pos, neg, k):
    if len(neg) < k:
        return 1.0
    kth = np.sort(neg)[::-1][k - 1]
    return float((pos > kth).mean())


def _np_mrr(pos, neg):
    # Direct transcription of OGB 1.3.2 _eval_mrr (the oracle called at
    # reference plnlp/utils.py:63-76): mean of optimistic and pessimistic
    # rank, +1.
    pos = pos.reshape(-1, 1)
    optimistic = (neg > pos).sum(1)
    pessimistic = (neg >= pos).sum(1)
    rank = 0.5 * (optimistic + pessimistic) + 1
    return float((1.0 / rank).mean())


def test_hits_hand_case():
    pos = jnp.asarray([3.0, 1.0, 0.5])
    neg = jnp.asarray([2.0, 0.9, 0.8, 0.7])
    # K=2: kth best neg = 0.9; pos > 0.9 -> [T, T, F] = 2/3
    np.testing.assert_allclose(hits_at_k(pos, neg, 2), 2 / 3, rtol=1e-6)
    # K=5 > #neg -> 1.0
    assert hits_at_k(pos, neg, 5) == 1.0


def test_hits_random(rng):
    pos = rng.standard_normal(200).astype(np.float32)
    neg = rng.standard_normal(500).astype(np.float32)
    for k in (1, 20, 50, 100):
        np.testing.assert_allclose(
            hits_at_k(jnp.asarray(pos), jnp.asarray(neg), k),
            _np_hits(pos, neg, k),
            rtol=1e-6,
        )


def test_mrr_hand_case():
    pos = jnp.asarray([1.0, 0.1])
    neg = jnp.asarray([[0.5, 2.0, 0.2], [0.2, 0.3, 0.05]])
    # ranks: pos0 beaten by 2.0 -> rank 2; pos1 beaten by 0.2,0.3 -> rank 3
    np.testing.assert_allclose(mrr(pos, neg), (1 / 2 + 1 / 3) / 2, rtol=1e-6)


def test_mrr_tie_semantics():
    # Deliberate pos == neg ties: OGB 1.3.2 averages optimistic and
    # pessimistic rank. pos=1.0 vs negs [1.0, 1.0, 0.5]:
    # optimistic #{neg>pos}=0, pessimistic #{neg>=pos}=2 -> rank 2 -> 1/2.
    pos = jnp.asarray([1.0])
    neg = jnp.asarray([[1.0, 1.0, 0.5]])
    np.testing.assert_allclose(mrr(pos, neg), 0.5, atol=1e-9)
    # All four negs tie: rank = 0.5*(0+4)+1 = 3 -> 1/3.
    neg = jnp.asarray([[2.0, 2.0, 2.0, 2.0]])
    np.testing.assert_allclose(mrr(jnp.asarray([2.0]), neg), 1 / 3, atol=1e-9)
    # Mixed rows against the NumPy transcription.
    pos_np = np.asarray([0.0, 1.0, -1.0], dtype=np.float32)
    neg_np = np.asarray(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [-1.0, -1.0, -1.0]], dtype=np.float32
    )
    np.testing.assert_allclose(
        mrr(jnp.asarray(pos_np), jnp.asarray(neg_np)),
        _np_mrr(pos_np, neg_np),
        atol=1e-9,
    )


def test_mrr_random(rng):
    pos = rng.standard_normal(100).astype(np.float32)
    neg = rng.standard_normal((100, 1000)).astype(np.float32)
    np.testing.assert_allclose(
        mrr(jnp.asarray(pos), jnp.asarray(neg)), _np_mrr(pos, neg), rtol=1e-5
    )


def test_evaluate_shapes(rng):
    pv = jnp.asarray(rng.standard_normal(50).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    pt = jnp.asarray(rng.standard_normal(50).astype(np.float32))
    nt = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    h = evaluate_hits(pv, nv, pt, nt)
    assert set(h) == {"Hits@20", "Hits@50", "Hits@100"}
    m = evaluate_mrr(pv, nv.reshape(50, 4), pt, nt.reshape(50, 4))
    assert set(m) == {"MRR"}
    for v, t in list(h.values()) + list(m.values()):
        assert 0.0 <= v <= 1.0 and 0.0 <= t <= 1.0
