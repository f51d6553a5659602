"""All 9 losses vs direct NumPy transcriptions of reference loss.py:5-62."""

import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu import losses as L


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.fixture
def batch(rng):
    p, k = 17, 3
    pos = rng.standard_normal(p).astype(np.float32)
    neg = rng.standard_normal(p * k).astype(np.float32)
    w = rng.random(p).astype(np.float32) + 0.5
    return pos, neg, w, p, k


def _np_pair(pos, neg, k):
    return pos.reshape(-1, 1), neg.reshape(-1, k)


def test_auc(batch):
    pos, neg, _, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    expect = np.square(1 - (po - ne)).sum()
    got = L.auc_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_hinge_auc(batch):
    pos, neg, _, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    expect = np.square(np.clip(1 - (po - ne), 0, None)).sum()
    got = L.hinge_auc_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_weighted_auc(batch):
    pos, neg, w, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    expect = (w.reshape(-1, 1) * np.square(1 - (po - ne))).sum()
    got = L.weighted_auc_loss(jnp.asarray(pos), jnp.asarray(neg), k, jnp.asarray(w))
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_adaptive_auc(batch):
    pos, neg, w, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    expect = np.square(w.reshape(-1, 1) - (po - ne)).sum()
    got = L.adaptive_auc_loss(jnp.asarray(pos), jnp.asarray(neg), k, jnp.asarray(w))
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_weighted_hinge_auc(batch):
    pos, neg, w, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    wc = w.reshape(-1, 1)
    expect = (wc * np.square(np.clip(wc - (po - ne), 0, None))).sum()
    got = L.weighted_hinge_auc_loss(
        jnp.asarray(pos), jnp.asarray(neg), k, jnp.asarray(w)
    )
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_adaptive_hinge_auc(batch):
    pos, neg, w, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    wc = w.reshape(-1, 1)
    expect = np.square(np.clip(wc - (po - ne), 0, None)).sum()
    got = L.adaptive_hinge_auc_loss(
        jnp.asarray(pos), jnp.asarray(neg), k, jnp.asarray(w)
    )
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_log_rank(batch):
    pos, neg, _, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    expect = -np.log(_sig(po - ne) + 1e-15).mean()
    got = L.log_rank_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_ce(batch):
    pos, neg, _, p, k = batch
    expect = -np.log(_sig(pos) + 1e-15).mean() - np.log(1 - _sig(neg) + 1e-15).mean()
    got = L.ce_loss(jnp.asarray(pos), jnp.asarray(neg))
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_info_nce(batch):
    pos, neg, _, p, k = batch
    po, ne = _np_pair(pos, neg, k)
    pe = np.exp(po)
    nse = np.exp(ne).sum(1, keepdims=True)
    expect = (-np.log(pe / (pe + nse) + 1e-15)).mean()
    got = L.info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_stable_info_nce_matches_reference_formula(batch):
    """StableInfoNCE == InfoNCE wherever the reference formula is finite."""
    pos, neg, _, p, k = batch
    ref = L.info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    got = L.info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), k, stable=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    via_dispatch = L.calculate_loss(
        "StableInfoNCE", jnp.asarray(pos), jnp.asarray(neg), k
    )
    np.testing.assert_allclose(float(via_dispatch), float(got), rtol=1e-7)


def test_stable_info_nce_large_scores():
    """At |score| ~ 100 the reference formula overflows exp() to nan in f32
    (documented quirk); the stable path stays finite with correct values."""
    import jax

    p, k = 8, 3
    rng = np.random.default_rng(3)
    pos = (100.0 * rng.standard_normal(p)).astype(np.float32)
    neg = (100.0 * rng.standard_normal(p * k)).astype(np.float32)
    unstable = L.info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    assert not np.isfinite(float(unstable))  # pin the overflow bound quirk
    stable = L.info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), k, stable=True)
    # f64 ground truth via logsumexp identity
    po = pos.astype(np.float64).reshape(-1, 1)
    ne = neg.astype(np.float64).reshape(-1, k)
    z = np.concatenate([np.zeros_like(po), ne - po], axis=1)
    zm = z.max(1, keepdims=True)
    expect = (zm + np.log(np.exp(z - zm).sum(1, keepdims=True))).mean()
    np.testing.assert_allclose(float(stable), expect, rtol=1e-5)
    # gradient must be finite too
    g = jax.grad(
        lambda a, b: L.info_nce_loss(a, b, k, stable=True)
    )(jnp.asarray(pos), jnp.asarray(neg))
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_equals_unpadded(batch):
    """Padding with mask must equal the unpadded loss for every loss."""
    pos, neg, w, p, k = batch
    pad = 5
    pos_p = np.concatenate([pos, np.zeros(pad, np.float32)])
    neg_p = np.concatenate([neg, np.zeros(pad * k, np.float32)])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])
    mask = np.concatenate([np.ones(p, np.float32), np.zeros(pad, np.float32)])
    for name in L.LOSS_NAMES:
        full = L.calculate_loss(name, jnp.asarray(pos), jnp.asarray(neg), k, jnp.asarray(w))
        padded = L.calculate_loss(
            name,
            jnp.asarray(pos_p),
            jnp.asarray(neg_p),
            k,
            jnp.asarray(w_p),
            mask=jnp.asarray(mask),
        )
        np.testing.assert_allclose(float(padded), float(full), rtol=1e-5, err_msg=name)


def test_margin_none_falls_back_to_auc(batch):
    """Reference model.py:116-125: margin-losses with margin=None -> AUC."""
    pos, neg, _, p, k = batch
    base = L.auc_loss(jnp.asarray(pos), jnp.asarray(neg), k)
    for name in ("AdaAUC", "WeightedAUC", "AdaHingeAUC", "WeightedHingeAUC"):
        got = L.calculate_loss(name, jnp.asarray(pos), jnp.asarray(neg), k, margin=None)
        np.testing.assert_allclose(float(got), float(base), rtol=1e-6)
