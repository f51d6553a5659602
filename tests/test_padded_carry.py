"""Padded-carry over perm-free hybrid operands (round 5).

apply_encoder runs the whole layer stack at n_pad = num_nodes rounded up
to the tile size when the HybridGraph carries no perms (the CLI id-space
relabel path), eliminating the per-layer pad/slice HBM round-trips of the
tile ops.  Chip A/B at collab scale: TRANSFORMER 55.6 -> 52.6 ms (1.06x),
2-layer 107.3 -> 100.9 ms; SAGE x2 1.02x (RESULTS.md round 5).

These tests pin the correctness contract: padded inputs produce identical
real rows and EXACTLY zero pad rows / pad-row cotangents, for every
encoder, against both the unpadded hybrid call and the blocked/segment
oracle.  Pad rows are deliberately poisoned to prove the masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.graph import _pad_to, prepare_graph
from plnlp_tpu.models.encoders import apply_encoder, init_encoder
from plnlp_tpu.ops.spmm import spmm_segment
from plnlp_tpu.ops.tile_spmm import build_hybrid, hybrid_spmm

TILE = 16
N = 100  # deliberately NOT a multiple of TILE


def _community_graph(rng):
    src, dst = [], []
    for c in (0, 50):
        src.append(rng.integers(c, c + 50, 800))
        dst.append(rng.integers(c, c + 50, 800))
    src.append(rng.integers(0, N, 60))
    dst.append(rng.integers(0, N, 60))
    src = np.concatenate(src)
    dst = np.concatenate(dst)
    m = src != dst
    keys = np.unique(src[m].astype(np.int64) * N + dst[m])
    return (keys // N).astype(np.int64), (keys % N).astype(np.int64)


@pytest.fixture(scope="module")
def operands():
    rng = np.random.default_rng(0)
    src, dst = _community_graph(rng)
    hg = build_hybrid(
        src, dst, num_nodes=N, tile=TILE, min_fill=4, reorder="none"
    )
    assert hg.perm_in is None and hg.num_tiles > 0 and hg.res_edges > 0
    g, gt = prepare_graph(
        src, dst, num_nodes=N, block=(16, 16), couple_transpose=True
    )
    x = jnp.asarray(rng.normal(size=(N, 32)), jnp.float32)
    return hg, g, gt, x


def _poison_pad(x):
    n_pad = _pad_to(N, TILE)
    return jnp.pad(x, ((0, n_pad - N), (0, 0))).at[N:].set(1e6)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_hybrid_spmm_padded_matches_unpadded(operands, reduce):
    hg, g, _, x = operands
    a = hybrid_spmm(hg, x, reduce)
    b = hybrid_spmm(hg, _poison_pad(x), reduce)
    assert b.shape[0] == _pad_to(N, TILE)
    # poisoned pad sources must not leak into real rows, pad rows are zero
    assert float(jnp.abs(b[N:]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b[:N]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a),
        np.asarray(spmm_segment(g, x, reduce)),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.parametrize("name", ["SAGE", "GCN", "WSAGE", "TRANSFORMER"])
def test_encoder_padded_carry_value_and_grad(operands, name):
    hg, g, gt, x = operands
    params = init_encoder(jax.random.PRNGKey(1), name, 32, 32, 2)

    def f_hybrid(p, xx):
        return jnp.sum(apply_encoder(p, name, hg, xx, graph_t=None) ** 2)

    def f_oracle(p, xx):
        return jnp.sum(apply_encoder(p, name, g, xx, graph_t=gt) ** 2)

    vh, grads_h = jax.value_and_grad(f_hybrid, argnums=(0, 1))(params, x)
    vo, grads_o = jax.value_and_grad(f_oracle, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(vh), float(vo), rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        ),
        grads_h,
        grads_o,
    )


def test_padded_input_cotangents_are_zero(operands):
    """The VJP through a pre-padded hybrid call must return exactly zero
    cotangents for pad rows (the proof that pad rows cannot influence the
    loss through any path)."""
    hg, _, _, x = operands
    xp = _poison_pad(x)

    def f(xx):
        return jnp.sum(hybrid_spmm(hg, xx, "sum")[:N] ** 2)

    gx = jax.grad(f)(xp)
    assert gx.shape[0] == _pad_to(N, TILE)
    assert float(jnp.abs(gx[N:]).max()) == 0.0


def test_flash_path_padded_carry_interpret(operands, monkeypatch):
    """The FLASH kernels (interpret mode) under padded-carry: apply_encoder
    (padded) must match a direct unpadded hybrid_transformer_conv call —
    the explicit counterpart of the chip A/B's value-parity check (the
    scan path is covered by the parametrized encoder test above)."""
    import functools

    import plnlp_tpu.ops.pallas_attention as pa
    import plnlp_tpu.ops.tile_attention as ta

    monkeypatch.setattr(pa, "attention_pallas_supported", lambda t, d: True)
    for name in ("flash_tiles_fwd", "flash_tiles_dq", "flash_tiles_dkv"):
        orig = getattr(pa, name)
        monkeypatch.setattr(pa, name, functools.partial(orig, interpret=True))

    hg, _, _, x = operands
    params = init_encoder(jax.random.PRNGKey(4), "TRANSFORMER", 32, 32, 1)
    assert ta._flash_supported(hg, 32)
    lp = params["layers"][0]

    def f_padded(xx):
        return jnp.sum(
            apply_encoder(params, "TRANSFORMER", hg, xx, graph_t=None) ** 2
        )

    def f_direct(xx):
        out = jax.nn.relu(ta.hybrid_transformer_conv(lp, hg, xx))
        return jnp.sum(out ** 2)

    vp, gp = jax.value_and_grad(f_padded)(x)
    vd, gd = jax.value_and_grad(f_direct)(x)
    np.testing.assert_allclose(float(vp), float(vd), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gd), rtol=1e-4, atol=1e-5
    )


def test_single_layer_quirk_under_padding(operands):
    """num_layers==1 applies relu+dropout after the layer (reference
    layer.py:23-27); the padded-carry slice must come after that."""
    hg, g, gt, x = operands
    params = init_encoder(jax.random.PRNGKey(2), "SAGE", 32, 32, 1)
    a = apply_encoder(params, "SAGE", hg, x, graph_t=None)
    b = apply_encoder(params, "SAGE", g, x, graph_t=gt)
    assert a.shape == (N, 32)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
    )
