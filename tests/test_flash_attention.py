"""Block-sparse FLASH attention kernels (ops/pallas_attention.py) in
interpret mode on CPU, routed through the real dispatch in
ops/tile_attention.hybrid_transformer_conv via monkeypatch — the same
harness pattern as the tile_matmul interpret tests (test_tile_spmm.py).

The scan path (the shipped non-TPU fallback) is the parity oracle: it is
itself pinned against the per-edge segment TransformerConv by
test_tile_spmm.py::test_hybrid_transformer_matches_segment.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_graph_np
from plnlp_tpu.graph import prepare_graph
from plnlp_tpu.ops.tile_spmm import build_hybrid


def build_graph(src, dst, w, num_nodes):
    g, _ = prepare_graph(src, dst, w, num_nodes=num_nodes, block=None)
    return g


@pytest.fixture
def flash(monkeypatch):
    """Force the flash path with interpret-mode kernels."""
    import plnlp_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "attention_pallas_supported", lambda t, d: True)
    for name in ("flash_tiles_fwd", "flash_tiles_dq", "flash_tiles_dkv"):
        orig = getattr(pa, name)
        monkeypatch.setattr(pa, name, functools.partial(orig, interpret=True))
    return pa


@pytest.mark.parametrize("min_fill", [1, 3])
def test_flash_matches_scan_values_and_grads(rng, flash, min_fill):
    """Flash path == scan path (values, input grads) across all-dense
    (min_fill=1 -> no residual set) and mixed fill regimes, through
    apply_encoder's stack.  d=16 also exercises the 128-lane pad."""
    import plnlp_tpu.ops.tile_attention as ta
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 150, 16
    src, dst, _ = random_graph_np(rng, n, 1200)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=min_fill,
        block=(8, 32), reorder="labelprop",
    )
    assert ta._flash_supported(hg, d)
    if min_fill == 1:
        assert hg.res_graph is None  # every tile dense -> pure kernel path
    params = init_encoder(jax.random.PRNGKey(0), "TRANSFORMER", d, d, 2)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    def run():
        return (
            apply_encoder(params, "TRANSFORMER", hg, x),
            jax.grad(
                lambda x: jnp.vdot(
                    apply_encoder(params, "TRANSFORMER", hg, x), cot
                )
            )(x),
        )

    out_f, grad_f = run()
    # oracle = scan path: turn the flash dispatch off
    sup = flash.attention_pallas_supported
    flash.attention_pallas_supported = lambda t, d: False
    try:
        out_s, grad_s = run()
    finally:
        flash.attention_pallas_supported = sup
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_s), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grad_f), np.asarray(grad_s), rtol=1e-4, atol=1e-5
    )


def test_flash_param_grads_match_segment(rng, flash):
    """q/k/v/skip projection grads through the hand VJP == the per-edge
    segment TransformerConv's autodiff grads."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 120, 8
    src, dst, _ = random_graph_np(rng, n, 900)
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=3, block=(8, 32),
        reorder="labelprop",
    )
    params = init_encoder(jax.random.PRNGKey(1), "TRANSFORMER", d, d, 1)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    pr = jax.grad(
        lambda p: jnp.vdot(apply_encoder(p, "TRANSFORMER", g, x), cot)
    )(params)
    ph = jax.grad(
        lambda p: jnp.vdot(apply_encoder(p, "TRANSFORMER", hg, x), cot)
    )(params)
    for (kp, a), b in zip(
        jax.tree_util.tree_flatten_with_path(pr)[0],
        jax.tree_util.tree_leaves(ph),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_flash_partial_coverage_and_isolated_rows(rng, flash):
    """Row tiles with only residual edges (row_mask masking of undefined
    kernel output) and fully isolated rows (skip projection only) match
    the per-edge segment path."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 100, 8
    # dense core among nodes 0..63; a few stray edges among 64..89
    # (residual-only row tiles at tile=16); nodes 90..99 isolated
    s1, d1, _ = random_graph_np(rng, 64, 800)
    s2 = rng.integers(64, 90, 12)
    d2 = rng.integers(64, 90, 12)
    src = np.concatenate([s1, s2])
    dst = np.concatenate([d1, d2])
    g = build_graph(src, dst, None, num_nodes=n)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=5, block=(8, 32),
        reorder="none",
    )
    assert hg.res_edges > 0 and hg.num_tiles > 0
    params = init_encoder(jax.random.PRNGKey(2), "TRANSFORMER", d, d, 1)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(apply_encoder(params, "TRANSFORMER", hg, x)),
        np.asarray(apply_encoder(params, "TRANSFORMER", g, x)),
        rtol=1e-4, atol=1e-5,
    )
    gr = jax.grad(
        lambda x: jnp.vdot(apply_encoder(params, "TRANSFORMER", g, x), cot)
    )(x)
    gh = jax.grad(
        lambda x: jnp.vdot(apply_encoder(params, "TRANSFORMER", hg, x), cot)
    )(x)
    np.testing.assert_allclose(
        np.asarray(gh), np.asarray(gr), rtol=1e-4, atol=1e-5
    )


def test_flash_bf16_finite_and_close(rng, flash):
    """bf16 compute dtype: finite output, loose parity vs the f32 scan
    path (the kernel casts p/ds to bf16 for the MXU)."""
    from plnlp_tpu.models.encoders import apply_encoder, init_encoder

    n, d = 100, 8
    src, dst, _ = random_graph_np(rng, n, 900)
    hg = build_hybrid(
        src, dst, None, num_nodes=n, tile=16, min_fill=3, block=(8, 32),
        reorder="labelprop", dtype="bfloat16",
    )
    params = init_encoder(jax.random.PRNGKey(3), "TRANSFORMER", d, d, 1)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    out = apply_encoder(params, "TRANSFORMER", hg, x)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    gr = jax.grad(
        lambda x: jnp.sum(
            apply_encoder(params, "TRANSFORMER", hg, x).astype(jnp.float32)
            ** 2
        )
    )(x)
    assert bool(jnp.all(jnp.isfinite(gr.astype(jnp.float32))))
