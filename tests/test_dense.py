"""DenseAdj fast path: parity with the CSR segment path for every encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.dense import prepare_dense, to_dense
from plnlp_tpu.graph import build_graph
from plnlp_tpu.models.encoders import ENCODER_NAMES, apply_encoder, init_encoder
from plnlp_tpu.ops.spmm import spmm, spmm_segment
from tests.conftest import random_graph_np


@pytest.fixture
def setup(rng):
    n, d = 48, 12
    src, dst, w = random_graph_np(rng, n, 300, weighted=True)
    g = build_graph(src, dst, w, num_nodes=n)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    return n, src, dst, w, g, x


def test_prepare_dense_matches_to_dense(setup):
    n, src, dst, w, g, x = setup
    da1 = prepare_dense(src, dst, w, num_nodes=n)
    da2 = to_dense(g)
    np.testing.assert_allclose(np.asarray(da1.adj), np.asarray(da2.adj), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(da1.in_degrees), np.asarray(da2.in_degrees)
    )


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_spmm_dispatch_dense(setup, reduce):
    n, src, dst, w, g, x = setup
    da = to_dense(g)
    np.testing.assert_allclose(
        np.asarray(spmm(da, x, reduce)),
        np.asarray(spmm_segment(g, x, reduce)),
        rtol=1e-4,
        atol=1e-5,
    )


@pytest.mark.parametrize("name", ENCODER_NAMES)
def test_encoders_dense_vs_csr(setup, name):
    n, src, dst, w, g, x = setup
    if name == "TRANSFORMER":
        # reference strips edge values before TransformerConv (main.py:184-186)
        g = build_graph(src, dst, None, num_nodes=n)
    da = to_dense(g)
    params = init_encoder(jax.random.PRNGKey(0), name, 12, 8, 2)
    out_csr = apply_encoder(params, name, g, x)
    out_dense = apply_encoder(params, name, da, x)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_csr), rtol=1e-4, atol=1e-4
    )


def test_dense_encoder_differentiable(setup):
    n, src, dst, w, g, x = setup
    da = to_dense(g)
    params = init_encoder(jax.random.PRNGKey(1), "SAGE", 12, 8, 2)

    def loss(p):
        return jnp.sum(apply_encoder(p, "SAGE", da, x) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(grads))
