"""Predictor formulas vs NumPy transcriptions of reference layer.py:66-189."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plnlp_tpu.models.predictors import (
    PREDICTOR_NAMES,
    apply_predictor,
    init_predictor,
)


def _np_linear(p, x):
    out = x @ np.asarray(p["w"])
    if "b" in p:
        out = out + np.asarray(p["b"])
    return out


@pytest.fixture
def xs(rng):
    b, h = 13, 16
    xi = rng.standard_normal((b, h)).astype(np.float32)
    xj = rng.standard_normal((b, h)).astype(np.float32)
    return xi, xj, h


def _run(name, params, xi, xj):
    return np.asarray(
        apply_predictor(params, name, jnp.asarray(xi), jnp.asarray(xj))
    )


def test_dot(xs):
    xi, xj, h = xs
    got = _run("DOT", {}, xi, xj)
    np.testing.assert_allclose(got, (xi * xj).sum(-1), rtol=1e-5)


def test_bil(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(0), "BIL", h, 2)
    got = _run("BIL", params, xi, xj)
    expect = (_np_linear(params["bilin"], xi) * xj).sum(-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_mlp(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(1), "MLP", h, 3)
    got = _run("MLP", params, xi, xj)
    x = xi * xj
    for lp in params["lins"][:-1]:
        x = np.maximum(_np_linear(lp, x), 0)
    expect = _np_linear(params["lins"][-1], x)
    assert got.shape == (13, 1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_mlpcat(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(2), "MLPCAT", h, 2)
    got = _run("MLPCAT", params, xi, xj)

    def run(x):
        for lp in params["lins"][:-1]:
            x = np.maximum(_np_linear(lp, x), 0)
        return _np_linear(params["lins"][-1], x)

    expect = (
        run(np.concatenate([xi, xj], -1)) + run(np.concatenate([xj, xi], -1))
    ) / 2
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def _np_tower(lins, x):
    for lp in lins:
        x = np.maximum(_np_linear(lp, x), 0)
    return x


def test_mlpdot(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(3), "MLPDOT", h, 2)
    # reference factory quirk: tower hidden width is 1 (model.py:270)
    assert params["lins"][0]["w"].shape == (h, 1)
    assert params["lins"][1]["w"].shape == (1, 1)
    got = _run("MLPDOT", params, xi, xj)
    expect = (_np_tower(params["lins"], xi) * _np_tower(params["lins"], xj)).sum(-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_mlpbil(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(4), "MLPBIL", h, 2)
    got = _run("MLPBIL", params, xi, xj)
    ti = _np_tower(params["lins"], xi)
    tj = _np_tower(params["lins"], xj)
    expect = (_np_linear(params["bilin"], ti) * tj).sum(-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_all_predictors_differentiable(xs):
    xi, xj, h = xs
    for name in PREDICTOR_NAMES:
        params = init_predictor(jax.random.PRNGKey(5), name, h, 2)

        def loss(p):
            return jnp.sum(
                apply_predictor(p, name, jnp.asarray(xi), jnp.asarray(xj))
            )

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        if name != "DOT":
            assert leaves and all(np.all(np.isfinite(l)) for l in leaves)


def test_dropout_active_in_train_mode(xs):
    xi, xj, h = xs
    params = init_predictor(jax.random.PRNGKey(6), "MLP", h, 2)
    out1 = apply_predictor(
        params, "MLP", jnp.asarray(xi), jnp.asarray(xj),
        dropout=0.5, train=True, rng=jax.random.PRNGKey(7),
    )
    out2 = apply_predictor(
        params, "MLP", jnp.asarray(xi), jnp.asarray(xj),
        dropout=0.5, train=True, rng=jax.random.PRNGKey(8),
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # eval mode deterministic
    e1 = apply_predictor(params, "MLP", jnp.asarray(xi), jnp.asarray(xj))
    e2 = apply_predictor(params, "MLP", jnp.asarray(xi), jnp.asarray(xj))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
