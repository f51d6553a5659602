"""Pairwise edge scorers s(u, v) — the six predictor families.

Functional re-designs of reference plnlp/layer.py:66-189 (MLP / MLPCAT /
MLPDOT / MLPBIL / DOT / BIL).  Each is pure dense math over gathered node
vectors (x_i, x_j) — all MXU work; the batched "score every candidate pair"
pattern is the SDDMM half of the framework.

API:
    params = init_predictor(key, name, hidden, num_layers)
    scores = apply_predictor(params, name, x_i, x_j, dropout=..., train=..., rng=...)

Scores keep the reference's exact output shapes: MLP/MLPCAT return (B, 1);
DOT/BIL/MLPDOT/MLPBIL return (B,).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from plnlp_tpu.nn import dropout as _dropout
from plnlp_tpu.nn import linear, torch_linear_init

PREDICTOR_NAMES = ("DOT", "BIL", "MLP", "MLPDOT", "MLPBIL", "MLPCAT")

__all__ = ["init_predictor", "apply_predictor", "grid_scores", "PREDICTOR_NAMES"]


def _init_mlp_stack(key, dims):
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    return [
        torch_linear_init(k, dims[i], dims[i + 1])
        for i, k in zip(range(len(dims) - 1), keys)
    ]


def init_predictor(key, name: str, hidden_channels: int, num_layers: int):
    """Mirrors reference create_predictor_layer (model.py:263-276) topologies."""
    name = name.upper()
    h = hidden_channels
    if name == "DOT":
        return {}
    if name == "BIL":
        # bias-free bilinear form ⟨Bx_i, x_j⟩ (layer.py:179-189)
        return {"bilin": torch_linear_init(key, h, h, bias=False)}
    if name == "MLP":
        # elementwise x_i*x_j -> MLP -> 1 (layer.py:66-87)
        dims = [h] + [h] * (num_layers - 1) + [1]
        return {"lins": _init_mlp_stack(key, dims)}
    if name == "MLPCAT":
        # symmetric concat MLP, shared weights (layer.py:90-116)
        dims = [2 * h] + [h] * (num_layers - 1) + [1]
        return {"lins": _init_mlp_stack(key, dims)}
    if name == "MLPDOT":
        # Reference factory instantiates MLPDotPredictor(h, 1, L, p)
        # (model.py:270) — tower hidden width is literally 1: Linear(h,1)
        # then (L-1)× Linear(1,1) (layer.py:119-127).  Preserved verbatim.
        dims = [h] + [1] * num_layers
        return {"lins": _init_mlp_stack(key, dims)}
    if name == "MLPBIL":
        # Same width-1 tower quirk (model.py:272, layer.py:142-152).
        k1, k2 = jax.random.split(key)
        dims = [h] + [1] * num_layers
        return {
            "lins": _init_mlp_stack(k1, dims),
            "bilin": torch_linear_init(k2, 1, 1, bias=False),
        }
    raise ValueError(f"unknown predictor: {name}")


def _mlp_final_scalar(lins, x, dropout, train, rng):
    """Shared relu/dropout-between, linear-last stack (layer.py:80-86)."""
    n = len(lins)
    keys = (
        jax.random.split(rng, max(n - 1, 1)) if rng is not None else [None] * n
    )
    for i, lp in enumerate(lins[:-1]):
        x = linear(lp, x)
        x = jax.nn.relu(x)
        x = _dropout(x, dropout, keys[i], train)
    return linear(lins[-1], x)


def _tower(lins, x, dropout, train, rng):
    """relu+dropout after EVERY layer (MLPDOT/MLPBIL towers, layer.py:132-137)."""
    keys = jax.random.split(rng, len(lins)) if rng is not None else [None] * len(lins)
    for i, lp in enumerate(lins):
        x = linear(lp, x)
        x = jax.nn.relu(x)
        x = _dropout(x, dropout, keys[i], train)
    return x


def apply_predictor(
    params,
    name: str,
    x_i: jnp.ndarray,
    x_j: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
):
    name = name.upper()
    if name == "DOT":
        return jnp.sum(x_i * x_j, axis=-1)
    if name == "BIL":
        return jnp.sum(linear(params["bilin"], x_i) * x_j, axis=-1)
    if name == "MLP":
        return _mlp_final_scalar(params["lins"], x_i * x_j, dropout, train, rng)
    if name == "MLPCAT":
        r1, r2 = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        x1 = jnp.concatenate([x_i, x_j], axis=-1)
        x2 = jnp.concatenate([x_j, x_i], axis=-1)
        o1 = _mlp_final_scalar(params["lins"], x1, dropout, train, r1)
        o2 = _mlp_final_scalar(params["lins"], x2, dropout, train, r2)
        return (o1 + o2) / 2
    if name == "MLPDOT":
        r1, r2 = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        ti = _tower(params["lins"], x_i, dropout, train, r1)
        tj = _tower(params["lins"], x_j, dropout, train, r2)
        return jnp.sum(ti * tj, axis=-1)
    if name == "MLPBIL":
        r1, r2 = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        ti = _tower(params["lins"], x_i, dropout, train, r1)
        tj = _tower(params["lins"], x_j, dropout, train, r2)
        return jnp.sum(linear(params["bilin"], ti) * tj, axis=-1)
    raise ValueError(f"unknown predictor: {name}")


_FACTORIZABLE = ("DOT", "BIL", "MLPDOT", "MLPBIL")


def grid_factorizable(name: str) -> bool:
    """True when all-pairs scoring factorizes into per-node transforms +
    one matmul (grid_scores); MLP/MLPCAT's first layer consumes a per-PAIR
    vector, so they stay on the chunked pairwise path."""
    return name.upper() in _FACTORIZABLE


def grid_transform_right(params, name: str, h_cand):
    """Candidate-side per-node transform for the factorized grid — compute
    ONCE per candidate set, reuse across source chunks."""
    name = name.upper()
    if name in ("DOT", "BIL"):
        return h_cand
    if name in ("MLPDOT", "MLPBIL"):
        return _tower(params["lins"], h_cand, 0.0, False, None)
    raise ValueError(f"{name} does not factorize (see grid_factorizable)")


def grid_scores_left(params, name: str, h_src, right):
    """(S, C) scores: source-side transform + ONE (S, D') @ (D', C) matmul
    against a precomputed ``grid_transform_right`` result."""
    name = name.upper()
    if name == "DOT":
        return h_src @ right.T
    if name == "BIL":
        return linear(params["bilin"], h_src) @ right.T
    if name == "MLPDOT":
        return _tower(params["lins"], h_src, 0.0, False, None) @ right.T
    if name == "MLPBIL":
        ti = _tower(params["lins"], h_src, 0.0, False, None)
        return linear(params["bilin"], ti) @ right.T
    raise ValueError(f"{name} does not factorize (see grid_factorizable)")


def grid_scores(params, name: str, h_src, h_cand):
    """(S, C) all-pairs scores via per-node transforms + ONE MXU matmul.

    DOT/BIL/MLPDOT/MLPBIL factorize: the per-node parts (towers, the
    bilinear transform) run once per node, then the pairwise reduction is a
    single (S, D') @ (D', C) matmul — at serving-grid shapes this replaces
    the S*C materialized elementwise products the chunked pairwise path
    pays (layer.py:119-189 semantics, eval mode: no dropout).  Returns
    None for genuinely pairwise predictors (MLP, MLPCAT), whose first
    layer consumes a per-PAIR vector.
    """
    if not grid_factorizable(name):
        return None
    return grid_scores_left(
        params, name, h_src, grid_transform_right(params, name, h_cand)
    )
