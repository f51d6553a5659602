"""Minimal functional NN primitives (params are plain pytrees of jnp arrays).

No framework classes: every module is an ``init(key, ...) -> params`` plus an
``apply(params, ...) -> out`` pure function, which keeps the whole model a
pytree that jit/shard_map/optax handle natively.

Initializers reproduce the torch/PyG defaults the reference trains with so
training dynamics match:
* ``torch_linear_init`` — torch.nn.Linear default: kaiming_uniform(a=√5) on
  weights ⇒ U(±1/√fan_in); bias U(±1/√fan_in).  (Used by SAGEConv/GraphConv/
  TransformerConv internals and all torch Linears in predictors.)
* ``glorot_init`` — PyG GCNConv weight init (glorot uniform), zero bias.
* ``xavier_uniform`` — reference param_init on the embedding table
  (reference model.py:96).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "torch_linear_init",
    "glorot_init",
    "xavier_uniform",
    "linear",
    "dropout",
]


def torch_linear_init(key, fan_in: int, fan_out: int, bias: bool = True):
    """torch.nn.Linear.reset_parameters equivalent; weight stored (in, out)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    params = {
        "w": jax.random.uniform(
            kw, (fan_in, fan_out), jnp.float32, -bound, bound
        )
    }
    if bias:
        params["b"] = jax.random.uniform(
            kb, (fan_out,), jnp.float32, -bound, bound
        )
    return params


def glorot_init(key, fan_in: int, fan_out: int, bias: bool = True):
    """Glorot-uniform weights, zero bias (PyG GCNConv convention)."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    params = {
        "w": jax.random.uniform(
            key, (fan_in, fan_out), jnp.float32, -bound, bound
        )
    }
    if bias:
        params["b"] = jnp.zeros((fan_out,), jnp.float32)
    return params


def xavier_uniform(key, shape):
    """torch.nn.init.xavier_uniform_ on a 2-D table (reference model.py:96)."""
    fan_in, fan_out = shape[1], shape[0]  # torch uses (rows=out, cols=in)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    """Dense layer in the activation dtype: params are stored f32 (master
    weights) and cast to x.dtype, so bf16 activations run bf16 MXU matmuls."""
    w = params["w"].astype(x.dtype)
    out = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def dropout(
    x: jnp.ndarray, rate: float, key: Optional[jax.Array], train: bool
) -> jnp.ndarray:
    """torch.nn.functional.dropout semantics (inverted scaling at train)."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
