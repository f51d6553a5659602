"""Per-epoch random-walk pair augmentation (reference main.py:228-253).

Each epoch: walk ``walk_length`` steps from every start node; emit training
pairs ``(walk[:, 0], walk[:, j+1])`` with weight ``1/(j+1)`` for
j = 0..L-1; self-pairs are dropped.  These pairs OVERWRITE the epoch's
training positives, and the weights become the WeightedHingeAUC margins
(reference main.py:252-253, loss.py:31-35).

TPU twist: the reference's masked_select produces a different pair count
every epoch (dynamic shape).  Here the output keeps the static shape
(S·L, 2) and returns a validity mask instead — Model.train_epoch masks
invalid pairs out of the loss, which yields the same gradient content.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from plnlp_tpu.graph import Graph
from plnlp_tpu.ops.walk import random_walk

__all__ = ["random_walk_pairs"]


def random_walk_pairs(
    graph: Graph, start: jnp.ndarray, walk_length: int, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pairs (S·L, 2) int32, weights (S·L,) f32, valid (S·L,) bool)."""
    walk = random_walk(graph, start, walk_length, key)  # (S, L+1)
    s = walk.shape[0]
    starts = walk[:, :1]  # (S, 1)
    pairs = []
    weights = []
    for j in range(walk_length):
        dst = walk[:, j + 1 : j + 2]
        pairs.append(jnp.concatenate([starts, dst], axis=1))
        weights.append(jnp.full((s,), 1.0 / (j + 1), jnp.float32))
    pairs = jnp.concatenate(pairs, axis=0)
    weights = jnp.concatenate(weights, axis=0)
    valid = pairs[:, 0] != pairs[:, 1]
    return pairs, weights, valid
