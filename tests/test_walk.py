"""Random-walk op: validity of steps, dead-end self-repeat, shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import build_graph
from plnlp_tpu.ops.walk import random_walk


def test_walk_steps_are_edges(rng):
    n = 30
    src = rng.integers(0, n, 200)
    dst = rng.integers(0, n, 200)
    g = build_graph(src, dst, None, num_nodes=n)
    e = g.num_edges
    a = np.zeros((n, n), bool)
    # neighbors of v are senders within v's CSR row
    a[np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]] = True
    deg = a.sum(1)

    start = jnp.arange(n, dtype=jnp.int32)
    walk = np.asarray(random_walk(g, start, 7, jax.random.PRNGKey(0)))
    assert walk.shape == (n, 8)
    np.testing.assert_array_equal(walk[:, 0], np.arange(n))
    for i in range(n):
        for t in range(7):
            u, v = walk[i, t], walk[i, t + 1]
            if deg[u] == 0:
                assert v == u  # dead-end: stay (torch_cluster semantics)
            else:
                assert a[u, v]


def test_walk_uniformity(rng):
    # star graph: node 0 connects to 1..4; steps from 0 should hit all nbrs
    src = np.array([1, 2, 3, 4])
    dst = np.array([0, 0, 0, 0])
    g = build_graph(src, dst, None, num_nodes=5)
    start = jnp.zeros(2000, jnp.int32)
    walk = np.asarray(random_walk(g, start, 1, jax.random.PRNGKey(1)))
    counts = np.bincount(walk[:, 1], minlength=5)[1:]
    assert (counts > 350).all()  # ~500 each, uniform
