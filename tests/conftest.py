"""Test config: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-chip logic (shard_map / pjit over a Mesh) is validated on fake CPU
devices exactly as SURVEY.md §4 prescribes; the real-TPU path is exercised by
bench.py and the driver's compile checks.
"""

import os

# Force CPU even when the ambient env targets a real TPU (JAX_PLATFORMS=axon,
# re-asserted by a sitecustomize hook — the env var alone is NOT enough):
# unit tests must be fast, deterministic, and run the 8-fake-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph_np(rng, num_nodes=64, num_edges=300, weighted=False, seed=None):
    """Random directed multigraph edge list (may contain dups/self-loops)."""
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    w = rng.random(num_edges).astype(np.float32) + 0.1 if weighted else None
    return src, dst, w
