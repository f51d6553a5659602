"""Observability: throughput counters and profiler hooks.

The reference's only instrumentation is epoch wall-time printing
(reference main.py:283-284).  Here: a per-epoch throughput meter for the
north-star metric (aggregated edges/s through the encoder fwd+bwd), a
JSON-lines metrics sink, and a jax.profiler trace context for capturing
XLA/TPU traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time
from typing import Optional

__all__ = ["ThroughputMeter", "MetricsWriter", "profile_trace"]


class ThroughputMeter:
    """Aggregated-edges/s for the full-graph-encoder-per-batch train loop.

    Per epoch the encoder runs fwd+bwd over ALL edges once per pair batch
    (reference model.py:150-151 inside the loop), so
        agg_edges = num_batches × num_edges × gnn_layers × 2.

    ``last_edges_per_sec`` counts EXECUTED work (the padded final batch does
    run a full-graph encoder pass on hardware); ``last_useful_edges_per_sec``
    discounts it by the fraction of real (unmasked) pairs, so a
    non-multiple-of-batch epoch is not credited for padding.
    """

    def __init__(self, num_edges: int, gnn_layers: int, batch_size: int):
        self.num_edges = num_edges
        self.gnn_layers = gnn_layers
        self.batch_size = batch_size
        self._t0: Optional[float] = None
        self.last_edges_per_sec = 0.0
        self.last_useful_edges_per_sec = 0.0
        self.last_pairs_per_sec = 0.0

    def start(self):
        self._t0 = time.time()

    def stop(self, num_pos: int) -> float:
        dt = max(time.time() - self._t0, 1e-9)
        num_batches = max(1, math.ceil(num_pos / self.batch_size))
        agg_edges = num_batches * self.num_edges * self.gnn_layers * 2
        useful_frac = num_pos / max(num_batches * self.batch_size, 1)
        self.last_edges_per_sec = agg_edges / dt
        self.last_useful_edges_per_sec = agg_edges * useful_frac / dt
        self.last_pairs_per_sec = num_pos / dt
        return dt


class MetricsWriter:
    """Append-only JSON-lines metrics file (one dict per line)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, **metrics):
        if not self.path:
            return
        metrics.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
