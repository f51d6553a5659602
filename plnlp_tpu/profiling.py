"""Observability: throughput counters and profiler hooks.

The reference's only instrumentation is epoch wall-time printing
(reference main.py:283-284).  Here: a per-epoch throughput meter for the
north-star metric (aggregated edges/s through the encoder fwd+bwd), a
JSON-lines metrics sink, and a jax.profiler trace context for capturing
XLA/TPU traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import math
import os
import time
from typing import Dict, List, Optional

__all__ = [
    "ThroughputMeter",
    "MetricsWriter",
    "profile_trace",
    "summarize_trace",
]


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


def summarize_trace(log_dir: str, top: int = 20) -> List[Dict]:
    """Aggregate per-op device time from a :func:`profile_trace` capture.

    Parses the newest ``*.trace.json.gz`` under ``log_dir`` (the Chrome-trace
    export jax.profiler writes next to the xplane proto — verified working
    over the axon TPU tunnel) and returns the top ops by total device time::

        [{"name", "device", "count", "total_ms", "mean_ms", "hlo"}, ...]

    ``hlo`` is the HLO long-name when present — it identifies what a
    ``fusion.N`` actually is (e.g. the pair-scoring scatter-add shows up as
    ``f32[4267,256] fusion(s32[262144] ...)``).  Host-side Python frames are
    excluded; only device lanes (``/device:``) are counted.
    """
    traces = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(traces[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    proc_names = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg: Dict = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        device = proc_names.get(e.get("pid"), "")
        if "/device:" not in device:
            continue
        key = (device, e.get("name", "?"))
        row = agg.setdefault(
            key,
            {
                "name": key[1],
                "device": device,
                "count": 0,
                "total_ms": 0.0,
                "hlo": str(e.get("args", {}).get("long_name", ""))[:120],
            },
        )
        row["count"] += 1
        row["total_ms"] += e.get("dur", 0) / 1e3
    rows = sorted(agg.values(), key=lambda r: -r["total_ms"])[:top]
    for r in rows:
        r["total_ms"] = round(r["total_ms"], 3)
        r["mean_ms"] = round(r["total_ms"] / max(r["count"], 1), 3)
    return rows
