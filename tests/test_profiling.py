"""ThroughputMeter / MetricsWriter units."""

import json
import time

from plnlp_tpu.profiling import MetricsWriter, ThroughputMeter


def test_meter_counts_executed_and_useful_work():
    m = ThroughputMeter(num_edges=1000, gnn_layers=2, batch_size=64)
    m.start()
    time.sleep(0.01)
    # 100 positives -> 2 batches executed (128 slots), 100/128 useful
    m.stop(100)
    assert m.last_edges_per_sec > 0
    ratio = m.last_useful_edges_per_sec / m.last_edges_per_sec
    assert abs(ratio - 100 / 128) < 1e-6
    # exact multiple: useful == executed
    m.start()
    time.sleep(0.001)
    m.stop(128)
    assert m.last_useful_edges_per_sec == m.last_edges_per_sec


def test_metrics_writer_appends_json_lines(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write(epoch=1, loss=2.5)
    w.write(epoch=2, loss=1.5)
    lines = [json.loads(l) for l in open(path)]
    assert [l["epoch"] for l in lines] == [1, 2]
    assert all("ts" in l for l in lines)
    # disabled writer is a no-op
    MetricsWriter(None).write(epoch=3)


def test_summarize_trace_parses_chrome_trace(tmp_path):
    """summarize_trace aggregates device lanes from the Chrome-trace export
    and ignores host frames."""
    import gzip
    import json

    from plnlp_tpu.profiling import summarize_trace

    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # two executions of the same device op, one host frame
        {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 2700,
         "args": {"long_name": "f32[4267,256] fusion(...)"}},
        {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 2300, "args": {}},
        {"ph": "X", "pid": 3, "name": "gather.1", "dur": 700, "args": {}},
        {"ph": "X", "pid": 9, "name": "python_frame", "dur": 99999},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    rows = summarize_trace(str(tmp_path))
    assert [r["name"] for r in rows] == ["fusion.2", "gather.1"]
    top = rows[0]
    assert top["count"] == 2
    assert abs(top["total_ms"] - 5.0) < 1e-6
    assert abs(top["mean_ms"] - 2.5) < 1e-6
    assert "4267" in top["hlo"]


def test_summarize_trace_missing_dir(tmp_path):
    import pytest as _pytest

    from plnlp_tpu.profiling import summarize_trace

    with _pytest.raises(FileNotFoundError):
        summarize_trace(str(tmp_path / "nope"))
