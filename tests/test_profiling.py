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
