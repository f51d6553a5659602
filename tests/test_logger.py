"""Logger semantics vs reference plnlp/logger.py (argmax-valid, last_best)."""

import io

import numpy as np

from plnlp_tpu.logger import Logger


def test_best_selection():
    lg = Logger(runs=1)
    for v, t in [(0.1, 0.5), (0.9, 0.7), (0.3, 0.9)]:
        lg.add_result(0, (v, t))
    hv, test, idx = lg.best(0)
    assert hv == 90.0 and test == 70.0 and idx == 1


def test_last_best_picks_last_argmax():
    """Saturated valid (collab: 100.00) -> pick the LAST peak
    (reference logger.py:19-22)."""
    lg = Logger(runs=1)
    for v, t in [(1.0, 0.2), (0.5, 0.3), (1.0, 0.8)]:
        lg.add_result(0, (v, t))
    _, test_first, idx_first = lg.best(0, last_best=False)
    _, test_last, idx_last = lg.best(0, last_best=True)
    assert idx_first == 0 and test_first == 20.0
    assert idx_last == 2 and test_last == 80.0


def test_summary_mean_std():
    lg = Logger(runs=3)
    for run, (v, t) in enumerate([(0.8, 0.7), (0.9, 0.75), (0.85, 0.72)]):
        lg.add_result(run, (v, t))
    vm, vs, tm, ts = lg.summary()
    np.testing.assert_allclose(vm, 85.0, rtol=1e-6)
    np.testing.assert_allclose(tm, 100 * (0.7 + 0.75 + 0.72) / 3, rtol=1e-6)
    # torch.std default is ddof=1
    np.testing.assert_allclose(
        vs, np.std([80, 90, 85], ddof=1), rtol=1e-6
    )


def test_print_statistics_smoke():
    lg = Logger(runs=2)
    lg.add_result(0, (0.5, 0.4))
    lg.add_result(1, (0.6, 0.5))
    buf = io.StringIO()
    lg.print_statistics(0, f=buf)
    lg.print_statistics(f=buf)
    out = buf.getvalue()
    assert "Highest Valid" in out and "Final Test" in out
