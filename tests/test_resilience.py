"""Restart-and-resume supervision (plnlp_tpu.resilience)."""

import numpy as np
import pytest

from plnlp_tpu.cli import argument, run_experiment
from plnlp_tpu.resilience import run_resilient


def _args(tmp_path, **overrides):
    base = dict(
        data_name="synthetic:hits",
        epochs=4,
        eval_steps=1,
        runs=1,
        batch_size=512,
        emb_hidden_channels=16,
        gnn_hidden_channels=16,
        mlp_hidden_channels=16,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1,
    )
    base.update(overrides)
    return argument([f"--{k}={v}" for k, v in base.items()])


def test_requires_checkpoint_dir(tmp_path):
    args = _args(tmp_path, checkpoint_dir="")
    with pytest.raises(ValueError):
        run_resilient(args)


def test_restarts_resume_from_checkpoint(tmp_path):
    """Inject one crash mid-run; the supervisor must resume from the latest
    checkpoint and finish with the full eval series."""
    args = _args(tmp_path)
    calls = {"n": 0}

    def flaky_run(a, log):
        calls["n"] += 1
        if calls["n"] == 1:
            # run two epochs for real (so a checkpoint exists), then "crash"
            short = argument([])
            vars(short).update(vars(a))
            short.epochs = 2
            run_experiment(short, log=log)
            raise RuntimeError("injected failure")
        assert a.resume is True  # retry must resume, not restart
        return run_experiment(a, log=log)

    loggers = run_resilient(
        args, max_restarts=2, backoff_seconds=0.0,
        log=lambda *_: None, _run=flaky_run,
    )
    assert calls["n"] == 2
    # resumed run reports the FULL series (epochs 1-2 restored + 3-4 fresh)
    assert len(loggers["Hits@20"].results[0]) == 4


def test_gives_up_after_max_restarts(tmp_path):
    args = _args(tmp_path)

    def always_fail(a, log):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="after 1 restarts"):
        run_resilient(
            args, max_restarts=1, backoff_seconds=0.0,
            log=lambda *_: None, _run=always_fail,
        )
