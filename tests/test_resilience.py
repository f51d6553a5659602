"""Restart-and-resume supervision (plnlp_tpu.resilience)."""

import os
import signal

import numpy as np
import pytest

from plnlp_tpu.cli import argument, run_experiment
from plnlp_tpu.resilience import Preempted, PreemptionGuard, run_resilient


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


def test_preemption_guard_catches_sigterm():
    """SIGTERM inside the guard sets the flag instead of killing the
    process; the previous handler is restored on exit."""
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert g.active and not g.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.preempted and g.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_preemption_mid_run_checkpoints_and_resumes(tmp_path):
    """A preemption signal delivered mid-run checkpoints at the next epoch
    boundary, exits with code 75 (Preempted), and a --resume relaunch
    completes the remaining epochs."""
    args = _args(tmp_path, epochs=5, checkpoint_every=100)

    # Deliver the real signal from inside the run: the metrics callback
    # fires once per epoch, so the guard flag flips during epoch 2 and the
    # boundary check must fire at the END of epoch 2 (checkpoint_every=100
    # means only the preemption path can have saved the checkpoint).
    def log_hook(msg):
        if "Epoch: 02" in str(msg):
            os.kill(os.getpid(), signal.SIGTERM)

    before = signal.getsignal(signal.SIGTERM)
    with pytest.raises(Preempted) as exc:
        run_experiment(args, log=log_hook)
    assert exc.value.code == 75
    assert exc.value.epoch == 2
    # SIGTERM handling must not leak past run_experiment
    assert signal.getsignal(signal.SIGTERM) is before

    args.resume = True
    loggers = run_experiment(args, log=lambda *_: None)
    # epochs 1-2 restored from the preemption checkpoint + 3-5 fresh
    assert len(loggers["Hits@20"].results[0]) == 5


def test_preempted_not_swallowed_by_supervisor(tmp_path):
    """run_resilient must NOT restart a preempted run in-process — the
    machine is going away; the exit code has to reach the scheduler."""
    args = _args(tmp_path)

    def preempted_run(a, log):
        raise Preempted(0, 3)

    with pytest.raises(Preempted):
        run_resilient(
            args, max_restarts=3, backoff_seconds=0.0,
            log=lambda *_: None, _run=preempted_run,
        )


def test_preemption_guard_partial_install_restores_handlers():
    """A ValueError mid-install (invalid signal) must put back handlers
    already swapped — the guard can never leak past a failed __enter__."""
    import signal

    from plnlp_tpu.resilience import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=(signal.SIGTERM, 0)) as g:
        assert not g.active
        assert signal.getsignal(signal.SIGTERM) is before
    assert signal.getsignal(signal.SIGTERM) is before
