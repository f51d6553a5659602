"""Failure recovery: restart-and-resume supervision for long runs.

The reference has NO failure handling — a crashed run loses everything but
its text log (reference main.py:100-103; SURVEY §5).  Here the CLI already
checkpoints params/opt-state/logger progress (``--checkpoint_dir`` +
``--resume``); this module closes the loop with a supervisor that reruns a
crashed experiment from its latest checkpoint, bounding lost work to
``--checkpoint_every`` epochs.

Intended for unattended TPU runs where preemptions and transient runtime
errors (device resets, tunnel drops) are expected::

    from plnlp_tpu.resilience import run_resilient
    loggers = run_resilient(args, max_restarts=5)
"""

from __future__ import annotations

import time
from typing import Callable, Optional

__all__ = ["run_resilient"]


def run_resilient(
    args,
    max_restarts: int = 3,
    backoff_seconds: float = 10.0,
    log: Callable = print,
    _run=None,
):
    """run_experiment with automatic restart-from-checkpoint on failure.

    Requires ``args.checkpoint_dir`` (otherwise a restart would replay from
    scratch, which silently duplicates work — refused instead).  After the
    first failure ``args.resume`` is forced on so every retry continues from
    the latest checkpoint.  KeyboardInterrupt is never retried.
    """
    from plnlp_tpu.cli import run_experiment

    run = _run or run_experiment
    if not getattr(args, "checkpoint_dir", ""):
        raise ValueError(
            "run_resilient needs args.checkpoint_dir — without checkpoints a "
            "restart replays the whole run from scratch"
        )
    attempt = 0
    last_err: Optional[BaseException] = None
    while attempt <= max_restarts:
        try:
            return run(args, log=log)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — supervisor boundary
            last_err = e
            attempt += 1
            if attempt > max_restarts:
                break
            log(
                f"run failed ({type(e).__name__}: {e}); restart "
                f"{attempt}/{max_restarts} from latest checkpoint in "
                f"{backoff_seconds:.0f}s"
            )
            args.resume = True
            time.sleep(backoff_seconds)
    raise RuntimeError(
        f"experiment failed after {max_restarts} restarts"
    ) from last_err
