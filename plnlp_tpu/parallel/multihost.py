"""Multi-host initialization helpers.

The reference is single-process (reference main.py:71-72); scaling across
hosts here is plain JAX distributed: ``jax.distributed.initialize`` connects
the processes, after which ``jax.devices()`` spans the whole slice and every
mesh/shard_map in this package works unchanged (XLA routes collectives over
ICI within a slice and DCN across slices).  Verified by
``tests/test_multihost.py``: two real OS processes (gloo CPU collectives,
localhost coordinator) jointly run one jitted data-parallel step over a
mesh spanning both processes, with a cross-process scalar reduction checked
against a NumPy oracle.

Typical pod-slice launch (same command on every host):

    python -c "from plnlp_tpu.parallel.multihost import init; init()" ...

On Cloud TPU the coordinator/process ids are auto-detected from the
environment; arguments are only needed for manual setups.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["init", "is_multihost", "local_device_count"]


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize wrapper."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_device_count() -> int:
    return jax.local_device_count()
