"""2-process jax.distributed CPU test: multihost.init + mesh + sharded step.

Launches two subprocesses (tests/multihost_worker.py) with a localhost
coordinator; each owns 2 forced-CPU devices and they jointly execute one
jitted data-parallel step whose scalar loss requires a cross-process gloo
reduction.  This is the proof behind multihost.py's claim that every
mesh/shard_map in the package works unchanged after ``init``.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # strip the single-process test harness's platform/device forcing so
        # the worker controls its own XLA flags
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK pid={i}" in out, f"worker {i} missing OK line:\n{out}"
    # both processes computed the identical global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1
