"""The examples/ scripts stay runnable end-to-end (CPU-forced subprocesses)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRAP = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "import runpy, sys; runpy.run_path(sys.argv[1], run_name='__main__')"
)


def _run(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-c", _WRAP, os.path.join(ROOT, "examples", script)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=ROOT,
    )


@pytest.mark.parametrize(
    "script,needle",
    [
        ("quickstart_api.py", "Hits@50 on held-out edges"),
        ("multichip_cpu_mesh.py", "devices: 8"),
        ("serving.py", "top-5 candidates for node 0"),
        ("custom_dataset.py", "Hits@50 from npz dataset"),
        ("hybrid_tiles.py", "hybrid backend Hits@50"),
        ("distributed_attention.py", "devices: 8"),
    ],
)
def test_example_runs(script, needle):
    r = _run(script)
    assert r.returncode == 0, r.stdout + r.stderr
    assert needle in r.stdout, r.stdout
