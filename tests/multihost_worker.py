"""Worker for the 2-process jax.distributed CPU test (run via subprocess).

Each process owns 2 forced-CPU devices; together they form a 4-device
'data' mesh spanning both processes.  One jitted data-parallel step runs a
loss + gradient over a globally-sharded batch — the scalar mean forces a
cross-process reduction (gloo), proving multihost.init + mesh + sharded step
compose as `plnlp_tpu.parallel.multihost` claims.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

# The axon sitecustomize forces the TPU tunnel platform; the env var alone
# does not override it — the config update after import does (and the real
# chip is single-tenant, so two processes MUST NOT touch it).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from plnlp_tpu.parallel.multihost import init, is_multihost, local_device_count

init(coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid)
assert is_multihost(), "expected >1 process after init"
assert local_device_count() == 2
assert jax.device_count() == 2 * nproc

mesh = Mesh(np.array(jax.devices()), ("data",))

# Deterministic global problem, identical in every process.
rng = np.random.default_rng(0)
B, D = 64, 16
X = rng.standard_normal((B, D)).astype(np.float32)
y = rng.standard_normal((B,)).astype(np.float32)
w = rng.standard_normal((D,)).astype(np.float32)

rows_per_proc = B // nproc
lo = pid * rows_per_proc
xg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), X[lo : lo + rows_per_proc]
)
yg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), y[lo : lo + rows_per_proc]
)
wg = jax.make_array_from_process_local_data(NamedSharding(mesh, P()), w)


@jax.jit
def step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)

    l, g = jax.value_and_grad(loss)(w)
    return l, w - 0.1 * g


l, w2 = step(wg, xg, yg)

# NumPy oracle for the same global step.
resid = X @ w - y
exp_loss = float((resid**2).mean())
exp_w2 = w - 0.1 * (2.0 / B) * (X.T @ resid)

np.testing.assert_allclose(float(l), exp_loss, rtol=1e-5)
got_w2 = np.asarray(list(w2.addressable_shards)[0].data)
np.testing.assert_allclose(got_w2, exp_w2, rtol=1e-4, atol=1e-5)

# ---- phase 2: the package's partitioned SpMM across BOTH processes ----
# (shard_map all_gather rides the gloo cross-process collectives)
from plnlp_tpu.graph import build_graph
from plnlp_tpu.ops.spmm import spmm_segment
from plnlp_tpu.parallel.graph_parallel import GraphParallel, partitioned_spmm
from plnlp_tpu.parallel.partition import partition_graph

n, d = 64, 8
g_rng = np.random.default_rng(7)
src = g_rng.integers(0, n, 400)
dst = g_rng.integers(0, n, 400)
xw = g_rng.standard_normal((n, d)).astype(np.float32)
pg = partition_graph(src, dst, None, num_nodes=n, num_shards=4, block=(8, 64))
gmesh = Mesh(np.array(jax.devices()), ("node",))
gp = GraphParallel(pg=pg, mesh=gmesh)
xp = np.zeros((pg.padded_nodes, d), np.float32)
xp[:n] = xw
rows = pg.rows_per_shard
lo = pid * 2 * rows  # this process owns 2 of the 4 shards
xg2 = jax.make_array_from_process_local_data(
    NamedSharding(gmesh, P("node", None)), xp[lo : lo + 2 * rows]
)
out = jax.jit(lambda x: partitioned_spmm(gp, x, "sum"))(xg2)
# each process checks ITS OWN rows against the single-device oracle
g_single = build_graph(src, dst, None, num_nodes=n)
expect = np.asarray(spmm_segment(g_single, jnp.asarray(xw), "sum"))
for shard in out.addressable_shards:
    r0 = shard.index[0].start or 0
    rows_here = np.asarray(shard.data)
    ref = expect[r0 : r0 + rows_here.shape[0]]
    np.testing.assert_allclose(rows_here[: ref.shape[0]], ref, rtol=1e-4, atol=1e-5)

# ---- phase 3: the TILED partition (hybrid x multi-chip, round 4) across
# both processes — per-shard dense tiles over the cross-process all_gather.
pg_t = partition_graph(
    src, dst, None, num_nodes=n, num_shards=4, block=(8, 64),
    tile=8, min_fill=2, reorder="labelprop",
)
assert pg_t.tile_dense_edges > 0
gp_t = GraphParallel(pg=pg_t, mesh=gmesh, comm="all_gather")
xp_t = np.zeros((pg_t.padded_nodes, d), np.float32)
# tiled partitions relabel node->slot; x stays in ORIGINAL ids (the perm
# rides the custom VJP), so the per-process rows are just row ranges of x
xp_t[:n] = xw
rows_t = pg_t.rows_per_shard
lo_t = pid * 2 * rows_t
xg3 = jax.make_array_from_process_local_data(
    NamedSharding(gmesh, P("node", None)), xp_t[lo_t : lo_t + 2 * rows_t]
)
out_t = jax.jit(lambda x: partitioned_spmm(gp_t, x, "sum"))(xg3)
for shard in out_t.addressable_shards:
    r0 = shard.index[0].start or 0
    rows_here = np.asarray(shard.data)
    ref = expect[r0 : r0 + rows_here.shape[0]]
    np.testing.assert_allclose(
        rows_here[: ref.shape[0]], ref, rtol=1e-4, atol=1e-5
    )
print(f"OK pid={pid} loss={float(l):.6f} spmm_ok=1 tiled_ok=1")
