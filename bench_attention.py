"""Chip A/B harness: flash Pallas attention vs the scan fallback on the
SAME hybrid operand at collab scale, plus a grad-parity spot check on
real hardware.  Run from the repo root on the TPU; results are recorded
in RESULTS.md (round 5).  Reference hot loop: TransformerConv
(/root/reference/plnlp/layer.py:57-63)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plnlp_tpu.data.synthetic import make_sbm_graph
from plnlp_tpu.models.encoders import apply_encoder, init_encoder
from plnlp_tpu.ops import tile_attention as ta
from plnlp_tpu.ops.tile_spmm import build_hybrid, label_prop_order

ns, es, ds = 236_000, 1_300_000, 256
h_src, h_dst = make_sbm_graph(np.random.default_rng(7), ns, es, num_communities=800)
# product configuration (cli.py round 5): pre-relabeled id space, no perms
h_order = label_prop_order(h_src, h_dst, ns)
h_map = np.empty(ns, np.int64)
h_map[h_order] = np.arange(ns)
hg = build_hybrid(
    h_map[h_src], h_map[h_dst], None, num_nodes=ns, tile=256, min_fill=96,
    symmetrize=True, reorder=None, dtype="bfloat16",
)
h_edges = hg.dense_edges + hg.res_edges
print(f"tiles={hg.num_tiles} dense={hg.dense_edges} res={hg.res_edges}")
xh = jax.random.normal(jax.random.PRNGKey(0), (ns, ds), jnp.bfloat16)
params = init_encoder(jax.random.PRNGKey(3), "TRANSFORMER", ds, ds, 1)


def run_path(force_scan: bool):
    orig = ta._flash_supported
    if force_scan:
        ta._flash_supported = lambda hg, d: False
    try:
        f = jax.jit(
            jax.value_and_grad(
                lambda x, g: jnp.sum(
                    apply_encoder(params, "TRANSFORMER", g, x)
                    .astype(jnp.float32) ** 2
                ),
                argnums=0,
            )
        )
        v, gr = f(xh, hg)
        v, gr = f(xh + 0.0 * v.astype(jnp.bfloat16), hg)
        float(v)
        iters = 4
        t0 = time.time()
        xi = xh
        for _ in range(iters):
            v, gr = f(xi, hg)
            xi = xh + 0.0 * v.astype(jnp.bfloat16)
        float(v)
        dt = (time.time() - t0) / iters
        return dt, float(v), np.asarray(gr.astype(jnp.float32))
    finally:
        ta._flash_supported = orig


dt_flash, v_flash, g_flash = run_path(force_scan=False)
print(f"flash:  {dt_flash*1e3:.1f} ms fwd+bwd  ({h_edges*2/dt_flash/1e6:.1f}M e/s)")
dt_scan, v_scan, g_scan = run_path(force_scan=True)
print(f"scan:   {dt_scan*1e3:.1f} ms fwd+bwd  ({h_edges*2/dt_scan/1e6:.1f}M e/s)")
print(f"speedup: {dt_scan/dt_flash:.2f}x")

# grad parity on chip (bf16 compute both sides -> loose tolerance)
gs = float(np.abs(g_scan).max())
rel = np.abs(g_flash - g_scan) / (np.abs(g_scan) + 1e-3 * gs)
print(
    f"value rel diff: {abs(v_flash-v_scan)/abs(v_scan):.2e}; "
    f"grad max rel diff (vs |g|+1e-3*max): {rel.max():.3e}; "
    f"mean: {rel.mean():.3e}"
)
assert abs(v_flash - v_scan) / abs(v_scan) < 2e-2
assert rel.max() < 0.1, rel.max()
print("GRAD PARITY OK (chip, bf16)")
