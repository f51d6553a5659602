"""Benchmark harness — prints one JSON line per tracked metric.

Headline metric (printed LAST — the driver parses the final line):
aggregated-edges/s/chip through the FULL flagship train step (2-layer SAGE
encoder full-graph fwd+bwd + MLP pair scoring + AUC loss + Adam update) on
an ogbl-ddi-sized synthetic graph (N=4267, E≈2M after symmetrization),
dense-adjacency backend — the configuration the reference's headline
ogbl-ddi result trains (reference README.md:24, BASELINE.md).

Round-5 restructure (VERDICT r4 directive 1 — BENCH_r04 was rc:124):

* the headline is MEASURED second (right after the chip-health line) and
  printed last, so a partial run can never lose it again; the final line
  also carries a compact ``others`` copy of every metric emitted.
* a deadline guard (BENCH_BUDGET_S, default 480 s wall) drops the
  cheapest-to-lose sections (serving variants first, then the blocked
  transformer line) instead of letting the driver's timeout kill the tail.
* the JAX persistent compilation cache is enabled (.jax_cache beside this
  file): in-round bench runs pre-warm it, so the driver's end-of-round run
  pays execution time only (measured: compile sections 3-40x faster warm;
  cached executables do NOT change measured kernel times — the timing
  loops run post-compile either way).
* serving lines re-anchored to latency-AMORTIZED all-pairs grids
  (directive 7): the old 512-source grid spent ~4 tunnel round trips
  (~50-60 ms) per sub-ms kernel pass, so the tracked number measured the
  tunnel, not the code.
* quality gates tightened to regression-tripwire thresholds (directive
  4): hits 6.0→8.0, mrr 0.30→0.40 (~0.8x healthy-day values), plus a
  THIRD gate running TRANSFORMER + --adj_backend=hybrid end-to-end (the
  block-sparse flash-attention path had no driver-visible quality check).
* kernel lines time min-of-2 dependent-chain passes (timed_chain): a
  transient tunnel stall inflates a single pass arbitrarily (measured: a
  mid-run stall read the ~12 ms hybrid SpMM line as 65 ms).

edges/s = num_edges × gnn_layers × 2 (fwd+bwd) / step_time.

vs_baseline anchors are the FIRST honest measurements of each path
(dense: 239 M agg-edges/s f32 round-1; sparse: 76 M edges/s round-1;
transformer/quality: round-3/4 landing values; all-pairs serving:
round-5 landing values) so the series tracks progress.
"""

import json
import os
import sys
import time

BASELINE_EDGES_PER_SEC = 239e6  # round-1 first measurement, dense path, f32
BASELINE_SPARSE_EDGES_PER_SEC = 76e6  # round-1 blocked spmm fwd+bwd ~67.5 ms
BASELINE_TCONV_EDGES_PER_SEC = 11.0e6  # segment/autodiff path, round-3 chip-day
BASELINE_HYBRID_EDGES_PER_SEC = 155e6  # round-3 GO measurement (32.8 ms, XLA tiles)
BASELINE_TCONV_HEALTHY = 17.2e6  # blocked hand-VJP transformer, healthy day r4
BASELINE_SERVING_ALLPAIRS = 38e6  # round-5 landing: all-pairs MLP grid
BASELINE_SERVING_DOT_ALLPAIRS = 90e6  # round-5 landing; run-to-run band 92-111M
QUALITY_GATE_HITS50 = 8.0  # tripwire at ~0.8x healthy 9.9 (was 6.0 r3-r4)
QUALITY_GATE_MRR = 0.40  # tripwire at ~0.85x healthy 0.467 (was 0.30)
QUALITY_GATE_ATTN_HITS50 = 8.0  # TRANSFORMER+hybrid gate; 10.3 at landing


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """Ride out transient axon-tunnel outages (observed: multi-minute
    UNAVAILABLE windows and post-kill wedges) instead of hanging or dying
    on the first probe — the driver runs this unattended at round end."""
    import jax
    import jax.numpy as jnp

    deadline = time.time() + max_wait_s
    while True:
        try:
            float(jnp.sum(jnp.ones((256, 256))))
            return
        except Exception as e:  # backend init/compile UNAVAILABLE
            if time.time() > deadline:
                raise RuntimeError(
                    f"TPU backend unavailable for {max_wait_s:.0f}s"
                ) from e
            time.sleep(30)
            # a failed init can be memoized — drop backend state and retry
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
            jax.clear_caches()


def main():
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    deadline = t_start + budget

    import jax

    # rbg PRNG: the threefry default costs ~13 ms/step in dropout-mask
    # generation alone at this scale on TPU.
    jax.config.update("jax_default_prng_impl", "rbg")
    # Persistent compile cache: in-round runs pre-warm it for the driver's
    # end-of-round run (verified working over the axon tunnel: 4.7 s cold
    # compile -> 1.5 s warm on the probe kernel).
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs: compile cold, still correct
    import jax.numpy as jnp
    import numpy as np

    _wait_for_backend()

    from plnlp_tpu.dense import prepare_dense
    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.training import Model, ModelConfig

    emitted = {}
    dropped = []

    def emit(rec):
        emitted[rec["metric"]] = rec["value"]
        print(json.dumps(rec), flush=True)

    def timed_chain(step, x0, iters, reps=2):
        """Per-iter time of a dependent chain (one readback per pass),
        MIN over ``reps`` passes.  A transient tunnel stall inflates a
        single pass arbitrarily (measured: a mid-run stall read the
        ~12 ms hybrid SpMM line as 65 ms); min-of-2 restores the true
        kernel time at ~one extra second per metric.  The scalar
        dependence (x0 + 0*v) forces strict sequencing on device;
        block_until_ready lies on axon, so the sync is the float()."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            xi = x0
            v = None
            for _ in range(iters):
                v, _gr = step(xi)
                xi = x0 + 0.0 * v.astype(x0.dtype)
            float(v)
            best = min(best, (time.time() - t0) / iters)
        return best

    def have_time(est_s, name):
        """Deadline guard: skip a section when its estimated cost would
        blow the budget — cheapest-to-lose sections pass larger ests."""
        if time.time() + est_s <= deadline:
            return True
        dropped.append(name)
        print(
            f"BENCH BUDGET: dropping {name} "
            f"(elapsed {time.time()-t_start:.0f}s of {budget:.0f}s)",
            file=sys.stderr,
        )
        return False

    # ---- chip-health diagnostic: raw XLA row-gather rate ----
    # The shared chip + tunnel shows up to ~3x day-to-day variance, and the
    # sparse metric below is gather-bound — this line gives the reader the
    # raw gather rate of THIS run's chip-day so bench numbers from
    # different days can be compared honestly (RESULTS.md "gather wall").
    g_rng = np.random.default_rng(7)  # separate stream: keep the sparse
    gn, ge, gd = 236_000, 2_600_000, 256  # graph below byte-identical
    gx = jax.random.normal(jax.random.PRNGKey(2), (gn, gd), jnp.float32)
    gidx = jnp.asarray(g_rng.integers(0, gn, ge).astype(np.int32))
    gf = jax.jit(lambda x: x + 0.0 * jnp.sum(x[gidx], axis=0))
    xg = gf(gx)
    float(jnp.sum(xg))
    g_iters = 8
    t0 = time.time()
    xg = gx
    for _ in range(g_iters):
        xg = gf(xg)
    float(jnp.sum(xg))
    g_dt = (time.time() - t0) / g_iters
    emit(
        {
            "metric": "xla_row_gather_rate_rows_per_sec",
            "value": round(ge / g_dt),
            "unit": f"rows/s (raw {ge}-row D={gd} f32 gather — chip-day "
            f"health reference; round-1/2 range 59-125M)",
            "vs_baseline": round((ge / g_dt) / 74e6, 3),
        }
    )

    # ---- headline metric (MEASURED now, PRINTED last): full ddi-size
    # train step, dense backend ----
    rng = np.random.default_rng(0)
    n, e, dim, batch, num_neg = 4267, 1_067_000, 512, 64 * 1024, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dense = prepare_dense(src, dst, None, num_nodes=n, symmetrize=True)
    csr, _ = prepare_graph(src, dst, None, num_nodes=n, symmetrize=True, block=None)
    num_edges = csr.num_edges

    cfg = ModelConfig(
        emb_hidden_channels=dim,
        gnn_hidden_channels=dim,
        mlp_hidden_channels=dim,
        batch_size=batch,
        num_neg=num_neg,
        dropout=0.3,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_opt_state(params)
    pos = jnp.asarray(rng.integers(0, n, (batch, 2)).astype(np.int32))
    neg = jnp.asarray(
        rng.integers(0, n, (batch, num_neg, 2)).astype(np.int32)
    )
    margin = jnp.zeros((batch,), jnp.float32)
    mask = jnp.ones((batch,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    def one_step(params, opt_state, key):
        return model._train_step(
            params, opt_state, dense, None, None, pos, neg, margin, mask,
            lr, key, False,
        )

    # warmup/compile.  NOTE: sync via float(loss) (device->host readback) —
    # block_until_ready() does NOT wait for execution on the axon tunnel.
    params, opt_state, loss = one_step(params, opt_state, jax.random.PRNGKey(1))
    float(loss)

    iters = 20
    t0 = time.time()
    for i in range(iters):
        params, opt_state, loss = one_step(
            params, opt_state, jax.random.PRNGKey(i)
        )
    float(loss)  # forces the whole dependent chain
    dt = (time.time() - t0) / iters
    headline_eps = num_edges * cfg.gnn_num_layers * 2 / dt

    # bf16 variant of the same step (non-headline): the TPU-first compute
    # dtype a production deployment runs (--compute_dtype=bfloat16); kept
    # as a separate line so the f32 headline stays comparable to its
    # round-1 anchor.  Quality under bf16 is covered by the fuzz suite's
    # bf16-tracks-f32 tests.
    import dataclasses as _dc

    cfg16 = _dc.replace(cfg, compute_dtype="bfloat16")
    model16 = Model(cfg16, num_nodes=n)
    params16 = model16.init_params(jax.random.PRNGKey(0))
    opt16 = model16.init_opt_state(params16)

    def one_step16(params, opt_state, key):
        return model16._train_step(
            params, opt_state, dense, None, None, pos, neg, margin, mask,
            lr, key, False,
        )

    params16, opt16, loss16 = one_step16(params16, opt16, jax.random.PRNGKey(1))
    float(loss16)
    t0 = time.time()
    for i in range(iters):
        params16, opt16, loss16 = one_step16(
            params16, opt16, jax.random.PRNGKey(i)
        )
    float(loss16)
    dt16 = (time.time() - t0) / iters
    emit(
        {
            "metric": "train_step_bf16_agg_edges_per_sec_per_chip",
            "value": round(num_edges * cfg.gnn_num_layers * 2 / dt16),
            "unit": f"edges/s (same ddi-size train step, "
            f"--compute_dtype=bfloat16; {dt16*1e3:.1f} ms vs f32 "
            f"{dt*1e3:.1f} ms)",
            "vs_baseline": round(
                (num_edges * cfg.gnn_num_layers * 2 / dt16)
                / BASELINE_EDGES_PER_SEC,
                3,
            ),
        }
    )
    del model16, params16, opt16

    # ---- sparse-path metric: collab-scale blocked-CSR SpMM fwd+bwd ----
    from plnlp_tpu.ops.spmm import spmm_blocked

    ns, es, ds = 236_000, 1_300_000, 256
    s_src = rng.integers(0, ns, es)
    s_dst = rng.integers(0, ns, es)
    sg, sgt = prepare_graph(
        s_src, s_dst, None, num_nodes=ns, symmetrize=True, block=(512, 512)
    )
    # features generated ON DEVICE — a 242 MB host->device push over the
    # axon tunnel takes minutes and would poison the timing environment
    xs = jax.random.normal(jax.random.PRNGKey(0), (ns, ds), jnp.float32)
    spmm_f = jax.jit(
        jax.value_and_grad(lambda x: jnp.sum(spmm_blocked(sg, sgt, x, "sum") ** 2))
    )
    v, gr = spmm_f(xs)
    # Warm up the CHAIN too, not just spmm_f: the eager `xs + 0.0 * v` ops
    # compile lazily; unwarmed, that compile lands inside the first timed
    # loop (measured round 2: first loop 190 ms/iter, steady 85).
    v, gr = spmm_f(xs + 0.0 * v)
    float(v)  # compile + sync (block_until_ready lies on axon)
    # Dependent chain with ONE readback per pass (the tunnel's round trip
    # costs ~40 ms — per-rep syncs would overstate a ~60-100 ms kernel by
    # ~40%), min over 2 passes (timed_chain).
    sp_dt = timed_chain(spmm_f, xs, 8)
    sp_eps = sg.num_edges * 2 / sp_dt
    emit(
        {
            "metric": "blocked_csr_spmm_fwd_bwd_edges_per_sec",
            "value": round(sp_eps),
            "unit": f"edges/s (collab-size N={ns} E={sg.num_edges} D={ds} "
            f"blocked-CSR SpMM fwd+bwd; {sp_dt*1e3:.1f} ms)",
            "vs_baseline": round(sp_eps / BASELINE_SPARSE_EDGES_PER_SEC, 3),
        }
    )

    # ---- hybrid dense-tile metric: Pallas fused tile kernel + int8 tiles +
    # blocked residual at collab scale on the community-structured graph the
    # lever exists for (800-community SBM, labelprop reorder; T=256 /
    # min_fill=96 — the round-4 sweep optimum).  Graph passed as a jit ARG:
    # capturing the tile store as a lowering constant overflows the
    # remote-compile request (measured: HTTP 413 at 616 MB).
    from plnlp_tpu.data.synthetic import make_sbm_graph
    from plnlp_tpu.ops.tile_spmm import build_hybrid, label_prop_order
    from plnlp_tpu.ops.spmm import spmm as spmm_any

    if have_time(90, "hybrid_tile_spmm+attention"):
        h_src, h_dst = make_sbm_graph(
            np.random.default_rng(7), ns, es, num_communities=800
        )
        # the PRODUCT configuration (cli.py round 5): the id space is
        # relabeled to slot order on host once, so the operand carries no
        # perm_in/perm_out and the per-call feature permutations (4
        # full-matrix gathers per fwd+bwd, ~6.5 ms at this scale) are gone
        h_order = label_prop_order(h_src, h_dst, ns)
        h_map = np.empty(ns, np.int64)
        h_map[h_order] = np.arange(ns)
        h_src, h_dst = h_map[h_src], h_map[h_dst]
        hg = build_hybrid(
            h_src, h_dst, None, num_nodes=ns, tile=256, min_fill=96,
            symmetrize=True, reorder=None, dtype="bfloat16",
        )
        h_edges = hg.dense_edges + hg.res_edges
        xh = jax.random.normal(jax.random.PRNGKey(0), (ns, ds), jnp.bfloat16)
        hyb_f = jax.jit(
            jax.value_and_grad(
                lambda x, g: jnp.sum(
                    spmm_any(g, x, "sum").astype(jnp.float32) ** 2
                ),
                argnums=0,
            )
        )
        v, gr = hyb_f(xh, hg)
        v, gr = hyb_f(xh + 0.0 * v.astype(jnp.bfloat16), hg)
        float(v)
        hy_dt = timed_chain(lambda x: hyb_f(x, hg), xh, 8)
        hy_eps = h_edges * 2 / hy_dt
        emit(
            {
                "metric": "hybrid_tile_spmm_fwd_bwd_edges_per_sec",
                "value": round(hy_eps),
                "unit": f"edges/s (collab-size 800-community SBM N={ns} "
                f"E={h_edges} D=256 bf16 pre-relabeled (CLI id-space relabel, no perms); {hg.num_tiles} tiles "
                f"{100 * hg.dense_edges // h_edges}% dense, "
                f"store={hg.tile_vals.dtype}; {hy_dt*1e3:.1f} ms)",
                "vs_baseline": round(hy_eps / BASELINE_HYBRID_EDGES_PER_SEC, 3),
            }
        )
        # ---- block-sparse FLASH attention over the SAME hybrid operand
        # (ops/pallas_attention.py fused kernels + hand VJP).  Anchor = the
        # blocked hand-VJP transformer's healthy-day rate at this scale, so
        # vs_baseline reads directly as the speedup over the round-3 path.
        from plnlp_tpu.models.encoders import apply_encoder, init_encoder

        ta_params = init_encoder(jax.random.PRNGKey(3), "TRANSFORMER", ds, ds, 1)
        ta_f = jax.jit(
            jax.value_and_grad(
                lambda x, g: jnp.sum(
                    apply_encoder(ta_params, "TRANSFORMER", g, x)
                    .astype(jnp.float32) ** 2
                ),
                argnums=0,
            )
        )
        v, gr = ta_f(xh, hg)
        v, gr = ta_f(xh + 0.0 * v.astype(jnp.bfloat16), hg)
        float(v)
        ta_dt = timed_chain(lambda x: ta_f(x, hg), xh, 4)
        ta_eps = h_edges * 2 / ta_dt
        emit(
            {
                "metric": "hybrid_tile_attention_fwd_bwd_edges_per_sec",
                "value": round(ta_eps),
                "unit": f"edges/s (collab-size 800-community SBM N={ns} "
                f"E={h_edges} D=256 bf16 pre-relabeled block-sparse flash TransformerConv "
                f"fwd+bwd; {ta_dt*1e3:.1f} ms; anchor = blocked hand-VJP "
                f"17.2M e/s)",
                "vs_baseline": round(ta_eps / BASELINE_TCONV_HEALTHY, 3),
            }
        )
        del hg, hyb_f, ta_f

    # ---- transformer-conv metric: blocked hand-VJP fwd+bwd, collab scale
    # (the non-community path TRANSFORMER configs actually run) ----
    if have_time(70, "transformer_conv_blocked"):
        from plnlp_tpu.models.encoders import apply_encoder, init_encoder

        tg, tgt = prepare_graph(
            s_src, s_dst, None, num_nodes=ns, symmetrize=True, block=(512, 512),
            couple_transpose=True,
        )
        tparams = init_encoder(jax.random.PRNGKey(3), "TRANSFORMER", ds, ds, 1)
        tf = jax.jit(
            jax.value_and_grad(
                lambda x: jnp.sum(
                    apply_encoder(tparams, "TRANSFORMER", tg, x, graph_t=tgt) ** 2
                )
            )
        )
        v, gr = tf(xs)
        v, gr = tf(xs + 0.0 * v)  # warm the eager chain (see sparse note)
        float(v)
        tc_dt = timed_chain(tf, xs, 4)
        tc_eps = tg.num_edges * 2 / tc_dt
        emit(
            {
                "metric": "transformer_conv_fwd_bwd_edges_per_sec",
                "value": round(tc_eps),
                "unit": f"edges/s (collab-size N={ns} E={tg.num_edges} D={ds} "
                f"blocked TransformerConv hand-VJP fwd+bwd; {tc_dt*1e3:.1f} ms)",
                "vs_baseline": round(tc_eps / BASELINE_TCONV_EDGES_PER_SEC, 3),
            }
        )
        del tg, tgt, tf
    del xs

    # ---- quality gates: fixed-seed SBM training runs (tripwires at ~0.8x
    # healthy-day values; VERDICT r4 directive 4) ----
    from plnlp_tpu.cli import argument, run_experiment
    import contextlib
    import io

    def run_gate(argv, logger_key):
        # Logger.print_statistics writes to stdout unconditionally; keep
        # the bench stream pure JSON lines (the driver parses the last).
        with contextlib.redirect_stdout(io.StringIO()):
            loggers = run_experiment(argument(argv), log=lambda *_: None)
        traj = np.asarray(loggers[logger_key].results[0], np.float64)
        return float(traj[traj[:, 0].argmax(), 1])  # test at argmax valid

    def emit_gate(metric, value, threshold, unit):
        ok = bool(value >= threshold)
        emit(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": unit + f"; PASS threshold {threshold}; "
                + ("PASS)" if ok else "FAIL)"),
                # machine-readable gate: vs_baseline < 1.0 == FAIL, plus an
                # explicit boolean so automation needn't parse the unit text
                "pass": ok,
                "vs_baseline": round(value / threshold, 3),
            }
        )
        if not ok:
            print(
                f"QUALITY GATE FAILED: {metric} {value:.4f} < {threshold} "
                f"— training quality regressed",
                file=sys.stderr,
            )

    t_hits_dur = 100.0  # prior if the hits gate is skipped
    if have_time(100, "quality_gate_sbm_hits50"):
        t0 = time.time()
        q_val = 100 * run_gate(
            [
                "--data_name=synthetic:hits-sbm:num_nodes=4000,"
                "num_edges=60000,seed=7",
                "--epochs=15", "--eval_steps=5", "--runs=1",
                "--batch_size=65536", "--emb_hidden_channels=128",
                "--gnn_hidden_channels=128", "--mlp_hidden_channels=128",
                "--num_neg=3", "--dropout=0.3", "--adj_backend=dense",
                "--seed=0",
            ],
            "Hits@50",
        )
        t_hits_dur = time.time() - t0
        emit_gate(
            "quality_gate_sbm_hits50", q_val, QUALITY_GATE_HITS50,
            "Hits@50 %, test at argmax-valid (fixed-seed SBM, 15 epochs, "
            "SAGE+MLP+AUC",
        )

    # mrr layout + local sampler path (the hits gate can't see regressions
    # in the mrr eval layout, tie handling, or the local sampler)
    if have_time(80, "quality_gate_sbm_mrr"):
        m_val = run_gate(
            [
                "--data_name=synthetic:mrr-sbm:num_nodes=2000,"
                "num_edges=30000,seed=5",
                "--eval_metric=mrr", "--neg_sampler=local",
                "--epochs=20", "--eval_steps=5", "--runs=1", "--lr=0.003",
                "--batch_size=8192", "--emb_hidden_channels=64",
                "--gnn_hidden_channels=64", "--mlp_hidden_channels=64",
                "--num_neg=3", "--dropout=0.3", "--adj_backend=dense",
                "--seed=0",
            ],
            "MRR",
        )
        emit_gate(
            "quality_gate_sbm_mrr", m_val, QUALITY_GATE_MRR,
            "MRR, test at argmax-valid (fixed-seed SBM mrr layout, 20 "
            "epochs, SAGE+MLP+AUC+local sampler",
        )

    # TRANSFORMER + hybrid gate: block-sparse flash attention end-to-end
    # (the newest compute path gets its own driver-visible quality floor;
    # 16 communities at 4000 nodes -> dense diagonal tiles at T=256).
    # Cost scales with compile state: ~390 s cold cache, far less warm —
    # estimate it at 5x the hits gate's measured duration this run so a
    # cold-cache run DROPS this gate instead of losing the headline.
    if have_time(max(110.0, 5.0 * t_hits_dur), "quality_gate_sbm_attn_hits50"):
        a_val = 100 * run_gate(
            [
                "--data_name=synthetic:hits-sbm:num_nodes=4000,"
                "num_edges=60000,seed=7,num_communities=16",
                "--encoder=TRANSFORMER", "--adj_backend=hybrid",
                "--tile_size=256", "--tile_min_fill=64",
                "--epochs=15", "--eval_steps=5", "--runs=1",
                "--batch_size=65536", "--emb_hidden_channels=128",
                "--gnn_hidden_channels=128", "--mlp_hidden_channels=128",
                "--num_neg=3", "--dropout=0.3", "--seed=0",
            ],
            "Hits@50",
        )
        emit_gate(
            "quality_gate_sbm_attn_hits50", a_val, QUALITY_GATE_ATTN_HITS50,
            "Hits@50 %, test at argmax-valid (fixed-seed 16-community SBM, "
            "15 epochs, TRANSFORMER+hybrid block-sparse flash attention"
            "+MLP+AUC",
        )

    # ---- serving metrics: latency-AMORTIZED all-pairs grids (VERDICT r4
    # directive 7).  The old tracked 512-src pass was ~4 tunnel round
    # trips around a sub-ms kernel; all-pairs (n x n = 18.2M pairs) keeps
    # the same code path but amortizes the round trips ~36x, so the line
    # tracks the code, not the tunnel. ----
    from plnlp_tpu.serve import Scorer

    all_srcs = np.arange(n, dtype=np.int32)
    if have_time(60, "serving_rank_pairs_per_sec"):
        sc = Scorer(model, params, dense)
        sc.rank_candidates_batch(all_srcs, k=10, exclude_edges=True)  # warm
        t0 = time.time()
        serve_reps = 2
        for _ in range(serve_reps):
            sc.rank_candidates_batch(all_srcs, k=10, exclude_edges=True)
        serve_dt = (time.time() - t0) / serve_reps
        serve_pps = n * n / serve_dt
        emit(
            {
                "metric": "serving_rank_pairs_per_sec",
                "value": round(serve_pps),
                "unit": f"pairs/s (ALL-PAIRS {n} srcs x {n} candidates = "
                f"{n*n/1e6:.1f}M pairs, MLP predictor, top-10, known-edge "
                f"exclusion; latency-amortized over chunked dispatches; "
                f"{serve_dt*1e3:.0f} ms/pass)",
                "vs_baseline": round(serve_pps / BASELINE_SERVING_ALLPAIRS, 3),
            }
        )

    # factorized DOT grid (predictors.grid_scores): per-node transforms +
    # ONE MXU matmul + mask + top-k per source chunk, one jitted dispatch
    if have_time(45, "serving_rank_dot_pairs_per_sec"):
        import dataclasses

        cfg_dot = dataclasses.replace(cfg, predictor="DOT")
        model_dot = Model(cfg_dot, num_nodes=n)
        params_dot = model_dot.init_params(jax.random.PRNGKey(0))
        sc_dot = Scorer(model_dot, params_dot, dense)
        sc_dot.rank_candidates_batch(all_srcs, k=10, exclude_edges=True)
        t0 = time.time()
        serve_reps = 2
        for _ in range(serve_reps):
            sc_dot.rank_candidates_batch(all_srcs, k=10, exclude_edges=True)
        dot_dt = (time.time() - t0) / serve_reps
        dot_pps = n * n / dot_dt
        emit(
            {
                "metric": "serving_rank_dot_pairs_per_sec",
                "value": round(dot_pps),
                "unit": f"pairs/s (ALL-PAIRS {n} srcs x {n} candidates, DOT "
                f"predictor via factorized grid_scores, top-10, known-edge "
                f"exclusion; latency-amortized; {dot_dt*1e3:.0f} ms/pass)",
                "vs_baseline": round(
                    dot_pps / BASELINE_SERVING_DOT_ALLPAIRS, 3
                ),
            }
        )

    # ---- headline LAST (the driver parses the final line); carries a
    # compact copy of everything emitted so a partial log still surfaces
    # the full picture ----
    print(
        json.dumps(
            {
                "metric": "train_step_agg_edges_per_sec_per_chip",
                "value": round(headline_eps),
                "unit": "edges/s (full ddi-size train step: 2-layer SAGE "
                "fwd+bwd + MLP scoring + Adam)",
                "vs_baseline": round(headline_eps / BASELINE_EDGES_PER_SEC, 3),
                "others": emitted,
                "dropped": dropped,
                "elapsed_s": round(time.time() - t_start, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
