"""Benchmark harness — prints one JSON line per tracked metric.

Headline metric (printed LAST — the driver parses the final line):
aggregated-edges/s/chip through the FULL flagship train step (2-layer SAGE
encoder full-graph fwd+bwd + MLP pair scoring + AUC loss + Adam update) on
an ogbl-ddi-sized synthetic graph (N=4267, E≈2M after symmetrization),
dense-adjacency backend — the configuration the reference's headline
ogbl-ddi result trains (reference README.md:24, BASELINE.md).

Sparse-path metric (printed first): blocked-CSR SpMM fwd+bwd at
ogbl-collab scale (N=236k, E≈2.6M sym, D=256) — the kernel that carries
collab and citation2, where the XLA row gather is the wall.  Tracked so a
green dense headline can't hide a red sparse kernel (round-1 verdict).

edges/s = num_edges × gnn_layers × 2 (fwd+bwd) / step_time.

Round-3 additions (per VERDICT r2 directives 3, 4, 7):
* transformer_conv fwd+bwd edges/s at collab scale — the blocked hand-VJP
  path (ops/transformer.py); anchor = the segment/XLA-autodiff path's 11.0M
  edges/s measured the same chip-day the kernel landed.
* serving pairs/s — Scorer.rank_candidates_batch, 512 sources × all-nodes
  grid with known-edge exclusion, on-device top-k.
* quality gate — fixed-seed SBM hits run (ddi-shape model, 15 epochs);
  test-at-argmax-valid Hits@50 must exceed the recorded threshold (6.0;
  measured 9.9 when the gate landed).  Catches silent training-quality
  regressions that throughput lines can't.

vs_baseline anchors are the FIRST honest measurements of each path
(dense: 239 M agg-edges/s f32 round-1; sparse: 76 M edges/s round-1;
transformer/serving/quality: round-3 landing values) so the series tracks
progress.
"""

import json
import time

BASELINE_EDGES_PER_SEC = 239e6  # round-1 first measurement, dense path, f32
BASELINE_SPARSE_EDGES_PER_SEC = 76e6  # round-1 blocked spmm fwd+bwd ~67.5 ms
BASELINE_TCONV_EDGES_PER_SEC = 11.0e6  # segment/autodiff path, round-3 chip-day
BASELINE_HYBRID_EDGES_PER_SEC = 155e6  # round-3 GO measurement (32.8 ms, XLA tiles)
BASELINE_TCONV_HEALTHY = 17.2e6  # blocked hand-VJP transformer, healthy day r4
BASELINE_SERVING_PAIRS_PER_SEC = 26e6  # round-3 landing measurement
BASELINE_SERVING_DOT_PPS = 34e6  # round-4 landing (factorized grid, jitted)
QUALITY_GATE_HITS50 = 6.0  # threshold; 9.9 measured at round-3 landing
QUALITY_GATE_MRR = 0.30  # threshold; ~0.53 measured when the mrr test landed


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
    import jax

    # rbg PRNG: the threefry default costs ~13 ms/step in dropout-mask
    # generation alone at this scale on TPU.
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    _wait_for_backend()

    from plnlp_tpu.dense import prepare_dense
    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.training import Model, ModelConfig

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
    print(
        json.dumps(
            {
                "metric": "xla_row_gather_rate_rows_per_sec",
                "value": round(ge / g_dt),
                "unit": f"rows/s (raw {ge}-row D={gd} f32 gather — chip-day "
                f"health reference; round-1/2 range 59-125M)",
                "vs_baseline": round((ge / g_dt) / 74e6, 3),
            }
        )
    )

    # ---- sparse-path metric: collab-scale blocked-CSR SpMM fwd+bwd ----
    from plnlp_tpu.ops.spmm import spmm_blocked

    rng = np.random.default_rng(0)
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
    # compile lazily, and over the tunnel that compile costs ~0.8 s — left
    # unwarmed it lands inside the first timed loop and inflated the
    # round-2 bench ~2x (measured: first loop 190 ms/iter, steady 85).
    v, gr = spmm_f(xs + 0.0 * v)
    float(v)  # compile + sync (block_until_ready lies on axon)
    # Time a DEPENDENT chain of steps with ONE readback at the end: the
    # tunnel's device->host round trip costs ~40 ms, so a per-rep float()
    # sync would overstate a ~60-100 ms kernel by ~40%.  The scalar
    # dependence (xs + 0*v) forces strict sequencing on device.
    sp_iters = 8
    t0 = time.time()
    xi = xs
    for _ in range(sp_iters):
        v, gr = spmm_f(xi)
        xi = xs + 0.0 * v
    float(v)
    sp_dt = (time.time() - t0) / sp_iters
    sp_eps = sg.num_edges * 2 / sp_dt
    print(
        json.dumps(
            {
                "metric": "blocked_csr_spmm_fwd_bwd_edges_per_sec",
                "value": round(sp_eps),
                "unit": f"edges/s (collab-size N={ns} E={sg.num_edges} D={ds} "
                f"blocked-CSR SpMM fwd+bwd; {sp_dt*1e3:.1f} ms)",
                "vs_baseline": round(sp_eps / BASELINE_SPARSE_EDGES_PER_SEC, 3),
            }
        )
    )

    # ---- hybrid dense-tile metric: Pallas fused tile kernel + int8 tiles +
    # blocked residual at collab scale on the community-structured graph the
    # lever exists for (800-community SBM, labelprop reorder; T=256 /
    # min_fill=96 — the round-4 sweep optimum, NOT the T=512/384 config the
    # 155M anchor was measured at).  Graph passed as a jit ARG: capturing
    # the tile store as a lowering constant overflows the remote-compile
    # request (measured: HTTP 413 at 616 MB).
    from plnlp_tpu.data.synthetic import make_sbm_graph
    from plnlp_tpu.ops.tile_spmm import build_hybrid
    from plnlp_tpu.ops.spmm import spmm as spmm_any

    h_src, h_dst = make_sbm_graph(
        np.random.default_rng(7), ns, es, num_communities=800
    )
    hg = build_hybrid(
        h_src, h_dst, None, num_nodes=ns, tile=256, min_fill=96,
        symmetrize=True, reorder="labelprop", dtype="bfloat16",
    )
    h_edges = hg.dense_edges + hg.res_edges
    xh = jax.random.normal(jax.random.PRNGKey(0), (ns, ds), jnp.bfloat16)
    hyb_f = jax.jit(
        jax.value_and_grad(
            lambda x, g: jnp.sum(spmm_any(g, x, "sum").astype(jnp.float32) ** 2),
            argnums=0,
        )
    )
    v, gr = hyb_f(xh, hg)
    v, gr = hyb_f(xh + 0.0 * v.astype(jnp.bfloat16), hg)
    float(v)
    hy_iters = 8
    t0 = time.time()
    xi = xh
    for _ in range(hy_iters):
        v, gr = hyb_f(xi, hg)
        xi = xh + 0.0 * v.astype(jnp.bfloat16)
    float(v)
    hy_dt = (time.time() - t0) / hy_iters
    hy_eps = h_edges * 2 / hy_dt
    print(
        json.dumps(
            {
                "metric": "hybrid_tile_spmm_fwd_bwd_edges_per_sec",
                "value": round(hy_eps),
                "unit": f"edges/s (collab-size 800-community SBM N={ns} "
                f"E={h_edges} D=256 bf16; {hg.num_tiles} tiles "
                f"{100 * hg.dense_edges // h_edges}% dense, "
                f"store={hg.tile_vals.dtype}; {hy_dt*1e3:.1f} ms)",
                "vs_baseline": round(hy_eps / BASELINE_HYBRID_EDGES_PER_SEC, 3),
            }
        )
    )
    # ---- block-sparse attention metric (round 4): TransformerConv over the
    # SAME hybrid operand (ops/tile_attention.py) — dense masked QK^T/PV per
    # tile + per-edge residual, two-pass global softmax.  Anchor = the
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
    ta_iters = 4
    t0 = time.time()
    xi = xh
    for _ in range(ta_iters):
        v, gr = ta_f(xi, hg)
        xi = xh + 0.0 * v.astype(jnp.bfloat16)
    float(v)
    ta_dt = (time.time() - t0) / ta_iters
    ta_eps = h_edges * 2 / ta_dt
    print(
        json.dumps(
            {
                "metric": "hybrid_tile_attention_fwd_bwd_edges_per_sec",
                "value": round(ta_eps),
                "unit": f"edges/s (collab-size 800-community SBM N={ns} "
                f"E={h_edges} D=256 bf16 block-sparse TransformerConv "
                f"fwd+bwd; {ta_dt*1e3:.1f} ms; anchor = blocked hand-VJP "
                f"17.2M e/s)",
                "vs_baseline": round(ta_eps / BASELINE_TCONV_HEALTHY, 3),
            }
        )
    )
    del hg, hyb_f, ta_f

    # ---- transformer-conv metric: blocked hand-VJP fwd+bwd, collab scale --

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
    v, gr = tf(xs + 0.0 * v)  # warm the eager chain (see sparse metric note)
    float(v)
    tc_iters = 4
    t0 = time.time()
    xi = xs
    for _ in range(tc_iters):
        v, gr = tf(xi)
        xi = xs + 0.0 * v
    float(v)
    tc_dt = (time.time() - t0) / tc_iters
    tc_eps = tg.num_edges * 2 / tc_dt
    print(
        json.dumps(
            {
                "metric": "transformer_conv_fwd_bwd_edges_per_sec",
                "value": round(tc_eps),
                "unit": f"edges/s (collab-size N={ns} E={tg.num_edges} D={ds} "
                f"blocked TransformerConv hand-VJP fwd+bwd; {tc_dt*1e3:.1f} ms)",
                "vs_baseline": round(tc_eps / BASELINE_TCONV_EDGES_PER_SEC, 3),
            }
        )
    )
    del tg, tgt, tf

    # ---- quality gate: fixed-seed SBM training run (VERDICT r2 #3) ----
    from plnlp_tpu.cli import argument, run_experiment

    q_argv = [
        "--data_name=synthetic:hits-sbm:num_nodes=4000,num_edges=60000,seed=7",
        "--epochs=15", "--eval_steps=5", "--runs=1", "--batch_size=65536",
        "--emb_hidden_channels=128", "--gnn_hidden_channels=128",
        "--mlp_hidden_channels=128", "--num_neg=3", "--dropout=0.3",
        "--adj_backend=dense", "--seed=0",
    ]
    import contextlib
    import io

    # Logger.print_statistics writes to stdout unconditionally; keep the
    # bench stream pure JSON lines (the driver parses the final line).
    with contextlib.redirect_stdout(io.StringIO()):
        loggers = run_experiment(argument(q_argv), log=lambda *_: None)
    traj = np.asarray(loggers["Hits@50"].results[0], np.float64)
    q_val = float(100 * traj[traj[:, 0].argmax(), 1])  # test at argmax valid
    q_pass = bool(q_val >= QUALITY_GATE_HITS50)
    print(
        json.dumps(
            {
                "metric": "quality_gate_sbm_hits50",
                "value": round(q_val, 2),
                "unit": f"Hits@50 %, test at argmax-valid (fixed-seed SBM, "
                f"15 epochs, SAGE+MLP+AUC; PASS threshold "
                f"{QUALITY_GATE_HITS50}; {'PASS' if q_pass else 'FAIL'})",
                # machine-readable gate: vs_baseline < 1.0 == FAIL, plus an
                # explicit boolean so automation needn't parse the unit text
                "pass": q_pass,
                "vs_baseline": round(q_val / QUALITY_GATE_HITS50, 3),
            }
        )
    )
    if not q_pass:
        import sys

        print(
            f"QUALITY GATE FAILED: sbm Hits@50 {q_val:.2f} < "
            f"{QUALITY_GATE_HITS50} — training quality regressed",
            file=sys.stderr,
        )

    # ---- quality gate #2: MRR path (citation2-shaped eval + local sampler).
    # Mirrors tests/test_cli.py::test_mrr_quality_on_learnable_graph, here as
    # a driver-visible per-round number (the hits gate can't see regressions
    # in the mrr eval layout, tie handling, or the local sampler).
    m_argv = [
        "--data_name=synthetic:mrr-sbm:num_nodes=2000,num_edges=30000,seed=5",
        "--eval_metric=mrr", "--neg_sampler=local",
        "--epochs=20", "--eval_steps=5", "--runs=1", "--lr=0.003",
        "--batch_size=8192", "--emb_hidden_channels=64",
        "--gnn_hidden_channels=64", "--mlp_hidden_channels=64",
        "--num_neg=3", "--dropout=0.3", "--adj_backend=dense", "--seed=0",
    ]
    with contextlib.redirect_stdout(io.StringIO()):
        m_loggers = run_experiment(argument(m_argv), log=lambda *_: None)
    m_traj = np.asarray(m_loggers["MRR"].results[0], np.float64)
    m_val = float(m_traj[m_traj[:, 0].argmax(), 1])  # test at argmax valid
    m_pass = bool(m_val >= QUALITY_GATE_MRR)
    print(
        json.dumps(
            {
                "metric": "quality_gate_sbm_mrr",
                "value": round(m_val, 4),
                "unit": f"MRR, test at argmax-valid (fixed-seed SBM mrr "
                f"layout, 20 epochs, SAGE+MLP+AUC+local sampler; PASS "
                f"threshold {QUALITY_GATE_MRR}; "
                f"{'PASS' if m_pass else 'FAIL'})",
                "pass": m_pass,
                "vs_baseline": round(m_val / QUALITY_GATE_MRR, 3),
            }
        )
    )
    if not m_pass:
        import sys

        print(
            f"QUALITY GATE FAILED: sbm MRR {m_val:.4f} < "
            f"{QUALITY_GATE_MRR} — mrr-path training quality regressed",
            file=sys.stderr,
        )

    # ---- headline metric: full ddi-size train step (dense backend) ----
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

    edges_per_sec = num_edges * cfg.gnn_num_layers * 2 / dt

    # ---- serving metric: on-device grid ranking (VERDICT r2 #7) ----
    # 512 sources × all-node candidate grid, known-edge exclusion, top-10;
    # only (512,) sources go up and (512, 10) results come back.
    from plnlp_tpu.serve import Scorer

    sc = Scorer(model, params, dense)
    srcs = rng.integers(0, n, 512).astype(np.int32)
    sc.rank_candidates_batch(srcs, k=10, exclude_edges=True)  # warm
    t0 = time.time()
    serve_reps = 2
    for _ in range(serve_reps):
        sc.rank_candidates_batch(srcs, k=10, exclude_edges=True)
    serve_dt = (time.time() - t0) / serve_reps
    serve_pps = 512 * n / serve_dt
    print(
        json.dumps(
            {
                "metric": "serving_rank_pairs_per_sec",
                "value": round(serve_pps),
                "unit": f"pairs/s (512 srcs x {n} candidates, top-10, "
                f"known-edge exclusion; {serve_dt*1e3:.0f} ms/pass)",
                "vs_baseline": round(
                    serve_pps / BASELINE_SERVING_PAIRS_PER_SEC, 3
                ),
            }
        )
    )

    # ---- serving metric #2: the factorized DOT grid (round 4) ----
    # DOT/BIL/MLPDOT/MLPBIL rank through predictors.grid_scores — per-node
    # transforms + ONE MXU matmul + mask + top-k in a single jitted
    # dispatch.  At this 512-source grid the pass is tunnel-latency bound
    # (~4 round trips); the kernel itself is sub-ms.
    import dataclasses

    cfg_dot = dataclasses.replace(cfg, predictor="DOT")
    model_dot = Model(cfg_dot, num_nodes=n)
    params_dot = model_dot.init_params(jax.random.PRNGKey(0))
    sc_dot = Scorer(model_dot, params_dot, dense)
    sc_dot.rank_candidates_batch(srcs, k=10, exclude_edges=True)  # warm
    t0 = time.time()
    for _ in range(serve_reps):
        sc_dot.rank_candidates_batch(srcs, k=10, exclude_edges=True)
    dot_dt = (time.time() - t0) / serve_reps
    dot_pps = 512 * n / dot_dt
    print(
        json.dumps(
            {
                "metric": "serving_rank_dot_pairs_per_sec",
                "value": round(dot_pps),
                "unit": f"pairs/s (512 srcs x {n} candidates, DOT predictor "
                f"via factorized grid_scores, top-10, known-edge exclusion, "
                f"one jitted dispatch; {dot_dt*1e3:.0f} ms/pass)",
                "vs_baseline": round(dot_pps / BASELINE_SERVING_DOT_PPS, 3),
            }
        )
    )

    print(
        json.dumps(
            {
                "metric": "train_step_agg_edges_per_sec_per_chip",
                "value": round(edges_per_sec),
                "unit": "edges/s (full ddi-size train step: 2-layer SAGE fwd+bwd + MLP scoring + Adam)",
                "vs_baseline": round(edges_per_sec / BASELINE_EDGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
