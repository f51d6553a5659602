"""Autotuning: blocked-SpMM block sizes and hyperparameter grid search.

The scatter-matmul's row-block size R trades one-hot matmul cost
(per-edge ~2·R·D flops) against sub-block padding and accumulator
residency; round-1 measurements showed R=512 beating R=256 by ~1.6x at
collab scale, with the optimum shifting with graph degree distribution and
feature width.  ``autotune_block`` measures the real fwd+bwd on the actual
graph for a few candidate (R, B) pairs and returns the fastest.

Timings force a device->host readback per trial (block_until_ready does not
wait for execution over the axon tunnel) and use medians over ``iters``
trials to ride out the shared chip's run-to-run variance.
"""

from __future__ import annotations

import copy
import itertools
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["autotune_block", "grid_search", "random_search"]

_CANDIDATES: Tuple[Tuple[int, int], ...] = ((256, 512), (512, 512), (1024, 512))


def autotune_block(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    *,
    num_nodes: int,
    dim: int,
    symmetrize: bool = False,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    block_edges: int = 512,
    iters: int = 3,
    dtype="float32",
    log=None,
) -> Tuple[int, int]:
    """Measure blocked SpMM fwd+bwd per candidate (R, B); return the best.

    Intended for one-time use at experiment setup on real hardware (the CLI
    ``--block_rows=0`` path); on CPU it still works but the choice is
    meaningless for TPU runs.
    """
    import jax
    import jax.numpy as jnp

    from plnlp_tpu.graph import prepare_graph
    from plnlp_tpu.ops.spmm import spmm_blocked

    if candidates is None:
        # Sweep R only; honor the caller's --block_edges rather than
        # silently overriding it.
        candidates = tuple((r, block_edges) for r, _ in _CANDIDATES)

    x = jax.random.normal(
        jax.random.PRNGKey(0), (num_nodes, dim), jnp.dtype(dtype)
    )
    best, best_dt = None, float("inf")
    for R, B in candidates:
        if R > max(num_nodes, 1):
            continue
        g, gt = prepare_graph(
            src, dst, weight, num_nodes=num_nodes,
            symmetrize=symmetrize, block=(R, B),
        )
        f = jax.jit(
            jax.value_and_grad(
                lambda x: jnp.sum(
                    spmm_blocked(g, gt, x, "sum").astype(jnp.float32) ** 2
                )
            )
        )
        try:
            v, _ = f(x)
            float(v)  # compile + readback sync
            ts = []
            for _ in range(iters):
                t0 = time.time()
                v, gr = f(x)
                float(v)
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
        except Exception as e:  # OOM on huge R etc. — skip the candidate
            if log:
                log(f"autotune: (R={R}, B={B}) failed: {e!r:.120}")
            continue
        if log:
            log(f"autotune: (R={R}, B={B}) spmm fwd+bwd {dt*1e3:.1f} ms")
        if dt < best_dt:
            best, best_dt = (R, B), dt
    if best is None:
        # Nothing was measured (every candidate skipped or failed) — fall
        # back to the smallest candidate that satisfies the same
        # R <= num_nodes constraint the sweep enforced, not a hard-coded
        # (512, 512) that may itself be invalid for a tiny graph.
        valid = [
            (r, b) for r, b in sorted(candidates) if r <= max(num_nodes, 1)
        ]
        if valid:
            return valid[0]
        r = 1 << max(0, max(num_nodes, 1).bit_length() - 1)  # pow2 <= N
        return min(r, 512), block_edges
    return best


def grid_search(
    base_args,
    grid: Dict[str, Sequence],
    metric: Optional[str] = None,
    log=print,
    _announce_best: bool = True,
) -> Tuple[Dict, List[Dict]]:
    """Exhaustive hyperparameter search over CLI flag values.

    The reference offers no tuning support — its README hyperparameters were
    found by hand.  This driver runs the FULL experiment protocol
    (``cli.run_experiment``: runs × epochs, per-epoch sampling, eval points,
    model selection) once per grid point and selects by mean best-validation
    score, the same argmax-valid criterion the run logger applies within a
    run (reference logger.py:26-49).

    Args:
      base_args: an ``argparse.Namespace`` from ``cli.argument`` — the fixed
        flags.  Each grid point deep-copies it and overrides the swept keys.
      grid: flag name → list of values, e.g. ``{"lr": [1e-3, 3e-3],
        "num_neg": [1, 3]}``.  Keys must be existing CLI flags.
      metric: logger key to select by (``"Hits@50"``, ``"MRR"``, ...);
        defaults to the ``eval_metric`` flag's natural key (``MRR`` for mrr,
        ``Hits@50`` for hits).
      log: progress sink (``None`` silences).

    Returns ``(best, results)``: ``best`` is the winning overrides dict with
    ``valid``/``test`` means attached; ``results`` has one such dict per grid
    point in sweep order.
    """
    from plnlp_tpu.cli import run_experiment

    for k in grid:
        if not hasattr(base_args, k):
            raise ValueError(f"unknown CLI flag in grid: --{k}")
    if metric is None:
        metric = "MRR" if getattr(base_args, "eval_metric", "hits") == "mrr" else "Hits@50"
    emit = log if log is not None else (lambda *a: None)

    keys = list(grid)
    results: List[Dict] = []
    best: Optional[Dict] = None
    for combo in itertools.product(*(grid[k] for k in keys)):
        overrides = dict(zip(keys, combo))
        args = copy.deepcopy(base_args)
        for k, v in overrides.items():
            setattr(args, k, v)
        loggers = run_experiment(args, log=lambda *a: None)
        if metric not in loggers:
            raise ValueError(
                f"metric {metric!r} not produced; available: {sorted(loggers)}"
            )
        vm, vs, tm, ts = loggers[metric].summary()
        if np.isnan(vm):
            # epochs < eval_steps records no eval points; a silent NaN here
            # would make every best-comparison False and return the first
            # (unevaluated) point as "best".
            raise ValueError(
                f"grid point {overrides} recorded no eval points (valid mean "
                f"is NaN) — epochs={args.epochs} < eval_steps="
                f"{args.eval_steps}?"
            )
        entry = {
            **overrides,
            "valid": float(vm),
            "valid_std": float(vs),
            "test": float(tm),
            "test_std": float(ts),
        }
        results.append(entry)
        emit(
            f"grid_search: {overrides} -> {metric} valid "
            f"{vm:.2f} ± {vs:.2f}, test {tm:.2f}"
        )
        if best is None or entry["valid"] > best["valid"]:
            best = entry
    if best is None:
        raise ValueError("empty grid")
    if _announce_best:
        emit(f"grid_search: best {best}")
    return best, results


def random_search(
    base_args,
    space: Dict[str, Sequence],
    num_trials: int,
    metric: Optional[str] = None,
    seed: int = 0,
    log=print,
) -> Tuple[Dict, List[Dict]]:
    """Random hyperparameter search: ``num_trials`` draws from ``space``.

    Same contract as :func:`grid_search` but each trial samples one value
    per flag uniformly (with replacement across trials, deduplicated —
    a repeated draw is skipped, so fewer than ``num_trials`` results can
    come back on small spaces).  Preferable to the full grid when the
    space is large: random search covers each 1-D marginal ``num_trials``
    times where a grid of equal budget covers it ``budget^(1/d)`` times
    (Bergstra & Bengio, 2012).
    """
    rng = np.random.default_rng(seed)
    keys = list(space)
    for k in keys:
        if not hasattr(base_args, k):
            raise ValueError(f"unknown CLI flag in space: --{k}")
        if not len(space[k]):
            raise ValueError(f"empty value list for --{k}")
    seen = set()
    combos = []
    for _ in range(num_trials):
        combo = tuple(space[k][rng.integers(len(space[k]))] for k in keys)
        if combo in seen:
            continue
        seen.add(combo)
        combos.append(combo)
    # Reuse grid_search's runner on the sampled points: a degenerate
    # "grid" with exactly one value per axis per trial.
    results: List[Dict] = []
    best: Optional[Dict] = None
    for combo in combos:
        b, r = grid_search(
            base_args,
            {k: [v] for k, v in zip(keys, combo)},
            metric=metric,
            log=log,
            _announce_best=False,  # one line per trial + one final best
        )
        results.extend(r)
        if best is None or b["valid"] > best["valid"]:
            best = b
    if best is None:
        raise ValueError("num_trials must be >= 1")
    if log is not None:
        log(f"random_search: best {best}")
    return best, results
