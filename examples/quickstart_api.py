"""Library-level quickstart: train a link predictor without the CLI.

Runs on any backend (CPU in seconds, TPU unchanged).  Shows the functional
core the CLI driver is built from: immutable graph pytrees, a Model holding
only static config, and pure jitted steps that thread (params, opt_state).

    python examples/quickstart_api.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.data.synthetic import make_sbm_graph
from plnlp_tpu.graph import prepare_graph
from plnlp_tpu.metrics import evaluate_hits
from plnlp_tpu.sampling import global_neg_sample
from plnlp_tpu.training import Model, ModelConfig


def main():
    # --- a small learnable graph (4 communities, intra-community edges) ---
    rng = np.random.default_rng(0)
    n = 2000
    src, dst = make_sbm_graph(rng, num_nodes=n, num_edges=12000, num_communities=4)
    order = rng.permutation(len(src))
    train, held = order[: len(src) - 512], order[len(src) - 512 :]

    # Graph container: host-side preprocessing, one h2d push, static shapes.
    graph, graph_t = prepare_graph(
        src[train], dst[train], None, num_nodes=n, symmetrize=True, block=(512, 512)
    )

    # --- model: SAGE encoder + MLP pair scorer + AUC ranking loss ---------
    cfg = ModelConfig(
        encoder="SAGE",
        predictor="MLP",
        loss_func="AUC",
        gnn_hidden_channels=64,
        mlp_hidden_channels=64,
        emb_hidden_channels=64,
        batch_size=4096,
        num_neg=3,
        dropout=0.1,
        lr=0.01,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_opt_state(params)

    pos = jnp.asarray(np.stack([src[train], dst[train]], 1).astype(np.int32))
    key = jax.random.PRNGKey(1)
    for epoch in range(1, 11):
        key, k_epoch = jax.random.split(key)
        params, opt_state, loss = model.train_epoch(
            params, opt_state, graph, graph_t, None, pos, None, k_epoch, cfg.lr,
            sample_graph=graph,
        )
        print(f"epoch {epoch}: loss {float(loss):.1f}")

    # --- evaluate: held-out edges vs sampled negatives --------------------
    h = model._encode(params, graph, graph_t, None)
    pos_eval = jnp.asarray(np.stack([src[held], dst[held]], 1).astype(np.int32))
    neg_eval = global_neg_sample(
        jax.random.PRNGKey(2), graph, len(held), 1
    ).reshape(-1, 2)
    pos_pred = model.batch_predict(params, h, pos_eval)
    neg_pred = model.batch_predict(params, h, neg_eval)
    res = evaluate_hits(pos_pred, neg_pred, pos_pred, neg_pred)
    print(f"Hits@50 on held-out edges: {res['Hits@50'][0]:.3f}")


if __name__ == "__main__":
    main()
