"""Sharded training step: the Model step jitted over a device mesh.

pjit-style: the single-device step function is unchanged; shardings are
declared on inputs/outputs and XLA's SPMD partitioner inserts the
collectives.  Parity with the single-device step is asserted in tests on the
8-fake-device CPU mesh (SURVEY.md §4 distributed test plan).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plnlp_tpu.parallel.mesh import param_shardings
from plnlp_tpu.training import Model

__all__ = ["make_sharded_train_step", "shard_state"]


def shard_state(model: Model, mesh: Mesh, params, opt_state):
    """Place params and optimizer state on the mesh (moments follow params)."""
    p_sh = param_shardings(params, mesh)
    sharded_params = jax.device_put(params, p_sh)

    def opt_like(state):
        # Optimizer states mirror the param pytree inside their leaves
        # (e.g. ScaleByAdamState.mu/nu); shard leaves whose SHAPE matches
        # the emb table like the table itself, replicate everything else
        # (step counters, small-weight moments).
        def place(leaf):
            for pk, psh in [("emb", NamedSharding(mesh, P("node", None)))]:
                if (
                    hasattr(leaf, "shape")
                    and pk in params
                    and leaf.shape == params[pk].shape
                ):
                    return jax.device_put(leaf, psh)
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        return jax.tree_util.tree_map(place, state)

    return sharded_params, opt_like(opt_state)


def make_sharded_train_step(model: Model, mesh: Mesh):
    """jit the Model step with explicit shardings over ``mesh``.

    Input placement contract (see parallel.mesh): params.emb and graph edge
    arrays sharded over 'node', batches over 'data', the rest replicated.
    Returns a callable with the same signature as Model._train_step minus
    the static use_margin flag (bound to margin-present).
    """

    def step(params, opt_state, graph, graph_t, node_feats, pos, neg, margin, mask, lr, key, use_margin):
        return model._train_step_impl(
            params, opt_state, graph, graph_t, node_feats,
            pos, neg, margin, mask, lr, key, use_margin,
        )

    # Inputs arrive pre-placed with NamedShardings (shard_state/shard_graph/
    # shard_batch); jit propagates them and SPMD inserts the collectives.
    jitted = jax.jit(step, static_argnums=(11,), donate_argnums=(0, 1))

    def run(params, opt_state, graph, graph_t, node_feats, pos, neg, margin, mask, lr, key, use_margin=False):
        return jitted(
            params, opt_state, graph, graph_t, node_feats,
            pos, neg, margin, mask, lr, key, use_margin,
        )

    return run
