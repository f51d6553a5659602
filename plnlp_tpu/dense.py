"""Dense-adjacency fast path for small/dense graphs.

TPU-native design decision with no reference counterpart: for graphs like
ogbl-ddi (4,267 nodes, ~1M edges, mean degree ≈ 500) the N×N adjacency is
only ~70 MB and a dense ``A @ X`` rides the MXU at speed-of-light, beating
any sparse gather/scatter formulation by an order of magnitude.  The
reference is locked into torch_sparse CSR everywhere (reference main.py:81);
we pick the layout per graph.

``DenseAdj`` is a drop-in aggregation operand for every encoder: the
``ops.spmm.spmm`` dispatcher and the Transformer encoder accept either a CSR
:class:`plnlp_tpu.graph.Graph` or a ``DenseAdj``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plnlp_tpu.graph import Graph, _csr_np

__all__ = ["DenseAdj", "to_dense", "prepare_dense"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["adj", "in_degrees"],
    meta_fields=["num_nodes"],
)
@dataclasses.dataclass(frozen=True)
class DenseAdj:
    """Row = destination (same convention as Graph): out = adj @ x."""

    adj: jnp.ndarray  # [N, N] float32
    in_degrees: jnp.ndarray  # [N] int32 — unweighted in-edge counts
    num_nodes: int


def _dense_np(csr) -> Tuple[np.ndarray, np.ndarray]:
    n = csr["num_nodes"]
    e = csr["num_edges"]
    recv = csr["receivers"][:e]
    send = csr["senders"][:e]
    from plnlp_tpu import native

    if native.available():
        # np.add.at costs ~40s at 2M edges / 18M cells; the C++ loop ~50ms.
        return native.densify(
            send.astype(np.int64), recv.astype(np.int64),
            csr["edge_weight"][:e], n,
        )
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (recv, send), csr["edge_weight"][:e])
    deg = np.zeros(n, np.int32)
    np.add.at(deg, recv, 1)
    return a, deg.astype(np.int32)


def to_dense(graph: Graph) -> DenseAdj:
    """Densify an existing Graph ON DEVICE (no host readback)."""
    n = graph.num_nodes
    a = jnp.zeros((n, n), jnp.float32).at[graph.receivers, graph.senders].add(
        graph.edge_weight
    )
    return DenseAdj(adj=a, in_degrees=graph.in_degrees, num_nodes=n)


def prepare_dense(
    src,
    dst,
    weight=None,
    *,
    num_nodes: int,
    symmetrize: bool = False,
    coalesce: bool = True,
) -> DenseAdj:
    """Host-side COO → DenseAdj with a single h2d push."""
    csr = _csr_np(src, dst, weight, num_nodes, symmetrize, coalesce, 1)
    a, deg = _dense_np(csr)
    return DenseAdj(
        adj=jnp.asarray(a), in_degrees=jnp.asarray(deg), num_nodes=num_nodes
    )
