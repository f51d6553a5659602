"""plnlp_tpu — a TPU-native graph link-prediction framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of
PLNLP (zhitao-wang/PLNLP): full-graph GNN encoders over MXU-blocked SpMM,
pairwise edge predictors, AUC-family ranking losses, negative samplers,
random-walk augmentation, OGB-exact evaluation, and a multi-device sharded
runtime the reference never had.  See SURVEY.md for the reference analysis.
"""

from plnlp_tpu.dense import DenseAdj, prepare_dense, to_dense
from plnlp_tpu.graph import (
    Graph,
    build_graph,
    prepare_graph,
    transpose_graph,
    with_blocks,
)

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "DenseAdj",
    "build_graph",
    "prepare_graph",
    "prepare_dense",
    "to_dense",
    "transpose_graph",
    "with_blocks",
    "__version__",
]
