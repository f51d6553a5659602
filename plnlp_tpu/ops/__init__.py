from plnlp_tpu.ops.spmm import spmm, spmm_segment, spmm_blocked, spmm_dense
from plnlp_tpu.ops.sddmm import sddmm_dot, edge_softmax
from plnlp_tpu.ops.walk import random_walk

__all__ = [
    "spmm",
    "spmm_segment",
    "spmm_blocked",
    "spmm_dense",
    "sddmm_dot",
    "edge_softmax",
    "random_walk",
]
