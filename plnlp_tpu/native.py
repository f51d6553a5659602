"""ctypes bindings for the native graphcore library (csrc/graphcore.cpp).

Compiled lazily on first use with g++ (cached under build/); every entry
point has a NumPy fallback in graph.py / dense.py, so the framework works —
just slower at preprocessing time — when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "get_lib",
    "coalesce_add",
    "build_indptr",
    "densify",
    "blocks_build",
    "label_prop",
    "bfs_order",
    "available",
]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "graphcore.cpp")
_BUILD_DIR = os.path.join(_ROOT, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libgraphcore.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    for flags in (
        ["-O3", "-march=native", "-fopenmp"],
        ["-O3"],  # fallback without openmp/march
    ):
        cmd = ["g++", *flags, "-shared", "-fPIC", _SRC, "-o", _LIB_PATH]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            return False
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.coalesce_add.restype = ctypes.c_int64
        lib.coalesce_add.argtypes = [
            _I64, _I64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            _I64, _I64, _F32,
        ]
        lib.build_indptr.restype = None
        lib.build_indptr.argtypes = [_I64, ctypes.c_int64, ctypes.c_int64, _I32]
        lib.densify.restype = None
        lib.densify.argtypes = [
            _I64, _I64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            _F32, _I32,
        ]
        lib.blocks_count.restype = ctypes.c_int64
        lib.blocks_count.argtypes = [
            _I32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.blocks_fill.restype = None
        lib.blocks_fill.argtypes = [
            _I64, _I64, ctypes.c_void_p, _I32, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, _I32, _F32, _I32, _I32,
        ]
        lib.label_prop.restype = ctypes.c_int64
        lib.label_prop.argtypes = [
            _I32, _I32, ctypes.c_int64, ctypes.c_int64, _I64,
        ]
        lib.bfs_order.restype = None
        lib.bfs_order.argtypes = [_I32, _I32, ctypes.c_int64, _I64, _I64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _wptr(w: Optional[np.ndarray]):
    if w is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    return w.ctypes.data_as(ctypes.c_void_p), w  # keep alive


def coalesce_add(
    src: np.ndarray, dst: np.ndarray, w: Optional[np.ndarray], num_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    e = len(src)
    out_src = np.empty(e, np.int64)
    out_dst = np.empty(e, np.int64)
    out_w = np.empty(e, np.float32)
    if w is None:
        wp, keep = None, None
    else:
        wp, keep = _wptr(w)
    m = lib.coalesce_add(src, dst, wp, e, num_nodes, out_src, out_dst, out_w)
    return out_src[:m].copy(), out_dst[:m].copy(), out_w[:m].copy()


def build_indptr(dst_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    dst_sorted = np.ascontiguousarray(dst_sorted, np.int64)
    indptr = np.empty(num_nodes + 1, np.int32)
    lib.build_indptr(dst_sorted, len(dst_sorted), num_nodes, indptr)
    return indptr


def blocks_build(
    senders: np.ndarray,
    receivers: np.ndarray,
    w: Optional[np.ndarray],
    indptr: np.ndarray,
    num_nodes: int,
    R: int,
    B: int,
) -> dict:
    """Sub-block metadata for the blocked scatter-matmul — native counterpart
    of graph._blocks_np (edges sorted by dst; arrays pre-zeroed here so
    padding lanes carry weight 0)."""
    lib = get_lib()
    assert lib is not None
    senders = np.ascontiguousarray(senders, np.int64)
    receivers = np.ascontiguousarray(receivers, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int32)
    nblk = int(lib.blocks_count(indptr, num_nodes, R, B))
    blk_src = np.zeros(nblk * B, np.int32)
    blk_w = np.zeros(nblk * B, np.float32)
    blk_local = np.zeros(nblk * B, np.int32)
    blk_rowblock = np.zeros(nblk, np.int32)
    if w is None:
        wp = None
    else:
        wp, _keep = _wptr(w)
    lib.blocks_fill(
        senders, receivers, wp, indptr, num_nodes, R, B,
        blk_src, blk_w, blk_local, blk_rowblock,
    )
    return {
        "blk_src": blk_src.reshape(nblk, B),
        "blk_weight": blk_w.reshape(nblk, B),
        "blk_local": blk_local.reshape(nblk, B),
        "blk_rowblock": blk_rowblock,
        "block_rows": R,
        "block_edges": B,
    }


def label_prop(
    indptr: np.ndarray, indices: np.ndarray, num_nodes: int, rounds: int
) -> np.ndarray:
    """Label propagation over an undirected CSR; returns final labels.
    Semantics identical to the NumPy sweep in ops/tile_spmm.py (mode of
    neighbor labels, ties -> smallest; synchronous updates; early stop)."""
    lib = get_lib()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    labels = np.arange(num_nodes, dtype=np.int64)
    lib.label_prop(indptr, indices, num_nodes, rounds, labels)
    return labels


def bfs_order(
    indptr: np.ndarray, indices: np.ndarray, num_nodes: int,
    seeds: np.ndarray,
) -> np.ndarray:
    """Level-synchronous BFS order over an undirected CSR (sorted-unique
    frontier per level, per-component seeds in priority order) — native
    counterpart of parallel.partition._bfs_order's expansion."""
    lib = get_lib()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int64)
    order = np.empty(num_nodes, np.int64)
    lib.bfs_order(indptr, indices, num_nodes, seeds, order)
    return order


def densify(
    src: np.ndarray, dst: np.ndarray, w: Optional[np.ndarray], num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    a = np.zeros((num_nodes, num_nodes), np.float32)
    deg = np.zeros(num_nodes, np.int32)
    if w is None:
        wp, keep = None, None
    else:
        wp, keep = _wptr(w)
    lib.densify(src, dst, wp, len(src), num_nodes, a, deg)
    return a, deg
