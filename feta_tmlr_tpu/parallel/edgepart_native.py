"""ctypes binding for the native edge partitioner (native/edgepart.cpp).

`partition_edges` buckets every edge by (dst shard, src shard) before the
multi-chip ring schedules run; the Python builder appends to S*S lists —
O(E) interpreter work that dominates setup at ring-attention scale
(millions of edges on one giant graph). The native two-pass counting
fill streams the edge list twice with no per-edge Python. Used
automatically when the library exists (FETA_NATIVE_EDGEPART=0 forces the
Python path); bucket-internal edge order is input order in both, so the
outputs are bit-identical (tests/test_edgepart_native.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libedgepart.so")

_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _load_lib():
    global _LIB
    if _LIB is None and os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # committed binary built for another architecture — the
            # Python twin in edge_partition.py takes over
            return None
        lib.edgepart_count.argtypes = [
            ctypes.c_int64, _I32P, _I32P, ctypes.c_int32, ctypes.c_int32,
            _I64P]
        lib.edgepart_count.restype = ctypes.c_int64
        lib.edgepart_fill.argtypes = [
            ctypes.c_int64, _I32P, _I32P, _F32P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, _I64P,
            _I32P, _I32P, _F32P, _U8P]
        lib.edgepart_fill.restype = ctypes.c_int32
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return (os.environ.get("FETA_NATIVE_EDGEPART", "1") == "1"
            and _load_lib() is not None)


def partition_edges_native(edge_index: np.ndarray, n_nodes: int,
                           n_shards: int, edge_weight=None):
    """Bucketed static layout, bit-identical to the Python builder.

    Returns (nodes_per_shard, src_local, dst_local, weight, mask) with
    the [S, S, e_max] padded bucket arrays.
    """
    lib = _load_lib()
    assert lib is not None
    vs = -(-n_nodes // n_shards)
    src = np.ascontiguousarray(edge_index[0], np.int32)
    dst = np.ascontiguousarray(edge_index[1], np.int32)
    n_edges = src.shape[0]
    if edge_weight is None:
        edge_weight = np.ones(n_edges, np.float32)
    w = np.ascontiguousarray(edge_weight, np.float32)

    counts = np.zeros(n_shards * n_shards, np.int64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    e_max = int(lib.edgepart_count(
        n_edges, p(src, ctypes.c_int32), p(dst, ctypes.c_int32),
        vs, n_shards, p(counts, ctypes.c_int64)))

    shape = (n_shards, n_shards, e_max)
    src_local = np.zeros(shape, np.int32)
    dst_local = np.zeros(shape, np.int32)
    weight = np.zeros(shape, np.float32)
    mask = np.zeros(shape, np.uint8)
    cursors = np.zeros(n_shards * n_shards, np.int64)
    lib.edgepart_fill(
        n_edges, p(src, ctypes.c_int32), p(dst, ctypes.c_int32),
        p(w, ctypes.c_float), vs, n_shards, e_max,
        p(cursors, ctypes.c_int64),
        p(src_local, ctypes.c_int32), p(dst_local, ctypes.c_int32),
        p(weight, ctypes.c_float), p(mask, ctypes.c_uint8))
    return vs, src_local, dst_local, weight, mask.astype(bool)
