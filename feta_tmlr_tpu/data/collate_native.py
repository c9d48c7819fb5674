"""ctypes binding for the native dense collator (native/collate.cpp).

One C call fills every padded dense tensor of a GraphBatch straight from
per-graph input pointers (no host-side concatenation) — the host-side
data-loader step. OPT-IN via FETA_NATIVE_COLLATE=1: honest A/B on this
4-core host (B=128 ZINC / B=32 SBM-128, 30-iter means) measured the
numpy fancy-indexing path already at memory bandwidth — 3.1 vs 2.9 ms
(native ~7% faster) and 1.5 vs 2.7 ms (native slower; large contiguous
block copies favor numpy) — so the default stays numpy. An OpenMP
parallel-for made it WORSE (11.6 ms: GOMP spin-wait fights the JAX/XLA
host thread pools). The binding is kept as the native data-loader
component + for hosts where the Python loop actually dominates; the
numpy path is the golden reference, asserted bit-identical in
tests/test_collate_native.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libcollate.so")

_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_PPF = ctypes.POINTER(ctypes.c_void_p)


def _load_lib():
    global _LIB
    if _LIB is None and os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # committed binary built for another architecture —
            # the Python twin takes over
            return None
        lib.collate_dense.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I64P,
            _PPF, _PPF, _PPF, _PPF, _PPF, _PPF, _PPF,
            _F32P, _U8P, _F32P, _F32P, _F32P, _F32P, _I32P,
        ]
        lib.collate_dense.restype = ctypes.c_int32
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return (os.environ.get("FETA_NATIVE_COLLATE", "0") == "1"
            and _load_lib() is not None)


def _out_ptr(arr, ctype):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctype))
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _ptr_table(ptrs):
    """C array of per-graph data pointers from raw ints (None -> null)."""
    if ptrs is None:
        return ctypes.cast(None, _PPF)
    return ctypes.cast((ctypes.c_void_p * len(ptrs))(*ptrs), _PPF)


_PTR_FIELDS = ("x", "edge_index", "pe", "lap_pe", "degree", "edge_type")


def _graph_ptrs(g):
    """(n, e, ptr-dict) with dtype conversion + `.ctypes.data` resolution
    done ONCE per graph — numpy's ctypes accessor costs ~20us per array,
    which dominates at B=128 x 7 arrays without this cache. The cache
    entry HOLDS the arrays and validates identity with `is` (an id()-based
    key could false-hit after CPython reuses a freed object's address and
    hand the C side dangling pointers)."""
    cached = getattr(g, "_native_ptr_cache", None)
    if cached is not None and all(
            a is getattr(g, f) for f, a in zip(_PTR_FIELDS, cached[0])):
        return cached[1]

    def conv(attr, dt):
        a = getattr(g, attr)
        if a is None:
            return None
        a = np.asarray(a)
        if a.dtype != dt or not a.flags.c_contiguous:
            a = np.ascontiguousarray(a, dt)
            setattr(g, attr, a)         # keep the converted array alive
        return a

    x = conv("x", np.float32)
    ei = conv("edge_index", np.int32)
    pe = conv("pe", np.float32)
    lap = conv("lap_pe", np.float32)
    deg = conv("degree", np.float32)
    et = conv("edge_type", np.int32)
    row_bytes = ei.strides[0]
    entry = {
        "n": int(x.shape[0]), "e": int(ei.shape[1]),
        "f": int(x.shape[-1]),
        "p": int(lap.shape[-1]) if lap is not None else 0,
        "x": x.ctypes.data,
        "src": ei.ctypes.data,
        "dst": ei.ctypes.data + row_bytes,
        "pe": pe.ctypes.data if pe is not None else None,
        "lap": lap.ctypes.data if lap is not None else None,
        "deg": deg.ctypes.data if deg is not None else None,
        "et": et.ctypes.data if et is not None else None,
    }
    # hold the (post-conversion) arrays: keeps their buffers alive and
    # makes the `is` identity check sound
    g._native_ptr_cache = (
        tuple(getattr(g, f) for f in _PTR_FIELDS), entry)
    return entry


def collate_dense_native(graphs: Sequence, n: int, dtype=np.float32):
    """Fill (x, node_mask, adj, pe, lap_pe, degree, edge_type) natively.

    Returns the tuple of arrays (entries None when the attribute is
    absent), or None when this batch isn't supported by the native path
    (caller falls back to numpy).
    """
    lib = _load_lib()
    if lib is None or dtype != np.float32:
        return None
    g0 = graphs[0]
    if np.issubdtype(np.asarray(g0.x).dtype, np.integer):
        return None                     # categorical-x tiers -> numpy path
    bsz = len(graphs)
    f = int(np.asarray(g0.x).shape[-1])

    use_pe = g0.pe is not None
    use_lap = g0.lap_pe is not None
    use_deg = g0.degree is not None
    use_et = g0.edge_type is not None

    entries = [_graph_ptrs(g) for g in graphs]
    p = entries[0]["p"] if use_lap else 0
    if any(e["f"] != f for e in entries):
        return None
    if use_lap and any(e["p"] != p for e in entries):
        return None                     # ragged PE dims -> numpy path
    if use_pe and any(e["pe"] is None for e in entries):
        return None
    n_nodes = np.fromiter((e["n"] for e in entries), np.int32, bsz)
    n_edges = np.fromiter((e["e"] for e in entries), np.int64, bsz)
    xs = [e["x"] for e in entries]
    srcs = [e["src"] for e in entries]
    dsts = [e["dst"] for e in entries]
    pes = [e["pe"] for e in entries] if use_pe else None
    laps = [e["lap"] for e in entries] if use_lap else None
    degs = [e["deg"] for e in entries] if use_deg else None
    ets = [e["et"] for e in entries] if use_et else None

    x = np.zeros((bsz, n, f), np.float32)
    mask = np.zeros((bsz, n), np.uint8)
    adj = np.zeros((bsz, n, n), np.float32)
    pe = np.zeros((bsz, n, n), np.float32) if use_pe else None
    lap = np.zeros((bsz, n, p), np.float32) if use_lap else None
    deg = np.zeros((bsz, n), np.float32) if use_deg else None
    et = np.zeros((bsz, n, n), np.int32) if use_et else None

    bad = lib.collate_dense(
        bsz, n, f, p,
        n_nodes.ctypes.data_as(_I32P), n_edges.ctypes.data_as(_I64P),
        _ptr_table(xs), _ptr_table(srcs), _ptr_table(dsts),
        _ptr_table(pes), _ptr_table(laps), _ptr_table(degs),
        _ptr_table(ets),
        _out_ptr(x, ctypes.c_float), _out_ptr(mask, ctypes.c_uint8),
        _out_ptr(adj, ctypes.c_float), _out_ptr(pe, ctypes.c_float),
        _out_ptr(lap, ctypes.c_float), _out_ptr(deg, ctypes.c_float),
        _out_ptr(et, ctypes.c_int32))
    if bad:
        # match the numpy path's loud failure on malformed edge indices
        raise IndexError(
            f"{bad} edge endpoint(s) out of range for their graph's node "
            "count (corrupt edge_index)")
    return x, mask.astype(bool), adj, pe, lap, deg, et
