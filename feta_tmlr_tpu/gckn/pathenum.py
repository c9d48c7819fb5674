"""Path enumeration: ctypes binding to the C++ DFS + pure-python twin.

Native equivalent of the reference's Cython `get_paths`
(/root/reference/gckn/graphs/graphs_fast.pyx:131-165). The C++ library
(native/pathenum.cpp) is built by `make -C native`; the pure-python twin is
the golden reference for tests and the fallback when the .so is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libpathenum.so")


def _load_lib():
    global _LIB
    if _LIB is None and os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # committed binary built for another architecture —
            # the Python twin takes over
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        for count_name, fill_name in (("count_paths", "fill_paths"),
                                      ("count_walks", "fill_walks")):
            getattr(lib, count_name).argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64)]
            getattr(lib, count_name).restype = ctypes.c_int
            getattr(lib, fill_name).argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(i32p)]
            getattr(lib, fill_name).restype = ctypes.c_int
        _LIB = lib
    return _LIB


def _to_csr(edge_index: np.ndarray, n_nodes: int
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Sorted CSR adjacency (neighbors ascending, deterministic DFS order)."""
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int32)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return indptr, dst.astype(np.int32)


def enumerate_paths(edge_index: np.ndarray, n_nodes: int, k: int
                    ) -> Tuple[List[np.ndarray], np.ndarray]:
    """All simple paths with 1..k nodes from every start node.

    Returns:
      paths: list of k arrays; paths[s-1] has shape [n_paths_s, s], rows
        grouped by start node (ascending), DFS order within a node.
      counts: [k, n_nodes] int64, counts[s-1, u] = #size-s paths from u.
    """
    lib = _load_lib()
    if lib is None:
        return enumerate_paths_py(edge_index, n_nodes, k)
    indptr, indices = _to_csr(edge_index, n_nodes)
    counts = np.zeros((k, n_nodes), dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.count_paths(
        indptr.ctypes.data_as(i32p), indices.ctypes.data_as(i32p),
        n_nodes, k, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    paths = [np.empty((int(counts[s - 1].sum()), s), dtype=np.int32)
             for s in range(1, k + 1)]
    ptrs = (i32p * k)(*[p.ctypes.data_as(i32p) for p in paths])
    lib.fill_paths(
        indptr.ctypes.data_as(i32p), indices.ctypes.data_as(i32p),
        n_nodes, k, ptrs)
    return paths, counts


def enumerate_walks(edge_index: np.ndarray, n_nodes: int, k: int
                    ) -> Tuple[List[np.ndarray], np.ndarray]:
    """All walks with 1..k nodes (revisits allowed, no immediate
    backtracking — graphs_fast.pyx:110-129 `all_walks`)."""
    lib = _load_lib()
    if lib is None:
        return enumerate_walks_py(edge_index, n_nodes, k)
    indptr, indices = _to_csr(edge_index, n_nodes)
    counts = np.zeros((k, n_nodes), dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.count_walks(
        indptr.ctypes.data_as(i32p), indices.ctypes.data_as(i32p),
        n_nodes, k, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    walks = [np.empty((int(counts[s - 1].sum()), s), dtype=np.int32)
             for s in range(1, k + 1)]
    ptrs = (i32p * k)(*[w.ctypes.data_as(i32p) for w in walks])
    lib.fill_walks(
        indptr.ctypes.data_as(i32p), indices.ctypes.data_as(i32p),
        n_nodes, k, ptrs)
    return walks, counts


def enumerate_walks_py(edge_index: np.ndarray, n_nodes: int, k: int
                       ) -> Tuple[List[np.ndarray], np.ndarray]:
    """Pure-python golden twin of `enumerate_walks`."""
    indptr, indices = _to_csr(edge_index, n_nodes)
    adj = [indices[indptr[u]:indptr[u + 1]].tolist()
           for u in range(n_nodes)]
    out: List[List[List[int]]] = [[] for _ in range(k)]
    counts = np.zeros((k, n_nodes), dtype=np.int64)

    def dfs(path, start):
        out[len(path) - 1].append(list(path))
        counts[len(path) - 1, start] += 1
        if len(path) >= k:
            return
        prev = path[-2] if len(path) >= 2 else -1
        for v in adj[path[-1]]:
            if v == prev:
                continue
            path.append(v)
            dfs(path, start)
            path.pop()

    for u in range(n_nodes):
        dfs([u], u)
    walks = [np.asarray(out[s], dtype=np.int32).reshape(-1, s + 1)
             for s in range(k)]
    return walks, counts


def enumerate_paths_py(edge_index: np.ndarray, n_nodes: int, k: int
                       ) -> Tuple[List[np.ndarray], np.ndarray]:
    """Pure-python golden twin of `enumerate_paths` (identical ordering)."""
    indptr, indices = _to_csr(edge_index, n_nodes)
    adj = [indices[indptr[u]:indptr[u + 1]].tolist()
           for u in range(n_nodes)]
    out: List[List[List[int]]] = [[] for _ in range(k)]
    counts = np.zeros((k, n_nodes), dtype=np.int64)

    def dfs(path, visited, start):
        out[len(path) - 1].append(list(path))
        counts[len(path) - 1, start] += 1
        if len(path) >= k:
            return
        for v in adj[path[-1]]:
            if v not in visited:
                visited.add(v)
                path.append(v)
                dfs(path, visited, start)
                path.pop()
                visited.discard(v)

    for u in range(n_nodes):
        dfs([u], {u}, u)
    paths = [np.asarray(out[s], dtype=np.int32).reshape(-1, s + 1)
             for s in range(k)]
    return paths, counts
