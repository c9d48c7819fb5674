"""Host-side positional-encoding precompute.

Rebuild of /root/reference/transformer/position_encoding.py. PEs are
train-time-constant inputs: computed once per graph on the host with
numpy/scipy (eigendecompositions and matrix exponentials don't belong on the
MXU), cached to disk (npz, see pe/cache.py), then fed to the device through
the GraphBatch.

Numerical quirks replicated deliberately (SURVEY.md §7.3.4):
  - LapEncoding eigendecomposes the *unsymmetrized* Laplacian with np.linalg.eig
    and takes the real part (position_encoding.py:136-138);
  - its padding rules for small/disconnected graphs
    (position_encoding.py:139-159);
  - diffusion uses scipy expm of the sparse Laplacian
    (position_encoding.py:65-72).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import expm

from feta_tmlr_tpu.data.batch import Graph
from feta_tmlr_tpu.pe.cache import PECache


def graph_laplacian(
    edge_index: np.ndarray,
    num_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    normalization: Optional[str] = None,
) -> sp.csc_matrix:
    """Sparse graph Laplacian, PyG `get_laplacian` semantics.

    None: L = D - A; 'sym': I - D^-1/2 A D^-1/2 (d^-1/2 = 0 where d = 0,
    diagonal 1 for every node); 'rw': I - D^-1 A.
    """
    if edge_weight is None:
        edge_weight = np.ones(edge_index.shape[1], dtype=np.float64)
    row, col = edge_index[0], edge_index[1]
    keep = row != col  # remove self loops, as get_laplacian does
    row, col, w = row[keep], col[keep], edge_weight[keep]
    a = sp.coo_matrix((w, (row, col)), shape=(num_nodes, num_nodes))
    deg = np.asarray(a.sum(axis=1)).ravel()
    if normalization is None:
        lap = sp.diags(deg) - a
    elif normalization == "sym":
        dis = np.zeros_like(deg)
        nz = deg > 0
        dis[nz] = deg[nz] ** -0.5
        an = sp.diags(dis) @ a @ sp.diags(dis)
        lap = sp.eye(num_nodes) - an
    elif normalization == "rw":
        dinv = np.zeros_like(deg)
        nz = deg > 0
        dinv[nz] = 1.0 / deg[nz]
        lap = sp.eye(num_nodes) - sp.diags(dinv) @ a
    else:
        raise ValueError(f"invalid normalization {normalization!r}")
    return lap.tocsc()


class PositionEncoding:
    """Base: per-graph compute with optional disk cache + zero_diag."""

    def __init__(self, cache: Optional[PECache] = None,
                 zero_diag: bool = False):
        self.cache = cache
        self.zero_diag = zero_diag

    def compute_pe(self, graph: Graph) -> np.ndarray:
        raise NotImplementedError

    def cache_key(self) -> str:
        return type(self).__name__

    def apply_to(self, graphs: Sequence[Graph], split: str = "all"
                 ) -> Sequence[Graph]:
        cached = self.cache.load(self.cache_key(), split) if self.cache else None
        computed: List[np.ndarray] = []
        for i, g in enumerate(graphs):
            pe = cached[i] if cached is not None else self.compute_pe(g)
            if cached is None:
                computed.append(pe)
            if self.zero_diag:
                pe = pe.copy()
                np.fill_diagonal(pe, 0)
            g.pe = pe.astype(np.float32)
        if self.cache and cached is None:
            self.cache.save(self.cache_key(), split, computed)
        return graphs


class DiffusionEncoding(PositionEncoding):
    """expm(-beta * L) (position_encoding.py:55-72)."""

    def __init__(self, beta: float = 1.0, normalization: Optional[str] = None,
                 use_edge_attr: bool = False, cache=None, zero_diag=False):
        super().__init__(cache, zero_diag)
        self.beta = beta
        self.normalization = normalization
        self.use_edge_attr = use_edge_attr

    def cache_key(self):
        return (f"diffusion_{self.beta}_{self.normalization}"
                f"_{self.use_edge_attr}")

    def compute_pe(self, graph: Graph) -> np.ndarray:
        ew = None
        if self.use_edge_attr and graph.edge_attr is not None:
            ew = np.asarray(graph.edge_attr).ravel()
        lap = graph_laplacian(graph.edge_index, graph.num_nodes, ew,
                              self.normalization)
        return np.asarray(expm(-self.beta * lap).todense())


class PStepRWEncoding(PositionEncoding):
    """(I - beta * L)^p (position_encoding.py:75-93)."""

    def __init__(self, p: int = 1, beta: float = 0.5,
                 normalization: Optional[str] = None,
                 use_edge_attr: bool = False, cache=None, zero_diag=False):
        super().__init__(cache, zero_diag)
        self.p = p
        self.beta = beta
        self.normalization = normalization
        self.use_edge_attr = use_edge_attr

    def cache_key(self):
        return (f"pstep_{self.p}_{self.beta}_{self.normalization}"
                f"_{self.use_edge_attr}")

    def compute_pe(self, graph: Graph) -> np.ndarray:
        ew = None
        if self.use_edge_attr and graph.edge_attr is not None:
            ew = np.asarray(graph.edge_attr).ravel()
        lap = graph_laplacian(graph.edge_index, graph.num_nodes, ew,
                              self.normalization)
        base = sp.identity(lap.shape[0], dtype=lap.dtype) - self.beta * lap
        out = base
        for _ in range(self.p - 1):
            out = out.dot(base)
        return np.asarray(out.todense())


class AdjEncoding(PositionEncoding):
    """Dense adjacency as PE kernel (position_encoding.py:96-105)."""

    def __init__(self, normalization: Optional[str] = None, cache=None,
                 zero_diag=False):
        super().__init__(cache, zero_diag)
        self.normalization = normalization

    def compute_pe(self, graph: Graph) -> np.ndarray:
        n = graph.num_nodes
        a = np.zeros((n, n))
        a[graph.edge_index[0], graph.edge_index[1]] = 1.0
        return a


class FullEncoding(PositionEncoding):
    """All-ones kernel (position_encoding.py:107-115)."""

    def compute_pe(self, graph: Graph) -> np.ndarray:
        n = graph.num_nodes
        return np.ones((n, n))


class LapEncoding(PositionEncoding):
    """Laplacian eigenvector absolute PE (position_encoding.py:118-169).

    Deliberately uses np.linalg.eig of the (possibly unsymmetric in floating
    point) Laplacian + real part, and the reference's exact pad rules.
    """

    def __init__(self, dim: int, normalization: Optional[str] = None,
                 use_edge_attr: bool = False):
        super().__init__(None, False)
        self.pos_enc_dim = dim
        self.normalization = normalization
        self.use_edge_attr = use_edge_attr

    def compute_pe(self, graph: Graph) -> np.ndarray:
        ew = None
        if self.use_edge_attr and graph.edge_attr is not None:
            ew = np.asarray(graph.edge_attr).ravel()
        lap = graph_laplacian(graph.edge_index, graph.num_nodes, ew,
                              self.normalization)
        eigval, eigvec = np.linalg.eig(lap.toarray())
        idx = eigval.argsort()
        eigvec = np.real(eigvec[:, idx])
        vec = eigvec[:, 1: self.pos_enc_dim + 1]
        if vec.shape[1] < self.pos_enc_dim:
            pad = np.zeros((vec.shape[0], self.pos_enc_dim))
            pad[:, : vec.shape[1]] = vec
            vec = pad
        return vec.astype(np.float32)

    def apply_to(self, graphs: Sequence[Graph], split: str = "all"):
        for g in graphs:
            g.lap_pe = self.compute_pe(g)
        return graphs


POSENCODINGS = {
    "diffusion": DiffusionEncoding,
    "pstep": PStepRWEncoding,
    "adj": AdjEncoding,
}
