"""Laplacian eigendecomposition PE for the SAN/LPE tier.

Rebuild of `laplace_decomp` (/root/reference/LPE/data/molecules.py:118-155):
sym-normalized Laplacian with degree clip(1), dense eigh, keep up to
max_freqs frequencies, row-normalize eigenvectors (p=2 over the frequency
axis), NaN-pad when the graph has fewer nodes than max_freqs; eigenvalues
abs-sorted and NaN-padded.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from feta_tmlr_tpu.data.batch import Graph


def laplace_decomp(graph: Graph, max_freqs: int) -> None:
    n = graph.num_nodes
    a = np.zeros((n, n))
    if graph.num_edges:
        a[graph.edge_index[0], graph.edge_index[1]] = 1.0
    deg = a.sum(1)
    dis = np.clip(deg, 1.0, None) ** -0.5
    lap = np.eye(n) - dis[:, None] * a * dis[None, :]
    eigvals, eigvecs = np.linalg.eigh(lap)
    eigvals = eigvals[:max_freqs]
    eigvecs = eigvecs[:, :max_freqs]
    norms = np.linalg.norm(eigvecs, axis=1, keepdims=True)
    eigvecs = eigvecs / np.maximum(norms, 1e-12)
    if n < max_freqs:
        eigvecs = np.pad(eigvecs, ((0, 0), (0, max_freqs - n)),
                         constant_values=np.nan)
    vals = np.sort(np.abs(np.real(eigvals)))
    if n < max_freqs:
        vals = np.pad(vals, (0, max_freqs - n), constant_values=np.nan)
    graph.eigvecs = eigvecs.astype(np.float32)
    graph.eigvals = vals.astype(np.float32)


def apply_laplace_decomp(graphs: Sequence[Graph], max_freqs: int):
    for g in graphs:
        laplace_decomp(g, max_freqs)
    return graphs
