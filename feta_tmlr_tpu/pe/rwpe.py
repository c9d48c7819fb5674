"""Random-walk positional encoding (LSPE tier).

Rebuild of `init_positional_encoding` with `rand_walk`
(/root/reference/LSPE/data/molecules.py:173-198): the k-step random-walk
landing probabilities diag((D^-1 A)^k), k = 1..dim, stacked per node.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from feta_tmlr_tpu.data.batch import Graph


def rwpe(graph: Graph, dim: int) -> np.ndarray:
    n = graph.num_nodes
    row, col = graph.edge_index[0], graph.edge_index[1]
    a = sp.coo_matrix(
        (np.ones(len(row)), (row, col)), shape=(n, n)).tocsr()
    deg = np.asarray(a.sum(axis=1)).ravel()
    dinv = np.zeros_like(deg)
    dinv[deg > 0] = 1.0 / deg[deg > 0]
    rw = sp.diags(dinv) @ a
    out = np.zeros((n, dim), dtype=np.float32)
    m = rw
    out[:, 0] = m.diagonal()
    for k in range(1, dim):
        m = m @ rw
        out[:, k] = m.diagonal()
    return out
