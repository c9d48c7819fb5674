"""Adapters from foreign graph containers to this framework's `Graph`.

The reference's `experiments/data_utils.py:16-33` converts PyG datasets
to its GCKN `S2VGraph` container (adjacency lists + one-hot node tags +
degree stats). The equivalent here is duck-typed — anything exposing
PyG `Data`-style attributes (`x`, `edge_index`, optional `y` /
`edge_attr` / `num_nodes`, torch tensors or arrays) converts without
importing torch_geometric, so real PyG datasets work where installed
and plain namespaces work everywhere (tests, custom loaders).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from feta_tmlr_tpu.data.batch import Graph


def _to_numpy(t):
    if t is None:
        return None
    if hasattr(t, "detach"):                       # torch tensor
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def from_pyg(data, n_tags: Optional[int] = None) -> Graph:
    """One PyG-style `Data` object -> `Graph`.

    With `n_tags`, integer node labels in `x` become one-hot features —
    the reference's `F.one_hot(g.x.view(-1).long(), n_tags)` path
    (data_utils.py:26); otherwise `x` passes through as float features.
    """
    edge_index = _to_numpy(data.edge_index).astype(np.int64)
    x = _to_numpy(data.x)
    if n_tags is not None:
        tags = x.reshape(-1).astype(np.int64)
        x = np.eye(n_tags, dtype=np.float32)[tags]
    else:
        x = x.astype(np.float32)
    y = getattr(data, "y", None)
    if y is not None:
        y = _to_numpy(y)
        y = y.item() if y.size == 1 else y
    edge_attr = _to_numpy(getattr(data, "edge_attr", None))
    return Graph(x=x, edge_index=edge_index, y=y, edge_attr=edge_attr)


def convert_dataset(dataset: Optional[Sequence],
                    n_tags: Optional[int] = None):
    """PyG-style dataset -> list of `Graph` (+ per-dataset degree stats).

    Mirrors the reference's `convert_dataset` (data_utils.py:16-33)
    including its None passthrough; `max_neighbor` / `mean_neighbor`
    (the reference's integer-mean quirk: (sum(deg) + n - 1) // n) are
    returned alongside since `Graph` keeps no loader metadata.
    """
    if dataset is None:
        return None
    graphs, stats = [], []
    for data in dataset:
        g = from_pyg(data, n_tags=n_tags)
        deg = np.bincount(g.edge_index[0],
                          minlength=g.x.shape[0]).astype(np.int64)
        stats.append({
            "max_neighbor": int(deg.max()) if deg.size else 0,
            "mean_neighbor": int((deg.sum() + deg.size - 1) // deg.size)
            if deg.size else 0,
        })
        graphs.append(g)
    return graphs, stats
