"""Synthetic graph generators for tests and benchmarks.

The build environment has no network egress and no bundled datasets, so tests
and kernel benchmarks run on synthetic graphs shaped like the reference's
workloads (molecule-sized Erdős–Rényi graphs for ZINC/TU, larger denser blocks
for SBM PATTERN/CLUSTER).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from feta_tmlr_tpu.data.batch import Graph


def random_connected_graph(
    rng: np.random.Generator,
    n_nodes: int,
    n_features: int,
    edge_prob: float = 0.2,
    node_classes: Optional[int] = None,
) -> Graph:
    """Random undirected graph: a spanning chain plus ER edges (connected)."""
    upper = np.triu(rng.random((n_nodes, n_nodes)) < edge_prob, k=1)
    # guarantee connectivity with a chain
    for i in range(n_nodes - 1):
        upper[i, i + 1] = True
    rows, cols = np.nonzero(upper)
    src = np.concatenate([rows, cols])
    dst = np.concatenate([cols, rows])
    edge_index = np.stack([src, dst]).astype(np.int32)
    if node_classes is not None:
        labels = rng.integers(0, node_classes, size=n_nodes)
        x = np.eye(n_features, dtype=np.float32)[labels % n_features]
    else:
        x = rng.standard_normal((n_nodes, n_features)).astype(np.float32)
    return Graph(x=x, edge_index=edge_index)


def random_graph_dataset(
    seed: int = 0,
    n_graphs: int = 32,
    min_nodes: int = 6,
    max_nodes: int = 24,
    n_features: int = 7,
    n_classes: int = 2,
    edge_prob: float = 0.2,
    task: str = "classification",
    node_level: bool = False,
) -> List[Graph]:
    """Graphs with a *learnable* label derived from graph statistics.

    Labels depend on mean degree so that a model can actually fit them
    (used by the overfit tests and the end-to-end training smoke tests).
    """
    rng = np.random.default_rng(seed)
    graphs = []
    scores = []
    for _ in range(n_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        g = random_connected_graph(rng, n, n_features, edge_prob)
        mean_deg = g.num_edges / n
        scores.append(mean_deg + 0.3 * float(g.x.mean()))
        if node_level:
            deg = np.zeros(n)
            np.add.at(deg, g.edge_index[0], 1.0)
            g.y = (deg > np.median(deg)).astype(np.int32)
        elif task != "classification":
            g.y = np.float32(mean_deg + 0.1 * g.x.sum())
        g.compute_degree_feature()
        graphs.append(g)
    if not node_level and task == "classification":
        # balanced labels: median split of a graph statistic so both
        # classes are learnable AND populated
        med = float(np.median(scores))
        for g, s in zip(graphs, scores):
            g.y = np.int64(s > med)
    return graphs


def zinc_like_dataset(seed: int = 0, n_graphs: int = 128) -> List[Graph]:
    """Molecule-shaped graphs (ZINC: ~23 nodes avg, 28 atom types one-hot)."""
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(9, 38))
        g = random_connected_graph(rng, n, 28, edge_prob=2.0 / max(n - 1, 1),
                                   node_classes=28)
        g.y = np.float32(rng.standard_normal())
        g.compute_degree_feature()
        graphs.append(g)
    return graphs


def zinc_categorical_dataset(seed: int = 0, n_graphs: int = 32,
                             num_atom_type: int = 28,
                             num_bond_type: int = 4) -> List[Graph]:
    """ZINC-format graphs for the SAN/LSPE tier: int atom ids as node
    features, int bond types as edge types, float regression target."""
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(9, 30))
        g = random_connected_graph(rng, n, 1, edge_prob=2.0 / max(n - 1, 1))
        g.x = rng.integers(0, num_atom_type, size=(n, 1)).astype(np.int32)
        # symmetric bond types
        ne = g.num_edges
        et = np.zeros(ne, dtype=np.int32)
        seen = {}
        for i in range(ne):
            key = tuple(sorted((int(g.edge_index[0, i]),
                                int(g.edge_index[1, i]))))
            if key not in seen:
                seen[key] = int(rng.integers(1, num_bond_type))
            et[i] = seen[key]
        g.edge_type = et
        g.y = np.float32(rng.standard_normal())
        g.compute_degree_feature()
        graphs.append(g)
    return graphs


def sbm_like_dataset(seed: int = 0, n_graphs: int = 8, n_nodes: int = 128,
                     n_classes: int = 2) -> List[Graph]:
    """PATTERN/CLUSTER-shaped graphs: dense-ish blocks, per-node labels."""
    rng = np.random.default_rng(seed)
    graphs = []
    for gi in range(n_graphs):
        # vary sizes slightly (real SBM benchmarks do; also keeps the
        # node-label inference in collate_graphs unambiguous)
        n_g = max(4, n_nodes - int(rng.integers(0, max(n_nodes // 8, 2))))
        labels = rng.integers(0, n_classes, size=n_g)
        p_in, p_out = 0.2, 0.05
        probs = np.where(labels[:, None] == labels[None, :], p_in, p_out)
        upper = np.triu(rng.random((n_g, n_g)) < probs, k=1)
        rows, cols = np.nonzero(upper)
        edge_index = np.stack(
            [np.concatenate([rows, cols]), np.concatenate([cols, rows])]
        ).astype(np.int32)
        x = np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=n_g)]
        g = Graph(x=x, edge_index=edge_index, y=labels.astype(np.int32))
        g.compute_degree_feature()
        graphs.append(g)
    return graphs
