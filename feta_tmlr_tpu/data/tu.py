"""TU-format graph-dataset parser and CV fold splits.

Rebuild of /root/reference/gckn/data_io.py:27-160 (load_graphdata) and
gckn/data.py:167-180 (separate_data): parses the standard TU text layout
(1-indexed `_A.txt` edge list, `_graph_indicator.txt` node->graph map,
`_graph_labels.txt`, optional `_node_labels.txt`/`_node_attributes.txt`)
into host Graph objects. Reference semantics kept:
  - node labels shifted to start at 0 and one-hot encoded as features
    (discrete/"tagged" datasets, transformer/data.py:49-55);
  - graph labels remapped to ints by first-seen order (data_io.py:80-89);
  - stratified 10-fold splits, replicating the
    `dataset/fold-idx/{name}/10fold_idx/{train,test}_idx-{fold}.txt` layout
    when present, else sklearn StratifiedKFold(shuffle, seed).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

import numpy as np

from feta_tmlr_tpu.data.batch import Graph


def load_tu_dataset(
    name: str,
    datadir: str = "dataset",
    one_hot_labels: bool = True,
    degree_feature: bool = True,
    native: Optional[bool] = None,
) -> Tuple[List[Graph], int]:
    """Parse a TU dataset directory. Returns (graphs, n_node_tags).

    `native` selects the C tokenizer (native/tuparse.cpp) for the text
    files: None = auto (use it if built), True = require it, False =
    pure-Python parsing. Both paths produce bit-identical graphs
    (tests/test_collate_native.py).
    """
    from feta_tmlr_tpu.data import tu_native
    if native is None:
        native = tu_native.available()
    elif native and not tu_native.available():
        raise RuntimeError("native TU parser requested but "
                           "native/libtuparse.so is not built")
    prefix = os.path.join(datadir, name, name)

    if native:
        node2graph = tu_native.read_ints(prefix + "_graph_indicator.txt")
        raw_labels = tu_native.read_ints(
            prefix + "_graph_labels.txt").tolist()
    else:
        with open(prefix + "_graph_indicator.txt") as f:
            node2graph = np.array([int(l) for l in f if l.strip()])
        with open(prefix + "_graph_labels.txt") as f:
            raw_labels = [int(l) for l in f if l.strip()]
    # remap labels by first-seen order (data_io.py:80-89)
    label_map = {}
    for v in raw_labels:
        if v not in label_map:
            label_map[v] = len(label_map)
    graph_labels = np.array([label_map[v] for v in raw_labels])
    n_graphs = len(graph_labels)

    node_labels = None
    n_tags = 0
    path = prefix + "_node_labels.txt"
    if os.path.isfile(path):
        if native:
            node_labels = tu_native.read_ints(path)
        else:
            with open(path) as f:
                node_labels = np.array([int(l) for l in f if l.strip()])
        node_labels = node_labels - node_labels.min()
        n_tags = int(node_labels.max()) + 1

    node_attrs = None
    path = prefix + "_node_attributes.txt"
    if os.path.isfile(path):
        if native:
            node_attrs = tu_native.read_float_matrix(path)
        else:
            rows = []
            with open(path) as f:
                for line in f:
                    vals = [float(a)
                            for a in re.split(r"[,\s]+", line.strip())
                            if a]
                    if vals:
                        rows.append(vals)
            node_attrs = np.asarray(rows, dtype=np.float32)

    if native:
        flat = tu_native.read_ints(prefix + "_A.txt")
        assert flat.size % 2 == 0, "odd token count in _A.txt"
        edges = flat.reshape(-1, 2).T  # [2, E], 1-indexed global
    else:
        pairs = []
        with open(prefix + "_A.txt") as f:
            for line in f:
                if not line.strip():
                    continue
                a, b = line.replace(",", " ").split()[:2]
                pairs.append((int(a), int(b)))
        edges = np.asarray(pairs, dtype=np.int64).T  # [2, E], 1-indexed

    # group nodes per graph
    graphs: List[Graph] = []
    node_offsets = np.zeros(n_graphs + 1, dtype=np.int64)
    counts = np.bincount(node2graph, minlength=n_graphs + 1)
    node_offsets[1:] = np.cumsum(counts[1:])
    # edge membership by source node's graph (data_io.py:110-119)
    edge_graph = node2graph[edges[0] - 1]
    order = np.argsort(edge_graph, kind="stable")
    edges_sorted = edges[:, order]
    edge_graph_sorted = edge_graph[order]
    bounds = np.searchsorted(edge_graph_sorted, np.arange(1, n_graphs + 2))

    for gi in range(n_graphs):
        lo_node = node_offsets[gi]
        hi_node = node_offsets[gi + 1]
        m = hi_node - lo_node
        # edges of graph id gi+1 span [searchsorted(id), searchsorted(id+1))
        e_lo, e_hi = bounds[gi], bounds[gi + 1]
        e = edges_sorted[:, e_lo:e_hi] - 1 - lo_node  # to local 0-index
        if one_hot_labels and node_labels is not None:
            x = np.eye(n_tags, dtype=np.float32)[
                node_labels[lo_node:hi_node]]
        elif node_attrs is not None:
            x = node_attrs[lo_node:hi_node]
        else:
            x = np.ones((m, 1), dtype=np.float32)
        if node_attrs is not None and one_hot_labels and node_labels is not None:
            x = np.concatenate([x, node_attrs[lo_node:hi_node]], axis=-1)
        g = Graph(x=x, edge_index=e.astype(np.int32),
                  y=np.int64(graph_labels[gi]))
        if degree_feature:
            g.compute_degree_feature()
        graphs.append(g)
    return graphs, n_tags


def load_fold_indices(
    graphs: List[Graph],
    fold_idx: int,
    name: Optional[str] = None,
    fold_dir: Optional[str] = None,
    n_folds: int = 10,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(train_idx, test_idx) for a CV fold (1-based fold_idx as in README).

    Prefers the reference's on-disk `10fold_idx/{train,test}_idx-{fold}.txt`
    files; otherwise a stratified split matching gckn/data.py:167-180.
    """
    if fold_dir and name:
        base = os.path.join(fold_dir, name, f"{n_folds}fold_idx")
        tr = os.path.join(base, f"train_idx-{fold_idx}.txt")
        te = os.path.join(base, f"test_idx-{fold_idx}.txt")
        if os.path.isfile(tr) and os.path.isfile(te):
            return (np.loadtxt(tr, dtype=np.int64),
                    np.loadtxt(te, dtype=np.int64))
    from sklearn.model_selection import StratifiedKFold
    labels = np.array([int(g.y) for g in graphs])
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)
    splits = list(skf.split(np.zeros(len(labels)), labels))
    return splits[fold_idx - 1]


def make_splits(n: int, n_folds: int = 10, seed: int = 0,
                test_ratio: float = 0.1):
    """Nested CV split generator (gckn/utils.py:164-191): yields
    (train_idx, val_idx, test_idx) per outer fold with an inner val split."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    fold_size = n // n_folds
    for f in range(n_folds):
        test = perm[f * fold_size:(f + 1) * fold_size]
        rest = np.concatenate([perm[: f * fold_size],
                               perm[(f + 1) * fold_size:]])
        n_val = max(int(len(rest) * test_ratio), 1)
        val, train = rest[:n_val], rest[n_val:]
        yield train, val, test
