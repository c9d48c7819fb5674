"""Format-faithful OGB graph-property-prediction loader (raw CSV layout).

The reference consumes OGB via ``DglGraphPropPredDataset`` /
``PygGraphPropPredDataset`` (/root/reference/LSPE/data/ogb_mol.py:7,190-216,
/root/reference/transformer/data.py:6), which download and read OGB's
canonical on-disk *raw CSV* layout:

  <root>/<ogbg_molhiv>/raw/edge.csv.gz            rows "src,dst" — node ids
                                                  LOCAL to each graph,
                                                  concatenated over graphs
                       num-node-list.csv.gz       one row per graph
                       num-edge-list.csv.gz       one row per graph
                       node-feat.csv.gz           [N_total, 9] int atom feats
                       edge-feat.csv.gz           [E_total, 3] int bond feats
                       graph-label.csv.gz         [G, n_tasks]; empty cells =
                                                  unlabeled (molpcba)
  <root>/<ogbg_molhiv>/split/<scheme>/{train,valid,test}.csv.gz

This module reads that layout directly (no ogb package needed — the image
has no egress, but a user can drop the extracted dataset dir in place).
Plain ``.csv`` files are accepted alongside ``.csv.gz``.

Output convention matches the synthetic generators the runners already use:
``x`` is the full [n, 9] int32 atom-feature matrix (transformer tier embeds
all 9 columns via AtomEncoder); ``edge_type`` is the first bond-feature
column (bond type) offset by +1 so 0 remains "no edge" in dense maps, and
``edge_attr`` carries the full [e, 3] bond features.
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from feta_tmlr_tpu.data.batch import Graph


def _open(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rt")
    return open(path, "rt")


def _exists(path: str) -> bool:
    return os.path.exists(path) or os.path.exists(path + ".gz")


def _read_csv(path: str, dtype=np.int64) -> np.ndarray:
    """Small fast CSV reader; empty cells -> NaN (forces float output)."""
    rows = []
    has_nan = False
    with _open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            cells = line.split(",")
            if any(c == "" or c == "nan" for c in cells):
                has_nan = True
                rows.append([float(c) if c not in ("", "nan")
                             else np.nan for c in cells])
            else:
                rows.append([float(c) for c in cells])
    arr = np.asarray(rows, dtype=np.float64)
    if not has_nan and np.issubdtype(dtype, np.integer):
        return arr.astype(dtype)
    return arr.astype(np.float32)


def dataset_dir_name(name: str) -> str:
    """'ogbg-molhiv' -> 'ogbg_molhiv' (OGB's master.csv convention)."""
    return name.replace("-", "_").lower()


def load_ogb_graphs(root: str, name: str,
                    max_graphs: Optional[int] = None) -> List[Graph]:
    """Read all graphs of an OGB dataset from its raw CSV directory."""
    raw = os.path.join(root, dataset_dir_name(name), "raw")
    if not os.path.isdir(raw):
        raise FileNotFoundError(raw)
    num_nodes = _read_csv(os.path.join(raw, "num-node-list.csv")).reshape(-1)
    num_edges = _read_csv(os.path.join(raw, "num-edge-list.csv")).reshape(-1)
    edges = _read_csv(os.path.join(raw, "edge.csv"))
    node_feat = _read_csv(os.path.join(raw, "node-feat.csv"))
    has_efeat = _exists(os.path.join(raw, "edge-feat.csv"))
    edge_feat = (_read_csv(os.path.join(raw, "edge-feat.csv"))
                 if has_efeat else None)
    labels = _read_csv(os.path.join(raw, "graph-label.csv"), dtype=np.float64)
    labels = np.atleast_2d(labels.astype(np.float32))
    if labels.shape[0] == 1 and len(num_nodes) > 1:
        labels = labels.T

    num_nodes = num_nodes.astype(np.int64)
    num_edges = num_edges.astype(np.int64)
    if edges.ndim == 1:
        edges = edges.reshape(-1, 2)
    graphs: List[Graph] = []
    n_off = e_off = 0
    count = len(num_nodes) if max_graphs is None else min(
        len(num_nodes), max_graphs)
    for gi in range(count):
        n, e = int(num_nodes[gi]), int(num_edges[gi])
        ei = edges[e_off: e_off + e].astype(np.int32).T  # [2, e] local ids
        x = node_feat[n_off: n_off + n].astype(np.int32)
        g = Graph(x=x, edge_index=ei,
                  y=(labels[gi, 0] if labels.shape[1] == 1 else labels[gi]))
        if edge_feat is not None:
            ef = edge_feat[e_off: e_off + e].astype(np.int32)
            g.edge_attr = ef
            # bond type (first column) + 1 so 0 stays "no edge" densely
            g.edge_type = (ef[:, 0] + 1).astype(np.int32) if e else \
                np.zeros(0, np.int32)
        g.compute_degree_feature()
        graphs.append(g)
        n_off += n
        e_off += e
    return graphs


def load_ogb_split_idx(root: str, name: str,
                       scheme: str = "scaffold") -> Dict[str, np.ndarray]:
    """{train, valid, test} -> graph indices from split/<scheme>/."""
    split_dir = os.path.join(root, dataset_dir_name(name), "split", scheme)
    if not os.path.isdir(split_dir):
        # some datasets ship a single differently-named scheme; take it
        parent = os.path.join(root, dataset_dir_name(name), "split")
        subs = sorted(os.listdir(parent)) if os.path.isdir(parent) else []
        if not subs:
            raise FileNotFoundError(split_dir)
        split_dir = os.path.join(parent, subs[0])
    out = {}
    for split in ("train", "valid", "test"):
        out[split] = _read_csv(
            os.path.join(split_dir, f"{split}.csv")).astype(np.int64).reshape(-1)
    return out


def load_ogb(root: str, name: str, min_nodes: Optional[int] = None,
             max_graphs: Optional[int] = None,
             ) -> Tuple[List[Graph], List[Graph], List[Graph]]:
    """(train, val, test) per the dataset's shipped split.

    ``min_nodes=6`` reproduces the LSPE tier's size filter
    (OGBMOLDGL keeps graphs with ``number_of_nodes() > 5``,
    LSPE/data/ogb_mol.py:21-23); the transformer tier applies no filter.
    ``max_graphs`` truncates the *graph table* (smoke runs); split indices
    beyond it are dropped.
    """
    graphs = load_ogb_graphs(root, name, max_graphs=max_graphs)
    idx = load_ogb_split_idx(root, name)
    out = []
    for split in ("train", "valid", "test"):
        sel = [graphs[i] for i in idx[split] if i < len(graphs)]
        if min_nodes is not None:
            sel = [g for g in sel if g.num_nodes > min_nodes - 1]
        out.append(sel)
    return tuple(out)


def find_ogb_root(datadir: str, name: str) -> Optional[str]:
    """Resolve a root containing <dataset_dir>/raw under datadir."""
    if not datadir:
        return None
    for cand in (datadir, os.path.join(datadir, "ogb"),
                 os.path.join(datadir, "dataset")):
        if os.path.isdir(os.path.join(cand, dataset_dir_name(name), "raw")):
            return cand
    return None


def load_ogb_or_synthetic(datadir: str, name: str, synthetic_fn,
                          min_nodes: Optional[int] = None,
                          max_graphs: Optional[int] = None):
    """(train, val, test, used_real); synthetic_fn() -> list of Graphs
    split 80/10/10 on fallback."""
    root = find_ogb_root(datadir, name)
    if root is not None:
        tr, va, te = load_ogb(root, name, min_nodes=min_nodes,
                              max_graphs=max_graphs)
        print(f"[data] loaded {name} from {root}: "
              f"{len(tr)}/{len(va)}/{len(te)} graphs")
        return tr, va, te, True
    print(f"[warn] no {name} raw CSVs under {datadir!r} - synthetic "
          "OGB-shaped fallback")
    graphs = synthetic_fn()
    n = len(graphs)
    return (graphs[: int(0.8 * n)],
            graphs[int(0.8 * n): int(0.9 * n)],
            graphs[int(0.9 * n):], False)
