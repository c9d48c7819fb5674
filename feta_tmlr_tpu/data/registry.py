"""Dataset registry: one name-keyed entry point over every loader.

Equivalent of the reference's `LoadData` dispatchers
(/root/reference/LPE/data/data.py:9-33, LSPE/data/data.py:10-31): maps a
dataset name to the right format-faithful loader with the
real-if-present / synthetic-otherwise resolution every CLI uses.

Returns a `DatasetSplits` with (train, val, test) Graph lists plus the
metadata the model tiers need (vocab sizes, class counts, task kind).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from feta_tmlr_tpu.data.batch import Graph

SBM_DATASETS = ("SBM_CLUSTER", "SBM_PATTERN")
TU_DATASETS = ("MUTAG", "NCI1", "PROTEINS", "PTC", "PTC_MR", "DD",
               "ENZYMES", "IMDB-BINARY", "IMDB-MULTI")
OGB_DATASETS = {"MOL-HIV": "ogbg-molhiv", "OGBG-MOLHIV": "ogbg-molhiv",
                "MOLHIV": "ogbg-molhiv",
                "OGBG-MOLPCBA": "ogbg-molpcba", "MOLPCBA": "ogbg-molpcba",
                "OGBG-MOLTOX21": "ogbg-moltox21", "MOLTOX21": "ogbg-moltox21"}


@dataclasses.dataclass
class DatasetSplits:
    name: str
    train: List[Graph]
    val: List[Graph]
    test: List[Graph]
    task: str                       # graph_reg | graph_clf | node_clf |
    #                                 binary_graph
    used_real: bool
    num_atom_type: Optional[int] = None
    num_bond_type: Optional[int] = None
    n_classes: Optional[int] = None
    n_tasks: Optional[int] = None

    @property
    def all_graphs(self):
        return self.train + self.val + self.test


def load_data(name: str, datadir: str = "data", seed: int = 0,
              n_synthetic: int = 96,
              max_graphs_per_split: Optional[int] = None) -> DatasetSplits:
    """LoadData(DATASET_NAME) equivalent (LPE/data/data.py:9-33)."""
    key = name.upper().replace("OGBG_", "OGBG-")

    if key == "ZINC" or key == "ZINC-FULL":
        from feta_tmlr_tpu.data.zinc import (
            NUM_ATOM_TYPE, NUM_BOND_TYPE, load_zinc_or_synthetic)
        tr, va, te, real = load_zinc_or_synthetic(
            datadir, seed=seed, n_synthetic=n_synthetic,
            subset=key == "ZINC",
            max_graphs_per_split=max_graphs_per_split)
        return DatasetSplits(name, tr, va, te, "graph_reg", real,
                             num_atom_type=NUM_ATOM_TYPE,
                             num_bond_type=NUM_BOND_TYPE)

    if key in SBM_DATASETS or key in ("PATTERN", "CLUSTER"):
        from feta_tmlr_tpu.data.sbm import load_sbm_or_synthetic
        sbm_name = key if key.startswith("SBM_") else f"SBM_{key}"
        tr, va, te, real = load_sbm_or_synthetic(
            datadir, sbm_name, seed=seed, n_synthetic=max(n_synthetic, 8),
            max_graphs_per_split=max_graphs_per_split)
        graphs = tr + va + te
        return DatasetSplits(
            name, tr, va, te, "node_clf", real,
            num_atom_type=int(max(int(g.x.max()) for g in graphs)) + 1,
            num_bond_type=2,
            n_classes=int(max(int(g.y.max()) for g in graphs)) + 1)

    if key in OGB_DATASETS:
        from feta_tmlr_tpu.data.ogb_raw import load_ogb_or_synthetic
        ogb_name = OGB_DATASETS[key]
        n_tasks = {"ogbg-molhiv": 1, "ogbg-moltox21": 12,
                   "ogbg-molpcba": 128}[ogb_name]

        def synth():
            from feta_tmlr_tpu.data.synthetic import random_connected_graph
            rng = np.random.default_rng(seed)
            out = []
            for i in range(n_synthetic):
                n = int(rng.integers(8, 26))
                g = random_connected_graph(rng, n, 1, edge_prob=0.15)
                g.x = rng.integers(0, 119, (n, 9)).astype(np.int32)
                g.edge_type = rng.integers(1, 5, g.num_edges) \
                    .astype(np.int32)
                if n_tasks == 1:
                    g.y = np.float32(i % 5 == 2)
                else:
                    y = rng.integers(0, 2, n_tasks).astype(np.float32)
                    y[rng.random(n_tasks) < 0.25] = np.nan
                    g.y = y
                g.compute_degree_feature()
                out.append(g)
            return out

        tr, va, te, real = load_ogb_or_synthetic(
            datadir, ogb_name, synth, min_nodes=6,
            max_graphs=max_graphs_per_split)
        return DatasetSplits(name, tr, va, te, "binary_graph", real,
                             num_atom_type=119, num_bond_type=5,
                             n_tasks=n_tasks)

    if key in TU_DATASETS:
        import os
        from feta_tmlr_tpu.data.tu import load_tu_dataset, make_splits
        from feta_tmlr_tpu.data.synthetic import random_graph_dataset
        if os.path.isdir(os.path.join(datadir, key)):
            graphs, _ = load_tu_dataset(key, datadir)
            real = True
        else:
            print(f"[warn] TU dataset {key} not under {datadir!r} - "
                  "synthetic fallback")
            graphs = random_graph_dataset(seed=seed,
                                          n_graphs=n_synthetic,
                                          n_features=7)
            real = False
        tr_idx, va_idx, te_idx = next(
            iter(make_splits(len(graphs), n_folds=10, seed=seed)))
        tr = [graphs[i] for i in tr_idx]
        va = [graphs[i] for i in va_idx]
        te = [graphs[i] for i in te_idx]
        return DatasetSplits(
            name, tr, va, te, "graph_clf", real,
            n_classes=len({int(g.y) for g in graphs}))

    raise ValueError(f"unknown dataset {name!r}")
