"""Generate tiny committed dataset fixtures in the REAL on-disk formats.

Run from the repo root:  python tests/fixtures/make_fixtures.py

Formats reproduced byte-compatibly with what the reference stack reads:
  - ZINC molecule pickles + .index CSVs (LSPE/data/molecules.py:24-37):
    torch tensors inside plain dicts.
  - GNNBenchmark SBM pickles (LPE/data/SBMs.py:18-27): lists of DotDict
    records whose class path points at the (non-importable) generating
    notebook module — exactly the situation real downloads present.
  - OGB raw CSV layout (what DglGraphPropPredDataset downloads):
    raw/*.csv.gz + split/scaffold/*.csv.gz.
"""

import csv
import gzip
import os
import pickle

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))


# --------------------------------------------------------------- ZINC
def _random_molecule(rng, n):
    atom = torch.from_numpy(rng.integers(0, 28, n).astype(np.int64))
    bond = np.zeros((n, n), dtype=np.int64)
    order = rng.permutation(n)
    for a, b in zip(order[:-1], order[1:]):  # spanning chain
        t = int(rng.integers(1, 4))
        bond[a, b] = bond[b, a] = t
    extra = rng.integers(0, n, size=(2, max(n // 3, 1)))
    for a, b in zip(*extra):
        if a != b and bond[a, b] == 0:
            t = int(rng.integers(1, 4))
            bond[a, b] = bond[b, a] = t
    return {
        "num_atom": int(n),
        "atom_type": atom,
        "bond_type": torch.from_numpy(bond),
        "logP_SA_cycle_normalized": torch.tensor(
            float(rng.standard_normal()), dtype=torch.float64),
    }


def make_zinc(root):
    rng = np.random.default_rng(7)
    os.makedirs(root, exist_ok=True)
    sizes = {"train": 12, "val": 5, "test": 5}
    for split, count in sizes.items():
        mols = [_random_molecule(rng, int(rng.integers(6, 16)))
                for _ in range(count)]
        with open(os.path.join(root, f"{split}.pickle"), "wb") as f:
            pickle.dump(mols, f)
        # index file selecting a strict subset, reference CSV shape:
        # one row of indices (LSPE/data/molecules.py:33-36)
        idx = list(range(0, count, 2))
        with open(os.path.join(root, f"{split}.index"), "w",
                  newline="") as f:
            csv.writer(f).writerow(idx)
    print(f"wrote ZINC fixture -> {root}")


# --------------------------------------------------------------- SBM
class DotDict(dict):
    def __getattr__(self, k):
        return self[k]

    def __setattr__(self, k, v):
        self[k] = v


# Real benchmarking-gnns pickles were written by the generating notebook, so
# they reference ``__main__.DotDict`` — a class that does NOT exist in the
# loading process. Running this script as __main__ reproduces that exactly:
# naive pickle.load fails on these fixtures, the tolerant unpickler in
# feta_tmlr_tpu/data/sbm.py is required, same as for the real files.


def make_sbm(root, name="SBM_FIXTURE"):
    rng = np.random.default_rng(11)
    os.makedirs(root, exist_ok=True)
    for split, count in (("train", 6), ("val", 3), ("test", 3)):
        recs = []
        for _ in range(count):
            n = int(rng.integers(12, 24))
            labels = rng.integers(0, 2, n)
            p = np.where(labels[:, None] == labels[None, :], 0.5, 0.1)
            upper = np.triu(rng.random((n, n)) < p, k=1)
            W = (upper | upper.T).astype(np.int16)
            rec = DotDict()
            rec.node_feat = torch.from_numpy(
                rng.integers(0, 3, n).astype(np.int64))
            rec.W = torch.from_numpy(W)
            rec.node_label = torch.from_numpy(labels.astype(np.int16))
            recs.append(rec)
        with open(os.path.join(root, f"{name}_{split}.pkl"), "wb") as f:
            pickle.dump(recs, f)
    print(f"wrote SBM fixture -> {root}")


# --------------------------------------------------------------- OGB raw
def _write_csv_gz(path, rows):
    with gzip.open(path, "wt", newline="") as f:
        w = csv.writer(f)
        for r in rows:
            w.writerow(r)


def make_ogb(root, name_dir, n_graphs, n_tasks, with_nan, seed):
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, name_dir, "raw")
    split = os.path.join(root, name_dir, "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)
    num_nodes, num_edges, edges, nfeat, efeat, labels = [], [], [], [], [], []
    for gi in range(n_graphs):
        # include some <=5-node graphs to exercise the LSPE size filter
        n = int(rng.integers(3, 6)) if gi % 5 == 4 else int(
            rng.integers(7, 18))
        order = rng.permutation(n)
        und = [(int(a), int(b)) for a, b in zip(order[:-1], order[1:])]
        ee = []
        for a, b in und:  # both directions, local node ids
            ee.append((a, b))
            ee.append((b, a))
        num_nodes.append([n])
        num_edges.append([len(ee)])
        edges.extend(ee)
        nfeat.extend(rng.integers(0, 20, size=(n, 9)).tolist())
        efeat.extend(rng.integers(0, 4, size=(len(ee), 3)).tolist())
        if n_tasks == 1:
            labels.append([int(rng.integers(0, 2))])
        else:
            row = [int(rng.integers(0, 2)) for _ in range(n_tasks)]
            if with_nan:
                for j in range(n_tasks):
                    if rng.random() < 0.3:
                        row[j] = ""  # unlabeled task cell (molpcba style)
            labels.append(row)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), num_nodes)
    _write_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"), num_edges)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), edges)
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), nfeat)
    _write_csv_gz(os.path.join(raw, "edge-feat.csv.gz"), efeat)
    _write_csv_gz(os.path.join(raw, "graph-label.csv.gz"), labels)
    idx = rng.permutation(n_graphs)
    cut1, cut2 = int(0.6 * n_graphs), int(0.8 * n_graphs)
    _write_csv_gz(os.path.join(split, "train.csv.gz"),
                  [[int(i)] for i in idx[:cut1]])
    _write_csv_gz(os.path.join(split, "valid.csv.gz"),
                  [[int(i)] for i in idx[cut1:cut2]])
    _write_csv_gz(os.path.join(split, "test.csv.gz"),
                  [[int(i)] for i in idx[cut2:]])
    print(f"wrote OGB fixture -> {os.path.join(root, name_dir)}")


# --------------------------------------------------------------- PCQM4M-LSC
def make_pcqm4m_lsc(root, name="pcqm4m_kddcup2021"):
    """REAL OGB-LSC layout: raw/data.csv.gz (idx,smiles,homolumogap) +
    split_dict.pt (what ogb.lsc.PCQM4MDataset downloads)."""
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    smiles = ["CCO", "c1ccccc1", "CC(=O)Nc1ccccc1", "C#N", "CC1CCCCC1",
              "OC(=O)c1ccccc1O", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
              "[NH3+]CC([O-])=O", "CCOC(=O)C", "c1ccc2ccccc2c1",
              "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O", "N#Cc1ccccc1"]
    rng = np.random.default_rng(13)
    with gzip.open(os.path.join(raw, "data.csv.gz"), "wt",
                   newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "smiles", "homolumogap"])
        for i, s in enumerate(smiles):
            gap = "" if i >= len(smiles) - 2 else \
                f"{float(rng.uniform(2, 8)):.4f}"   # last 2: test (no label)
            w.writerow([i, s, gap])
    n = len(smiles)
    torch.save({"train": np.arange(0, n - 4),
                "valid": np.arange(n - 4, n - 2),
                "test": np.arange(n - 2, n)},
               os.path.join(root, name, "split_dict.pt"))
    print(f"wrote PCQM4M-LSC fixture -> {os.path.join(root, name)}")


# --------------------------------------------------------------- TU
def make_tu(root, name="TUFIX", n_graphs=16, seed=11):
    """Standard TU text layout (1-indexed _A.txt edge list etc.), the same
    files a TUDataset download unpacks (gckn/data_io.py:27-160 reads it)."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    pre = os.path.join(d, name)
    adjs, node_labels, graph_labels = [], [], []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 12))
        a = np.triu(rng.random((n, n)) > 0.55, k=1).astype(int)
        order = rng.permutation(n)           # spanning chain: connected
        for u, v in zip(order[:-1], order[1:]):
            a[min(u, v), max(u, v)] = 1
        a = a + a.T
        adjs.append(a)
        node_labels.append(rng.integers(0, 5, n))
        # learnable label: density above/below median-ish threshold,
        # raw values 6/-1 to exercise the first-seen label remap
        dens = a.sum() / (n * (n - 1))
        graph_labels.append(6 if dens > 0.5 else -1)
    with open(f"{pre}_graph_indicator.txt", "w") as f:
        for gi, a in enumerate(adjs, 1):
            f.writelines(f"{gi}\n" for _ in range(a.shape[0]))
    with open(f"{pre}_graph_labels.txt", "w") as f:
        f.writelines(f"{l}\n" for l in graph_labels)
    with open(f"{pre}_node_labels.txt", "w") as f:
        for labs in node_labels:
            f.writelines(f"{l}\n" for l in labs)
    with open(f"{pre}_A.txt", "w") as f:
        offset = 1
        for a in adjs:
            for u, v in zip(*np.nonzero(a)):
                f.write(f"{u + offset}, {v + offset}\n")
            offset += a.shape[0]
    print(f"wrote TU fixture -> {d}")


if __name__ == "__main__":
    make_zinc(os.path.join(HERE, "molecules"))
    make_sbm(os.path.join(HERE, "SBMs"))
    make_ogb(HERE, "ogbg_molhiv", n_graphs=10, n_tasks=1,
             with_nan=False, seed=3)
    make_ogb(HERE, "ogbg_molpcba", n_graphs=8, n_tasks=8,
             with_nan=True, seed=5)
    make_tu(HERE)
    make_pcqm4m_lsc(HERE)
