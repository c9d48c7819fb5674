"""Data-layer tests: TU parser round-trip, collation, bucketing, splits."""

import os

import numpy as np
import pytest

from feta_tmlr_tpu.data import collate_graphs, pad_bucket, random_graph_dataset
from feta_tmlr_tpu.data.batch import Graph
from feta_tmlr_tpu.data.tu import load_fold_indices, load_tu_dataset


def write_tu(tmp_path, name, graphs, node_labels, graph_labels):
    d = tmp_path / name
    d.mkdir()
    pre = d / name
    n_nodes = [g.shape[0] for g in graphs]
    with open(f"{pre}_graph_indicator.txt", "w") as f:
        for gi, n in enumerate(n_nodes, 1):
            f.writelines(f"{gi}\n" for _ in range(n))
    with open(f"{pre}_graph_labels.txt", "w") as f:
        f.writelines(f"{l}\n" for l in graph_labels)
    with open(f"{pre}_node_labels.txt", "w") as f:
        for labs in node_labels:
            f.writelines(f"{l}\n" for l in labs)
    with open(f"{pre}_A.txt", "w") as f:
        offset = 1
        for g, n in zip(graphs, n_nodes):
            for a, b in zip(*np.nonzero(g)):
                f.write(f"{a + offset}, {b + offset}\n")
            offset += n


def test_tu_parser_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    adjs, nls = [], []
    for n in (5, 7, 4):
        a = np.triu((rng.random((n, n)) > 0.5), k=1).astype(int)
        a = a + a.T
        adjs.append(a)
        nls.append(rng.integers(3, 6, size=n))  # labels 3..5 -> shift to 0..2
    write_tu(tmp_path, "TOY", adjs, nls, [6, -1, 6])  # labels remap 6->0,-1->1

    graphs, n_tags = load_tu_dataset("TOY", datadir=str(tmp_path))
    assert len(graphs) == 3 and n_tags == 3
    assert [int(g.y) for g in graphs] == [0, 1, 0]
    for g, a, nl in zip(graphs, adjs, nls):
        assert g.num_nodes == a.shape[0]
        dense = np.zeros_like(a)
        dense[g.edge_index[0], g.edge_index[1]] = 1
        np.testing.assert_array_equal(dense, a)
        np.testing.assert_array_equal(np.argmax(g.x, -1), nl - 3)
        # degree feature 1/sqrt(1+deg)
        np.testing.assert_allclose(
            g.degree, 1.0 / np.sqrt(1.0 + a.sum(1)), atol=1e-6)


def test_fold_indices_stratified(tmp_path):
    graphs = random_graph_dataset(seed=0, n_graphs=40)
    tr, te = load_fold_indices(graphs, fold_idx=1)
    assert len(set(tr) & set(te)) == 0
    assert len(tr) + len(te) == 40
    # disk-format folds are preferred when present
    base = tmp_path / "TOY" / "10fold_idx"
    base.mkdir(parents=True)
    np.savetxt(base / "train_idx-1.txt", np.arange(30), fmt="%d")
    np.savetxt(base / "test_idx-1.txt", np.arange(30, 40), fmt="%d")
    tr2, te2 = load_fold_indices(graphs, 1, name="TOY",
                                 fold_dir=str(tmp_path))
    assert list(te2) == list(range(30, 40))


def test_pad_bucket_monotone():
    assert pad_bucket(5) == 8
    assert pad_bucket(8) == 8
    assert pad_bucket(9) == 16
    assert pad_bucket(513) == 640
    prev = 0
    for n in range(1, 600):
        b = pad_bucket(n)
        assert b >= n
        assert b >= prev or n <= prev
        prev = b


def test_collate_coo_view():
    graphs = random_graph_dataset(seed=1, n_graphs=4)
    gb = collate_graphs(graphs, with_coo=True)
    for i, g in enumerate(graphs):
        ne = g.num_edges
        assert gb.edge_mask[i, :ne].all()
        assert not gb.edge_mask[i, ne:].any()
        np.testing.assert_array_equal(gb.edge_index[i, :, :ne], g.edge_index)
        # COO view must agree with the dense adjacency
        dense = np.zeros((gb.max_nodes, gb.max_nodes))
        dense[gb.edge_index[i, 0, :ne], gb.edge_index[i, 1, :ne]] = 1
        np.testing.assert_array_equal(dense, gb.adj[i])


def test_node_level_label_padding():
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    graphs = sbm_like_dataset(seed=0, n_graphs=3, n_nodes=10)
    gb = collate_graphs(graphs, max_nodes=12, node_labels=True)
    assert gb.y.shape == (3, 12)
    for i, g in enumerate(graphs):
        n = g.num_nodes
        assert (gb.y[i, n:] == -1).all()
        assert (gb.y[i, :n] >= 0).all()


def test_ambiguous_labels_rejected():
    import pytest as _pytest
    from feta_tmlr_tpu.data.batch import Graph
    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(3):
        g = random_graph_dataset(seed=1, n_graphs=1, min_nodes=6,
                                 max_nodes=6)[0]
        g.y = rng.integers(0, 2, 6).astype(np.int64)  # len == node count
        graphs.append(g)
    with _pytest.raises(ValueError, match="ambiguous"):
        collate_graphs(graphs)
    gb = collate_graphs(graphs, node_labels=True)
    assert gb.y.shape[1] == gb.max_nodes
