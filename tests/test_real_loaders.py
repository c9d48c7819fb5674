"""Round-trip tests for the real-format dataset loaders against committed
fixtures written in the reference stack's on-disk formats
(tests/fixtures/make_fixtures.py).

Covers: ZINC molecule pickles + .index subsets (LSPE/data/molecules.py:24-37),
GNNBenchmark SBM pickles with an unimportable DotDict class path
(LPE/data/SBMs.py:18-27), and the OGB raw CSV layout incl. NaN multi-task
labels and the >5-node LSPE filter (LSPE/data/ogb_mol.py:21-23).
"""

import os
import pickle

import numpy as np
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.ogb_raw import (
    find_ogb_root,
    load_ogb,
    load_ogb_graphs,
    load_ogb_or_synthetic,
    load_ogb_split_idx,
)
from feta_tmlr_tpu.data.sbm import (
    find_sbm_dir,
    load_sbm,
    load_sbm_or_synthetic,
    num_classes,
)
from feta_tmlr_tpu.data.zinc import (
    find_zinc_dir,
    load_zinc,
    load_zinc_or_synthetic,
    load_zinc_split,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
ZINC_DIR = os.path.join(FIXTURES, "molecules")
SBM_DIR = os.path.join(FIXTURES, "SBMs")


# --------------------------------------------------------------- ZINC
def test_zinc_split_roundtrip_against_pickle():
    graphs = load_zinc_split(ZINC_DIR, "train", use_index=False)
    with open(os.path.join(ZINC_DIR, "train.pickle"), "rb") as f:
        raw = pickle.load(f)
    assert len(graphs) == len(raw) == 12
    for g, mol in zip(graphs, raw):
        n = int(mol["num_atom"])
        assert g.x.shape == (n, 1)
        np.testing.assert_array_equal(
            g.x[:, 0], mol["atom_type"].numpy().astype(np.int32))
        bond = mol["bond_type"].numpy()
        # dense edge_type map reconstructs the bond matrix exactly
        dense = np.zeros((n, n), dtype=np.int64)
        dense[g.edge_index[0], g.edge_index[1]] = g.edge_type
        np.testing.assert_array_equal(dense, bond)
        assert np.isclose(float(g.y),
                          float(mol["logP_SA_cycle_normalized"]))
        # bond matrices are symmetric -> both edge directions present
        assert g.num_edges % 2 == 0


def test_zinc_index_subset():
    full = load_zinc_split(ZINC_DIR, "train", use_index=False)
    sub = load_zinc_split(ZINC_DIR, "train", use_index=True)
    # fixture index selects every other molecule
    assert len(sub) == 6
    for i, g in enumerate(sub):
        ref = full[2 * i]
        np.testing.assert_array_equal(g.x, ref.x)
        assert float(g.y) == float(ref.y)


def test_zinc_index_count_check():
    with pytest.raises(ValueError, match="expected 1000"):
        load_zinc_split(ZINC_DIR, "val", num_graphs=1000)


def test_zinc_three_splits_and_resolution():
    tr, va, te = load_zinc(ZINC_DIR, subset=False)
    assert (len(tr), len(va), len(te)) == (12, 5, 5)
    # subset=True consumes the committed index files
    tr_s, va_s, te_s = load_zinc(ZINC_DIR, subset=True)
    assert (len(tr_s), len(va_s), len(te_s)) == (6, 3, 3)
    assert find_zinc_dir(FIXTURES) == ZINC_DIR  # resolves molecules/ subdir
    assert find_zinc_dir("/nonexistent") is None
    tr2, va2, te2, used_real = load_zinc_or_synthetic(FIXTURES, subset=False)
    assert used_real and len(tr2) == 12
    tr3, _, _, used_real3 = load_zinc_or_synthetic("/nonexistent",
                                                   n_synthetic=20)
    assert not used_real3 and len(tr3) == 16


def test_zinc_graphs_collate_and_train_ready():
    tr, _, _ = load_zinc(ZINC_DIR, subset=False)
    batch = collate_graphs(tr, with_coo=True)
    assert batch.x.shape[0] == 12
    assert batch.edge_type is not None  # dense bond-type map for SAN tier
    assert batch.y.shape == (12,)


# --------------------------------------------------------------- SBM
def test_sbm_pickle_requires_tolerant_unpickler():
    # the fixture's DotDict class path is NOT importable -> naive load fails,
    # exactly like real benchmarking-gnns downloads
    with open(os.path.join(SBM_DIR, "SBM_FIXTURE_train.pkl"), "rb") as f:
        with pytest.raises(Exception):
            pickle.load(f)


def test_sbm_roundtrip():
    tr, va, te = load_sbm(SBM_DIR, "SBM_FIXTURE")
    assert (len(tr), len(va), len(te)) == (6, 3, 3)
    for g in tr:
        n = g.num_nodes
        assert g.x.shape == (n, 1)
        assert g.y.shape == (n,)
        assert set(np.unique(g.y)) <= {0, 1}
        # W was symmetric: adjacency round-trips symmetric
        A = np.zeros((n, n))
        A[g.edge_index[0], g.edge_index[1]] = 1
        np.testing.assert_array_equal(A, A.T)
        assert g.edge_type.shape == (g.num_edges,)
    assert num_classes(tr) == 2


def test_sbm_resolution_and_fallback():
    assert find_sbm_dir(FIXTURES, "SBM_FIXTURE") == SBM_DIR
    tr, va, te, used = load_sbm_or_synthetic(FIXTURES, "SBM_FIXTURE")
    assert used and len(tr) == 6
    tr2, _, _, used2 = load_sbm_or_synthetic("/nonexistent", "SBM_PATTERN",
                                             n_synthetic=10)
    assert not used2
    assert tr2[0].x.ndim == 2 and tr2[0].x.dtype == np.int32


def test_sbm_node_label_batching():
    tr, _, _ = load_sbm(SBM_DIR, "SBM_FIXTURE")
    batch = collate_graphs(tr, node_labels=True)
    assert batch.y.shape == batch.node_mask.shape
    # padding slots are -1
    assert (batch.y[~batch.node_mask] == -1).all()


# --------------------------------------------------------------- OGB raw
def test_ogb_molhiv_roundtrip():
    graphs = load_ogb_graphs(FIXTURES, "ogbg-molhiv")
    assert len(graphs) == 10
    for g in graphs:
        assert g.x.shape[1] == 9          # full OGB atom features
        assert g.edge_attr.shape[1] == 3  # full bond features
        assert g.edge_type.min() >= 1     # offset keeps 0 = no edge
        assert g.edge_index.max() < g.num_nodes  # local node ids
    idx = load_ogb_split_idx(FIXTURES, "ogbg-molhiv")
    assert sum(len(v) for v in idx.values()) == 10


def test_ogb_split_and_min_nodes_filter():
    tr, va, te = load_ogb(FIXTURES, "ogbg-molhiv")
    assert len(tr) + len(va) + len(te) == 10
    tr_f, va_f, te_f = load_ogb(FIXTURES, "ogbg-molhiv", min_nodes=6)
    # fixture plants <=5-node graphs at every 5th slot
    assert len(tr_f) + len(va_f) + len(te_f) == 8
    for g in tr_f + va_f + te_f:
        assert g.num_nodes > 5


def test_ogb_molpcba_nan_labels():
    graphs = load_ogb_graphs(FIXTURES, "ogbg-molpcba")
    ys = np.stack([g.y for g in graphs])
    assert ys.shape == (8, 8)
    assert np.isnan(ys).any()             # unlabeled cells preserved
    finite = ys[np.isfinite(ys)]
    assert set(np.unique(finite)) <= {0.0, 1.0}


def test_ogb_resolution_and_fallback():
    assert find_ogb_root(FIXTURES, "ogbg-molhiv") == FIXTURES
    tr, va, te, used = load_ogb_or_synthetic(
        FIXTURES, "ogbg-molhiv", synthetic_fn=lambda: [], min_nodes=6)
    assert used
    called = {}

    def synth():
        called["yes"] = True
        from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
        return zinc_categorical_dataset(n_graphs=10)

    tr2, _, _, used2 = load_ogb_or_synthetic("/nonexistent", "ogbg-molhiv",
                                             synthetic_fn=synth)
    assert not used2 and called.get("yes")


# --------------------------------------------------------------- registry
def test_load_data_registry():
    from feta_tmlr_tpu.data.registry import load_data

    ds = load_data("ZINC", FIXTURES)
    assert ds.used_real and ds.task == "graph_reg"
    assert ds.num_atom_type == 28 and len(ds.train) == 6  # index subset

    ds = load_data("MOL-HIV", FIXTURES)
    assert ds.used_real and ds.task == "binary_graph" and ds.n_tasks == 1

    ds = load_data("SBM_PATTERN", "/nonexistent", n_synthetic=10)
    assert not ds.used_real and ds.task == "node_clf"
    assert ds.n_classes == 2

    with pytest.raises(ValueError):
        load_data("NOPE", "/nonexistent")


def test_load_data_registry_tu():
    from feta_tmlr_tpu.data.registry import load_data
    ds = load_data("MUTAG", "/nonexistent", n_synthetic=30)
    assert not ds.used_real and ds.task == "graph_clf"
    assert ds.n_classes == 2
    assert len(ds.train) + len(ds.val) + len(ds.test) == 30
