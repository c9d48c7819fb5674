"""Positional-encoding precompute tests (host numpy/scipy)."""

import numpy as np
import scipy.linalg

from feta_tmlr_tpu.data import random_graph_dataset
from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.pe import (
    AdjEncoding,
    DiffusionEncoding,
    FullEncoding,
    LapEncoding,
    PStepRWEncoding,
    graph_laplacian,
    rwpe,
)
from feta_tmlr_tpu.pe.cache import PECache


def graphs():
    return random_graph_dataset(seed=7, n_graphs=3, min_nodes=5, max_nodes=9)


def test_graph_laplacian_sym_properties():
    g = graphs()[0]
    lap = graph_laplacian(g.edge_index, g.num_nodes, normalization="sym")
    arr = lap.toarray()
    np.testing.assert_allclose(arr, arr.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(arr), 1.0)
    w = np.linalg.eigvalsh(arr)
    assert w.min() > -1e-9 and w.max() < 2 + 1e-9


def test_diffusion_matches_dense_expm():
    for g in graphs():
        pe = DiffusionEncoding(beta=0.7).compute_pe(g)
        lap = graph_laplacian(g.edge_index, g.num_nodes).toarray()
        ref = scipy.linalg.expm(-0.7 * lap)
        np.testing.assert_allclose(pe, ref, atol=1e-8)


def test_pstep_matches_dense_power():
    for g in graphs():
        pe = PStepRWEncoding(p=3, beta=0.4, normalization="sym").compute_pe(g)
        lap = graph_laplacian(g.edge_index, g.num_nodes, normalization="sym")
        base = np.eye(g.num_nodes) - 0.4 * lap.toarray()
        ref = base @ base @ base
        np.testing.assert_allclose(pe, ref, atol=1e-10)


def test_adj_full_and_zero_diag():
    g = graphs()[0]
    a = AdjEncoding().compute_pe(g)
    assert a.shape == (g.num_nodes,) * 2
    assert a.sum() == g.num_edges
    f = FullEncoding(zero_diag=True)
    f.apply_to([g])
    assert np.all(np.diag(g.pe) == 0)
    assert np.all(g.pe[0, 1] == 1)


def test_lap_encoding_shape_and_orthogonality():
    g = graphs()[1]
    LapEncoding(dim=4).apply_to([g])
    assert g.lap_pe.shape == (g.num_nodes, 4)
    # eigvec of first nonzero eigval is orthogonal to constant vector for
    # the unnormalized Laplacian of a connected graph
    assert abs(g.lap_pe[:, 0].sum()) < 1e-5


def test_lap_encoding_pad_small_graph():
    g = random_connected_graph(np.random.default_rng(0), 3, 4)
    pe = LapEncoding(dim=8).compute_pe(g)
    assert pe.shape == (3, 8)
    assert np.all(pe[:, 2:] == 0)  # only n-1=2 nonconstant eigvecs exist


def test_rwpe_values():
    g = graphs()[2]
    pe = rwpe(g, dim=3)
    assert pe.shape == (g.num_nodes, 3)
    # k=1 diag of D^-1 A is 0 (no self loops)
    np.testing.assert_allclose(pe[:, 0], 0.0)
    # rows of (D^-1 A)^k sum to 1, so diag entries are probabilities
    assert np.all(pe >= 0) and np.all(pe <= 1)


def test_pe_cache_roundtrip(tmp_path):
    gs = graphs()
    cache = PECache(str(tmp_path))
    enc = DiffusionEncoding(beta=1.0, cache=cache)
    enc.apply_to(gs, split="train")
    first = [g.pe.copy() for g in gs]
    gs2 = graphs()
    enc2 = DiffusionEncoding(beta=1.0, cache=cache)
    enc2.apply_to(gs2, split="train")
    for a, b in zip(first, (g.pe for g in gs2)):
        np.testing.assert_allclose(a, b)
