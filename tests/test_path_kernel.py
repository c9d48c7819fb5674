"""Path-kernel goldens vs the reference's own numpy implementation.

/root/reference/gckn/path_kernel.py is pure numpy (its gckn.data import
is under __main__), so the reference code itself runs here as the
golden: `pathkernel` (Gram), `pathkernel_compare2` (pair, per length),
and `dfs` (position-filter scoring) against our MXU-shaped rebuild.
"""

import importlib.util

import numpy as np
import pytest

from feta_tmlr_tpu.gckn.path_kernel import (
    path_filter_response, path_kernel_gram, path_kernel_pair)


@pytest.fixture(scope="module")
def ref_pk():
    spec = importlib.util.spec_from_file_location(
        "ref_path_kernel", "/root/reference/gckn/path_kernel.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _RefGraph:
    """The duck type the reference functions expect."""

    def __init__(self, x, edge_index):
        n = x.shape[0]
        self.node_features = np.asarray(x, dtype=np.float64)
        self.neighbors = [[] for _ in range(n)]
        for s, d in zip(*np.asarray(edge_index)):
            self.neighbors[int(s)].append(int(d))
        # the reference DFS visits children in list order; sort so it
        # matches our CSR enumeration's lowest-index-first order
        self.neighbors = [sorted(a) for a in self.neighbors]


def _random_graph(rng, n, extra_edges=2, d=3):
    # a connected chain plus a few random chords, both edge directions
    edges = {(i, i + 1) for i in range(n - 1)}
    while len(edges) < n - 1 + extra_edges:
        a, b = rng.integers(0, n, size=2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    ei = np.array([[a, b] for a, b in edges] +
                  [[b, a] for a, b in edges]).T
    x = rng.normal(size=(n, d)).astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, ei


def _graph_set(seed=0, sizes=(4, 5, 6, 7)):
    rng = np.random.default_rng(seed)
    return [_random_graph(rng, n) for n in sizes]


@pytest.mark.parametrize("normalize", [False, True])
@pytest.mark.parametrize("cum", [False, True])
def test_gram_matches_reference(ref_pk, normalize, cum, capsys):
    graphs = _graph_set()
    ref_graphs = [_RefGraph(x, ei) for x, ei in graphs]
    want = ref_pk.pathkernel(ref_graphs, 3, coef=1.5,
                             normalize=normalize, cum=cum, sigma=0.8)
    got = path_kernel_gram(graphs, 3, coef=1.5, normalize=normalize,
                           cum=cum, sigma=0.8)
    capsys.readouterr()   # the reference prints its coef vector
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert np.allclose(got, got.T)


def test_gram_empty_length_quirk(ref_pk, capsys):
    """A 2-node graph has no 4-node paths: the reference leaves out[j]=0
    and still exps it — the quirk must survive the rebuild."""
    rng = np.random.default_rng(1)
    tiny = _random_graph(rng, 2, extra_edges=0)
    big = _random_graph(rng, 6)
    graphs = [tiny, big]
    ref_graphs = [_RefGraph(x, ei) for x, ei in graphs]
    want = ref_pk.pathkernel(ref_graphs, 4, coef=2.0,
                             normalize=True, cum=True, sigma=0.6)
    got = path_kernel_gram(graphs, 4, normalize=True, cum=True)
    capsys.readouterr()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # the quirk's fingerprint: the length-4 slot contributed exp(-1/s^2)
    assert got[0, 0] > 0


def test_pair_matches_compare2(ref_pk, capsys):
    graphs = _graph_set(seed=2, sizes=(5, 6))
    ref_graphs = [_RefGraph(x, ei) for x, ei in graphs]
    want = ref_pk.pathkernel_compare2(ref_graphs[0], ref_graphs[1], 3)
    got = path_kernel_pair(graphs[0], graphs[1], 3)
    capsys.readouterr()   # compare2 prints base_sim diagnostics
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_filter_response_matches_dfs(ref_pk, capsys):
    rng = np.random.default_rng(3)
    x, ei = _random_graph(rng, 6)
    filters = rng.normal(size=(3, 4, x.shape[1]))
    want = ref_pk.dfs(_RefGraph(x, ei), filters)
    got = np.asarray(path_filter_response((x, ei), filters))
    capsys.readouterr()   # dfs prints n
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_filter_response_clean_semantics():
    """Without the reference's sibling-restore quirk, every slot is the
    plain prefix-mean score; the full-path slot agrees across modes."""
    rng = np.random.default_rng(5)
    x, ei = _random_graph(rng, 6)
    filters = rng.normal(size=(3, 4, x.shape[1])).astype(np.float32)
    quirky = np.asarray(path_filter_response((x, ei), filters))
    clean = np.asarray(path_filter_response((x, ei), filters,
                                            reference_semantics=False))
    np.testing.assert_allclose(quirky[-1], clean[-1], rtol=1e-5)
    from feta_tmlr_tpu.gckn.pathenum import enumerate_paths
    paths, _ = enumerate_paths(ei, x.shape[0], 3)
    base = np.einsum("mkd,kpd->kmp", x[paths[2]].astype(np.float32),
                     filters)
    want = np.exp((np.cumsum(base, axis=0)
                   / np.arange(1, 4)[:, None, None] - 1) / 0.6**2).sum(1)
    np.testing.assert_allclose(clean, want, rtol=1e-4)


def test_filter_response_no_full_paths():
    rng = np.random.default_rng(4)
    x, ei = _random_graph(rng, 2, extra_edges=0)
    out = np.asarray(path_filter_response((x, ei), rng.normal(size=(4, 2, 3))))
    assert out.shape == (4, 2) and np.all(out == 0)
