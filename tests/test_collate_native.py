"""Native C++ collator (native/collate.cpp): bit-identical to the numpy
golden path across every supported tensor, with fallback behavior for
unsupported batches."""

import numpy as np
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.collate_native import native_available
from feta_tmlr_tpu.data.synthetic import (
    sbm_like_dataset,
    zinc_categorical_dataset,
    zinc_like_dataset,
)
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding

import os

os.environ.setdefault("FETA_NATIVE_COLLATE", "1")   # opt-in for the tests
needs_native = pytest.mark.skipif(
    not native_available(), reason="libcollate.so not built")


def _collate_both(graphs, monkeypatch, **kw):
    monkeypatch.setenv("FETA_NATIVE_COLLATE", "1")
    native = collate_graphs(graphs, **kw)
    monkeypatch.setenv("FETA_NATIVE_COLLATE", "0")
    golden = collate_graphs(graphs, **kw)
    return native, golden


@needs_native
def test_native_bit_identical_full_batch(monkeypatch):
    graphs = zinc_like_dataset(seed=0, n_graphs=32)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    nb, gb = _collate_both(graphs, monkeypatch, max_nodes=48)
    for field in ("x", "node_mask", "adj", "pe", "lap_pe", "degree", "y"):
        a, b = getattr(nb, field), getattr(gb, field)
        assert (a is None) == (b is None), field
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=field)


@needs_native
def test_native_edge_types_and_coo(monkeypatch):
    graphs = zinc_categorical_dataset(seed=1, n_graphs=12)
    # categorical x -> numpy path; force float x to hit native with etype
    for g in graphs:
        g.x = np.eye(28, dtype=np.float32)[g.x.reshape(-1)]
    nb, gb = _collate_both(graphs, monkeypatch, with_coo=True)
    for field in ("x", "adj", "edge_type", "edge_index", "edge_mask", "y"):
        a, b = getattr(nb, field), getattr(gb, field)
        assert (a is None) == (b is None), field
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=field)


@needs_native
def test_native_node_labels(monkeypatch):
    graphs = sbm_like_dataset(seed=2, n_graphs=6, n_nodes=32)
    nb, gb = _collate_both(graphs, monkeypatch, node_labels=True)
    np.testing.assert_array_equal(nb.y, gb.y)
    np.testing.assert_array_equal(nb.adj, gb.adj)


def test_categorical_batches_fall_back():
    # int node ids (SAN tier) use the numpy path regardless of the .so
    graphs = zinc_categorical_dataset(seed=3, n_graphs=4)
    batch = collate_graphs(graphs)
    assert batch.x.dtype == np.int32


@needs_native
def test_native_collate_comparable_speed():
    """No perf assertion: on this 4-core host numpy fancy indexing is
    already at memory bandwidth (see collate_native.py docstring A/B);
    this just prints the numbers and guards against order-of-magnitude
    regressions."""
    import time
    graphs = zinc_like_dataset(seed=4, n_graphs=128)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    import os
    collate_graphs(graphs, max_nodes=48)          # warm both paths

    def timeit(env):
        os.environ["FETA_NATIVE_COLLATE"] = env
        t0 = time.perf_counter()
        for _ in range(10):
            collate_graphs(graphs, max_nodes=48)
        return (time.perf_counter() - t0) / 10

    try:
        t_native = timeit("1")
        t_numpy = timeit("0")
    finally:
        os.environ["FETA_NATIVE_COLLATE"] = "1"
    print(f"native {t_native*1e3:.2f} ms vs numpy {t_numpy*1e3:.2f} ms")
    assert t_native < t_numpy * 10


@needs_native
def test_native_rejects_corrupt_edge_index(monkeypatch):
    monkeypatch.setenv("FETA_NATIVE_COLLATE", "1")
    graphs = zinc_like_dataset(seed=5, n_graphs=3)
    graphs[1].edge_index = graphs[1].edge_index.copy()
    graphs[1].edge_index[0, 0] = 10_000          # out of range
    with pytest.raises(IndexError):
        collate_graphs(graphs, max_nodes=48)


@needs_native
def test_native_cache_invalidates_on_attribute_replacement(monkeypatch):
    monkeypatch.setenv("FETA_NATIVE_COLLATE", "1")
    graphs = zinc_like_dataset(seed=6, n_graphs=4)
    b1 = collate_graphs(graphs, max_nodes=48)
    # replace an attribute array: the pointer cache must not serve the
    # stale buffer
    graphs[0].x = graphs[0].x + 1.0
    b2 = collate_graphs(graphs, max_nodes=48)
    m = graphs[0].num_nodes
    np.testing.assert_allclose(np.asarray(b2.x[0, :m]),
                               np.asarray(b1.x[0, :m]) + 1.0)


def test_tu_native_parse_matches_python(tmp_path):
    """Native TU tokenizer (native/tuparse.cpp) vs the pure-Python parser:
    bit-identical graphs on the committed TUFIX fixture, plus a synthetic
    dataset WITH float node attributes (TUFIX has none)."""
    from feta_tmlr_tpu.data import tu_native
    from feta_tmlr_tpu.data.tu import load_tu_dataset
    if not tu_native.available():
        pytest.skip("native/libtuparse.so not built")

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    ref, ntags_ref = load_tu_dataset("TUFIX", fixdir, native=False)
    nat, ntags_nat = load_tu_dataset("TUFIX", fixdir, native=True)
    assert ntags_ref == ntags_nat and len(ref) == len(nat)
    for a, b in zip(ref, nat):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        assert int(a.y) == int(b.y)

    # attributes file: comma-separated float rows
    d = tmp_path / "ATTR"
    d.mkdir()
    (d / "ATTR_graph_indicator.txt").write_text("1\n1\n2\n2\n2\n")
    (d / "ATTR_graph_labels.txt").write_text("5\n-3\n")
    (d / "ATTR_A.txt").write_text("1, 2\n2, 1\n3, 4\n4, 5\n5, 3\n")
    (d / "ATTR_node_attributes.txt").write_text(
        "0.5, -1.25\n2.0, 3.5\n1.0, 0.0\n-0.5, 4.25\n0.25, 1.75\n")
    ref, _ = load_tu_dataset("ATTR", str(tmp_path), native=False)
    nat, _ = load_tu_dataset("ATTR", str(tmp_path), native=True)
    for a, b in zip(ref, nat):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        assert int(a.y) == int(b.y)
    assert int(ref[0].y) == 0 and int(ref[1].y) == 1   # first-seen remap
