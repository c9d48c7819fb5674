"""Native edge partitioner (native/edgepart.cpp): bit-parity with the
pure-Python bucket builder and a timing sanity check at scale."""

import time

import numpy as np
import pytest

from feta_tmlr_tpu.parallel import edge_partition as ep
from feta_tmlr_tpu.parallel.edgepart_native import (
    native_available,
    partition_edges_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libedgepart.so not built")


def _python_partition(edge_index, n_nodes, n_shards, w=None):
    """Force the Python path regardless of the native gate."""
    import unittest.mock as mock
    with mock.patch(
            "feta_tmlr_tpu.parallel.edgepart_native.native_available",
            return_value=False):
        return ep.partition_edges(edge_index, n_nodes, n_shards, w)


def _random_graph(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges, dtype=np.int32)
    dst = rng.integers(0, n_nodes, n_edges, dtype=np.int32)
    return np.stack([src, dst])


@pytest.mark.parametrize("n_nodes,n_edges,n_shards",
                         [(24, 100, 8), (100, 1000, 4), (7, 9, 3),
                          (1, 1, 2), (64, 0, 8)])
def test_native_bit_parity(n_nodes, n_edges, n_shards):
    rng = np.random.default_rng(n_nodes + n_edges)
    ei = _random_graph(rng, n_nodes, n_edges)
    w = rng.standard_normal(n_edges).astype(np.float32)
    py = _python_partition(ei, n_nodes, n_shards, w)
    vs, src_l, dst_l, weight, mask = partition_edges_native(
        ei, n_nodes, n_shards, w)
    assert vs == py.nodes_per_shard
    np.testing.assert_array_equal(src_l, py.src_local)
    np.testing.assert_array_equal(dst_l, py.dst_local)
    np.testing.assert_array_equal(weight, py.weight)
    np.testing.assert_array_equal(mask, py.mask)


def test_native_default_weight_and_dispatch():
    """partition_edges itself routes through the native builder and the
    implicit all-ones weights match."""
    rng = np.random.default_rng(0)
    ei = _random_graph(rng, 50, 300)
    via_dispatch = ep.partition_edges(ei, 50, 4)
    py = _python_partition(ei, 50, 4)
    np.testing.assert_array_equal(via_dispatch.weight, py.weight)
    np.testing.assert_array_equal(via_dispatch.mask, py.mask)
    np.testing.assert_array_equal(via_dispatch.src_local, py.src_local)


def test_native_faster_at_scale():
    """At ring-attention scale (1M edges) the native builder must beat
    the per-edge Python loop decisively (measured ~28x on this host;
    assert a conservative 5x so CI noise can't flake it)."""
    rng = np.random.default_rng(7)
    ei = _random_graph(rng, 100_000, 1_000_000)
    t0 = time.perf_counter()
    _python_partition(ei, 100_000, 8)
    t_python = time.perf_counter() - t0
    # best of 2 so a descheduled run on a loaded CI host can't flake;
    # the bound is intentionally far below the measured ~28x
    t_native = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        partition_edges_native(ei, 100_000, 8)
        t_native = min(t_native, time.perf_counter() - t0)
    assert t_native * 3 < t_python, (t_native, t_python)
