"""Edge-partitioned multi-chip SpMM tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.parallel import make_mesh
from feta_tmlr_tpu.parallel.edge_partition import (
    make_allgather_spmm,
    make_ring_spmm,
    partition_edges,
    place_partitioned,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _random_graph(n_nodes, n_edges, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    w = rng.standard_normal(n_edges).astype(np.float32)
    x = rng.standard_normal((n_nodes, 16)).astype(np.float32)
    return np.stack([src, dst]).astype(np.int64), w, x


@pytest.mark.parametrize("maker", [make_allgather_spmm, make_ring_spmm])
@pytest.mark.parametrize("n_nodes", [64, 100])  # 100: uneven shards
def test_partitioned_spmm_matches_dense(maker, n_nodes):
    edge_index, w, x = _random_graph(n_nodes, 512, seed=n_nodes)
    mesh = make_mesh(8, model_parallel=1)
    pg = partition_edges(edge_index, n_nodes, mesh.shape["data"], w)
    args = place_partitioned(pg, x, mesh)
    spmm = jax.jit(maker(mesh))
    out = np.asarray(spmm(*args))[:n_nodes]

    dense = np.zeros((n_nodes, n_nodes), np.float32)
    np.add.at(dense, (edge_index[1], edge_index[0]), w)
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_partitioned_cheb_recurrence():
    """K-step Chebyshev over the partitioned graph == dense recurrence."""
    n_nodes, k_order = 96, 4
    edge_index, w, x = _random_graph(n_nodes, 400, seed=7)
    mesh = make_mesh(8, model_parallel=1)
    pg = partition_edges(edge_index, n_nodes, mesh.shape["data"], w)
    x_sh, src, dst, ww, mm = place_partitioned(pg, x, mesh)
    spmm = jax.jit(make_ring_spmm(mesh))

    tx0 = x_sh
    tx1 = spmm(tx0, src, dst, ww, mm)
    outs = [np.asarray(tx0), np.asarray(tx1)]
    for _ in range(2, k_order):
        tx2 = 2.0 * spmm(tx1, src, dst, ww, mm) - tx0
        outs.append(np.asarray(tx2))
        tx0, tx1 = tx1, tx2

    dense = np.zeros((n_nodes, n_nodes), np.float32)
    np.add.at(dense, (edge_index[1], edge_index[0]), w)
    r0, r1 = x, dense @ x
    refs = [r0, r1]
    for _ in range(2, k_order):
        r2 = 2.0 * dense @ r1 - r0
        refs.append(r2)
        r0, r1 = r1, r2
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(got[:n_nodes], ref, rtol=1e-3, atol=1e-3)
