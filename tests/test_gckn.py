"""GCKN subsystem tests: path enumeration (C++ vs python twin), path conv,
pooling, k-means, layer forward vs direct numpy, end-to-end PE."""

import numpy as np
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.gckn import (
    GCKNFeature,
    build_path_batch,
    enumerate_paths,
    enumerate_paths_py,
)
from feta_tmlr_tpu.gckn.layer import (
    init_path_layer,
    path_layer_forward,
    sample_paths,
    unsup_train_layer,
)
from feta_tmlr_tpu.gckn.models import gckn_encode_as_pe
from feta_tmlr_tpu.gckn.ops import (
    exp_kernel,
    matrix_inverse_sqrt,
    path_conv,
    segment_pool,
)
import jax


def ring_graph(n):
    src = np.arange(n)
    dst = (src + 1) % n
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei.astype(np.int32)


def test_native_matches_python_twin():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(4, 12))
        g = random_graph_dataset(seed=trial, n_graphs=1, min_nodes=n,
                                 max_nodes=n, n_features=2)[0]
        p_native, c_native = enumerate_paths(g.edge_index, n, 4)
        p_py, c_py = enumerate_paths_py(g.edge_index, n, 4)
        np.testing.assert_array_equal(c_native, c_py)
        for a, b in zip(p_native, p_py):
            np.testing.assert_array_equal(a, b)


def test_path_counts_on_ring():
    n = 6
    ei = ring_graph(n)
    paths, counts = enumerate_paths(ei, n, 3)
    # ring: per node 1 path of size 1, 2 of size 2, 2 of size 3
    np.testing.assert_array_equal(counts[0], np.ones(n))
    np.testing.assert_array_equal(counts[1], 2 * np.ones(n))
    np.testing.assert_array_equal(counts[2], 2 * np.ones(n))
    # all paths are simple
    for s, p in enumerate(paths, 1):
        assert p.shape[1] == s
        for row in p:
            assert len(set(row.tolist())) == s


def test_path_conv_and_pool_direct():
    rng = np.random.default_rng(1)
    v, s, h = 5, 3, 4
    feats = rng.standard_normal((v + 1, s, h)).astype(np.float32)
    feats[-1] = 0
    paths = np.array([[0, 1, 2], [1, 2, 3], [3, 4, 0], [2, 0, 1]],
                     np.int32)
    seg = np.array([0, 1, 3, 2], np.int32)
    emb = np.asarray(path_conv(jnp.asarray(feats), jnp.asarray(paths)))
    for p in range(len(paths)):
        ref = np.mean([feats[paths[p, j], j] for j in range(s)], axis=0)
        np.testing.assert_allclose(emb[p], ref, atol=1e-6)
    pooled = np.asarray(segment_pool(jnp.asarray(emb), jnp.asarray(seg),
                                     v + 1, "mean"))
    np.testing.assert_allclose(pooled[3], emb[2], atol=1e-6)
    mx = np.asarray(segment_pool(jnp.asarray(emb), jnp.asarray(seg),
                                 v + 1, "max"))
    np.testing.assert_allclose(mx[0], emb[0], atol=1e-6)


def test_matrix_inverse_sqrt():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((6, 6))
    gram = a @ a.T + 6 * np.eye(6)
    # eps=0 isolates the mathematical property; the default eps=1e-2
    # reproduces the reference's regularised formula and is covered by
    # test_reference_goldens.py
    inv_sqrt = np.asarray(matrix_inverse_sqrt(jnp.asarray(gram), eps=0.0))
    approx = inv_sqrt @ gram @ inv_sqrt
    np.testing.assert_allclose(approx, np.eye(6), atol=1e-4)


def test_path_layer_forward_matches_numpy():
    graphs = random_graph_dataset(seed=3, n_graphs=3, min_nodes=4,
                                  max_nodes=8, n_features=5)
    k = 2
    batch = build_path_batch(graphs, k)
    layer = init_path_layer(jax.random.key(0), 5, 6, k, kernel_arg=0.6)
    out = np.asarray(path_layer_forward(
        layer, jnp.asarray(batch.features), batch))
    # numpy direct for a couple of nodes
    w = np.asarray(layer.weight)
    w = w / np.maximum(
        np.linalg.norm(w, axis=-1, keepdims=True), 1e-6)
    alpha = 1.0 / 0.6 ** 2
    feats = batch.features
    norms = np.linalg.norm(feats, axis=-1)
    proj = np.einsum("vf,shf->vsh", feats, w) / np.maximum(
        norms, 1e-6)[:, None, None]
    gram = np.einsum("shd,sgd->shg", w, w).mean(0)
    lint = np.asarray(matrix_inverse_sqrt(
        jnp.asarray(np.exp(alpha * (gram - 1)))))
    pi = batch.path_indices[k - 1]
    mask = batch.path_mask[k - 1]
    seg = batch.segment_ids[k - 1]
    for node in range(batch.n_nodes):
        rows = np.where((seg == node) & mask)[0]
        embs = []
        for r in rows:
            e = np.mean([proj[pi[r, j], j] for j in range(k)], 0)
            embs.append(np.exp(alpha * (e - 1)))
        ref = np.mean(embs, 0) * norms[node]
        ref = ref @ lint
        np.testing.assert_allclose(out[node, 0], ref, rtol=1e-4, atol=1e-4)


def test_unsup_train_and_pe_end_to_end():
    graphs = random_graph_dataset(seed=4, n_graphs=6, min_nodes=5,
                                  max_nodes=9, n_features=4)
    dim = gckn_encode_as_pe(graphs, dim=8, path_size=2,
                            n_sampling_paths=500)
    assert dim == 8
    for g in graphs:
        assert g.lap_pe.shape == (g.num_nodes, 8)
        assert np.all(np.isfinite(g.lap_pe))
    # features must be usable downstream as lap-PE inputs
    gb = collate_graphs(graphs)
    assert gb.lap_pe.shape[-1] == 8
