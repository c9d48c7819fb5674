"""Golden tests: dense batched device ops vs numpy COO twins."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.ops import (
    cheb_scaled_laplacian,
    cheb_filter_dynamic,
    gcn_norm_dense,
    kernel_modulated_attention,
    coo_spmm,
    segment_softmax,
)
from feta_tmlr_tpu.ops.cheb import cheb_filter_scalar_coeff

from tests.reference_impls import (
    coo_cheb_norm,
    cheb_dynamic_single,
    gcn_norm_np,
    graphit_attention_np,
)


@pytest.fixture(scope="module")
def batch():
    graphs = random_graph_dataset(seed=3, n_graphs=6, min_nodes=5,
                                  max_nodes=17, n_features=4)
    return graphs, collate_graphs(graphs)


@pytest.mark.parametrize("norm", ["sym", "rw", None])
def test_cheb_scaled_laplacian_matches_coo(batch, norm):
    graphs, gb = batch
    # non-sym normalizations require an explicit lambda_max (reference
    # ChebNetDynamic.py:135-140); the numpy twin uses 2.0 throughout
    lam = {} if norm == "sym" else {"lambda_max": 2.0}
    lhat = np.asarray(cheb_scaled_laplacian(
        jnp.asarray(gb.adj), jnp.asarray(gb.node_mask),
        normalization=norm, **lam))
    for i, g in enumerate(graphs):
        n = g.num_nodes
        ref = coo_cheb_norm(g.edge_index, n, normalization=norm)
        np.testing.assert_allclose(lhat[i, :n, :n], ref, atol=1e-5)
        # padded rows/cols must be exactly zero
        assert np.all(lhat[i, n:, :] == 0)
        assert np.all(lhat[i, :, n:] == 0)


def test_cheb_filter_dynamic_matches_per_graph(batch):
    graphs, gb = batch
    rng = np.random.default_rng(0)
    b, n = gb.adj.shape[:2]
    h, k, dh = 3, 4, 5
    x = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    x = x * gb.node_mask[:, None, :, None]
    w = rng.standard_normal((b, h, k, dh, dh)).astype(np.float32)
    bias = rng.standard_normal((dh,)).astype(np.float32)

    lhat = cheb_scaled_laplacian(jnp.asarray(gb.adj),
                                 jnp.asarray(gb.node_mask))
    out = np.asarray(cheb_filter_dynamic(
        jnp.asarray(x), lhat, jnp.asarray(w), jnp.asarray(bias)))

    for i, g in enumerate(graphs):
        m = g.num_nodes
        ref_l = coo_cheb_norm(g.edge_index, m)
        for head in range(h):
            ref = cheb_dynamic_single(x[i, head, :m], ref_l, w[i, head], bias)
            np.testing.assert_allclose(out[i, head, :m], ref,
                                       rtol=1e-4, atol=1e-4)


def test_cheb_filter_scalar_coeff_matches(batch):
    graphs, gb = batch
    rng = np.random.default_rng(1)
    b, n = gb.adj.shape[:2]
    h, k, dh = 2, 3, 4
    x = (rng.standard_normal((b, h, n, dh)).astype(np.float32)
         * gb.node_mask[:, None, :, None])
    coeff = rng.standard_normal((b, h, k)).astype(np.float32)
    weight = rng.standard_normal((k, dh, dh)).astype(np.float32)

    lhat = cheb_scaled_laplacian(jnp.asarray(gb.adj),
                                 jnp.asarray(gb.node_mask))
    out = np.asarray(cheb_filter_scalar_coeff(
        jnp.asarray(x), lhat, jnp.asarray(coeff), jnp.asarray(weight)))
    for i, g in enumerate(graphs):
        m = g.num_nodes
        ref_l = coo_cheb_norm(g.edge_index, m)
        for head in range(h):
            # scalar-coefficient mode: out = sum_k (c_k * Tx_k) @ W_k
            wdyn = coeff[i, head][:, None, None] * weight
            ref = cheb_dynamic_single(x[i, head, :m], ref_l, wdyn)
            np.testing.assert_allclose(out[i, head, :m], ref,
                                       rtol=1e-4, atol=1e-4)


def test_gcn_norm_dense_matches(batch):
    graphs, gb = batch
    rng = np.random.default_rng(2)
    w_adj = gb.adj * rng.random(gb.adj.shape).astype(np.float32)
    out = np.asarray(gcn_norm_dense(jnp.asarray(w_adj),
                                    jnp.asarray(gb.node_mask)))
    for i, g in enumerate(graphs):
        m = g.num_nodes
        ref = gcn_norm_np(w_adj[i, :m, :m])
        np.testing.assert_allclose(out[i, :m, :m], ref, atol=1e-5)


def test_attention_matches_numpy_and_padding_invariant(batch):
    graphs, gb = batch
    rng = np.random.default_rng(4)
    b, n = gb.node_mask.shape
    h, dh = 2, 8
    q, k, v = (rng.standard_normal((b, h, n, dh)).astype(np.float32)
               for _ in range(3))
    pe = rng.random((b, n, n)).astype(np.float32) * gb.node_mask[:, :, None] \
        * gb.node_mask[:, None, :]
    deg = rng.random((b, n)).astype(np.float32) * gb.node_mask

    out, attn = kernel_modulated_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(gb.node_mask), pe=jnp.asarray(pe), degree=jnp.asarray(deg))
    out, attn = np.asarray(out), np.asarray(attn)
    for i, g in enumerate(graphs):
        m = g.num_nodes
        valid = gb.node_mask[i]
        for head in range(h):
            ref_o, ref_a = graphit_attention_np(
                q[i, head], k[i, head], v[i, head], valid, pe[i], deg[i])
            np.testing.assert_allclose(out[i, head], ref_o, atol=1e-4)
            np.testing.assert_allclose(attn[i, head], ref_a, atol=1e-5)
    # attention rows over valid keys sum to 1 for valid queries
    row_sums = attn.sum(-1)
    valid_q = np.broadcast_to(gb.node_mask[:, None, :], row_sums.shape)
    np.testing.assert_allclose(row_sums[valid_q], 1.0, atol=1e-4)
    assert np.all(row_sums[~valid_q] == 0)

    # padding invariance: re-collate with more padding, outputs must agree
    gb2 = collate_graphs(graphs, max_nodes=n + 16)
    pad = lambda t: np.pad(t, [(0, 0)] * (t.ndim - 2) + [(0, 16), (0, 0)])
    q2 = np.pad(q, [(0, 0), (0, 0), (0, 16), (0, 0)])
    k2, v2 = (np.pad(t, [(0, 0), (0, 0), (0, 16), (0, 0)]) for t in (k, v))
    pe2 = np.pad(pe, [(0, 0), (0, 16), (0, 16)])
    deg2 = np.pad(deg, [(0, 0), (0, 16)])
    out2, _ = kernel_modulated_attention(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
        jnp.asarray(gb2.node_mask), pe=jnp.asarray(pe2),
        degree=jnp.asarray(deg2))
    np.testing.assert_allclose(np.asarray(out2)[:, :, :n], out, atol=1e-5)


def test_coo_spmm_matches_dense():
    rng = np.random.default_rng(5)
    n, e, d = 11, 40, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(e) > 0.3
    out = np.asarray(coo_spmm(jnp.asarray(np.stack([src, dst])),
                              jnp.asarray(w), jnp.asarray(x), n,
                              edge_mask=jnp.asarray(mask)))
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (dst[mask], src[mask]), w[mask])
    np.testing.assert_allclose(out, a @ x, atol=1e-5)


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(6)
    n = 6
    # full bipartite-ish edge set: every (dst, src) pair once
    dst, src = np.mgrid[0:n, 0:n].reshape(2, -1)
    logits = rng.standard_normal(n * n).astype(np.float32)
    out = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(dst), n))
    dense = np.exp(logits.reshape(n, n))
    dense = dense / dense.sum(-1, keepdims=True)
    np.testing.assert_allclose(out.reshape(n, n), dense, atol=1e-5)
