"""Tests for GCN/GENGCN modules, ARMA dynamic filter, and model variants."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import (
    DenseGCNConv,
    DenseGENGCN,
    DiffGraphTransformerGCN,
    DiffGraphTransformerGenGCN,
)
from feta_tmlr_tpu.ops.arma import arma_filter_dynamic, gcn_norm_no_self_loops
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding

from tests.reference_impls import gcn_norm_np


def _batch():
    graphs = random_graph_dataset(seed=9, n_graphs=4, min_nodes=5,
                                  max_nodes=11, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    return graphs, collate_graphs(graphs, max_nodes=12)


def test_dense_gcn_matches_numpy():
    graphs, gb = _batch()
    mod = DenseGCNConv(5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 12, 7)).astype(np.float32)) * gb.node_mask[..., None]
    params = mod.init(jax.random.key(0), x, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask))
    out = np.asarray(mod.apply(params, x, jnp.asarray(gb.adj),
                               jnp.asarray(gb.node_mask)))
    kernel = np.asarray(params["params"]["kernel_proj"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    for i, g in enumerate(graphs):
        m = g.num_nodes
        a = np.zeros((m, m))
        a[g.edge_index[0], g.edge_index[1]] = 1.0
        ref = gcn_norm_np(a) @ (np.asarray(x[i, :m]) @ kernel) + bias
        np.testing.assert_allclose(out[i, :m], ref, atol=1e-4)


def test_gengcn_polynomial_semantics():
    graphs, gb = _batch()
    mod = DenseGENGCN(7, num_hops=3)
    x = jnp.asarray(gb.x)
    params = mod.init(jax.random.key(1), x, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask))
    out = np.asarray(mod.apply(params, x, jnp.asarray(gb.adj),
                               jnp.asarray(gb.node_mask)))
    kernel = np.asarray(params["params"]["kernel_proj"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    h = np.asarray(params["params"]["h"])
    for i, g in enumerate(graphs):
        m = g.num_nodes
        a = np.zeros((m, m))
        a[g.edge_index[0], g.edge_index[1]] = 1.0
        deg = a.sum(1)
        dis = np.where(deg > 0, deg.clip(min=1e-30) ** -0.5, 0)
        lap = np.eye(m) - dis[:, None] * a * dis[None, :]
        xw = gb.x[i, :m] @ kernel
        ref = h[0] * xw + h[1] * (lap @ xw) + h[2] * (lap @ lap @ xw) + bias
        np.testing.assert_allclose(out[i, :m], ref, atol=1e-4)


def test_arma_filter_matches_loop():
    rng = np.random.default_rng(3)
    graphs, gb = _batch()
    b, n = gb.adj.shape[:2]
    h_heads, d, k = 2, 4, 3
    x = (rng.standard_normal((b, h_heads, n, d)).astype(np.float32)
         * gb.node_mask[:, None, :, None])
    coeff = rng.standard_normal((b, h_heads, 2 * k)).astype(np.float32)
    w_init = rng.standard_normal((k, d, d)).astype(np.float32)
    w_root = rng.standard_normal((k, d, d)).astype(np.float32)
    bias = rng.standard_normal((k, 1, d)).astype(np.float32)

    anorm = gcn_norm_no_self_loops(jnp.asarray(gb.adj),
                                   jnp.asarray(gb.node_mask))
    out = np.asarray(arma_filter_dynamic(
        jnp.asarray(x), anorm, jnp.asarray(coeff), jnp.asarray(w_init),
        jnp.asarray(w_root), jnp.asarray(bias),
        activation=lambda t: np.maximum(t, 0) if isinstance(t, np.ndarray)
        else jnp.maximum(t, 0)))

    an = np.asarray(anorm)
    for i in range(b):
        for hh in range(h_heads):
            acc = np.zeros((n, d), np.float32)
            for kk in range(k):
                wa = w_init[kk] * coeff[i, hh, kk]
                wb = w_root[kk] * coeff[i, hh, k + kk]
                y = an[i] @ (x[i, hh] @ wa) + x[i, hh] @ wb + bias[kk]
                acc += np.maximum(y, 0)
            np.testing.assert_allclose(out[i, hh], acc / k,
                                       rtol=1e-4, atol=1e-4)


def test_arma_feta_model_trains():
    _, gb = _batch()
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=3, gnn_type="ARMAConvDynamic")
    params = model.init(jax.random.key(0), gb)
    logits, reg, coeff = model.apply(params, gb, return_filter_coeff=True)
    assert logits.shape == (4, 2)
    assert coeff.shape == (4, 4, 6)  # 2K = 6 coefficients per head
    grads = jax.grad(
        lambda p: model.apply(p, gb)[0].sum())(params)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_transformer_gcn_model():
    _, gb = _batch()
    model = DiffGraphTransformerGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4)
    params = model.init(jax.random.key(0), gb)
    out = model.apply(params, gb)
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out)))
