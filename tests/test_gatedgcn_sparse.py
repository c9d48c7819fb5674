"""Sparse-COO GatedGCN-LSPE path vs the dense mailbox path.

Both run the same parameters; the sparse path computes the identical
per-edge math over the padded edge list (ops/sparse_agg.py) instead of a
masked [B, N, N, D] field, so outputs must agree to float-reassociation
tolerance, including BatchNorm statistics (taken over the same set of
real edges) and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.gatedgcn import GatedGCNLSPENet
from feta_tmlr_tpu.pe.rwpe import rwpe

KW = dict(num_atom_type=28, num_bond_type=4, hidden_dim=20, out_dim=20,
          n_layers=3, pos_enc_dim=8, n_out=1)


def _batch(seed=0, n=8):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n)
    for g in graphs:
        g.lap_pe = rwpe(g, 8)
    return collate_graphs(graphs, max_nodes=32, with_coo=True)


def test_sparse_matches_dense_forward_and_grads():
    batch = _batch()
    m_sparse = GatedGCNLSPENet(sparse_edges=True, **KW)
    m_dense = GatedGCNLSPENet(sparse_edges=False, **KW)
    params = m_dense.init(jax.random.key(0), batch)
    out_s = m_sparse.apply(params, batch)
    out_d = m_dense.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)

    def grads(mod):
        def f(p):
            return jnp.abs(mod.apply(p, batch)).sum()
        return jax.grad(f)(params)

    for a, b in zip(jax.tree_util.tree_leaves(grads(m_sparse)),
                    jax.tree_util.tree_leaves(grads(m_dense))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_sparse_matches_dense_batchnorm_training_stats():
    batch = _batch(seed=1)
    m_sparse = GatedGCNLSPENet(sparse_edges=True, **KW)
    m_dense = GatedGCNLSPENet(sparse_edges=False, **KW)
    variables = m_dense.init(jax.random.key(0), batch)
    out_s, upd_s = m_sparse.apply(
        variables, batch, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)})
    out_d, upd_d = m_dense.apply(
        variables, batch, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(upd_s),
                    jax.tree_util.tree_leaves(upd_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_auto_gate_uses_coo_when_present():
    batch = _batch(seed=2)
    m_auto = GatedGCNLSPENet(**KW)            # sparse_edges=None -> auto
    params = m_auto.init(jax.random.key(0), batch)
    out_coo = m_auto.apply(params, batch)
    # same batch without COO falls back to the dense mailbox
    batch_nc = batch.replace(edge_index=None, edge_mask=None,
                             in_edges=None, in_edge_mask=None)
    out_dense = m_auto.apply(params, batch_nc)
    np.testing.assert_allclose(np.asarray(out_coo), np.asarray(out_dense),
                               rtol=1e-4, atol=1e-5)


def test_lapeig_variant_still_works_sparse():
    batch = _batch(seed=3)
    model = GatedGCNLSPENet(use_lapeig_loss=True, lambda_loss=1.0,
                            alpha_loss=1e-4, **KW)
    params = model.init(jax.random.key(0), batch)
    out, aux = model.apply(params, batch)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(float(aux))
