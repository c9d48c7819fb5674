"""SAN/LPE-tier tests: dense attention vs numpy edge-walk twin, spectra
layer, SAN_NodeSpectra end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.san import (
    SANAttention,
    SANNodeSpectra,
    san_structure_laplacian,
)
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp


def _batch(n_graphs=4, max_freqs=6):
    graphs = zinc_categorical_dataset(seed=0, n_graphs=n_graphs)
    apply_laplace_decomp(graphs, max_freqs)
    return graphs, collate_graphs(graphs, max_nodes=32)


def test_laplace_decomp_contract():
    graphs, gb = _batch()
    g = graphs[0]
    n = g.num_nodes
    assert g.eigvecs.shape == (n, 6)
    assert not np.isnan(g.eigvecs).any()  # n > max_freqs here
    assert np.all(np.diff(g.eigvals) >= -1e-9)
    # batch collation NaN-pads beyond each graph's nodes
    assert np.isnan(gb.eigvecs[0, n:]).all()


def test_san_attention_matches_numpy():
    graphs, gb = _batch(n_graphs=2)
    mod = SANAttention(out_dim=4, num_heads=2, gamma=0.1, full_graph=True,
                       edge_features=False)
    h = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 8)).astype(np.float32)) * gb.node_mask[..., None]
    params = mod.init(jax.random.key(0), h, None, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask))
    out, attn, struct = mod.apply(params, h, None, jnp.asarray(gb.adj),
                                  jnp.asarray(gb.node_mask))
    out, attn = np.asarray(out), np.asarray(attn)

    p = params["params"]
    wq = np.asarray(p["Q"]["kernel"])
    wk = np.asarray(p["K"]["kernel"])
    wv = np.asarray(p["V"]["kernel"])
    wq2 = np.asarray(p["Q_2"]["kernel"])
    wk2 = np.asarray(p["K_2"]["kernel"])
    hnp = np.asarray(h)
    gamma = 0.1
    for b, g in enumerate(graphs):
        n = g.num_nodes
        real = np.zeros((n, n), bool)
        real[g.edge_index[0], g.edge_index[1]] = True
        for head in range(2):
            sl = slice(head * 4, (head + 1) * 4)
            q = hnp[b, :n] @ wq[:, sl]
            k = hnp[b, :n] @ wk[:, sl]
            v = hnp[b, :n] @ wv[:, sl]
            q2 = hnp[b, :n] @ wq2[:, sl]
            k2 = hnp[b, :n] @ wk2[:, sl]
            s_real = (q[:, None, :] * k[None, :, :]).sum(-1) / 2.0
            s_fake = (q2[:, None, :] * k2[None, :, :]).sum(-1) / 2.0
            w = np.where(real,
                         np.exp(np.clip(s_real, -5, 5)) / (gamma + 1),
                         gamma * np.exp(np.clip(s_fake, -5, 5)) / (gamma + 1))
            # the reference full graph has no self loops
            np.fill_diagonal(w, 0.0)
            ref_out = (w @ v) / (w.sum(-1, keepdims=True) + 1e-6)
            np.testing.assert_allclose(attn[b, head, :n, :n], w,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                out[b, :n, head * 4:(head + 1) * 4], ref_out,
                rtol=1e-3, atol=1e-4)


def test_structure_laplacian_clip():
    _, gb = _batch(n_graphs=2)
    lhat = np.asarray(san_structure_laplacian(
        jnp.asarray(gb.adj), jnp.asarray(gb.node_mask)))
    # zero diagonal, symmetric, zero on padding
    for b in range(2):
        np.testing.assert_allclose(np.diag(lhat[b]), 0.0)
        np.testing.assert_allclose(lhat[b], lhat[b].T, atol=1e-6)
    n0 = int(gb.node_mask[0].sum())
    assert np.all(lhat[0, n0:, :] == 0)


def test_san_node_spectra_end_to_end():
    graphs, gb = _batch()
    model = SANNodeSpectra(num_atom_type=28, num_bond_type=4,
                           hidden_dim=16, out_dim=16, n_heads=2,
                           n_layers=2, lpe_dim=4, lpe_heads=2, lpe_layers=1,
                           filter_order=3, batch_norm=True)
    variables = model.init(jax.random.key(0), gb)
    out = model.apply(variables, gb)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss_fn(v):
        pred = model.apply(v, gb, deterministic=True)
        return jnp.abs(pred.squeeze(-1) - gb.y).mean()

    grads = jax.grad(loss_fn)(variables)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # spectra params get gradient
    gsum = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gsum > 0


def test_san_trains_with_trainer():
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    graphs, gb = _batch(n_graphs=8)
    model = SANNodeSpectra(num_atom_type=28, num_bond_type=4,
                           hidden_dim=16, out_dim=16, n_heads=2,
                           n_layers=2, lpe_dim=4, lpe_heads=2, lpe_layers=1,
                           filter_order=2, batch_norm=True)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3, epochs=10,
                                    sign_flip=False))
    res = tr.fit([gb], val_batches=[gb])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
