"""GatedGCN-LSPE tests: layer vs numpy twin, net forward, lapeig loss."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.gatedgcn import (
    GatedGCNLSPELayer,
    GatedGCNLSPENet,
    lapeig_loss,
)
from feta_tmlr_tpu.pe.rwpe import rwpe


def _batch(n_graphs=3):
    graphs = zinc_categorical_dataset(seed=6, n_graphs=n_graphs)
    for g in graphs:
        g.lap_pe = rwpe(g, 6)
    return graphs, collate_graphs(graphs, max_nodes=32)


def test_gatedgcn_layer_matches_numpy():
    graphs, gb = _batch(2)
    rng = np.random.default_rng(0)
    d = 6
    b, n = gb.node_mask.shape
    h = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32)
                    * gb.node_mask[..., None])
    p = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32)
                    * gb.node_mask[..., None])
    e = jnp.asarray(rng.standard_normal((b, n, n, d)).astype(np.float32))
    snorm = jnp.asarray(gb.node_mask.astype(np.float32))
    mod = GatedGCNLSPELayer(output_dim=d, batch_norm=False, residual=False)
    params = mod.init(jax.random.key(0), h, p, e, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask), snorm)
    h2, p2, e2 = mod.apply(params, h, p, e, jnp.asarray(gb.adj),
                           jnp.asarray(gb.node_mask), snorm)
    pp = params["params"]

    def lin(name, x):
        return x @ np.asarray(pp[name]["kernel"]) + np.asarray(
            pp[name]["bias"])

    hn, pn, en = (np.asarray(t) for t in (h, p, e))
    for bi, g in enumerate(graphs):
        m = g.num_nodes
        real = np.zeros((n, n))
        real[g.edge_index[0], g.edge_index[1]] = 1.0
        hp = np.concatenate([hn[bi], pn[bi]], -1)
        a1, a2 = lin("A1", hp), lin("A2", hp)
        b1, b2, b3 = lin("B1", hn[bi]), lin("B2", hn[bi]), lin("B3", en[bi])
        c1, c2 = lin("C1", pn[bi]), lin("C2", pn[bi])
        # hat_eta[i,j] = B1 h_j + B2 h_i + B3 e_ji(src j, dst i)
        hat = b1[None, :, :] + b2[:, None, :] + b3.transpose(1, 0, 2)
        sig = (1 / (1 + np.exp(-hat))) * real.T[:, :, None]
        eta = sig / (sig.sum(1, keepdims=True) + 1e-6)
        h_ref = np.maximum(a1 + np.einsum("ijd,jd->id", eta, a2), 0)
        p_ref = np.tanh(c1 + np.einsum("ijd,jd->id", eta, c2))
        np.testing.assert_allclose(np.asarray(h2)[bi, :m], h_ref[:m],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(p2)[bi, :m], p_ref[:m],
                                   rtol=1e-4, atol=1e-4)


def test_gatedgcn_net_and_lapeig():
    graphs, gb = _batch(4)
    model = GatedGCNLSPENet(num_atom_type=28, num_bond_type=4,
                            hidden_dim=16, out_dim=16, n_layers=2,
                            pos_enc_dim=6, use_lapeig_loss=True)
    variables = model.init(jax.random.key(0), gb)
    out, aux = model.apply(variables, gb)
    assert out.shape == (4, 1)
    # aux is the pre-weighted scalar alpha * lapeig_loss, trainer-addable
    assert jnp.shape(aux) == () and np.isfinite(float(aux))
    p = jax.random.normal(jax.random.key(1), gb.adj.shape[:2] + (6,))
    ll = lapeig_loss(p, jnp.asarray(gb.adj), jnp.asarray(gb.node_mask),
                     6, lambda_loss=1.0)
    assert np.isfinite(float(ll))

    def loss_fn(v):
        o, aux_v = model.apply(v, gb)
        task = jnp.abs(o.squeeze(-1) - gb.y).mean()
        return task + aux_v

    grads = jax.grad(loss_fn)(variables)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
