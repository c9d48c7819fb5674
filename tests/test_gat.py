"""GAT-FeTA tier tests."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.gat import DenseGATConv, GATFeTANet


def _batch(n_graphs=4):
    graphs = zinc_categorical_dataset(seed=5, n_graphs=n_graphs)
    return graphs, collate_graphs(graphs, max_nodes=32)


def test_dense_gat_matches_numpy():
    graphs, gb = _batch(2)
    rng = np.random.default_rng(0)
    d_in, dh, hh = 6, 4, 2
    h = jnp.asarray(rng.standard_normal((2, 32, d_in)).astype(np.float32)
                    * gb.node_mask[..., None])
    mod = DenseGATConv(dh, hh)
    params = mod.init(jax.random.key(0), h, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask))
    out, attn = mod.apply(params, h, jnp.asarray(gb.adj),
                          jnp.asarray(gb.node_mask))
    out, attn = np.asarray(out), np.asarray(attn)
    w = np.asarray(params["params"]["fc"]["kernel"])
    al = np.asarray(params["params"]["attn_l"])
    ar = np.asarray(params["params"]["attn_r"])
    hnp = np.asarray(h)
    for b, g in enumerate(graphs):
        n = g.num_nodes
        real = np.zeros((n, n), bool)
        real[g.edge_index[0], g.edge_index[1]] = True
        for head in range(hh):
            sl = slice(head * dh, (head + 1) * dh)
            f = hnp[b, :n] @ w[:, sl]
            el = f @ al[head]
            er = f @ ar[head]
            sc = el[None, :] + er[:, None]           # [dst i, src j]
            sc = np.where(sc > 0, sc, 0.2 * sc)
            sc = np.where(real, sc, -1e30)
            a = np.exp(sc - sc.max(-1, keepdims=True))
            a = a / a.sum(-1, keepdims=True)
            a = a * real
            # rows with no in-edges -> softmax of all -1e30 is uniform but
            # zeroed by the real mask, matching dense impl
            ref = a @ f
            np.testing.assert_allclose(attn[b, head, :n, :n], a, atol=1e-5)
            np.testing.assert_allclose(out[b, :n, head], ref,
                                       rtol=1e-4, atol=1e-4)


def test_gat_feta_net_trains():
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    _, gb = _batch(8)
    model = GATFeTANet(num_atom_type=28, hidden_dim=8, out_dim=16,
                       num_heads=2, n_layers=2, filter_order=2,
                       batch_norm=True, residual=True)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3, epochs=8,
                                    sign_flip=False))
    res = tr.fit([gb], val_batches=[gb])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
