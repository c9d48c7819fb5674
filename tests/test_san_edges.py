"""Edge-feature path of SAN attention vs numpy twin."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.san import SANAttention


def test_san_attention_edge_features_match_numpy():
    graphs = zinc_categorical_dataset(seed=3, n_graphs=2)
    gb = collate_graphs(graphs, max_nodes=32)
    rng = np.random.default_rng(1)
    d = 8
    h = jnp.asarray(rng.standard_normal((2, 32, d)).astype(np.float32)
                    * gb.node_mask[..., None])
    e_emb = jnp.asarray(rng.standard_normal((2, 32, 32, d))
                        .astype(np.float32))
    mod = SANAttention(out_dim=4, num_heads=2, gamma=0.2, full_graph=True,
                       edge_features=True)
    params = mod.init(jax.random.key(0), h, e_emb, jnp.asarray(gb.adj),
                      jnp.asarray(gb.node_mask))
    out, attn, _ = mod.apply(params, h, e_emb, jnp.asarray(gb.adj),
                             jnp.asarray(gb.node_mask))
    attn = np.asarray(attn)

    p = params["params"]
    get = lambda k: np.asarray(p[k]["kernel"])
    hnp, enp = np.asarray(h), np.asarray(e_emb)
    gamma = 0.2
    for b, g in enumerate(graphs):
        n = g.num_nodes
        real = np.zeros((n, n), bool)
        real[g.edge_index[0], g.edge_index[1]] = True
        for head in range(2):
            sl = slice(head * 4, (head + 1) * 4)
            q = hnp[b, :n] @ get("Q")[:, sl]
            k = hnp[b, :n] @ get("K")[:, sl]
            q2 = hnp[b, :n] @ get("Q_2")[:, sl]
            k2 = hnp[b, :n] @ get("K_2")[:, sl]
            er = enp[b, :n, :n] @ get("E")[:, sl]
            ef = enp[b, :n, :n] @ get("E_2")[:, sl]
            # edge j->i carries e[j, i]: score[i,j] = sum_d q_i k_j e[j,i]
            s_real = np.einsum("id,jd,jid->ij", q, k, er) / 2.0
            s_fake = np.einsum("id,jd,jid->ij", q2, k2, ef) / 2.0
            w = np.where(real,
                         np.exp(np.clip(s_real, -5, 5)) / (gamma + 1),
                         gamma * np.exp(np.clip(s_fake, -5, 5)) / (gamma + 1))
            np.fill_diagonal(w, 0.0)   # full graph has no self loops
            np.testing.assert_allclose(attn[b, head, :n, :n], w,
                                       rtol=1e-4, atol=1e-5)
