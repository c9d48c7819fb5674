"""Sparse-COO PNA-LSPE path vs the dense mailbox path.

Same parameters, same math over real in-edges only: sums/means/std via
one-hot matmuls, max/min via the host-built in-edge incidence table
(GraphBatch.in_edges). Outputs and grads agree with the dense masked
formulation to float-reassociation tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.pna import PNALSPENet, average_log_degree
from feta_tmlr_tpu.pe.rwpe import rwpe


def _batch(seed=0, n=8):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n)
    for g in graphs:
        g.lap_pe = rwpe(g, 8)
    avg = average_log_degree(graphs)
    return collate_graphs(graphs, max_nodes=32, with_coo=True), avg


@pytest.mark.parametrize("edge_feat,pretrans", [(False, 1), (True, 1),
                                                (True, 2)])
def test_pna_sparse_matches_dense(edge_feat, pretrans):
    batch, avg = _batch()
    kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=20, out_dim=20,
              n_layers=2, pos_enc_dim=8, towers=2, avg_d_log=avg, n_out=1,
              edge_feat=edge_feat, edge_dim=12 if edge_feat else 0,
              pretrans_layers=pretrans)
    m_sparse = PNALSPENet(sparse_edges=True, **kw)
    m_dense = PNALSPENet(sparse_edges=False, **kw)
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


def test_pna_sparse_gru_variant_runs():
    batch, avg = _batch(seed=1)
    model = PNALSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=20,
                       out_dim=20, n_layers=2, pos_enc_dim=8, towers=2,
                       avg_d_log=avg, n_out=1, gru=True)
    params = model.init(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(np.asarray(out)).all()


def test_incidence_table_matches_segment_max():
    """GraphBatch.in_edges (host-built) against a numpy per-dst max."""
    batch, _ = _batch(seed=2, n=4)
    dst = np.asarray(batch.edge_index[:, 1])
    emask = np.asarray(batch.edge_mask)
    rng = np.random.default_rng(0)
    msg = rng.standard_normal(emask.shape + (5,)).astype(np.float32)
    from feta_tmlr_tpu.ops.sparse_agg import incidence_max, \
        make_sparse_edges
    edges = make_sparse_edges(batch, with_incidence=True)
    got = np.asarray(incidence_max(jnp.asarray(msg), edges))
    for b in range(emask.shape[0]):
        for i in range(batch.node_mask.shape[1]):
            sel = (dst[b] == i) & emask[b]
            want = msg[b][sel].max(0) if sel.any() else np.zeros(5)
            np.testing.assert_allclose(got[b, i], want, rtol=1e-6)


def test_vmapped_towers_match_tower_loop():
    """nn.vmap'd towers (stacked params under scope 'towers') against the
    per-tower loop (scopes tower_0..T-1) with the SAME weights: stack the
    loop variant's per-tower leaves and compare outputs."""
    import jax.tree_util as jtu

    batch, avg = _batch(seed=4)
    kw = dict(num_atom_type=28, num_bond_type=4, hidden_dim=20, out_dim=20,
              n_layers=2, pos_enc_dim=8, towers=2, avg_d_log=avg, n_out=1,
              edge_feat=True, edge_dim=12)
    m_loop = PNALSPENet(vmap_towers=False, **kw)
    m_vmap = PNALSPENet(vmap_towers=True, **kw)
    p_loop = m_loop.init(jax.random.key(0), batch)
    p_vmap = jax.tree_util.tree_map(lambda x: x,
                                    m_vmap.init(jax.random.key(0), batch))

    # graft the loop variant's weights into the stacked layout
    def graft(tree):
        out = jax.device_get(p_vmap)
        for col in out:                              # params / batch_stats
            if col not in tree:
                continue
            for lname, lval in tree[col].items():
                if not lname.startswith("layer_"):
                    out[col][lname] = lval
                    continue
                dst = out[col][lname]
                towers = [lval[f"tower_{t}"] for t in range(2)]
                stacked = jtu.tree_map(
                    lambda *xs: jnp.stack(xs, 0), *towers)
                dst["towers"] = stacked
                for k, v in lval.items():
                    if not k.startswith("tower_"):
                        dst[k] = v
        return out

    import flax
    grafted = graft(flax.core.unfreeze(p_loop))
    out_loop = m_loop.apply(p_loop, batch)
    out_vmap = m_vmap.apply(grafted, batch)
    np.testing.assert_allclose(np.asarray(out_vmap), np.asarray(out_loop),
                               rtol=1e-4, atol=1e-5)
