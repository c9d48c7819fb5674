"""PNA-LSPE tests: aggregation twins + net training."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.pna import (
    PNALSPENet,
    _aggregate,
    _scale,
    average_log_degree,
)
from feta_tmlr_tpu.pe.rwpe import rwpe


def test_aggregators_match_numpy():
    rng = np.random.default_rng(0)
    b, n, d = 2, 6, 3
    msg = rng.standard_normal((b, n, n, d)).astype(np.float32)
    mask = rng.random((b, n, n)) > 0.5
    deg = mask.sum(2).astype(np.float32)
    out = np.asarray(_aggregate(jnp.asarray(msg), jnp.asarray(mask),
                                jnp.asarray(deg),
                                ("mean", "max", "min", "std")))
    for bi in range(b):
        for i in range(n):
            sel = msg[bi, i][mask[bi, i]]
            if len(sel) == 0:
                ref = np.zeros((4 * d,))
            else:
                mean = sel.mean(0)
                var = np.maximum((sel * sel).mean(0) - mean * mean, 0)
                ref = np.concatenate([mean, sel.max(0), sel.min(0),
                                      np.sqrt(var + 1e-5)])
            np.testing.assert_allclose(out[bi, i], ref, rtol=1e-4,
                                       atol=1e-5)


def test_scalers():
    agg = jnp.ones((1, 3, 2))
    deg = jnp.asarray([[1.0, 3.0, 7.0]])
    out = np.asarray(_scale(agg, deg, ("identity", "amplification"),
                            avg_d_log=2.0))
    np.testing.assert_allclose(out[0, :, :2], 1.0)
    np.testing.assert_allclose(out[0, 1, 2:], np.log(4.0) / 2.0, rtol=1e-5)


def _edge_mlp_inputs(seed, de):
    rng = np.random.default_rng(seed)
    b, n, dx = 2, 7, 5
    x = jnp.asarray(rng.standard_normal((b, n, dx)).astype(np.float32))
    ef = (jnp.asarray(rng.standard_normal((b, n, n, de))
                      .astype(np.float32)) if de else None)
    return x, ef


def _legacy_edge_cat(x, ef):
    b, n, dx = x.shape
    parts = [jnp.broadcast_to(x[:, None, :, :], (b, n, n, dx)),
             jnp.broadcast_to(x[:, :, None, :], (b, n, n, dx))]
    if ef is not None:
        parts.append(jnp.swapaxes(ef, 1, 2))
    return jnp.concatenate(parts, axis=-1)


def test_edge_mlp_matches_materialized_concat():
    """_EdgeMLP(x, ef) == _MLP(edge_cat(x, ef)) on one shared param tree,
    for ef present/absent x pretrans_layers 1/2 (advisor round-3
    finding: the decomposed default had no equivalence test for the ef
    branch or the multi-layer MLP). allclose, not bit-identical — the
    split matmul groups its accumulations differently."""
    from feta_tmlr_tpu.nn.pna import _MLP, _EdgeMLP
    for de in (0, 3):
        for layers in (1, 2):
            x, ef = _edge_mlp_inputs(seed=10 * layers + de, de=de)
            dec = _EdgeMLP(hidden=6, out=4, layers=layers)
            params = dec.init(jax.random.key(layers + de), x, ef)
            ref = _MLP(hidden=6, out=4, layers=layers)
            out_dec = dec.apply(params, x, ef)
            out_ref = ref.apply(params, _legacy_edge_cat(x, ef))
            np.testing.assert_allclose(
                np.asarray(out_dec), np.asarray(out_ref),
                rtol=1e-5, atol=1e-6,
                err_msg=f"de={de} layers={layers}")


def test_edgecat_attribute_matches_decomposed():
    """The legacy edgecat=True net and the decomposed default produce
    the same outputs on one param tree (edge_feat on)."""
    graphs = zinc_categorical_dataset(seed=11, n_graphs=4)
    for g in graphs:
        g.lap_pe = rwpe(g, 6)
    gb = collate_graphs(graphs, max_nodes=32)
    mk = lambda edgecat: PNALSPENet(
        num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
        n_layers=2, pos_enc_dim=6, towers=2, avg_d_log=1.0,
        edge_feat=True, edge_dim=8, edgecat=edgecat)
    v = mk(False).init(jax.random.key(2), gb)
    out_dec = mk(False).apply(v, gb)
    out_leg = mk(True).apply(v, gb)
    np.testing.assert_allclose(np.asarray(out_dec), np.asarray(out_leg),
                               rtol=1e-5, atol=1e-6)


def test_pna_net_trains():
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    graphs = zinc_categorical_dataset(seed=7, n_graphs=8)
    for g in graphs:
        g.lap_pe = rwpe(g, 6)
    avg_log = average_log_degree(graphs)
    gb = collate_graphs(graphs, max_nodes=32)
    model = PNALSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=16,
                       out_dim=16, n_layers=2, pos_enc_dim=6, towers=2,
                       avg_d_log=avg_log)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3, epochs=8,
                                    sign_flip=False))
    res = tr.fit([gb], val_batches=[gb])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]


def test_pna_net_gru_variant():
    """gru=True threads h through a shared between-layer GRU step
    (pna_net.py:95-96,118-119); the net must build, differ from the
    gru-free output, and keep padded nodes masked."""
    import jax
    graphs = zinc_categorical_dataset(seed=9, n_graphs=4)
    for g in graphs:
        g.lap_pe = rwpe(g, 6)
    gb = collate_graphs(graphs, max_nodes=32)
    mk = lambda gru: PNALSPENet(
        num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
        n_layers=3, pos_enc_dim=6, towers=2, avg_d_log=1.0, gru=gru)
    m_gru, m_plain = mk(True), mk(False)
    v = m_gru.init(jax.random.key(0), gb)
    assert "gru" in v["params"]
    out = m_gru.apply(v, gb)
    assert np.all(np.isfinite(np.asarray(out)))
    # param trees differ (the GRU cell exists once, shared across layers)
    v2 = m_plain.init(jax.random.key(0), gb)
    assert "gru" not in v2["params"]
    # behavioral check: same layer weights WITHOUT the GRU step give a
    # different output — the GRU is not a pass-through
    shared = {c: (vs if c != "params" else
                  {k: p for k, p in vs.items() if k != "gru"})
              for c, vs in v.items()}
    out_plain = m_plain.apply(shared, gb)
    assert not np.allclose(np.asarray(out), np.asarray(out_plain),
                           atol=1e-5)
