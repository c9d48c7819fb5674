"""Tier-3 (PNA-LSPE) parity: JAX PNALSPENet (sparse-COO towers) vs the
pure-torch twin (reference_twin/torch_pna.py) — logit parity with shared
weights in training mode."""

import numpy as np
import jax
import torch

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.pna import PNALSPENet, average_log_degree
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.reference_twin.torch_pna import TorchPNALSPENet
from tests.test_parity_gatedgcn import bn, lin

HID, OUT, LAYERS, PE, TOWERS, EDGE_DIM = 16, 16, 2, 8, 2, 12


def _data(n_graphs=6, seed=0):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n_graphs)
    for g in graphs:
        g.lap_pe = rwpe(g, PE)
    return collate_graphs(graphs, max_nodes=32, with_coo=True), \
        average_log_degree(graphs)


def _transfer(params, tm):
    p = params["params"]
    tm.embedding_h.weight.data = torch.from_numpy(
        np.asarray(p["embedding_h"]["embedding"]).copy())
    tm.embedding_e.weight.data = torch.from_numpy(
        np.asarray(p["embedding_e"]["embedding"]).copy())
    lin(tm.embedding_p, p["embedding_p"])
    for i, lay in enumerate(tm.layers):
        jl = p[f"layer_{i}"]
        for t, tower in enumerate(lay.tower_mods):
            jt = jl[f"tower_{t}"]
            lin(tower.pretrans_h.fc_out, jt["pretrans_h"]["fc_out"])
            lin(tower.pretrans_p.fc_out, jt["pretrans_p"]["fc_out"])
            lin(tower.posttrans_h.fc_out, jt["posttrans_h"]["fc_out"])
            lin(tower.posttrans_p.fc_out, jt["posttrans_p"]["fc_out"])
            bn(tower.bn_h, jt["batchnorm_h"])
        lin(lay.mixing_h, jl["mixing_h"])
        lin(lay.mixing_p, jl["mixing_p"])
    lin(tm.p_out, p["p_out"])
    lin(tm.Whp, p["Whp"])
    ro = p["mlp_readout"]
    lin(tm.readout[0], ro["fc_0"])
    lin(tm.readout[1], ro["fc_1"])
    lin(tm.fc_out, ro["fc_out"])


def test_pna_logit_parity_training_mode():
    gb, avg = _data()
    # per-tower scopes (vmap_towers=False) so the transfer below can walk
    # tower_0..T-1 like the twin's ModuleList
    jm = PNALSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=HID,
                    out_dim=OUT, n_layers=LAYERS, pos_enc_dim=PE,
                    towers=TOWERS, avg_d_log=avg, n_out=1, edge_feat=True,
                    edge_dim=EDGE_DIM, readout="sum", vmap_towers=False)
    variables = jm.init(jax.random.key(0), gb)
    jlogits, _ = jm.apply(variables, gb, deterministic=False,
                          mutable=["batch_stats"])
    jlogits = np.asarray(jlogits)

    tm = TorchPNALSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=HID,
                         out_dim=OUT, n_layers=LAYERS, pos_enc_dim=PE,
                         towers=TOWERS, avg_d_log=avg, n_out=1,
                         edge_feat=True, edge_dim=EDGE_DIM, readout="sum")
    _transfer(variables, tm)
    tm.train()
    with torch.no_grad():
        tlogits = tm(torch.from_numpy(np.asarray(gb.x)).long(),
                     torch.from_numpy(np.asarray(gb.edge_type)).long(),
                     torch.from_numpy(np.asarray(gb.adj)),
                     torch.from_numpy(np.asarray(gb.node_mask)),
                     torch.from_numpy(np.asarray(gb.lap_pe))).numpy()
    np.testing.assert_allclose(tlogits, jlogits.reshape(tlogits.shape),
                               rtol=2e-4, atol=2e-5)
