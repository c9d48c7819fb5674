"""Tier-3 (GatedGCN-LSPE) parity: JAX GatedGCNLSPENet (sparse-COO path)
vs the pure-torch twin (reference_twin/torch_gatedgcn.py) — logit parity
with shared weights in training mode (masked BN batch statistics)."""

import numpy as np
import jax
import torch

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.gatedgcn import GatedGCNLSPENet
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.reference_twin.torch_gatedgcn import TorchGatedGCNLSPENet

HID, OUT, LAYERS, PE = 16, 16, 3, 8


def _data(n_graphs=6, seed=0):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n_graphs)
    for g in graphs:
        g.lap_pe = rwpe(g, PE)
    return collate_graphs(graphs, max_nodes=32, with_coo=True)


def lin(tlin, node, bias=True):
    tlin.weight.data = torch.from_numpy(np.asarray(node["kernel"]).T.copy())
    if bias and "bias" in node:
        tlin.bias.data = torch.from_numpy(np.asarray(node["bias"]).copy())


def bn(tbn, node):
    tbn.scale.data = torch.from_numpy(np.asarray(node["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(node["bias"]).copy())


def _transfer(params, tm):
    p = params["params"]
    tm.embedding_h.weight.data = torch.from_numpy(
        np.asarray(p["embedding_h"]["embedding"]).copy())
    tm.embedding_e.weight.data = torch.from_numpy(
        np.asarray(p["embedding_e"]["embedding"]).copy())
    lin(tm.embedding_p, p["embedding_p"])
    for i, lay in enumerate(tm.layers):
        jl = p[f"layer_{i}"]
        for name in ("A1", "A2", "B1", "B2", "B3", "C1", "C2"):
            lin(getattr(lay, name), jl[name])
        bn(lay.bn_h, jl["bn_node_h"])
        bn(lay.bn_e, jl["bn_node_e"])
    lin(tm.p_out, p["p_out"])
    lin(tm.Whp, p["Whp"])
    ro = p["mlp_readout"]
    lin(tm.readout[0], ro["fc_0"])
    lin(tm.readout[1], ro["fc_1"])
    lin(tm.fc_out, ro["fc_out"])


def test_gatedgcn_logit_parity_training_mode():
    gb = _data()
    jm = GatedGCNLSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=HID,
                         out_dim=OUT, n_layers=LAYERS, pos_enc_dim=PE,
                         n_out=1)
    variables = jm.init(jax.random.key(0), gb)
    jlogits, _ = jm.apply(variables, gb, deterministic=False,
                          mutable=["batch_stats"])
    jlogits = np.asarray(jlogits)

    tm = TorchGatedGCNLSPENet(num_atom_type=28, num_bond_type=4,
                              hidden_dim=HID, out_dim=OUT, n_layers=LAYERS,
                              pos_enc_dim=PE, n_out=1)
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
