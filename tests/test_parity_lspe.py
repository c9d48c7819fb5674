"""Tier-3 (LSPE) parity: JAX GraphiTSpectraNet vs the pure-torch twin
(reference_twin/torch_lspe.py) — shared-weight logit parity and lockstep
AdamW training-trajectory parity (rand_walk PE, LayerNorm config)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.reference_twin.torch_lspe import TorchGraphiTSpectraNet

HID, OUT, HEADS, LAYERS, K, POS = 16, 16, 2, 2, 3, 6


def _data(n_graphs=6, seed=0):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n_graphs)
    for g in graphs:
        g.lap_pe = rwpe(g, POS)
    return collate_graphs(graphs, max_nodes=32)


def _models():
    jm = GraphiTSpectraNet(
        num_atom_type=28, num_bond_type=4, hidden_dim=HID, out_dim=OUT,
        n_heads=HEADS, n_layers=LAYERS, pos_enc_dim=POS,
        pe_init="rand_walk", dropout=0.0, in_feat_dropout=0.0,
        layer_norm=True, batch_norm=False, filter_order=K, n_out=1)
    tm = TorchGraphiTSpectraNet(
        num_atom_type=28, num_bond_type=4, hidden_dim=HID, out_dim=OUT,
        n_heads=HEADS, n_layers=LAYERS, pos_enc_dim=POS, filter_order=K,
        n_out=1)
    return jm, tm


def _transfer(params, tm):
    p = params["params"]

    def lin(tlin, node, bias=True):
        tlin.weight.data = torch.from_numpy(
            np.asarray(node["kernel"]).T.copy())
        if bias and "bias" in node:
            tlin.bias.data = torch.from_numpy(
                np.asarray(node["bias"]).copy())

    def ln(tln, node):
        tln.weight.data = torch.from_numpy(
            np.asarray(node["scale"]).copy())
        tln.bias.data = torch.from_numpy(np.asarray(node["bias"]).copy())

    tm.embedding_h.weight.data = torch.from_numpy(
        np.asarray(p["embedding_h"]["embedding"]).copy())
    tm.embedding_e.weight.data = torch.from_numpy(
        np.asarray(p["embedding_e"]["embedding"]).copy())
    lin(tm.embedding_p, p["embedding_p"])

    for i, lay in enumerate(tm.layers):
        jl = p[f"layer_{i}"]
        for att_t, att_j in ((lay.attention_h, jl["attention_h"]),
                             (lay.attention_p, jl["attention_p"])):
            for tname, jname in (("Q", "Q"), ("K", "K"), ("V", "V"),
                                 ("Q2", "Q_2"), ("K2", "K_2"),
                                 ("E", "E"), ("E2", "E_2")):
                lin(getattr(att_t, tname), att_j[jname], bias=False)
        ch = jl["coeff_head"]
        lin(lay.gcn_linear, ch["gcn_linear"])
        lin(lay.ffn_filter_coeff, ch["ffn_filter_coeff"])
        lay.cheb_weight.data = torch.from_numpy(
            np.asarray(jl["cheb_weight"]).copy())
        lay.cheb_bias.data = torch.from_numpy(
            np.asarray(jl["cheb_bias"]).copy())
        lin(lay.filt_linear, jl["filt_linear"])
        lin(lay.O_h, jl["O_h"])
        lin(lay.O_p, jl["O_p"])
        lin(lay.ffn1, jl["ffn1"])
        lin(lay.ffn2, jl["ffn2"])
        ln(lay.norm1, jl["ln_norm1"])
        ln(lay.norm2, jl["ln_norm2"])

    lin(tm.p_out, p["p_out"])
    lin(tm.Whp, p["Whp"])
    ro = p["mlp_readout"]
    lin(tm.readout[0], ro["fc_0"])
    lin(tm.readout[1], ro["fc_1"])
    lin(tm.fc_out, ro["fc_out"])


def _torch_inputs(gb):
    return (torch.from_numpy(np.asarray(gb.x)).long(),
            torch.from_numpy(np.asarray(gb.edge_type)).long(),
            torch.from_numpy(np.asarray(gb.adj)),
            torch.from_numpy(np.asarray(gb.node_mask)),
            torch.from_numpy(np.asarray(gb.lap_pe)))


def test_lspe_logit_parity():
    gb = _data()
    jm, tm = _models()
    params = jm.init(jax.random.key(0), gb)
    jlogits = np.asarray(jm.apply(params, gb))
    _transfer(params, tm)
    tm.eval()
    with torch.no_grad():
        tlogits = tm(*_torch_inputs(gb)).numpy()
    np.testing.assert_allclose(tlogits, jlogits.reshape(tlogits.shape),
                               rtol=2e-4, atol=2e-5)


def test_lspe_training_trajectory_parity():
    gb = _data(seed=5)
    y = np.asarray(gb.y, np.float32).reshape(-1)
    jm, tm = _models()
    params = jm.init(jax.random.key(0), gb)
    _transfer(params, tm)

    import optax
    opt = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    ostate = opt.init(params)

    @jax.jit
    def step(params, ostate):
        def loss_fn(p):
            out = jm.apply(p, gb)
            return jnp.abs(out.reshape(-1) - y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, ostate = opt.update(grads, ostate, params)
        return optax.apply_updates(params, updates), ostate, loss

    topt = torch.optim.AdamW(tm.parameters(), lr=1e-3, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=0.0)
    tinp = _torch_inputs(gb)
    ty = torch.from_numpy(y)
    tm.train()
    for i in range(6):
        params, ostate, jloss = step(params, ostate)
        topt.zero_grad()
        tloss = torch.abs(tm(*tinp).reshape(-1) - ty).mean()
        tloss.backward()
        topt.step()
        np.testing.assert_allclose(float(tloss.detach()), float(jloss),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"step {i}")
