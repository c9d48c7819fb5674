"""Tier-2 (SAN/LPE) parity: JAX SANNodeSpectra vs the pure-torch twin
(reference_twin/torch_san.py) — logit parity with shared weights and
lockstep AdamW training-trajectory parity."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.san import SANNodeSpectra
from feta_tmlr_tpu.pe.laplace import laplace_decomp
from feta_tmlr_tpu.reference_twin.torch_san import TorchSANNodeSpectra

HID, OUT, HEADS, LAYERS, K = 16, 16, 2, 2, 3
LPE_DIM, LPE_HEADS, LPE_LAYERS = 8, 2, 1
MAX_FREQS = 5


def _data(n_graphs=6, seed=0):
    graphs = zinc_categorical_dataset(seed=seed, n_graphs=n_graphs)
    for g in graphs:
        laplace_decomp(g, MAX_FREQS)
    return collate_graphs(graphs, max_nodes=32)


def _models():
    jm = SANNodeSpectra(
        num_atom_type=28, num_bond_type=4, hidden_dim=HID, out_dim=OUT,
        n_heads=HEADS, n_layers=LAYERS, lpe_dim=LPE_DIM,
        lpe_heads=LPE_HEADS, lpe_layers=LPE_LAYERS, gamma=0.1,
        dropout=0.0, in_feat_dropout=0.0, layer_norm=True,
        batch_norm=False, filter_order=K, n_out=1)
    tm = TorchSANNodeSpectra(
        num_atom_type=28, num_bond_type=4, hidden_dim=HID, out_dim=OUT,
        n_heads=HEADS, n_layers=LAYERS, lpe_dim=LPE_DIM,
        lpe_heads=LPE_HEADS, lpe_layers=LPE_LAYERS, gamma=0.1,
        filter_order=K, n_out=1, lpe_ff_dim=2048)  # flax FreqTransformer
    return jm, tm                                  # default ff_dim=2048


def _transfer(params, tm):
    p = params["params"]

    def lin(tlin, node, bias=True):
        tlin.weight.data = torch.from_numpy(
            np.asarray(node["kernel"]).T.copy())
        if bias and "bias" in node:
            tlin.bias.data = torch.from_numpy(
                np.asarray(node["bias"]).copy())

    def ln(tln, node):
        tln.weight.data = torch.from_numpy(np.asarray(node["scale"]))
        tln.bias.data = torch.from_numpy(np.asarray(node["bias"]))

    tm.embedding_h.weight.data = torch.from_numpy(
        np.asarray(p["embedding_h"]["embedding"]).copy())
    tm.embedding_e.weight.data = torch.from_numpy(
        np.asarray(p["embedding_e"]["embedding"]).copy())

    pe = p["pe_transformer"]["freq_transformer"]
    lin(tm.pe.linear_A, pe["linear_A"])
    for i, lay in enumerate(tm.pe.layers):
        lin(lay.qkv, pe[f"qkv_{i}"])
        lin(lay.proj, pe[f"proj_{i}"])
        lin(lay.ff1, pe[f"ff1_{i}"])
        lin(lay.ff2, pe[f"ff2_{i}"])
        ln(lay.n1, pe[f"n1_{i}"])
        ln(lay.n2, pe[f"n2_{i}"])

    for i, lay in enumerate(tm.layers):
        jl = p[f"layer_{i}"]
        att = jl["attention"]
        for tname, jname in (("Q", "Q"), ("K", "K"), ("V", "V"),
                             ("Q2", "Q_2"), ("K2", "K_2"),
                             ("E", "E"), ("E2", "E_2")):
            lin(getattr(lay, tname), att[jname], bias=False)
        ch = jl["coeff_head"]
        lin(lay.gcn_linear, ch["gcn_linear"])
        lin(lay.ffn_filter_coeff, ch["ffn_filter_coeff"])
        lay.cheb_weight.data = torch.from_numpy(
            np.asarray(jl["cheb_weight"]).copy())
        lay.cheb_bias.data = torch.from_numpy(
            np.asarray(jl["cheb_bias"]).copy())
        lin(lay.filt_linear, jl["filt_linear"])
        lin(lay.O_h, jl["O_h"])
        lin(lay.ffn1, jl["ffn1"])
        lin(lay.ffn2, jl["ffn2"])
        ln(lay.norm1, jl["ln_norm1"])
        ln(lay.norm2, jl["ln_norm2"])

    ro = p["mlp_readout"]
    lin(tm.readout[0], ro["fc_0"])
    lin(tm.readout[1], ro["fc_1"])
    lin(tm.fc_out, ro["fc_out"])


def _torch_inputs(gb):
    return (torch.from_numpy(np.asarray(gb.x)).long(),
            torch.from_numpy(np.asarray(gb.edge_type)).long(),
            torch.from_numpy(np.asarray(gb.adj)),
            torch.from_numpy(np.asarray(gb.node_mask)),
            torch.from_numpy(np.asarray(gb.eigvecs)),
            torch.from_numpy(np.asarray(gb.eigvals)))


def test_san_logit_parity():
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


def test_san_training_trajectory_parity():
    gb = _data(seed=3)
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
        tout = tm(*tinp)
        tloss = torch.abs(tout.reshape(-1) - ty).mean()
        tloss.backward()
        topt.step()
        np.testing.assert_allclose(float(tloss), float(jloss),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"step {i}")
