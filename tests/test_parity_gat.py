"""Tier-2 (GATFeTA) parity: JAX GATFeTANet vs the pure-torch twin
(reference_twin/torch_gat.py) — logit parity with shared weights in
training mode."""

import numpy as np
import jax
import torch

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.gat import GATFeTANet
from feta_tmlr_tpu.reference_twin.torch_gat import TorchGATFeTANet
from tests.test_parity_gatedgcn import bn, lin

HID, OUT, HEADS, LAYERS, K = 6, 12, 4, 3, 3


def test_gat_feta_logit_parity_training_mode():
    graphs = zinc_categorical_dataset(seed=0, n_graphs=6)
    gb = collate_graphs(graphs, max_nodes=32)
    jm = GATFeTANet(num_atom_type=28, hidden_dim=HID, out_dim=OUT,
                    num_heads=HEADS, n_layers=LAYERS, batch_norm=True,
                    residual=True, filter_order=K, n_out=1)
    variables = jm.init(jax.random.key(0), gb)
    jlogits, _ = jm.apply(variables, gb, deterministic=False,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)})
    jlogits = np.asarray(jlogits)

    tm = TorchGATFeTANet(num_atom_type=28, hidden_dim=HID, out_dim=OUT,
                         num_heads=HEADS, n_layers=LAYERS, filter_order=K,
                         n_out=1)
    p = variables["params"]
    tm.embedding_h.weight.data = torch.from_numpy(
        np.asarray(p["embedding_h"]["embedding"]).copy())
    for i, lay in enumerate(tm.layers):
        jl = p[f"layer_{i}"]
        gc = jl["gatconv"]
        lin(lay.fc, gc["fc"], bias=False)
        lay.attn_l.data = torch.from_numpy(np.asarray(gc["attn_l"]).copy())
        lay.attn_r.data = torch.from_numpy(np.asarray(gc["attn_r"]).copy())
        ch = jl["coeff_head"]
        lin(lay.gcn_linear, ch["gcn_linear"])
        lin(lay.ffn_filter_coeff, ch["ffn_filter_coeff"])
        lay.cheb_weight.data = torch.from_numpy(
            np.asarray(jl["cheb_weight"]).copy())
        lay.cheb_bias.data = torch.from_numpy(
            np.asarray(jl["cheb_bias"]).copy())
        lin(lay.filt_linear, jl["filt_linear"])
        bn(lay.bn_h, jl["batchnorm_h"])
    ro = p["mlp_readout"]
    lin(tm.readout[0], ro["fc_0"])
    lin(tm.readout[1], ro["fc_1"])
    lin(tm.fc_out, ro["fc_out"])

    tm.train()
    with torch.no_grad():
        tlogits = tm(torch.from_numpy(np.asarray(gb.x)).long(),
                     torch.from_numpy(np.asarray(gb.adj)),
                     torch.from_numpy(np.asarray(gb.node_mask))).numpy()
    np.testing.assert_allclose(tlogits, jlogits.reshape(tlogits.shape),
                               rtol=2e-4, atol=2e-5)
