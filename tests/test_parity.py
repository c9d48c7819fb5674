"""Activation parity: JAX models vs the pure-torch FeTA twin.

The environment lacks torch_geometric/DGL so the actual reference cannot run;
the torch twin (feta_tmlr_tpu/reference_twin) re-expresses the reference's
documented semantics in plain torch. Loading identical weights into both
stacks and comparing logits end-to-end validates every layer in between
(embedding, kernel-modulated attention, coefficient GCN, dynamic Chebyshev
filter, fusion, pooling, classifier).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.reference_twin.torch_model import TorchFeTA

D_MODEL, HEADS, LAYERS, K = 32, 4, 2, 3


def _params_to_torch(params, tmodel):
    """Copy flax params into the torch twin (kernel -> weight.T)."""
    p = params["params"]

    def set_linear(tlin, node, bias=True):
        tlin.weight.data = torch.from_numpy(
            np.asarray(node["kernel"]).T.copy())
        if bias:
            tlin.bias.data = torch.from_numpy(np.asarray(node["bias"]))

    set_linear(tmodel.embedding, p["embedding"], bias=False)
    set_linear(tmodel.embedding_lap, p["embedding_lap_pos_enc"])
    enc = p["encoder"]
    for i in range(LAYERS):
        lay = enc[f"layer_{i}"]
        tl = tmodel.layers[i]
        # qkv is stored as raw kernel/bias leaves (MXU-friendly scores path)
        tl.qkv.weight.data = torch.from_numpy(
            np.asarray(lay["qkv"]).T.copy())
        tl.qkv.bias.data = torch.from_numpy(
            np.asarray(lay["qkv_bias"]).copy())
        tl.out_proj.weight.data = torch.from_numpy(
            np.asarray(lay["out_proj_kernel"]).T.copy())
        tl.out_proj.bias.data = torch.from_numpy(
            np.asarray(lay["out_proj_bias"]).copy())
        set_linear(tl.ff1, lay["ff1"])
        set_linear(tl.ff2, lay["ff2"])
        for nm, tn in (("norm1", tl.norm1), ("norm2", tl.norm2)):
            tn.weight.data = torch.from_numpy(np.asarray(lay[nm]["scale"]))
            tn.bias.data = torch.from_numpy(np.asarray(lay[nm]["bias"]))
    ch = enc["coeff_head"]
    tmodel.coeff_gcn.weight.data = torch.from_numpy(
        np.asarray(ch["gcn_kernel"]).T.copy())
    tmodel.coeff_gcn.bias.data = torch.from_numpy(
        np.asarray(ch["gcn_bias"]))
    set_linear(tmodel.coeff_linear, ch["coeff_linear"])
    tmodel.cheb_bias.data = torch.from_numpy(np.asarray(enc["cheb_bias"]))
    set_linear(tmodel.linear_cat, enc["linear_cat"])
    cls = p["classifier"]
    set_linear(tmodel.classifier[0], cls["fc1"])
    set_linear(tmodel.classifier[2], cls["fc2"])


def test_logit_parity_jax_vs_torch_twin():
    graphs = random_graph_dataset(seed=11, n_graphs=6, min_nodes=5,
                                  max_nodes=13, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    gb = collate_graphs(graphs, max_nodes=16)

    jmodel = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=D_MODEL, nb_heads=HEADS,
        dim_feedforward=2 * D_MODEL, dropout=0.0, nb_layers=LAYERS,
        batch_norm=False, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=K)
    params = jmodel.init(jax.random.key(3), gb)
    jlogits, _ = jmodel.apply(params, gb)

    tmodel = TorchFeTA(
        in_size=7, nb_class=2, d_model=D_MODEL, nb_heads=HEADS,
        dim_feedforward=2 * D_MODEL, nb_layers=LAYERS, filter_order=K,
        batch_norm=False, lap_pos_enc=True, lap_pos_enc_dim=4)
    _params_to_torch(params, tmodel)
    tmodel.eval()
    with torch.no_grad():
        tlogits = tmodel(
            torch.from_numpy(gb.x), torch.from_numpy(gb.adj),
            torch.from_numpy(gb.node_mask.astype(np.float32)),
            pe=torch.from_numpy(gb.pe),
            lap_pe=torch.from_numpy(gb.lap_pe),
            degree=torch.from_numpy(gb.degree))

    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), rtol=1e-4, atol=1e-5)
