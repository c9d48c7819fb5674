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
    if "cheb_bias" in enc:   # absent in ARMA mode
        tmodel.cheb_bias.data = torch.from_numpy(
            np.asarray(enc["cheb_bias"]))
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


def _prep_batch(seed=11):
    graphs = random_graph_dataset(seed=seed, n_graphs=6, min_nodes=5,
                                  max_nodes=13, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    return graphs, collate_graphs(graphs, max_nodes=16)


def _build_pair(batch, gnn_type="ChebConvDynamic", scalar=False,
                batch_norm=False, nb_class=2):
    """Init the JAX model, build the torch twin, load identical weights."""
    jmodel = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=nb_class, d_model=D_MODEL, nb_heads=HEADS,
        dim_feedforward=2 * D_MODEL, dropout=0.0, nb_layers=LAYERS,
        batch_norm=batch_norm, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=K, gnn_type=gnn_type,
        learn_only_filter_order_coeff=scalar)
    params = jmodel.init(jax.random.key(3), batch)
    tmodel = TorchFeTA(
        in_size=7, nb_class=nb_class, d_model=D_MODEL, nb_heads=HEADS,
        dim_feedforward=2 * D_MODEL, nb_layers=LAYERS, filter_order=K,
        batch_norm=batch_norm, lap_pos_enc=True, lap_pos_enc_dim=4,
        gnn_type=gnn_type, learn_only_filter_order_coeff=scalar)
    _params_to_torch(params, tmodel)
    enc = params["params"]["encoder"]
    if scalar:
        tmodel.cheb_weight.data = torch.from_numpy(
            np.asarray(enc["cheb_weight"]).copy())
    if gnn_type == "ARMAConvDynamic":
        tmodel.arma_init.data = torch.from_numpy(
            np.asarray(enc["arma_init_weight"]).copy())
        tmodel.arma_root.data = torch.from_numpy(
            np.asarray(enc["arma_root_weight"]).copy())
        tmodel.arma_bias.data = torch.from_numpy(
            np.asarray(enc["arma_bias"]).copy())
    return jmodel, params, tmodel


def _torch_logits(tmodel, gb, train=False):
    tmodel.train(train)
    ctx = torch.enable_grad() if train else torch.no_grad()
    with ctx:
        out = tmodel(
            torch.from_numpy(np.asarray(gb.x)),
            torch.from_numpy(np.asarray(gb.adj)),
            torch.from_numpy(gb.node_mask.astype(np.float32)),
            pe=torch.from_numpy(np.asarray(gb.pe)),
            lap_pe=torch.from_numpy(np.asarray(gb.lap_pe)),
            degree=torch.from_numpy(np.asarray(gb.degree)))
    return out.detach().numpy()


def test_logit_parity_batch_norm_train_mode():
    """BN variant in TRAIN mode: masked batch statistics on both sides
    (torch twin normalizes valid rows only; MaskedBatchNorm masks)."""
    _, gb = _prep_batch()
    jmodel, params, tmodel = _build_pair(gb, batch_norm=True)
    (jlogits, _), _ = jmodel.apply(params, gb, deterministic=False,
                                   mutable=["batch_stats"])
    tlogits = _torch_logits(tmodel, gb, train=True)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits,
                               rtol=1e-4, atol=1e-5)


def test_logit_parity_scalar_coeff_mode():
    """learn_only_filter_order_coeff=True: static Cheb weights with
    per-(graph, head) scalar coefficients (ChebNetDynamic.py:164-183)."""
    _, gb = _prep_batch(seed=13)
    jmodel, params, tmodel = _build_pair(gb, scalar=True)
    jlogits, _ = jmodel.apply(params, gb)
    tlogits = _torch_logits(tmodel, gb)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits,
                               rtol=1e-4, atol=1e-5)


def test_logit_parity_arma_mode():
    """ARMAConvDynamic filter (ChebNetDynamic.py:201-358)."""
    _, gb = _prep_batch(seed=17)
    jmodel, params, tmodel = _build_pair(gb, gnn_type="ARMAConvDynamic")
    jlogits, _ = jmodel.apply(params, gb)
    tlogits = _torch_logits(tmodel, gb)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits,
                               rtol=1e-4, atol=1e-5)


def test_training_trajectory_parity():
    """Full TRAINING parity: 8 AdamW steps of the jitted JAX Trainer vs 8
    torch AdamW steps on the twin, identical weights/data/hyperparams.

    This validates not just the forward pass but the whole training stack —
    gradients through every layer, AdamW decoupled weight decay, CE loss —
    against torch's training semantics (the reference trains with
    torch AdamW + cross entropy, run_transformer_gengcn_cv.py:362-377).
    """
    import torch.nn.functional as F
    from feta_tmlr_tpu.train.trainer import Trainer, TrainConfig

    _, gb = _prep_batch(seed=23)
    jmodel, params, tmodel = _build_pair(gb)

    lr, wd, steps = 1e-3, 1e-5, 8
    cfg = TrainConfig(task="graph_clf", lr=lr, weight_decay=wd,
                      sign_flip=False, regularization=0.0,
                      schedule="constant")
    trainer = Trainer(jmodel, cfg)
    state = trainer.init(jax.random.key(3), gb)
    # start from the SAME weights the twin got (init above re-derives them,
    # but reuse `params` to be explicit about the shared starting point)
    state = state.replace(params=params,
                          opt_state=trainer.optimizer.init(params))

    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    ty = torch.from_numpy(np.asarray(gb.y)).long()
    tmodel.train()

    jlosses, tlosses = [], []
    rng = jax.random.key(0)
    for s in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = trainer._jit_step(state, gb, sub)
        jlosses.append(float(loss))

        opt.zero_grad()
        out = tmodel(
            torch.from_numpy(np.asarray(gb.x)),
            torch.from_numpy(np.asarray(gb.adj)),
            torch.from_numpy(gb.node_mask.astype(np.float32)),
            pe=torch.from_numpy(np.asarray(gb.pe)),
            lap_pe=torch.from_numpy(np.asarray(gb.lap_pe)),
            degree=torch.from_numpy(np.asarray(gb.degree)))
        tloss = F.cross_entropy(out, ty)
        tloss.backward()
        opt.step()
        tlosses.append(float(tloss))

    np.testing.assert_allclose(jlosses, tlosses, rtol=2e-3, atol=2e-4)
    # the trajectories must actually move (a frozen model would trivially
    # "match"); and end-state logits must still agree across stacks
    assert abs(jlosses[0] - jlosses[-1]) > 1e-4
    jlogits, _ = jmodel.apply(state.params, gb)
    tlogits = _torch_logits(tmodel, gb)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits,
                               rtol=5e-3, atol=5e-4)


def test_logit_parity_packed_vs_twin():
    """Packed JAX batches against the twin consuming the UNPACKED layout:
    the packed model shares the unpacked param tree, the twin never sees
    packed rows — direct cross-stack equivalence."""
    from feta_tmlr_tpu.data.pack import pack_graphs
    from feta_tmlr_tpu.nn.packed import PackedDiffGraphTransformerGenGCN

    graphs, gb = _prep_batch(seed=19)
    jmodel, params, tmodel = _build_pair(gb)
    tlogits = _torch_logits(tmodel, gb)                  # [n_graphs, 2]

    packed_model = PackedDiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=D_MODEL, nb_heads=HEADS,
        dim_feedforward=2 * D_MODEL, dropout=0.0, nb_layers=LAYERS,
        batch_norm=False, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=K)
    packed = pack_graphs(graphs, row_len=32)
    packed_logits, _ = packed_model.apply(params, packed)
    packed_logits = np.asarray(packed_logits)            # [rows, slots, 2]

    # match packed (row, slot) -> original graph by node count (sizes are
    # distinct enough per test seed; ambiguity falls back to best match)
    matched = 0
    for gi, g in enumerate(graphs):
        want = tlogits[gi]
        best = None
        for r in range(packed.x.shape[0]):
            for s in range(int(packed.graph_mask[r].sum())):
                if int((packed.graph_id[r] == s).sum()) != g.num_nodes:
                    continue
                diff = float(np.abs(packed_logits[r, s] - want).max())
                best = diff if best is None else min(best, diff)
        assert best is not None, f"graph {gi} not found in packed layout"
        assert best < 2e-4, (gi, best)
        matched += 1
    assert matched == len(graphs)


def test_end_metric_training_parity():
    """End-METRIC training parity at twin level: train the JAX stack and
    the torch twin independently from identical weights/data/hyperparams
    for a full small run (120 full-batch AdamW steps, L1 regression per
    the reference ZINC protocol, run_transformer_gengcn.py:296) and
    compare the FINAL held-out MAE. The real datasets cannot be
    downloaded in this environment, so this is the strongest end-metric
    parity available: both stacks must converge to the same quality, not
    just the same early-step trajectory."""
    from feta_tmlr_tpu.train.trainer import Trainer, TrainConfig

    # one dataset split in half (the regression target derives from
    # graph statistics, so generalization is measurable)
    graphs = random_graph_dataset(seed=31, n_graphs=96, min_nodes=5,
                                  max_nodes=13, n_features=7,
                                  task="regression")
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    train_graphs, test_graphs = graphs[0::2], graphs[1::2]
    gb = collate_graphs(train_graphs, max_nodes=16)
    gb_test = collate_graphs(test_graphs, max_nodes=16)
    jmodel, params, tmodel = _build_pair(gb, nb_class=1)

    lr, wd, steps = 2e-3, 1e-5, 120
    trainer = Trainer(jmodel, TrainConfig(
        task="graph_reg", lr=lr, weight_decay=wd, sign_flip=False,
        regularization=0.0, schedule="constant"))
    state = trainer.init(jax.random.key(3), gb)
    state = state.replace(params=params,
                          opt_state=trainer.optimizer.init(params))
    rng = jax.random.key(0)
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, _ = trainer._jit_step(state, gb, sub)

    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    ty = torch.from_numpy(np.asarray(gb.y, np.float32))
    tmodel.train()
    tx = dict(x=torch.from_numpy(np.asarray(gb.x)),
              adj=torch.from_numpy(np.asarray(gb.adj)),
              mask=torch.from_numpy(gb.node_mask.astype(np.float32)),
              pe=torch.from_numpy(np.asarray(gb.pe)),
              lap_pe=torch.from_numpy(np.asarray(gb.lap_pe)),
              degree=torch.from_numpy(np.asarray(gb.degree)))
    for _ in range(steps):
        opt.zero_grad()
        out = tmodel(tx["x"], tx["adj"], tx["mask"], pe=tx["pe"],
                     lap_pe=tx["lap_pe"], degree=tx["degree"])
        (out.squeeze(-1) - ty).abs().mean().backward()
        opt.step()

    yt = np.asarray(gb_test.y, np.float32)
    jlogits, _ = jmodel.apply(state.params, gb_test)
    jmae = float(np.abs(np.asarray(jlogits).squeeze(-1) - yt).mean())
    tmae = float(np.abs(_torch_logits(tmodel, gb_test).squeeze(-1)
                        - yt).mean())
    # the mean-predictor baseline on this split is ~0.94 MAE: both stacks
    # must genuinely generalize past it, and land on the same quality
    assert jmae < 0.8, jmae
    assert tmae < 0.8, tmae
    assert abs(jmae - tmae) <= 0.12, (jmae, tmae)
