"""OGB molecular model family tests."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.batch import Graph
from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.nn.ogb import (
    ATOM_FEATURE_DIMS,
    DiffGraphTransformerGenGCNMolHiv,
    DiffGraphTransformerGenGCNMolPcba,
    DiffGraphTransformerGenGCNPCQM4M,
    OGBAtomEncoder,
)
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.train.metrics import multitask_mean, average_precision


def ogb_like_dataset(seed=0, n_graphs=8, n_tasks=1):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(8, 20))
        g = random_connected_graph(rng, n, 1, edge_prob=0.2)
        g.x = np.stack(
            [rng.integers(0, d, n) for d in ATOM_FEATURE_DIMS],
            axis=-1).astype(np.int32)
        if n_tasks == 1:
            g.y = np.float32(rng.integers(0, 2))
        else:
            y = rng.integers(0, 2, n_tasks).astype(np.float32)
            y[rng.random(n_tasks) < 0.3] = np.nan     # unlabeled tasks
            g.y = y
        g.compute_degree_feature()
        graphs.append(g)
    return graphs


def test_atom_encoder_sums_embeddings():
    enc = OGBAtomEncoder(emb_dim=8)
    x = jnp.zeros((2, 5, 9), jnp.int32)
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 5, 8)
    p = params["params"]
    ref = sum(np.asarray(p[f"atom_emb_{i}"]["embedding"])[0]
              for i in range(9))
    np.testing.assert_allclose(np.asarray(out[0, 0]), ref, atol=1e-6)


def test_molhiv_model_outputs():
    graphs = ogb_like_dataset(seed=1)
    gb = collate_graphs(graphs, max_nodes=24)
    model = DiffGraphTransformerGenGCNMolHiv(
        nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, filter_order=2)
    params = model.init(jax.random.key(0), gb)
    logits, reg, sig = model.apply(params, gb, regularization=0.1)
    assert logits.shape == (8,)
    np.testing.assert_allclose(np.asarray(sig),
                               1 / (1 + np.exp(-np.asarray(logits))),
                               atol=1e-6)
    assert np.isfinite(float(reg))


def test_molpcba_multitask_and_nan_labels():
    graphs = ogb_like_dataset(seed=2, n_tasks=16)
    gb = collate_graphs(graphs, max_nodes=24)
    model = DiffGraphTransformerGenGCNMolPcba(
        nb_class=16, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, filter_order=2)
    tr = Trainer(model, TrainConfig(task="binary_graph", lr=3e-3,
                                    epochs=6, sign_flip=False))
    res = tr.fit([gb], val_batches=[gb])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
    # AP metric works with NaN labels
    logits = np.random.default_rng(0).standard_normal((8, 16))
    ap = multitask_mean(average_precision, logits, np.asarray(gb.y))
    assert np.isfinite(ap)


def test_pcqm4m_regression():
    graphs = ogb_like_dataset(seed=3)
    for g in graphs:
        g.y = np.float32(np.random.rand())
    gb = collate_graphs(graphs, max_nodes=24)
    model = DiffGraphTransformerGenGCNPCQM4M(
        nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, filter_order=2)
    params = model.init(jax.random.key(0), gb)
    pred, reg = model.apply(params, gb)
    assert pred.shape == (8,)
    assert np.all(np.isfinite(np.asarray(pred)))
