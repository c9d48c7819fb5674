"""Gradient accumulation (Trainer.make_accum_step): k microbatches must
produce the same optimizer update as one step on the concatenated batch
(all task losses are mean-reduced; equal microbatch sizes => mean of
means == full-batch mean)."""

import numpy as np
import jax

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.data.batch import stack_batches
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig


def _graphs(seed, n):
    gs = random_graph_dataset(seed=seed, n_graphs=n, min_nodes=6,
                              max_nodes=12, n_features=7,
                              task="regression")
    DiffusionEncoding(beta=1.0).apply_to(gs)
    LapEncoding(dim=4).apply_to(gs)
    return gs


def test_accum_matches_full_batch_step():
    gs = _graphs(0, 16)
    full = collate_graphs(gs, max_nodes=16)
    micro = [collate_graphs(gs[:8], max_nodes=16),
             collate_graphs(gs[8:], max_nodes=16)]
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, batch_norm=False, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=2)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                    sign_flip=False))
    state = tr.init(jax.random.key(0), jax.device_put(full))
    state2 = jax.tree_util.tree_map(jax.numpy.copy, state)

    s_full, loss_full = tr._jit_step(state, jax.device_put(full),
                                     jax.random.key(1))
    step2 = tr.make_accum_step(2)
    stacked = jax.device_put(stack_batches(micro))
    s_acc, loss_acc = step2(state2, stacked, jax.random.key(1))

    np.testing.assert_allclose(float(loss_acc), float(loss_full),
                               rtol=1e-5, atol=1e-6)
    flat_f = jax.tree_util.tree_leaves(s_full.params)
    flat_a = jax.tree_util.tree_leaves(s_acc.params)
    for f, a in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                                   rtol=2e-4, atol=1e-6)
    assert int(s_acc.step) == 1


def test_accum_trains_with_batchnorm():
    """BN models run with per-microbatch statistics (documented); the
    accumulated step must still reduce the loss over iterations."""
    gs = _graphs(3, 16)
    micro = [collate_graphs(gs[:8], max_nodes=16),
             collate_graphs(gs[8:], max_nodes=16)]
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, batch_norm=True, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=2)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3,
                                    sign_flip=False))
    stacked = jax.device_put(stack_batches(micro))
    state = tr.init(jax.random.key(0), jax.device_put(micro[0]))
    step2 = tr.make_accum_step(2)
    losses = []
    for i in range(15):
        state, loss = step2(state, stacked, jax.random.key(10 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert state.batch_stats is not None
