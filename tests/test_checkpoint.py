"""Checkpoint save/restore round trip."""

import numpy as np
import jax

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.train.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    graphs = random_graph_dataset(seed=0, n_graphs=8, n_features=7)
    DiffusionEncoding().apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=32)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2, batch_norm=True)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=False))
    state = trainer.init(jax.random.key(0), batch)
    for i in range(3):
        state, _ = trainer._jit_step(state, batch, jax.random.key(i))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state)
    assert mgr.latest_step() == 3

    fresh = trainer.init(jax.random.key(1), batch)
    restored = mgr.restore(fresh)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 3
    # resumed training continues identically
    s1, l1 = trainer._jit_step(state, batch, jax.random.key(9))
    s2, l2 = trainer._jit_step(restored, batch, jax.random.key(9))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    mgr.close()


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save=True: save returns before IO completes; a donated next
    step may invalidate the live buffers (orbax copies device arrays out
    synchronously, so this is safe); wait_until_finished + restore must
    yield the exact saved state.

    Limitation: on the CPU test platform jax ignores donate_argnums, so
    the donation-vs-async-write interaction is only truly exercised on
    accelerator runs; here the test pins the save/wait/restore contract.
    """
    graphs = random_graph_dataset(seed=1, n_graphs=8, n_features=7)
    DiffusionEncoding().apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = jax.device_put(collate_graphs(graphs, max_nodes=32))
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=False))
    state = trainer.init(jax.random.key(0), batch)
    state, _ = trainer._jit_step(state, batch, jax.random.key(0))
    saved_params = jax.tree_util.tree_map(np.asarray, state.params)

    mgr = CheckpointManager(str(tmp_path / "ackpt"), async_save=True)
    mgr.save(int(state.step), state)
    # donated step immediately invalidates `state`'s buffers while the
    # async write may still be in flight
    state, _ = trainer._jit_step_donated(state, batch, jax.random.key(1))
    mgr.wait_until_finished()
    assert mgr.latest_step() == 1

    fresh = trainer.init(jax.random.key(2), batch)
    restored = mgr.restore(fresh)
    for a, b in zip(jax.tree_util.tree_leaves(saved_params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
