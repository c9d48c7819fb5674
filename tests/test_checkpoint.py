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


def _fit_setup(seed=3):
    graphs = random_graph_dataset(seed=seed, n_graphs=24, n_features=7,
                                  task="regression")
    DiffusionEncoding().apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batches = [collate_graphs(graphs[i:i + 8], max_nodes=32)
               for i in range(0, 24, 8)]
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)

    def make_trainer():
        # plateau with tiny patience so the kill/resume crosses an lr drop
        return Trainer(model, TrainConfig(
            task="graph_reg", lr=1e-2, sign_flip=False, seed=7,
            schedule="plateau", plateau_patience=1, plateau_factor=0.5,
            min_lr=1e-5))

    return make_trainer, batches


def test_fit_resume_bitexact_trajectory(tmp_path):
    """Kill/resume protocol: fit 3 epochs with ckpt_dir, then resume=True
    in a FRESH Trainer for the rest — per-epoch train losses, val
    metrics, and plateau-lr sequence must equal the uninterrupted 7-epoch
    run's exactly (epoch rngs are (seed, epoch)-pure, the batch-order
    generator is fast-forwarded, plateau counters come from
    fit_meta.json)."""
    make_trainer, batches = _fit_setup()
    full = make_trainer().fit(batches, val_batches=batches[:1], epochs=7)

    ckpt = str(tmp_path / "soak")
    make_trainer().fit(batches, val_batches=batches[:1], epochs=3,
                       ckpt_dir=ckpt)
    resumed = make_trainer().fit(batches, val_batches=batches[:1],
                                 epochs=7, ckpt_dir=ckpt, resume=True)

    assert [r["epoch"] for r in resumed["history"]] == [3, 4, 5, 6]
    by_epoch = {r["epoch"]: r for r in full["history"]}
    for row in resumed["history"]:
        ref = by_epoch[row["epoch"]]
        np.testing.assert_allclose(row["loss"], ref["loss"], rtol=1e-6)
        np.testing.assert_allclose(row["val_mae"], ref["val_mae"],
                                   rtol=1e-6)
        assert row.get("lr") == ref.get("lr"), (row, ref)


def test_fit_resume_without_checkpoint_starts_fresh(tmp_path):
    """resume=True with an empty ckpt_dir must train from scratch."""
    make_trainer, batches = _fit_setup(seed=4)
    res = make_trainer().fit(batches, epochs=2,
                             ckpt_dir=str(tmp_path / "empty"),
                             resume=True)
    assert [r["epoch"] for r in res["history"]] == [0, 1]
