"""Trainer + metrics tests: overfit tiny datasets per task adapter."""

import numpy as np
import jax
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
from feta_tmlr_tpu.nn import (
    DiffGraphTransformerGenGCN,
    DiffGraphTransformerGenGCNSBM,
)
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.train import metrics as M


def _prep(graphs, max_nodes=None):
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    return collate_graphs(graphs, max_nodes=max_nodes)


def test_overfit_graph_classification():
    graphs = random_graph_dataset(seed=0, n_graphs=16, min_nodes=6,
                                  max_nodes=12, n_features=7)
    batch = _prep(graphs, max_nodes=16)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=3e-3,
                                         epochs=30, sign_flip=False))
    result = trainer.fit([batch], val_batches=[batch])
    assert result["history"][-1]["loss"] < result["history"][0]["loss"]
    assert result["best_val"] >= 0.9


def test_overfit_regression_with_plateau():
    graphs = random_graph_dataset(seed=1, n_graphs=16, min_nodes=6,
                                  max_nodes=12, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=16)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(
        task="graph_reg", lr=3e-3, epochs=25, schedule="plateau",
        plateau_patience=3, sign_flip=True))
    result = trainer.fit([batch], val_batches=[batch])
    assert result["history"][-1]["loss"] < result["history"][0]["loss"]


def test_overfit_node_classification():
    graphs = sbm_like_dataset(seed=2, n_graphs=4, n_nodes=24)
    batch = _prep(graphs, max_nodes=32)
    model = DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="node_clf", lr=3e-3,
                                         epochs=30, sign_flip=False))
    result = trainer.fit([batch], val_batches=[batch])
    assert result["best_val"] > 0.65


def test_metrics_definitions():
    # balanced SBM accuracy: perfect on class 0, zero on class 1 -> 0.5
    logits = np.array([[[2.0, 0.0], [2.0, 0.0], [2.0, 0.0], [2.0, 0.0]]])
    labels = np.array([[0, 0, 1, 1]])
    assert M.accuracy_sbm(logits, labels) == 0.5
    # padded labels (-1) ignored
    labels2 = np.array([[0, 0, -1, -1]])
    assert M.accuracy_sbm(logits, labels2) == 1.0

    # roc_auc against hand-computed value
    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels3 = np.array([1, 0, 1, 0])
    # pairs: (0.9>0.8 ok),(0.9>0.2 ok),(0.3<0.8 bad),(0.3>0.2 ok) -> 3/4
    assert abs(M.roc_auc(scores, labels3) - 0.75) < 1e-9

    # AP hand value: ranks desc: y=[1,0,1,0]; precisions at hits: 1/1, 2/3
    assert abs(M.average_precision(scores, labels3) - (1.0 + 2 / 3) / 2) < 1e-9

    assert M.binary_f1([1, 1, 0], [1, 0, 0]) == pytest.approx(2 / 3)
    assert M.mae([1.0, 3.0], [0.0, 1.0]) == pytest.approx(1.5)


def test_sklearn_cross_check_auc_ap():
    from sklearn.metrics import average_precision_score, roc_auc_score
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(200)
    labels = (rng.random(200) > 0.6).astype(int)
    assert abs(M.roc_auc(scores, labels)
               - roc_auc_score(labels, scores)) < 1e-9
    assert abs(M.average_precision(scores, labels)
               - average_precision_score(labels, scores)) < 1e-9


def test_average_precision_tie_handling():
    from sklearn.metrics import average_precision_score
    # tied scores must collapse into one threshold (order-independent)
    scores = np.array([0.5, 0.5])
    labels = np.array([1, 0])
    assert M.average_precision(scores, labels) == pytest.approx(
        average_precision_score(labels, scores))
    assert M.average_precision(scores[::-1], labels[::-1]) == \
        pytest.approx(average_precision_score(labels, scores))
    rng = np.random.default_rng(3)
    s = np.round(rng.random(300), 1)               # heavy ties
    l = (rng.random(300) > 0.5).astype(int)
    assert M.average_precision(s, l) == pytest.approx(
        average_precision_score(l, s), abs=1e-9)


def test_accuracy_sbm_predicted_only_class_widens_denominator():
    # targets only class 0, predictions include class 1:
    # reference divides by 2 (classes in the confusion matrix)
    logits = np.array([[[0.0, 2.0], [2.0, 0.0]]])  # preds: 1, 0
    labels = np.array([[0, 0]])
    assert M.accuracy_sbm(logits, labels) == pytest.approx(0.25)


def test_stop_at_min_lr_and_per_epoch_ckpt(tmp_path):
    """Reference stop protocol (LPE main:199-208): break once the plateau
    schedule reaches min_lr; per-epoch keep-latest orbax checkpoints."""
    graphs = random_graph_dataset(seed=2, n_graphs=8, min_nodes=6,
                                  max_nodes=10, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=12)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=16, nb_heads=2, dim_feedforward=32,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(
        task="graph_reg", lr=1e-3, epochs=50, schedule="plateau",
        plateau_patience=0, plateau_factor=0.1, min_lr=1e-5,
        stop_at_min_lr=True, sign_flip=False))
    result = trainer.fit([batch], val_batches=[batch],
                         ckpt_dir=str(tmp_path / "ckpts"))
    # patience 0 + factor 0.1: lr decays every non-improving epoch and
    # hits min_lr within a few epochs -> early stop long before 50
    assert len(result["history"]) < 50
    from feta_tmlr_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    assert mgr.latest_step() == result["history"][-1]["epoch"]
    restored = mgr.restore(result["state"])
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in
               jax.tree_util.tree_leaves(restored.params))
    mgr.close()


def test_max_time_stop():
    graphs = random_graph_dataset(seed=3, n_graphs=8, min_nodes=6,
                                  max_nodes=10, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=12)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=16, nb_heads=2, dim_feedforward=32,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(
        task="graph_reg", lr=1e-3, epochs=500, max_time_h=1e-7,
        sign_flip=False))
    result = trainer.fit([batch])
    assert len(result["history"]) < 500


def test_eigvec_sign_flip_augmentation():
    """Trainer flips batch.eigvecs per train batch when sign_flip=True
    (reference LPE/train/train_ZINC_graph_regression.py:26-33): the
    flipped step equals an unflipped step on a pre-flipped batch (same
    rng, so dropout draws match), differs from the plain batch, and the
    eval path never flips."""
    import jax.numpy as jnp
    from feta_tmlr_tpu.experiments.common import make_batches
    from feta_tmlr_tpu.nn.san import SANNet
    from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
    from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp

    graphs = zinc_categorical_dataset(seed=0, n_graphs=8)
    apply_laplace_decomp(graphs, 6)
    batch = make_batches(graphs, 8)[0]
    assert batch.eigvecs is not None

    model = SANNet(num_atom_type=28, num_bond_type=4, hidden_dim=16,
                   out_dim=16, n_heads=2, n_layers=1, dropout=0.0,
                   lpe="node", lpe_dim=8, lpe_heads=2, lpe_layers=1)
    cfg = dict(task="graph_reg", lr=1e-3, seed=0)
    tr_flip = Trainer(model, TrainConfig(sign_flip=True, **cfg))
    tr_plain = Trainer(model, TrainConfig(sign_flip=False, **cfg))
    state = tr_flip.init(jax.random.key(0), batch)

    # find a step rng whose derived signs actually flip something
    for i in range(10):
        key = jax.random.key(i)
        rng_eig = jax.random.split(key, 3)[1]
        signs = jnp.where(
            jax.random.uniform(rng_eig, (batch.eigvecs.shape[-1],)) >= 0.5,
            1.0, -1.0)
        if (signs < 0).any():
            break
    assert (signs < 0).any()

    loss_flip = float(tr_flip._jit_step(state, batch, key)[1])
    pre_flipped = batch.replace(eigvecs=batch.eigvecs * signs)
    loss_equiv = float(tr_plain._jit_step(state, pre_flipped, key)[1])
    loss_plain = float(tr_plain._jit_step(state, batch, key)[1])
    np.testing.assert_allclose(loss_flip, loss_equiv, rtol=1e-6)
    assert abs(loss_flip - loss_plain) > 1e-7

    # eval path never flips: two evaluations agree exactly
    e1 = tr_flip.evaluate(state, [batch])
    e2 = tr_flip.evaluate(state, [batch])
    assert e1 == e2


def test_multi_step_scan_matches_sequential():
    """Trainer.make_multi_step: k scanned steps over stacked microbatches
    produce bit-identical params to k sequential _jit_step calls (same
    fold_in rng stream), incl. sign-flip augmentation and batch stats."""
    from feta_tmlr_tpu.data.batch import stack_batches

    graphs = random_graph_dataset(seed=0, n_graphs=24, min_nodes=5,
                                  max_nodes=11, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batches = [collate_graphs(graphs[i * 8:(i + 1) * 8], max_nodes=12)
               for i in range(3)]
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=16, nb_heads=2, dim_feedforward=32,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2, batch_norm=True)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=True))
    rng = jax.random.key(7)

    s_seq = trainer.init(jax.random.key(0), batches[0])
    for i, b in enumerate(batches):
        s_seq, _ = trainer._jit_step(s_seq, b, jax.random.fold_in(rng, i))

    s_scan = trainer.init(jax.random.key(0), batches[0])
    s_scan, losses = trainer.make_multi_step(3)(
        s_scan, stack_batches(batches), rng)
    assert losses.shape == (3,)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.batch_stats),
                    jax.tree_util.tree_leaves(s_scan.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ragged stacking must be rejected
    import pytest as _pytest
    bad = collate_graphs(graphs[:4], max_nodes=16)
    with _pytest.raises(ValueError):
        stack_batches([batches[0], bad])


def test_debug_nan_guard():
    """TrainConfig.debug_nan: clean runs pass; a diverging run (lr big
    enough to blow params past the reference's |p|>1000 threshold or to
    NaN) raises NonFiniteError (run_transformer_gengcn_cv.py:161-179)."""
    import pytest
    from feta_tmlr_tpu.train.trainer import NonFiniteError

    graphs = random_graph_dataset(seed=5, n_graphs=8, min_nodes=6,
                                  max_nodes=10, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=16)
    mk = lambda: DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    ok = Trainer(mk(), TrainConfig(task="graph_reg", lr=1e-3, epochs=2,
                                   sign_flip=False, debug_nan=True))
    res = ok.fit([batch])
    assert np.isfinite(res["history"][-1]["loss"])

    bad = Trainer(mk(), TrainConfig(task="graph_reg", lr=1e6, epochs=10,
                                    sign_flip=False, debug_nan=True))
    with pytest.raises(NonFiniteError):
        bad.fit([batch])


def test_grad_clip_norm():
    """grad_clip_norm bounds the global update norm; composes with the
    plateau (injectable-lr) schedule whose state sits inside the chain."""
    graphs = random_graph_dataset(seed=6, n_graphs=8, min_nodes=6,
                                  max_nodes=10, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=16)
    mk = lambda: DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    import jax.numpy as jnp
    tr = Trainer(mk(), TrainConfig(task="graph_reg", lr=1e-2, epochs=6,
                                   schedule="plateau", plateau_patience=1,
                                   sign_flip=False, grad_clip_norm=0.5))
    res = tr.fit([batch], val_batches=[batch])
    assert np.isfinite(res["history"][-1]["loss"])

    # wiring check: the trainer's optimizer must be EXACTLY
    # chain(clip_by_global_norm(0.1), adamw) — same update on the same
    # grads (AdamW itself is nearly scale-invariant, so comparing
    # against the unclipped update would not detect a missing clip)
    import optax
    tr2 = Trainer(mk(), TrainConfig(task="graph_reg", lr=1e-2,
                                    sign_flip=False, grad_clip_norm=0.1))
    state = tr2.init(jax.random.key(0), batch)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full(jnp.shape(p), 3.0), state.params)
    upd, _ = tr2.optimizer.update(grads, state.opt_state, state.params)
    ref_opt = optax.chain(optax.clip_by_global_norm(0.1),
                          optax.adamw(1e-2, weight_decay=1e-5))
    ref_upd, _ = ref_opt.update(grads, ref_opt.init(state.params),
                                state.params)
    for a, b in zip(jax.tree_util.tree_leaves(upd),
                    jax.tree_util.tree_leaves(ref_upd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # and the clip actually fired: the pre-adam gradient seen by the
    # chain is bounded, which for constant grads shows up as identical
    # updates for any grads of norm >= 0.1
    grads_big = jax.tree_util.tree_map(lambda g: g * 100.0, grads)
    upd_big, _ = tr2.optimizer.update(grads_big, state.opt_state,
                                      state.params)
    for a, b in zip(jax.tree_util.tree_leaves(upd),
                    jax.tree_util.tree_leaves(upd_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_plateau_lr_actually_injected():
    """Regression for a silent break: the inject_hyperparams state is a
    NamedTuple, so naive tuple-walking missed it and plateau reductions
    only changed the logged lr, never the device lr. Assert the
    opt_state's learning_rate really moves — with and without the
    grad-clip chain wrapper."""
    from feta_tmlr_tpu.train.trainer import _set_lr

    graphs = random_graph_dataset(seed=8, n_graphs=4, min_nodes=6,
                                  max_nodes=10, n_features=7,
                                  task="regression")
    batch = _prep(graphs, max_nodes=16)
    mk = lambda clip: Trainer(
        DiffGraphTransformerGenGCN(
            in_size=7, nb_class=1, d_model=32, nb_heads=4,
            dim_feedforward=64, dropout=0.0, nb_layers=1,
            lap_pos_enc=True, lap_pos_enc_dim=4, filter_order=2),
        TrainConfig(task="graph_reg", lr=1e-3, schedule="plateau",
                    sign_flip=False, grad_clip_norm=clip))

    def injected_lr(opt_state):
        states = opt_state if isinstance(opt_state, tuple) else [opt_state]
        for s in [opt_state, *states]:
            if hasattr(s, "hyperparams"):
                return float(s.hyperparams["learning_rate"])
        raise AssertionError("no injectable state found")

    for clip in (None, 0.5):
        tr = mk(clip)
        state = tr.init(jax.random.key(0), batch)
        assert abs(injected_lr(state.opt_state) - 1e-3) < 1e-9
        _set_lr(state, 5e-4)
        assert abs(injected_lr(state.opt_state) - 5e-4) < 1e-9, clip
