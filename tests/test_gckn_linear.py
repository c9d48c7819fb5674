"""L-BFGS linear classifier (gckn/linear.py vs reference gckn/layers.py
Linear.fit): fits separable data, regularization shrinks weights, and the
GCKNSupervised.unsup_train_classifier path improves the head."""

import numpy as np

from feta_tmlr_tpu.data.synthetic import random_graph_dataset
from feta_tmlr_tpu.gckn.linear import LinearClassifier
from feta_tmlr_tpu.gckn.models import GCKNSupervised
from feta_tmlr_tpu.gckn.paths import build_path_batch


def _blobs(n=80, d=6, k=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 4.0
    y = rng.integers(0, k, n)
    x = centers[y] + rng.standard_normal((n, d)) * 0.4
    return x.astype(np.float32), y


def test_lbfgs_fit_multiclass_ce_and_hinge():
    x, y = _blobs()
    for loss in ("ce", "hinge"):
        clf = LinearClassifier(x.shape[1], 3, loss=loss).fit(x, y)
        acc = (clf.predict(x) == y).mean()
        assert acc > 0.95, (loss, acc)
        proba = clf.predict_proba(x)
        np.testing.assert_allclose(proba.sum(-1), 1.0, atol=1e-5)


def test_lbfgs_fit_binary_bce():
    x, y = _blobs(k=2, seed=1)
    clf = LinearClassifier(x.shape[1], 1, loss="ce").fit(x, y)
    assert ((clf.decision_function(x)[:, 0] > 0).astype(int) == y
            ).mean() > 0.95
    assert clf.predict_proba(x).shape == (len(y), 2)


def test_alpha_regularization_shrinks_weights():
    x, y = _blobs(seed=2)
    w_free = LinearClassifier(x.shape[1], 3, alpha=0.0).fit(x, y).weight
    w_reg = LinearClassifier(x.shape[1], 3, alpha=100.0).fit(x, y).weight
    assert np.linalg.norm(w_reg) < 0.5 * np.linalg.norm(w_free)


def test_gckn_supervised_lbfgs_head():
    graphs = random_graph_dataset(seed=3, n_graphs=24, min_nodes=6,
                                  max_nodes=12, n_features=5, n_classes=2)
    labels = np.asarray([g.y for g in graphs]).astype(np.int64).ravel()
    model = GCKNSupervised(input_size=5, hidden_sizes=[8], path_sizes=[3],
                           n_classes=2, seed=0)
    batch = model.unsup_init(graphs, n_sampling_paths=500, seed=0)
    params = dict(model.init_params)
    fitted = model.unsup_train_classifier(params, batch, labels, loss="ce")
    logits_before = np.asarray(model.apply(params, batch))
    logits_after = np.asarray(model.apply(fitted, batch))
    acc = lambda lg: (lg.argmax(-1) == labels).mean()
    assert acc(logits_after) >= acc(logits_before)
    assert acc(logits_after) > 0.6
