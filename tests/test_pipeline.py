"""Pipeline parallelism (GPipe over the FeTA layer chain): parity with the
dense single-chip model, microbatch-count invariance, and training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.parallel.pipeline import (
    make_pipeline_train_step,
    make_pipelined_forward,
)
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding


def _setup(n_layers=5, n_graphs=8, task="classification", nb_class=2,
           batch_norm=False):
    graphs = random_graph_dataset(seed=5, n_graphs=n_graphs, min_nodes=5,
                                  max_nodes=11, n_features=6, task=task)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=3).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=12)
    model = DiffGraphTransformerGenGCN(
        in_size=6, nb_class=nb_class, d_model=16, nb_heads=2,
        dim_feedforward=32, dropout=0.0, nb_layers=n_layers,
        batch_norm=batch_norm, lap_pos_enc=True, lap_pos_enc_dim=3,
        filter_order=2)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    return model, params, batch


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("pp",))


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 2), (4, 8)])
def test_pipeline_parity_vs_dense(stages, microbatches):
    model, params, batch = _setup(n_layers=5)
    dense_logits, _ = model.apply(params, batch)
    fwd = make_pipelined_forward(_mesh(stages), model, microbatches)
    with _mesh(stages):
        logits, coeff = jax.jit(fwd)(params, batch)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(dense_logits),
                               rtol=2e-4, atol=2e-5)
    # the filtered last layer runs in the back: coeff shape as dense
    assert coeff.shape[1] == model.nb_heads


def test_pipeline_parity_with_degree():
    """batch.degree multiplies attention when present — the pipelined
    stages must thread it through identically."""
    model, params, batch = _setup(n_layers=3)
    assert batch.degree is not None
    dense_logits, _ = model.apply(params, batch)
    fwd = make_pipelined_forward(_mesh(2), model, 2)
    with _mesh(2):
        logits, _ = jax.jit(fwd)(params, batch)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(dense_logits),
                               rtol=2e-4, atol=2e-5)


def test_pipeline_batch_norm_single_microbatch_exact():
    """BatchNorm tier: with one microbatch the per-microbatch statistics
    ARE the full-batch statistics, so the pipelined forward must match
    the dense train-mode model exactly (M>1 is the documented
    per-microbatch approximation)."""
    model, params, batch = _setup(n_layers=5, batch_norm=True)
    (dense_logits, _), _ = model.apply(params, batch, deterministic=False,
                                       mutable=["batch_stats"])
    fwd = make_pipelined_forward(_mesh(4), model, n_microbatches=1)
    with _mesh(4):
        logits, _ = jax.jit(fwd)(params, batch)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(dense_logits),
                               rtol=2e-4, atol=2e-5)


def test_pipeline_batch_norm_trains():
    """Per-microbatch BN statistics still train (M=2 over 2 stages)."""
    model, params, batch = _setup(n_layers=3, task="regression",
                                  nb_class=1, batch_norm=True)
    step = make_pipeline_train_step(_mesh(2), model, 2, lr=5e-3,
                                    task="graph_reg")
    with _mesh(2):
        losses = []
        for _ in range(12):
            params, loss = step(params, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_pipeline_trains():
    """End-to-end differentiability: SGD through scan + ppermute learns."""
    model, params, batch = _setup(n_layers=5, task="regression",
                                  nb_class=1)
    step = make_pipeline_train_step(_mesh(4), model, 4, lr=5e-3,
                                    task="graph_reg")
    with _mesh(4):
        losses = []
        for _ in range(12):
            params, loss = step(params, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_pipeline_grad_matches_dense():
    """Gradients through the pipeline equal dense-model gradients (bubble
    computations must contribute exactly zero)."""
    model, params, batch = _setup(n_layers=3)

    def dense_loss(p):
        logits, _ = model.apply(p, batch)
        return (logits ** 2).mean()

    fwd = make_pipelined_forward(_mesh(2), model, 2)

    def pipe_loss(p):
        logits, _ = fwd(p, batch)
        return (logits ** 2).mean()

    gd = jax.grad(dense_loss)(params)
    with _mesh(2):
        gp = jax.jit(jax.grad(pipe_loss))(params)
    flat_d, _ = jax.tree.flatten(gd)
    flat_p, _ = jax.tree.flatten(gp)
    for a, b in zip(flat_d, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_pipeline_2d_pp_data_mesh():
    """pp x data composition: 2 stages x 2 data shards — parity with the
    dense model and a learning step on the 2-D mesh."""
    from feta_tmlr_tpu.parallel.pipeline import (
        make_pipeline_train_step, make_pipelined_forward)
    model, params, batch = _setup(n_layers=5, n_graphs=8)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]).reshape(2, 2),
                ("pp", "data"))
    dense_logits, _ = model.apply(params, batch)
    fwd = make_pipelined_forward(mesh, model, 2, data_axis="data")
    with mesh:
        logits, _ = jax.jit(fwd)(params, batch)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(dense_logits),
                               rtol=2e-4, atol=2e-5)

    model2, params2, batch2 = _setup(n_layers=5, n_graphs=8,
                                     task="regression", nb_class=1)
    step = make_pipeline_train_step(mesh, model2, 2, lr=5e-3,
                                    task="graph_reg", data_axis="data")
    with mesh:
        losses = []
        for _ in range(8):
            params2, loss = step(params2, batch2)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_pipeline_remat_grads_bitexact():
    """GPipe re-materialization (remat=True): checkpointing each stage
    application changes memory, not math — one SGD step lands on
    identical params; and the optax form (AdamW) learns."""
    import optax
    mesh = _mesh(4)
    model, params, batch = _setup(n_layers=5)

    outs = {}
    for name, rm in (("plain", False), ("remat", True)):
        step = make_pipeline_train_step(mesh, model, n_microbatches=4,
                                        lr=1e-2, task="classification",
                                        remat=rm)
        with mesh:
            p, loss = step(params, batch)
        outs[name] = (jax.tree_util.tree_leaves(p), float(loss))
    assert np.isclose(outs["plain"][1], outs["remat"][1], rtol=1e-6)
    for a, b in zip(outs["plain"][0], outs["remat"][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    adamw = optax.adamw(2e-3)
    step = make_pipeline_train_step(mesh, model, n_microbatches=4,
                                    task="classification", remat=True,
                                    optimizer=adamw)
    state = adamw.init(params)
    losses = []
    with mesh:
        for _ in range(10):
            params, state, loss = step(params, state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
