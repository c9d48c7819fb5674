"""Weight-only int8 quantization (quantize.py) + Predictor integration."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding
from feta_tmlr_tpu.quantize import (
    QTensor, dequantize_tensor, dequantize_variables, quantize_tensor,
    quantize_variables, tree_nbytes)
from feta_tmlr_tpu.serve import Predictor


def test_tensor_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(96, 48)).astype(np.float32) * \
        rng.uniform(0.1, 10.0, size=(1, 48)).astype(np.float32)
    t = quantize_tensor(w)
    assert t.q.dtype == jnp.int8 and t.scale.shape == (1, 48)
    back = np.asarray(dequantize_tensor(t))
    # symmetric rounding: per-channel error <= scale/2 = max|w_col|/254
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-7
    assert np.all(np.abs(back - w) <= bound)


def test_zero_column_safe():
    w = np.zeros((32, 8), np.float32)
    w[:, 0] = 1.0
    back = np.asarray(dequantize_tensor(quantize_tensor(w)))
    np.testing.assert_allclose(back, w, atol=1e-6)


def _setup():
    graphs = random_graph_dataset(seed=0, n_graphs=10, min_nodes=6,
                                  max_nodes=14, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=2, dim_feedforward=64,
        dropout=0.0, nb_layers=2, filter_order=2)
    batch = collate_graphs(graphs, max_nodes=16)
    variables = model.init(jax.random.key(0), batch)
    return graphs, model, batch, variables


def test_variables_structure_and_footprint():
    _, _, _, variables = _setup()
    qvars = quantize_variables(variables)
    # same tree structure modulo QTensor leaves; biases stay float
    flat = jax.tree_util.tree_leaves(
        qvars, is_leaf=lambda w: isinstance(w, QTensor))
    assert any(isinstance(leaf, QTensor) for leaf in flat)
    assert tree_nbytes(qvars) < 0.45 * tree_nbytes(variables)
    # dequantized tree feeds apply with identical structure
    deq = dequantize_variables(qvars)
    assert (jax.tree_util.tree_structure(deq)
            == jax.tree_util.tree_structure(variables))


def test_predictor_quantized_logits_close():
    graphs, model, batch, variables = _setup()
    want = np.asarray(model.apply(variables, batch)[0])

    pred = Predictor(model, variables=variables, max_batch=5,
                     collate_kwargs={"max_nodes": 16}, quantize=True)
    got = pred.predict(graphs)
    # weight-only int8: small relative logit perturbation, same argmax
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.05 * scale
    assert np.array_equal(got.argmax(-1), want.argmax(-1))


def test_w8a8_interceptor_matches_dense():
    """A lone Dense under the interceptor == manual int8 reference."""
    import flax.linen as nn
    from feta_tmlr_tpu.quantize import (
        dynamic_quantize, int8_dense_interceptor)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 10, 32)).astype(np.float32))
    layer = nn.Dense(64)
    variables = layer.init(jax.random.key(0), x)
    with nn.intercept_methods(int8_dense_interceptor):
        got = layer.apply(variables, x)

    w = variables["params"]["kernel"]
    xq, sx = dynamic_quantize(x)
    wt = quantize_tensor(w)
    want = (np.einsum("bti,io->bto", np.asarray(xq, np.int32),
                      np.asarray(wt.q, np.int32)).astype(np.float32)
            * np.asarray(sx) * np.asarray(wt.scale)
            + np.asarray(variables["params"]["bias"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # relative error vs the f32 dense stays at int8 scale
    exact = np.asarray(layer.apply(variables, x))
    assert np.abs(got - exact).max() <= 0.03 * np.abs(exact).max()


def test_w8a8_small_dense_passthrough():
    """Kernels under the size floor run the normal f32 path exactly."""
    import flax.linen as nn
    from feta_tmlr_tpu.quantize import int8_dense_interceptor

    x = jnp.asarray(np.random.default_rng(8).normal(size=(5, 8)),
                    dtype=jnp.float32)
    layer = nn.Dense(4)                       # 8*4 = 32 < 256 params
    variables = layer.init(jax.random.key(0), x)
    with nn.intercept_methods(int8_dense_interceptor):
        got = layer.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(layer.apply(variables, x)))


def test_predictor_w8a8_logits_close():
    graphs, model, batch, variables = _setup()
    want = np.asarray(model.apply(variables, batch)[0])
    pred = Predictor(model, variables=variables, max_batch=5,
                     collate_kwargs={"max_nodes": 16}, quantize="w8a8")
    got = pred.predict(graphs)
    # dynamic-activation int8 on every Dense: looser than w8 but bounded
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.15 * scale
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8


def test_quantized_train_restore_path(tmp_path):
    """ckpt-dir restore + quantize compose (the deploy recipe)."""
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    from feta_tmlr_tpu.train.checkpoint import CheckpointManager

    graphs, model, batch, _ = _setup()
    y = np.asarray([int(g.y) if g.y is not None else 0 for g in graphs])
    batch = batch.replace(y=y)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=False))
    state = trainer.init(jax.random.key(1), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    mgr.close()

    pred = Predictor(model, ckpt_dir=str(tmp_path / "ckpt"),
                     state_like=state, max_batch=5,
                     collate_kwargs={"max_nodes": 16}, quantize=True)
    out = pred.predict(graphs)
    assert out.shape == (len(graphs), 2) and np.isfinite(out).all()
