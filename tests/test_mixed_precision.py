"""Mixed-precision (bf16 compute) policy tests.

FETA_COMPUTE_DTYPE=bfloat16 switches the attention/FFN/Cheb matmuls of the
flagship path to bf16 while keeping params, residual stream, softmax and
norms in f32 (feta_tmlr_tpu/config.py::default_compute_dtype). Guards:
outputs stay close to the f32 reference and gradients stay finite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding


def _batch():
    graphs = random_graph_dataset(seed=0, n_graphs=8, min_nodes=8,
                                  max_nodes=14, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(4).apply_to(graphs)
    return collate_graphs(graphs, max_nodes=16)


def _model(cdt=None):
    return DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=3)


def test_bf16_close_to_f32_and_grads_finite(monkeypatch):
    batch = _batch()
    model = _model()
    params = model.init(jax.random.key(0), batch)

    logits_f32, _ = model.apply(params, batch)

    monkeypatch.setenv("FETA_COMPUTE_DTYPE", "bfloat16")
    logits_bf16, _ = model.apply(params, batch)
    assert logits_bf16.dtype == jnp.float32  # residual stream stays f32
    # bf16 has ~3 decimal digits; activations here are O(1)
    np.testing.assert_allclose(np.asarray(logits_bf16),
                               np.asarray(logits_f32), atol=0.05)

    def loss(p):
        lg, _ = model.apply(p, batch)
        return ((lg - 1.0) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)
    # params (and their grads) stay f32
    assert all(np.asarray(leaf).dtype == np.float32 for leaf in leaves)


def test_f32_default_unchanged(monkeypatch):
    monkeypatch.delenv("FETA_COMPUTE_DTYPE", raising=False)
    from feta_tmlr_tpu.config import default_compute_dtype
    assert default_compute_dtype() == jnp.float32
    monkeypatch.setenv("FETA_COMPUTE_DTYPE", "bf16")
    assert default_compute_dtype() == jnp.bfloat16
