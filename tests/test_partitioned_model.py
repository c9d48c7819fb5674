"""Edge-partitioned trainable model: grads through shard_map, dense parity,
and learning on one large SBM-style graph across the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.parallel import make_mesh
from feta_tmlr_tpu.parallel.partitioned_model import (
    init_params,
    make_partitioned_forward,
    make_train_step,
    prepare_inputs,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _big_graph(n_nodes=96, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n_nodes)
    probs = np.where(labels[:, None] == labels[None, :], 0.25, 0.05)
    upper = np.triu(rng.random((n_nodes, n_nodes)) < probs, k=1)
    r, c = np.nonzero(upper)
    ei = np.stack([np.concatenate([r, c]), np.concatenate([c, r])])
    x = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n_nodes)]
    return ei.astype(np.int64), x, labels.astype(np.int32)


def test_partitioned_forward_matches_dense():
    ei, x, labels = _big_graph()
    mesh = make_mesh(8, model_parallel=1)
    args = prepare_inputs(ei, x, labels, mesh)
    params = init_params(jax.random.key(0), 4, 16, 2, k_order=3)
    fwd = jax.jit(make_partitioned_forward(mesh, k_order=3))
    logits = np.asarray(fwd(params, *args[:5]))

    # dense reference: Lhat = -D^-1/2 A D^-1/2 (sym, lambda_max=2, diag 0)
    n = x.shape[0]
    a = np.zeros((n, n), np.float32)
    a[ei[0], ei[1]] = 1.0
    deg = a.sum(1)
    dis = np.where(deg > 0, deg.clip(min=1e-12) ** -0.5, 0.0)
    lhat = -(dis[:, None] * a * dis[None, :])
    w = np.asarray(params["cheb_w"])
    tx0, tx1 = x, lhat @ x
    h = tx0 @ w[0] + tx1 @ w[1]
    tx2 = 2 * lhat @ tx1 - tx0
    h = h + tx2 @ w[2]
    h = np.maximum(h + np.asarray(params["cheb_b"]), 0)
    ref = h @ np.asarray(params["out_w"]) + np.asarray(params["out_b"])
    np.testing.assert_allclose(logits[:n], ref, rtol=1e-3, atol=1e-3)


def test_partitioned_training_learns():
    ei, x, labels = _big_graph(n_nodes=120, seed=1)
    mesh = make_mesh(8, model_parallel=1)
    args = prepare_inputs(ei, x, labels, mesh)
    params = init_params(jax.random.key(1), 4, 32, 2, k_order=3)
    step = make_train_step(mesh, k_order=3, lr=0.05)
    losses = []
    for _ in range(60):
        params, loss = step(params, *args)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::15]
