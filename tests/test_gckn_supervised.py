"""Supervised GCKN classifier: overfit a tiny dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from feta_tmlr_tpu.data import random_graph_dataset
from feta_tmlr_tpu.gckn.models import GCKNSupervised
from feta_tmlr_tpu.gckn.paths import build_path_batch


def test_gckn_supervised_overfits():
    graphs = random_graph_dataset(seed=0, n_graphs=12, min_nodes=5,
                                  max_nodes=10, n_features=5)
    labels = jnp.asarray(np.array([int(g.y) for g in graphs]))
    model = GCKNSupervised(input_size=5, hidden_sizes=[16],
                           path_sizes=[2], n_classes=2)
    batch = model.unsup_init(graphs, n_sampling_paths=1000)
    params = dict(model.init_params)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, batch)
            onehot = jax.nn.one_hot(labels, 2)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot,
                                     -1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    logits = model.apply(params, batch)
    acc = float((np.argmax(np.asarray(logits), -1)
                 == np.asarray(labels)).mean())
    assert acc >= 0.9
