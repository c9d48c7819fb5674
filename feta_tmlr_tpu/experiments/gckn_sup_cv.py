"""Standalone supervised GCKN with CV (reference experiments/gckn_sup_cv.py):
unsupervised k-means init then supervised end-to-end training of the path
layers + classifier."""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from feta_tmlr_tpu.data import random_graph_dataset
from feta_tmlr_tpu.data.tu import load_fold_indices, load_tu_dataset
from feta_tmlr_tpu.gckn.models import GCKNSupervised
from feta_tmlr_tpu.gckn.paths import build_path_batch
from feta_tmlr_tpu.train.metrics import accuracy_graph
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="MUTAG")
    p.add_argument("--datadir", type=str, default="dataset")
    p.add_argument("--path-size", type=int, default=3)
    p.add_argument("--hidden-size", type=int, default=32)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--pooling", type=str, default="mean")
    p.add_argument("--aggregation", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--fold-idx", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    p.add_argument("--synthetic-graphs", type=int, default=80)
    args = p.parse_args(argv)

    path = os.path.join(args.datadir, args.dataset)
    if os.path.isdir(path):
        graphs, _ = load_tu_dataset(args.dataset, args.datadir)
    else:
        print(f"[warn] {path} not found - synthetic fallback")
        graphs = random_graph_dataset(seed=args.seed,
                                      n_graphs=args.synthetic_graphs,
                                      n_features=7)
    n_classes = len({int(g.y) for g in graphs})
    tr_idx, te_idx = load_fold_indices(
        graphs, args.fold_idx, name=args.dataset,
        fold_dir=f"{args.datadir}/fold-idx", seed=args.seed)

    model = GCKNSupervised(
        input_size=graphs[0].x.shape[-1],
        hidden_sizes=[args.hidden_size], path_sizes=[args.path_size],
        n_classes=n_classes, kernel_args=args.sigma,
        pooling=args.pooling, aggregation=args.aggregation, seed=args.seed)
    model.unsup_init(graphs, args.n_sampling_paths, seed=args.seed)

    train_graphs = [graphs[i] for i in tr_idx]
    test_graphs = [graphs[i] for i in te_idx]
    tb = build_path_batch(train_graphs, model.feature.max_path_size)
    eb = build_path_batch(test_graphs, model.feature.max_path_size)
    y_tr = jnp.asarray([int(g.y) for g in train_graphs])
    y_te = np.asarray([int(g.y) for g in test_graphs])

    params = dict(model.init_params)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(pp):
            logits = model.apply(pp, tb)
            onehot = jax.nn.one_hot(y_tr, n_classes)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            acc = accuracy_graph(np.asarray(model.apply(params, eb)), y_te)
            print({"epoch": epoch, "loss": round(float(loss), 5),
                   "test_acc": round(acc, 4)})
    return accuracy_graph(np.asarray(model.apply(params, eb)), y_te)


if __name__ == "__main__":
    main()
