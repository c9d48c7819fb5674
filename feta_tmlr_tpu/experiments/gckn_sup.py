"""Standalone supervised GCKN on ZINC-style regression.

Equivalent of /root/reference/experiments/gckn_sup.py: unsupervised
k-means path-layer init, then supervised end-to-end training with L1
loss on per-graph regression targets (reference defaults: path size 4,
sum pooling). The CV classification variant lives in gckn_sup_cv.py.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
from feta_tmlr_tpu.gckn.models import GCKNSupervised
from feta_tmlr_tpu.gckn.paths import build_path_batch
from feta_tmlr_tpu.train.metrics import mae


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path-size", type=int, default=4)
    p.add_argument("--hidden-size", type=int, default=32)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--pooling", type=str, default="sum")
    p.add_argument("--aggregation", action="store_true")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    p.add_argument("--synthetic-graphs", type=int, default=96)
    args = p.parse_args(argv)

    print("[warn] ZINC files not bundled - synthetic molecule fallback")
    graphs = zinc_like_dataset(seed=args.seed,
                               n_graphs=args.synthetic_graphs)
    n = len(graphs)
    tr = graphs[: int(0.8 * n)]
    te = graphs[int(0.8 * n):]

    model = GCKNSupervised(
        input_size=tr[0].x.shape[-1], hidden_sizes=[args.hidden_size],
        path_sizes=[args.path_size], n_classes=1,
        kernel_args=args.sigma, pooling=args.pooling,
        aggregation=args.aggregation, seed=args.seed)
    model.unsup_init(tr, args.n_sampling_paths, seed=args.seed)

    tb = build_path_batch(tr, model.feature.max_path_size)
    eb = build_path_batch(te, model.feature.max_path_size)
    y_tr = jnp.asarray([float(g.y) for g in tr])
    y_te = np.asarray([float(g.y) for g in te])

    params = dict(model.init_params)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(pp):
            pred = model.apply(pp, tb)[:, 0]
            return jnp.abs(pred - y_tr).mean()    # L1, reference criterion
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    bn_stats = None
    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            bn_stats = model.compute_bn_stats(params, tb)
            test_mae = mae(
                np.asarray(model.apply(params, eb, bn_stats))[:, 0], y_te)
            print({"epoch": epoch, "loss": round(float(loss), 5),
                   "test_mae": round(test_mae, 4)})
    bn_stats = model.compute_bn_stats(params, tb)
    return mae(np.asarray(model.apply(params, eb, bn_stats))[:, 0], y_te)


if __name__ == "__main__":
    main()
