"""End-to-end PATTERN-style distributed training on a 2-D device mesh.

What real SBM node-classification training feeds — batches of medium
graphs — sharded BOTH ways at once (parallel/feta_batched.py):

  - batch axis over the 'data' mesh dimension (data parallelism),
  - each graph's node axis over the 'nodes' dimension (each [N, N]
    attention/Laplacian block split across chips),

with the canonical reference config semantics (BatchNorm, degree-scaled
attention; run_transformer_gengcn_SBM_cv.py:276-282,368-370). The model
parameters are the UNMODIFIED flax tree of DiffGraphTransformerGenGCNSBM,
so the same checkpoint moves freely between this sharded trainer and the
single-chip Trainer/Predictor.

Runs on any jax.sharding.Mesh — on a pod slice the axes map to ICI; here
it demonstrates on the virtual CPU mesh (8 devices, 4 data x 2 nodes).

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python examples/train_pattern_sharded.py [--epochs 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # virtual-mesh demo (see README)

import jax.numpy as jnp
from jax.sharding import Mesh

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
from feta_tmlr_tpu.parallel.feta_batched import (
    make_feta_batched_forward,
    make_feta_batched_train_step,
    prepare_batched_inputs,
)
from feta_tmlr_tpu.pe import DiffusionEncoding
from feta_tmlr_tpu.train.metrics import accuracy_sbm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--graphs", type=int, default=32)
    ap.add_argument("--nodes", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--dp", type=int, default=4, help="data-axis shards")
    ap.add_argument("--sp", type=int, default=2, help="node-axis shards")
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--ring", action="store_true",
                    help="ring-streamed K/V attention (no gathered "
                         "[Bl,h,Vs,V] scores at any N)")
    args = ap.parse_args()

    n_dev = args.dp * args.sp
    devices = jax.devices()
    if len(devices) < n_dev:
        raise SystemExit(f"need {n_dev} devices, have {len(devices)} "
                         "(set --xla_force_host_platform_device_count)")
    mesh = Mesh(np.array(devices[:n_dev]).reshape(args.dp, args.sp),
                ("data", "nodes"))

    cfg = dict(d_model=16, n_heads=2, n_layers=2, filter_order=2)
    graphs = sbm_like_dataset(seed=0, n_graphs=args.graphs,
                              n_nodes=args.nodes, n_classes=2)
    DiffusionEncoding(beta=0.5).apply_to(graphs)
    val = graphs[-args.batch_size:]
    train = graphs[: len(graphs) - args.batch_size]

    def batches(gs):
        for i in range(0, len(gs) - args.batch_size + 1, args.batch_size):
            yield collate_graphs(gs[i: i + args.batch_size],
                                 max_nodes=args.nodes, node_labels=True)

    model = DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=cfg["d_model"],
        nb_heads=cfg["n_heads"], dim_feedforward=2 * cfg["d_model"],
        dropout=0.0, nb_layers=cfg["n_layers"], batch_norm=True,
        lap_pos_enc=False, filter_order=cfg["filter_order"])
    init_batch = next(batches(train))
    params = jax.jit(model.init)(jax.random.key(0), init_batch)["params"]

    step = make_feta_batched_train_step(mesh, lr=args.lr, batch_norm=True,
                                        ring_attention=args.ring,
                                        d_model=cfg["d_model"],
                                        n_heads=cfg["n_heads"],
                                        n_layers=cfg["n_layers"],
                                        filter_order=cfg["filter_order"])
    fwd = make_feta_batched_forward(mesh, batch_norm=True,
                                    ring_attention=args.ring,
                                    d_model=cfg["d_model"],
                                    n_heads=cfg["n_heads"],
                                    n_layers=cfg["n_layers"],
                                    filter_order=cfg["filter_order"])

    val_batch = collate_graphs(val, max_nodes=args.nodes, node_labels=True)
    vx, vpe, vlh, vmask, _, _, vdeg = prepare_batched_inputs(val_batch, mesh)

    losses = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for batch in batches(train):
            x, pe, lh, mask, lab, lmask, deg = prepare_batched_inputs(
                batch, mesh)
            params, loss = step(params, x, pe, lh, mask, lab, lmask, deg)
            losses.append(float(loss))
        logits = np.asarray(fwd(params, vx, vpe, vlh, vmask, vdeg))
        acc = accuracy_sbm(
            jnp.asarray(logits), jnp.asarray(np.asarray(val_batch.y)),
            mask=jnp.asarray(np.asarray(val_batch.node_mask)))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"val_acc_sbm={acc:.4f} ({time.perf_counter() - t0:.1f}s, "
              f"mesh data={args.dp} x nodes={args.sp})")
    if losses:
        assert np.isfinite(np.mean(losses))
    print("SHARDED PATTERN TRAIN OK")


if __name__ == "__main__":
    main()
