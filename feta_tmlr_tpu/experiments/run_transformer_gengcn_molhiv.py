"""FeTA ogbg-molhiv: ROC-AUC eval, BCE-with-logits loss.

Equivalent of /root/reference/experiments/run_transformer_gengcn_molhiv.py
(OGB Evaluator rocauc :215-222, BCEWithLogits :428, AtomEncoder input).
Synthetic OGB-shaped fallback when the dataset is absent.
"""

from __future__ import annotations

import numpy as np

from feta_tmlr_tpu.experiments.common import (
    apply_position_encodings,
    base_parser,
    load_ogb_tier,
    make_batches,
    resolve_outdir,
    run_and_log,
)
from feta_tmlr_tpu.nn.ogb import ATOM_FEATURE_DIMS, \
    DiffGraphTransformerGenGCNMolHiv
from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.train import Trainer, TrainConfig


def ogb_like_dataset(seed, n_graphs, n_tasks=1):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(8, 28))
        g = random_connected_graph(rng, n, 1, edge_prob=0.15)
        g.x = np.stack([rng.integers(0, d, n) for d in ATOM_FEATURE_DIMS],
                       axis=-1).astype(np.int32)
        g.y = np.float32(rng.integers(0, 2)) if n_tasks == 1 else \
            rng.integers(0, 2, n_tasks).astype(np.float32)
        g.compute_degree_feature()
        graphs.append(g)
    return graphs


def main(argv=None):
    p = base_parser("ogbg-molhiv")
    p.set_defaults(batch_size=128, dim_hidden=128, nb_heads=8, nb_layers=4)
    args = p.parse_args(argv)
    outdir = resolve_outdir(args, family="transformer_gengcn_molhiv")

    tr, va, te, _real = load_ogb_tier(
        args, "ogbg-molhiv",
        lambda: ogb_like_dataset(args.seed, args.synthetic_graphs))
    graphs = tr + va + te
    apply_position_encodings(graphs, args)
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, args.batch_size, max_nodes,
                           shuffle_seed=args.seed)
    val_b = make_batches(va, args.batch_size, max_nodes)
    test_b = make_batches(te, args.batch_size, max_nodes)

    model = DiffGraphTransformerGenGCNMolHiv(
        nb_class=1, d_model=args.dim_hidden, nb_heads=args.nb_heads,
        dim_feedforward=2 * args.dim_hidden, dropout=args.dropout,
        nb_layers=args.nb_layers, batch_norm=args.batch_norm,
        lap_pos_enc=args.lappe, lap_pos_enc_dim=args.lap_dim,
        filter_order=args.filter_order, gnn_type=args.gnn_type,
        last_layer_filter=args.last_layer_filter)
    trainer = Trainer(
        model,
        TrainConfig(task="binary_graph", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    regularization=args.regularization,
                    schedule=("warmup" if args.warmup else "constant"),
                    warmup_steps=args.warmup or 2000,
                    # OGB Evaluator('ogbg-molhiv') metric is ROC-AUC
                    # (run_transformer_gengcn_molhiv.py:215-222)
                    binary_metric="rocauc",
                    sign_flip=args.lappe, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, val_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
