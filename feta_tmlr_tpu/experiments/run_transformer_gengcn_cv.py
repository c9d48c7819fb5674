"""FeTA graph classification with 10-fold CV (canonical entry point).

TPU-native equivalent of
/root/reference/experiments/run_transformer_gengcn_cv.py (README.md:49):

  python -m feta_tmlr_tpu.experiments.run_transformer_gengcn_cv \
      --gnn_type=ChebConvDynamic --seed=0 --dataset=MUTAG

Reference training protocol kept: stratified fold split (disk fold-idx files
preferred), CE loss, AdamW, StepLR(50, 0.5)
(run_transformer_gengcn_cv.py:362,393-394), best-val model selection,
lap-PE sign flip augmentation.
"""

from __future__ import annotations

import numpy as np

from feta_tmlr_tpu.experiments.common import (
    apply_position_encodings,
    base_parser,
    load_tu_or_synthetic,
    make_batches,
    resolve_outdir,
    run_and_log,
)
from feta_tmlr_tpu.data.tu import load_fold_indices
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main(argv=None):
    args = base_parser("NCI1").parse_args(argv)
    outdir = resolve_outdir(args)

    graphs, in_size, n_classes, _real = load_tu_or_synthetic(args)
    # cache keyed per dataset, like the reference's cache/pe/{dataset}
    # layout (run_transformer_gengcn_cv.py:311-313)
    apply_position_encodings(
        graphs, args,
        cache_dir=(f"cache/pe/{args.dataset}" if _real else None))
    tr_idx, te_idx = load_fold_indices(
        graphs, args.fold_idx, name=args.dataset,
        fold_dir=f"{args.datadir}/fold-idx", seed=args.seed)
    train_graphs = [graphs[i] for i in tr_idx]
    test_graphs = [graphs[i] for i in te_idx]

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(train_graphs, args.batch_size, max_nodes,
                           shuffle_seed=args.seed)
    test_b = make_batches(test_graphs, args.batch_size, max_nodes)

    def rebatch(epoch):
        # per-epoch graph-level reshuffle (reference DataLoader shuffle=True)
        return make_batches(train_graphs, args.batch_size, max_nodes,
                            shuffle_seed=args.seed + epoch)

    model = DiffGraphTransformerGenGCN(
        in_size=in_size, nb_class=n_classes, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=args.dropout, nb_layers=args.nb_layers,
        batch_norm=args.batch_norm, lap_pos_enc=args.lappe,
        lap_pos_enc_dim=args.lap_dim, filter_order=args.filter_order,
        gnn_type=args.gnn_type, last_layer_filter=args.last_layer_filter)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_clf", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    regularization=args.regularization,
                    schedule="step", step_size=50, gamma=0.5,
                    sign_flip=args.lappe, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, test_b, test_b, args, outdir,
                       rebatch_fn=rebatch)


if __name__ == "__main__":
    main()
