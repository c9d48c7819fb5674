"""GraphiT + last-layer GCN TU CV — reference
experiments/run_transformer_gcn_cv.py."""

from __future__ import annotations

from feta_tmlr_tpu.experiments.common import (
    apply_position_encodings,
    base_parser,
    load_tu_or_synthetic,
    make_batches,
    resolve_outdir,
    run_and_log,
)
from feta_tmlr_tpu.data.tu import load_fold_indices
from feta_tmlr_tpu.nn import DiffGraphTransformerGCN
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main(argv=None):
    args = base_parser("NCI1").parse_args(argv)
    outdir = resolve_outdir(args, family="transformer_gcn")
    graphs, in_size, n_classes, _real = load_tu_or_synthetic(args)
    apply_position_encodings(graphs, args)
    tr_idx, te_idx = load_fold_indices(
        graphs, args.fold_idx, name=args.dataset,
        fold_dir=f"{args.datadir}/fold-idx", seed=args.seed)
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches([graphs[i] for i in tr_idx], args.batch_size,
                           max_nodes, shuffle_seed=args.seed)
    test_b = make_batches([graphs[i] for i in te_idx], args.batch_size,
                          max_nodes)
    model = DiffGraphTransformerGCN(
        in_size=in_size, nb_class=n_classes, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=args.dropout, nb_layers=args.nb_layers,
        batch_norm=args.batch_norm, lap_pos_enc=args.lappe,
        lap_pos_enc_dim=args.lap_dim)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_clf", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    schedule="step", step_size=50, gamma=0.5,
                    sign_flip=args.lappe, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, test_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
