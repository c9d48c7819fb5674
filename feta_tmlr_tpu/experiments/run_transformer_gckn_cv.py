"""GraphiT + GCKN node features, TU 10-fold CV.

Equivalent of /root/reference/experiments/run_transformer_gckn_cv.py:
plain DiffGraphTransformer where unsupervised GCKN path-kernel encodings
enter through the lap-PE input (gckn args run_transformer_gckn.py:40-45,
PE wiring :242-254), evaluated with the TU CV protocol (CE + StepLR(50,
0.5), fold files preferred from disk)."""

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
from feta_tmlr_tpu.gckn.models import gckn_encode_as_pe
from feta_tmlr_tpu.nn import DiffGraphTransformer
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main(argv=None):
    p = base_parser("NCI1")
    p.add_argument("--gckn-dim", type=int, default=32)
    p.add_argument("--gckn-path", type=int, default=3)
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    args = p.parse_args(argv)
    outdir = resolve_outdir(args, family="transformer_gckn")
    graphs, in_size, n_classes, _real = load_tu_or_synthetic(args)
    pe_dim = gckn_encode_as_pe(graphs, dim=args.gckn_dim,
                               path_size=args.gckn_path,
                               n_sampling_paths=args.n_sampling_paths,
                               seed=args.seed)
    apply_position_encodings(
        graphs, type("A", (), {**vars(args), "lappe": False})())
    tr_idx, te_idx = load_fold_indices(
        graphs, args.fold_idx, name=args.dataset,
        fold_dir=f"{args.datadir}/fold-idx", seed=args.seed)
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches([graphs[i] for i in tr_idx], args.batch_size,
                           max_nodes, shuffle_seed=args.seed)
    test_b = make_batches([graphs[i] for i in te_idx], args.batch_size,
                          max_nodes)
    model = DiffGraphTransformer(
        in_size=in_size, nb_class=n_classes, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=args.dropout, nb_layers=args.nb_layers,
        batch_norm=args.batch_norm, lap_pos_enc=True,
        lap_pos_enc_dim=pe_dim)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_clf", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    schedule="step", step_size=50, gamma=0.5,
                    sign_flip=False, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, test_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
