"""Plain GraphiT + GCKN node features, SBM node classification.

Equivalent of /root/reference/experiments/run_transformer_gckn_SBM_cv.py:
DiffGraphTransformerSBM with unsupervised GCKN path encodings through the
lap-PE input, class-balanced node accuracy. Synthetic SBM fallback when
GNNBenchmark files are absent.
"""

from __future__ import annotations

from feta_tmlr_tpu.experiments.common import (
    apply_position_encodings,
    base_parser,
    load_sbm_tier,
    make_batches,
    resolve_outdir,
    run_and_log,
)
from feta_tmlr_tpu.gckn.models import gckn_encode_as_pe
from feta_tmlr_tpu.nn import DiffGraphTransformerSBM
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main(argv=None):
    p = base_parser("PATTERN")
    p.add_argument("--n-nodes", type=int, default=96)
    p.add_argument("--gckn-dim", type=int, default=32)
    p.add_argument("--gckn-path", type=int, default=3)
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    p.set_defaults(batch_size=64, synthetic_graphs=64)
    args = p.parse_args(argv)
    outdir = resolve_outdir(args, family="transformer_gckn_sbm")

    tr, va, te, in_size, n_classes, _real = load_sbm_tier(args)
    graphs = tr + va + te
    pe_dim = gckn_encode_as_pe(graphs, dim=args.gckn_dim,
                               path_size=args.gckn_path,
                               n_sampling_paths=args.n_sampling_paths,
                               seed=args.seed)
    apply_position_encodings(
        graphs, type("A", (), {**vars(args), "lappe": False})())
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, args.batch_size, max_nodes,
                           shuffle_seed=args.seed, node_labels=True)
    val_b = make_batches(va, args.batch_size, max_nodes,
                         node_labels=True)
    test_b = make_batches(te, args.batch_size, max_nodes,
                          node_labels=True)

    model = DiffGraphTransformerSBM(
        in_size=in_size, nb_class=n_classes, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=args.dropout, nb_layers=args.nb_layers,
        batch_norm=args.batch_norm, lap_pos_enc=True,
        lap_pos_enc_dim=pe_dim)
    trainer = Trainer(
        model,
        TrainConfig(task="node_clf", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    sign_flip=False, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, val_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
