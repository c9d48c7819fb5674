"""FeTA (spectral-filtered GraphiT) + GCKN path-kernel features, ZINC.

Equivalent of /root/reference/experiments/run_transformer_gckn_gengcn.py:
unsupervised GCKN path encodings feed the lap-PE input of
DiffGraphTransformerGenGCN (lap_pos_enc=True, lap_pos_enc_dim=gckn_dim,
reference :271-291), relative PE via diffusion/p-step kernels (:240-259),
L1 loss with the plateau/warmup protocol (:296-310). This is a headline
configuration of the paper (FeTA + GCKN on ZINC).
"""

from __future__ import annotations

from feta_tmlr_tpu.experiments.common import (
    apply_position_encodings,
    base_parser,
    load_zinc_tier,
    make_batches,
    resolve_outdir,
    run_and_log,
)
from feta_tmlr_tpu.gckn.models import gckn_encode_as_pe
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main(argv=None):
    p = base_parser("ZINC")
    # reference gckn flags (run_transformer_gckn_gengcn.py:41-46)
    p.add_argument("--gckn-dim", type=int, default=32)
    p.add_argument("--gckn-path", type=int, default=8)
    p.add_argument("--gckn-sigma", type=float, default=0.6)
    p.add_argument("--gckn-pooling", default="sum",
                   choices=["mean", "sum"])
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    p.set_defaults(nb_heads=8, nb_layers=10, dim_hidden=64)
    args = p.parse_args(argv)
    args.batch_norm = not args.layer_norm
    outdir = resolve_outdir(args, family="transformer_gckn_gengcn_zinc")

    tr, va, te, in_size, _real = load_zinc_tier(args)
    graphs = tr + va + te
    pe_dim = gckn_encode_as_pe(graphs, dim=args.gckn_dim,
                               path_size=args.gckn_path,
                               kernel_arg=args.gckn_sigma,
                               pooling=args.gckn_pooling,
                               n_sampling_paths=args.n_sampling_paths,
                               seed=args.seed)
    apply_position_encodings(
        graphs, type("A", (), {**vars(args), "lappe": False})())
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, args.batch_size, max_nodes,
                           shuffle_seed=args.seed)
    val_b = make_batches(va, args.batch_size, max_nodes)
    test_b = make_batches(te, args.batch_size, max_nodes)

    # GCKN features replace the Laplacian PE input
    # (reference :279-280 lap_pos_enc=True, lap_pos_enc_dim=gckn_dim)
    model = DiffGraphTransformerGenGCN(
        in_size=in_size, nb_class=1, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=args.dropout, nb_layers=args.nb_layers,
        batch_norm=args.batch_norm, lap_pos_enc=True,
        lap_pos_enc_dim=pe_dim, filter_order=args.filter_order,
        gnn_type=args.gnn_type, last_layer_filter=args.last_layer_filter)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_reg", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    regularization=args.regularization,
                    schedule=("warmup" if args.warmup else "plateau"),
                    warmup_steps=args.warmup or 2000,
                    # reference plateau protocol (:299-305)
                    plateau_patience=15, plateau_factor=0.5, min_lr=1e-5,
                    sign_flip=False, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, val_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
