"""FeTA + GCKN node features on ogbg-molpcba (multitask AP).

Equivalent of /root/reference/experiments/
run_transformer_gckn_gengcn_molpcba.py: the FeTA MolPcba model with
unsupervised GCKN path encodings through the lap-PE input; multitask
BCE-with-logits + OGB average precision. The reference's only
multi-device path (nn.DataParallel, :469-475) maps to batch-axis
NamedSharding here (parallel/mesh.py, parallel/sharding.py) rather than
a per-script flag. Synthetic OGB-shaped fallback when the dataset is
absent.
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
from feta_tmlr_tpu.experiments.run_transformer_gengcn_molhiv import (
    ogb_like_dataset,
)
from feta_tmlr_tpu.gckn.models import gckn_encode_as_pe
from feta_tmlr_tpu.nn.ogb import DiffGraphTransformerGenGCNMolPcba
from feta_tmlr_tpu.train import Trainer, TrainConfig

N_TASKS = 128


def main(argv=None):
    p = base_parser("ogbg-molpcba")
    p.add_argument("--gckn-dim", type=int, default=32)
    p.add_argument("--gckn-path", type=int, default=3)
    p.add_argument("--n-sampling-paths", type=int, default=100000)
    p.set_defaults(batch_size=256, dim_hidden=128, nb_heads=8, nb_layers=4)
    args = p.parse_args(argv)
    outdir = resolve_outdir(args, family="transformer_gckn_gengcn_molpcba")

    tr, va, te, _real = load_ogb_tier(
        args, "ogbg-molpcba",
        lambda: ogb_like_dataset(args.seed, args.synthetic_graphs,
                                 n_tasks=N_TASKS))
    graphs = tr + va + te
    # task count from the data (reference reads dataset.num_tasks from the
    # OGB meta; molpcba = 128, fixtures may be narrower)
    n_tasks = int(np.atleast_1d(graphs[0].y).shape[0])
    pe_dim = gckn_encode_as_pe(graphs, dim=args.gckn_dim,
                               path_size=args.gckn_path,
                               n_sampling_paths=args.n_sampling_paths,
                               seed=args.seed)
    apply_position_encodings(
        graphs, type("A", (), {**vars(args), "lappe": False})())
    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, args.batch_size, max_nodes,
                           shuffle_seed=args.seed)
    val_b = make_batches(va, args.batch_size, max_nodes)
    test_b = make_batches(te, args.batch_size, max_nodes)

    model = DiffGraphTransformerGenGCNMolPcba(
        nb_class=n_tasks, d_model=args.dim_hidden, nb_heads=args.nb_heads,
        dim_feedforward=2 * args.dim_hidden, dropout=args.dropout,
        nb_layers=args.nb_layers, batch_norm=args.batch_norm,
        lap_pos_enc=True, lap_pos_enc_dim=pe_dim,
        filter_order=args.filter_order, gnn_type=args.gnn_type,
        last_layer_filter=args.last_layer_filter)
    trainer = Trainer(
        model,
        TrainConfig(task="binary_graph", lr=args.lr,
                    weight_decay=args.weight_decay, epochs=args.epochs,
                    regularization=args.regularization,
                    schedule=("warmup" if args.warmup else "constant"),
                    warmup_steps=args.warmup or 2000,
                    sign_flip=False, seed=args.seed),
        steps_per_epoch=len(train_b))
    return run_and_log(trainer, train_b, val_b, test_b, args, outdir)


if __name__ == "__main__":
    main()
