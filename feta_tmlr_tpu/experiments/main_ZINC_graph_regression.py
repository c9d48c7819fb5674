"""LPE/LSPE-tier ZINC trainer driven by JSON configs.

Equivalent of /root/reference/LPE/main_ZINC_graph_regression.py and
LSPE/main_ZINC_graph_regression.py: `--config <json>` plus overrides;
model registry covers the SAN family (SAN / NodeLPE / EdgeLPE /
NodeSpectra), GATFeTA, GraphiT-Spectra-LSPE and GatedGCN-LSPE. Plateau LR
schedule, per-epoch checkpoints, eigvec sign-flip augmentation are kept
(main_ZINC_graph_regression.py:127-260,
train/train_ZINC_graph_regression.py:26-33).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.zinc import load_zinc_or_synthetic
from feta_tmlr_tpu.experiments.common import make_batches
from feta_tmlr_tpu.nn.gat import GATFeTANet, GATNet
from feta_tmlr_tpu.nn.gatedgcn import GatedGCNLSPENet
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.nn.pna import PNALSPENet, average_log_degree
from feta_tmlr_tpu.nn.san import SANNet, SANNodeSpectra
from feta_tmlr_tpu.nn.san_lspe import SANLSPENet
from feta_tmlr_tpu.pe import PStepRWEncoding
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

MODEL_REGISTRY = {
    "SAN": (SANNet, {"lpe": "none"}),
    "GAT": (GATNet, {}),
    "SAN_NodeLPE": (SANNet, {"lpe": "node"}),
    "SAN_EdgeLPE": (SANNet, {"lpe": "edge"}),
    "SAN_NodeSpectra": (SANNodeSpectra, {}),
    "GATFeTA": (GATFeTANet, {}),
    "GraphiTSpectra": (GraphiTSpectraNet, {}),
    "GraphiT": (GraphiTSpectraNet, {"spectra": False}),
    "GatedGCN": (GatedGCNLSPENet, {}),
    "SAN_LSPE": (SANLSPENet, {}),
    "PNA": (PNALSPENet, {}),
}

NUM_ATOM_TYPE = 28
NUM_BOND_TYPE = 4



def resolve_model_name(cfg, model_arg=None):
    from feta_tmlr_tpu.utils.config import resolve_reference_model_name
    return resolve_reference_model_name(
        cfg, model_arg,
        lspe_aliases={"SAN": "SAN_LSPE", "Spectra": "GraphiTSpectra"})


def resolve_build(cfg, model_arg=None):
    """(cls, kwargs) for a config — the registry/kwargs half of model
    construction, shared by the trainer main and the serving CLI."""
    name = resolve_model_name(cfg, model_arg)
    if name not in MODEL_REGISTRY:
        raise SystemExit(f"unknown model {name}; "
                         f"choose from {sorted(MODEL_REGISTRY)}")
    cls, extra = MODEL_REGISTRY[name]
    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    return cls, kwargs


def construct_model(cls, kwargs, avg_d_log=None):
    """Instantiate with the dataset-derived PNA degree stat when given
    (training computes it over the train graphs; serving should pass the
    SAME value — persist it in net_params.avg_d_log, else predictions
    come from a different function than was trained)."""
    if cls is PNALSPENet and avg_d_log is not None:
        kwargs.setdefault("avg_d_log", avg_d_log)
    if cls in (GATFeTANet, GATNet):
        return cls(num_atom_type=NUM_ATOM_TYPE, **kwargs)
    return cls(num_atom_type=NUM_ATOM_TYPE,
               num_bond_type=NUM_BOND_TYPE, **kwargs)


def pe_precompute(graphs, cls, kwargs, cfg, max_freqs=10):
    """The per-model positional-encoding precompute each net needs on its
    input graphs — shared by the trainer below and the serving CLI
    (`experiments/serve_main.py`), which must apply the SAME transforms
    to request graphs."""
    if cls in (SANNet, SANNodeSpectra):
        apply_laplace_decomp(graphs, max_freqs)
    if cls in (GraphiTSpectraNet, GatedGCNLSPENet, SANLSPENet, PNALSPENet):
        dim = kwargs.get("pos_enc_dim", 20)
        pe_init = kwargs.get("pe_init", "rand_walk")
        if pe_init == "rand_walk":
            for g in graphs:
                g.lap_pe = rwpe(g, dim)
        elif pe_init == "lap_pe":
            # Laplacian eigvec init (LSPE data lap_positional_encoding)
            from feta_tmlr_tpu.pe import LapEncoding
            LapEncoding(dim, normalization="sym").apply_to(graphs)
        else:  # no_pe: nets ignore batch.lap_pe but collation still
            # needs a consistent (absent) attribute across graphs
            pass
        if kwargs.get("adaptive_edge_pe"):
            # k_RW = (I - gamma L)^p_steps (LSPE molecules.py make_full_graph)
            PStepRWEncoding(p=cfg["net_params"].get("p_steps", 2),
                            beta=cfg["net_params"].get("gamma", 0.25),
                            normalization="sym").apply_to(graphs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--init_lr", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--max_freqs", type=int, default=10)
    p.add_argument("--synthetic-graphs", type=int, default=96)
    p.add_argument("--data-dir", type=str, default="data",
                   help="root holding molecules/{train,val,test}.pickle")
    p.add_argument("--zinc-full", action="store_true",
                   help="load every molecule (ZINC-full) instead of the "
                        "10k/1k/1k index subset")
    p.add_argument("--max-graphs", type=int, default=None,
                   help="head-slice each real split (smoke runs)")
    p.add_argument("--outdir", type=str, default=None,
                   help="write logs.csv/results.csv + TensorBoard scalars "
                        "here (reference out_dir, LPE main:167-195)")
    p.add_argument("--ckpt-dir", type=str, default=None,
                   help="per-epoch keep-latest checkpoints (orbax)")
    args = p.parse_args(argv)

    cfg = (load_config(args.config) if args.config
           else {"model": "SAN_NodeSpectra", "params": {}, "net_params": {}})
    cls, kwargs = resolve_build(cfg, args.model)

    params = cfg["params"]
    epochs = args.epochs or params.get("epochs", 100)
    lr = args.init_lr or params.get("init_lr", 1e-3)
    batch_size = args.batch_size or params.get("batch_size", 128)

    tr, va, te, _real = load_zinc_or_synthetic(
        args.data_dir, seed=args.seed, n_synthetic=args.synthetic_graphs,
        subset=not args.zinc_full, max_graphs_per_split=args.max_graphs)
    graphs = tr + va + te

    # per-model PE precompute (shared with the serving CLI)
    pe_precompute(graphs, cls, kwargs, cfg, max_freqs=args.max_freqs)
    model = construct_model(cls, kwargs,
                            avg_d_log=(average_log_degree(graphs)
                                       if cls is PNALSPENet else None))

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, batch_size, max_nodes, shuffle_seed=args.seed)
    val_b = make_batches(va, batch_size, max_nodes)
    test_b = make_batches(te, batch_size, max_nodes)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_reg", lr=lr,
                    weight_decay=params.get("weight_decay", 0.0),
                    epochs=epochs, schedule="plateau",
                    plateau_patience=params.get("lr_schedule_patience", 10),
                    plateau_factor=params.get("lr_reduce_factor", 0.5),
                    min_lr=params.get("min_lr", 1e-5),
                    # lapeig-aux models return a pre-weighted scalar term
                    regularization=(1.0 if kwargs.get("use_lapeig_loss")
                                    else 0.0),
                    # reference stop protocol: break at min_lr / max_time
                    # hours (LPE main_ZINC_graph_regression.py:199-208)
                    stop_at_min_lr=True,
                    max_time_h=params.get("max_time"),
                    # reference flips eigvec signs every train batch for the
                    # SAN tier (LPE/train/train_ZINC...py:26-33); RWPE-based
                    # LSPE models are sign-fixed and must NOT flip
                    sign_flip=cls in (SANNet, SANNodeSpectra),
                    seed=args.seed),
        steps_per_epoch=len(train_b))
    csv_log = tb_log = None
    if args.outdir:
        from feta_tmlr_tpu.train.logging import CSVLogger, TensorBoardLogger
        csv_log = CSVLogger(args.outdir)
        tb_log = TensorBoardLogger(args.outdir)

    def log_row(row):
        print({k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in row.items()})
        if csv_log is not None:
            csv_log.log(row)
            tb_log.log(row)

    result = trainer.fit(train_b, val_batches=val_b, test_batches=test_b,
                         epochs=epochs, ckpt_dir=args.ckpt_dir,
                         log_fn=log_row)
    if csv_log is not None:
        csv_log.flush()
        csv_log.write_results(
            {"best_val": result["best_val"],
             **{f"test_{k}": v
                for k, v in (result.get("test") or {}).items()}})
        tb_log.close()
    print("best_val:", result["best_val"], "test:", result.get("test"))
    return result


if __name__ == "__main__":
    main()
