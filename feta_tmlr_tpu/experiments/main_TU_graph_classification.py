"""LPE-tier TU graph classification, JSON-config driven.

Equivalent of /root/reference/LPE/main_TUs_graph_classification.py: SAN
family with float (one-hot) node features, CE + accuracy.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from feta_tmlr_tpu.data import random_graph_dataset
from feta_tmlr_tpu.data.tu import load_fold_indices, load_tu_dataset
from feta_tmlr_tpu.experiments.common import (
    make_batches, set_accepted_defaults)
from feta_tmlr_tpu.nn.gatedgcn import GatedGCNLSPENet
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.nn.pna import PNALSPENet, average_log_degree
from feta_tmlr_tpu.nn.san import SANNet, SANNodeSpectra
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

MODELS = {
    "SAN": (SANNet, {}),
    "SAN_NodeLPE": (SANNet, {"lpe": "node"}),
    "SAN_EdgeLPE": (SANNet, {"lpe": "edge"}),
    "SAN_NodeSpectra": (SANNodeSpectra, {}),
    # LSPE-TU tier (nets/TU_graph_classification): float features in
    "GatedGCN": (GatedGCNLSPENet, {"categorical_input": False}),
    "PNA": (PNALSPENet, {"categorical_input": False}),
    "GraphiT": (GraphiTSpectraNet, {"spectra": False,
                                    "categorical_input": False}),
    "Spectra": (GraphiTSpectraNet, {"categorical_input": False}),
}





def resolve_model_name(cfg, model_arg=None):
    from feta_tmlr_tpu.utils.config import resolve_reference_model_name
    return resolve_reference_model_name(cfg, model_arg)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--dataset", type=str, default="NCI1")
    p.add_argument("--datadir", type=str, default="dataset")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--fold-idx", type=int, default=1)
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--max_freqs", type=int, default=10)
    p.add_argument("--synthetic-graphs", type=int, default=60)
    args = p.parse_args(argv)

    cfg = (load_config(args.config) if args.config
           else {"model": args.model, "params": {}, "net_params": {}})
    model_name = resolve_model_name(cfg, args.model)
    cls, extra = MODELS[model_name]
    params = cfg["params"]
    epochs = args.epochs or params.get("epochs", 100)

    path = os.path.join(args.datadir, args.dataset)
    if os.path.isdir(path):
        graphs, _ = load_tu_dataset(args.dataset, args.datadir)
    else:
        print(f"[warn] {path} not found - synthetic fallback")
        graphs = random_graph_dataset(seed=args.seed,
                                      n_graphs=args.synthetic_graphs,
                                      n_features=7)
    n_classes = len({int(g.y) for g in graphs})
    apply_laplace_decomp(graphs, args.max_freqs)
    if cls in (GatedGCNLSPENet, PNALSPENet, GraphiTSpectraNet):
        dim = cfg["net_params"].get("pos_enc_dim", 12)
        for g in graphs:
            g.lap_pe = rwpe(g, dim)
    tr_idx, te_idx = load_fold_indices(
        graphs, args.fold_idx, name=args.dataset,
        fold_dir=f"{args.datadir}/fold-idx", seed=args.seed)

    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    set_accepted_defaults(cls, kwargs, hidden_dim=32, out_dim=32,
                          n_heads=4, n_layers=3, lpe_dim=8,
                          categorical_input=False)
    if cls is PNALSPENet:
        kwargs.setdefault("avg_d_log", average_log_degree(graphs))
    model = cls(num_atom_type=1, num_bond_type=1,
                n_out=n_classes, **kwargs)

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches([graphs[i] for i in tr_idx],
                           params.get("batch_size", 32), max_nodes,
                           shuffle_seed=args.seed)
    test_b = make_batches([graphs[i] for i in te_idx],
                          params.get("batch_size", 32), max_nodes)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_clf", lr=params.get("init_lr", 1e-3),
                    epochs=epochs, schedule="plateau",
                    # eigvec flip for the SAN tier (LPE train loops:26-33)
                    sign_flip=cls in (SANNet, SANNodeSpectra),
                    seed=args.seed),
        steps_per_epoch=len(train_b))
    result = trainer.fit(train_b, val_batches=test_b, test_batches=test_b,
                         epochs=epochs,
                         log_fn=lambda row: print(
                             {k: (round(v, 5) if isinstance(v, float)
                                  else v) for k, v in row.items()}))
    print("best_val:", result["best_val"], "test:", result.get("test"))
    return result


if __name__ == "__main__":
    main()
