"""LPE-tier SBM node classification (PATTERN/CLUSTER), JSON-config driven.

Equivalent of /root/reference/LPE/main_SBMs_node_classification.py: SAN
family with node-level readout, weighted CE + class-balanced accuracy.
"""

from __future__ import annotations

import argparse

from feta_tmlr_tpu.data.sbm import load_sbm_or_synthetic
from feta_tmlr_tpu.experiments.common import (
    make_batches, set_accepted_defaults)
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.nn.san import SANNet, SANNodeSpectra
from feta_tmlr_tpu.pe.encodings import PStepRWEncoding
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

MODELS = {"SAN": (SANNet, {}),
          "SAN_NodeLPE": (SANNet, {"lpe": "node"}),
          "SAN_EdgeLPE": (SANNet, {"lpe": "edge"}),
          "SAN_NodeSpectra": (SANNodeSpectra, {}),
          # LSPE SBM tier (GraphiT_SBM_PATTERN_LSPE.json)
          "GraphiTSpectra": (GraphiTSpectraNet, {}),
          "Spectra": (GraphiTSpectraNet, {}),
          "GraphiT": (GraphiTSpectraNet, {"spectra": False})}





def resolve_model_name(cfg, model_arg=None):
    from feta_tmlr_tpu.utils.config import resolve_reference_model_name
    return resolve_reference_model_name(cfg, model_arg)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--n-nodes", type=int, default=64)
    p.add_argument("--n-classes", type=int, default=2)
    p.add_argument("--max_freqs", type=int, default=10)
    p.add_argument("--synthetic-graphs", type=int, default=48)
    p.add_argument("--dataset", type=str, default="SBM_PATTERN")
    p.add_argument("--data-dir", type=str, default="data",
                   help="root holding SBMs/<name>_{train,val,test}.pkl")
    p.add_argument("--max-graphs", type=int, default=None)
    args = p.parse_args(argv)

    cfg = (load_config(args.config) if args.config
           else {"model": args.model, "params": {}, "net_params": {}})
    model_name = resolve_model_name(cfg, args.model)
    cls, extra = MODELS[model_name]
    params = cfg["params"]
    epochs = args.epochs or params.get("epochs", 50)

    name = cfg.get("dataset", args.dataset)
    if not str(name).startswith("SBM_"):
        name = f"SBM_{name}"
    tr, va, te, _real = load_sbm_or_synthetic(
        args.data_dir, name, seed=args.seed,
        n_synthetic=args.synthetic_graphs, n_nodes=args.n_nodes,
        n_classes=args.n_classes, max_graphs_per_split=args.max_graphs)
    graphs = tr + va + te
    import numpy as np
    n_tags = int(max(int(g.x.max()) for g in graphs)) + 1
    n_classes = int(max(int(g.y.max()) for g in graphs)) + 1
    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    set_accepted_defaults(cls, kwargs, hidden_dim=32, out_dim=32,
                          n_heads=4, n_layers=3)
    if cls is GraphiTSpectraNet:
        # LSPE PE precompute: RWPE p channel + optional (I-gamma L)^p kernel
        dim = kwargs.setdefault("pos_enc_dim", 12)
        for g in graphs:
            g.lap_pe = rwpe(g, dim)
        if kwargs.get("adaptive_edge_pe"):
            PStepRWEncoding(p=cfg["net_params"].get("p_steps", 2),
                            beta=cfg["net_params"].get("gamma", 0.25),
                            normalization="sym").apply_to(graphs)
    else:
        apply_laplace_decomp(graphs, args.max_freqs)
        set_accepted_defaults(cls, kwargs, lpe_dim=8)
    model = cls(num_atom_type=n_tags, num_bond_type=2, node_level=True,
                n_out=n_classes, **kwargs)

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, params.get("batch_size", 16), max_nodes,
                           shuffle_seed=args.seed, node_labels=True)
    val_b = make_batches(va, params.get("batch_size", 16), max_nodes,
                         node_labels=True)
    test_b = make_batches(te, params.get("batch_size", 16), max_nodes,
                          node_labels=True)
    trainer = Trainer(
        model,
        TrainConfig(task="node_clf", lr=params.get("init_lr", 1e-3),
                    epochs=epochs, schedule="plateau",
                    sign_flip=cls in (SANNet, SANNodeSpectra),
                    seed=args.seed),
        steps_per_epoch=len(train_b))
    result = trainer.fit(train_b, val_batches=val_b,
                         test_batches=test_b, epochs=epochs,
                         log_fn=lambda row: print(
                             {k: (round(v, 5) if isinstance(v, float)
                                  else v) for k, v in row.items()}))
    print("best_val:", result["best_val"])
    return result


if __name__ == "__main__":
    main()
