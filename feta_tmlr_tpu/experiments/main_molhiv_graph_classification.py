"""LPE-tier ogbg-molhiv binary classification (JSON-config driven).

Equivalent of /root/reference/LPE/main_molhiv_graph_regression.py: SAN
family with OGB molecule features reduced to categorical ids, BCE loss and
ROC-AUC selection.
"""

from __future__ import annotations

import argparse

import numpy as np

from feta_tmlr_tpu.data.batch import Graph
from feta_tmlr_tpu.data.ogb_raw import load_ogb_or_synthetic
from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.experiments.common import (
    make_batches, set_accepted_defaults)
from feta_tmlr_tpu.nn.san import SANNet, SANNodeSpectra
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

MODELS = {"SAN": (SANNet, {}),
          "SAN_NodeLPE": (SANNet, {"lpe": "node"}),
          "SAN_EdgeLPE": (SANNet, {"lpe": "edge"}),
          "SAN_NodeSpectra": (SANNodeSpectra, {})}




def molhiv_like(seed, n_graphs, num_atom_type=119, num_bond_type=5):
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(8, 28))
        g = random_connected_graph(rng, n, 1, edge_prob=0.15)
        g.x = rng.integers(0, num_atom_type, (n, 1)).astype(np.int32)
        g.edge_type = rng.integers(0, num_bond_type,
                                   g.num_edges).astype(np.int32)
        g.y = np.float32(i % 5 == 2)     # ~20% positives, spread
        graphs.append(g)
    return graphs



def resolve_model_name(cfg, model_arg=None):
    from feta_tmlr_tpu.utils.config import resolve_reference_model_name
    return resolve_reference_model_name(cfg, model_arg)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--max_freqs", type=int, default=10)
    p.add_argument("--synthetic-graphs", type=int, default=64)
    p.add_argument("--data-dir", type=str, default="data",
                   help="root holding ogbg_molhiv/raw CSVs")
    p.add_argument("--max-graphs", type=int, default=None)
    args = p.parse_args(argv)

    cfg = (load_config(args.config) if args.config
           else {"model": args.model, "params": {}, "net_params": {}})
    model_name = resolve_model_name(cfg, args.model)
    cls, extra = MODELS[model_name]
    params = cfg["params"]
    epochs = args.epochs or params.get("epochs", 50)

    tr, va, te, used_real = load_ogb_or_synthetic(
        args.data_dir, "ogbg-molhiv",
        lambda: molhiv_like(args.seed, args.synthetic_graphs),
        min_nodes=6, max_graphs=args.max_graphs)
    graphs = tr + va + te
    if used_real:
        # this tier's nets embed a single categorical id per node/edge
        # (LSPE features='simple' keeps leading columns, ogb_mol.py:199-203)
        for g in graphs:
            g.x = g.x[:, :1].astype(np.int32)
    apply_laplace_decomp(graphs, args.max_freqs)

    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    set_accepted_defaults(cls, kwargs, hidden_dim=32, out_dim=32,
                          n_heads=4, n_layers=3, lpe_dim=8)
    model = cls(num_atom_type=119, num_bond_type=5, n_out=1, **kwargs)

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, params.get("batch_size", 32), max_nodes,
                           shuffle_seed=args.seed)
    val_b = make_batches(va, params.get("batch_size", 32), max_nodes)
    test_b = (make_batches(te, params.get("batch_size", 32), max_nodes)
              if te else None)
    trainer = Trainer(
        model,
        TrainConfig(task="binary_graph", lr=params.get("init_lr", 1e-3),
                    epochs=epochs, schedule="plateau",
                    sign_flip=cls in (SANNet, SANNodeSpectra),
                    # ogbg-molhiv's OGB metric is ROC-AUC
                    binary_metric="rocauc",
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
