"""LSPE-tier OGB molecule multitask classification (MOLTOX21/MOLPCBA).

Equivalent of /root/reference/LSPE/main_OGBMOL_graph_classification.py:
GatedGCN/PNA/GraphiT/SAN (+LSPE p channel) on OGB molecule graphs with
NaN-masked multitask BCE and AP/ROC-AUC evaluation
(LSPE/data/ogb_mol.py wrappers).
"""

from __future__ import annotations

import argparse

import numpy as np

from feta_tmlr_tpu.data.ogb_raw import load_ogb_or_synthetic
from feta_tmlr_tpu.data.synthetic import random_connected_graph
from feta_tmlr_tpu.experiments.common import make_batches
from feta_tmlr_tpu.nn.gatedgcn import GatedGCNLSPENet
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.nn.pna import PNALSPENet, average_log_degree
from feta_tmlr_tpu.nn.san_lspe import SANLSPENet
from feta_tmlr_tpu.pe.rwpe import rwpe
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

MODELS = {
    "GatedGCN": (GatedGCNLSPENet, {}),
    "PNA": (PNALSPENet, {}),
    "GraphiTSpectra": (GraphiTSpectraNet, {}),
    "Spectra": (GraphiTSpectraNet, {}),
    "GraphiT": (GraphiTSpectraNet, {"spectra": False}),
    "SAN": (SANLSPENet, {}),
}
N_TASKS = {"MOLTOX21": 12, "MOLPCBA": 128}


def ogbmol_like(seed, n_graphs, n_tasks, num_atom_type=119,
                num_bond_type=5):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(8, 26))
        g = random_connected_graph(rng, n, 1, edge_prob=0.15)
        g.x = rng.integers(0, num_atom_type, (n, 1)).astype(np.int32)
        g.edge_type = rng.integers(0, num_bond_type,
                                   g.num_edges).astype(np.int32)
        y = rng.integers(0, 2, n_tasks).astype(np.float32)
        y[rng.random(n_tasks) < 0.25] = np.nan        # unlabeled tasks
        g.y = y
        graphs.append(g)
    return graphs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None,
                   choices=sorted(N_TASKS))
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--synthetic-graphs", type=int, default=64)
    p.add_argument("--data-dir", type=str, default="data",
                   help="root holding ogbg_<dataset>/raw CSVs")
    p.add_argument("--max-graphs", type=int, default=None)
    args = p.parse_args(argv)

    cfg = (load_config(args.config) if args.config
           else {"model": args.model, "params": {}, "net_params": {}})
    cls, extra = MODELS[args.model or cfg.get("model")
                        or "GatedGCN"]
    params = cfg["params"]
    epochs = args.epochs or params.get("epochs", 50)
    # config "dataset" uses the reference's OGBG-MOLTOX21 naming
    dataset = (args.dataset
               or str(cfg.get("dataset") or "MOLTOX21")
               .upper().replace("OGBG-", ""))
    if dataset not in N_TASKS:
        raise SystemExit(f"unknown dataset {dataset}; "
                         f"choose from {sorted(N_TASKS)}")
    n_tasks = N_TASKS[dataset]

    tr, va, te, used_real = load_ogb_or_synthetic(
        args.data_dir, f"ogbg-{dataset.lower()}",
        lambda: ogbmol_like(args.seed, args.synthetic_graphs, n_tasks),
        min_nodes=6, max_graphs=args.max_graphs)
    graphs = tr + va + te
    if used_real:
        # single categorical id per node (LSPE features='simple' analogue)
        for g in graphs:
            g.x = g.x[:, :1].astype(np.int32)
        # task count from the actual label table (fixtures / pruned
        # datasets may be narrower than the published width)
        n_tasks = int(np.atleast_1d(graphs[0].y).shape[0])
    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    kwargs.setdefault("hidden_dim", 32)
    kwargs.setdefault("out_dim", 32)
    kwargs.setdefault("n_layers", 3)
    dim = kwargs.setdefault("pos_enc_dim", 12)
    pe_init = kwargs.get("pe_init", "rand_walk")
    if pe_init == "rand_walk":
        for g in graphs:
            g.lap_pe = rwpe(g, dim)
    elif pe_init == "lap_pe":
        from feta_tmlr_tpu.pe import LapEncoding
        LapEncoding(dim, normalization="sym").apply_to(graphs)
    if cls is PNALSPENet:
        kwargs.setdefault("avg_d_log", average_log_degree(graphs))
    model = cls(num_atom_type=119, num_bond_type=5, n_out=n_tasks,
                **kwargs)

    max_nodes = max(g.num_nodes for g in graphs)
    train_b = make_batches(tr, params.get("batch_size", 32), max_nodes,
                           shuffle_seed=args.seed)
    val_b = make_batches(va, params.get("batch_size", 32), max_nodes)
    test_b = (make_batches(te, params.get("batch_size", 32), max_nodes)
              if te else None)
    trainer = Trainer(
        model,
        TrainConfig(task="binary_graph", lr=params.get("init_lr", 1e-3),
                    epochs=epochs, schedule="plateau", sign_flip=False,
                    regularization=(1.0 if kwargs.get("use_lapeig_loss")
                                    else 0.0),
                    # OGB metric per dataset: ROC-AUC for MOLTOX21,
                    # AP for MOLPCBA (train_OGBMOL...:69-70)
                    binary_metric=("rocauc" if dataset == "MOLTOX21"
                                   else "ap"),
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
