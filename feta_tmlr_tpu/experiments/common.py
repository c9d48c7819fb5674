"""Shared experiment infrastructure for the CLI entry points.

Mirrors the reference's experiments/ layer (SURVEY.md §2.4): argparse flag
names, nested outdir naming encoding hyperparameters
(run_transformer_gengcn_cv.py:68-120), per-epoch CSV logs and final
results.csv. Dataset resolution: TU text datasets are read from --datadir
(reference `dataset/` layout) when present; otherwise a clearly-labeled
synthetic fallback with the same shapes is used (this build environment has
no network egress and ships no datasets).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence

import numpy as np

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.data.batch import Graph, GraphBatch
from feta_tmlr_tpu.data.ogb_raw import load_ogb_or_synthetic
from feta_tmlr_tpu.data.sbm import load_sbm_or_synthetic
from feta_tmlr_tpu.data.synthetic import sbm_like_dataset, zinc_like_dataset
from feta_tmlr_tpu.data.tu import load_fold_indices, load_tu_dataset
from feta_tmlr_tpu.data.zinc import NUM_ATOM_TYPE, load_zinc_or_synthetic
from feta_tmlr_tpu.pe import (
    POSENCODINGS,
    LapEncoding,
)
from feta_tmlr_tpu.pe.cache import PECache
from feta_tmlr_tpu.train.logging import CSVLogger


def base_parser(dataset_default: str) -> argparse.ArgumentParser:
    """Flags shared by the run_transformer* family (reference names)."""
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", type=str, default=dataset_default)
    p.add_argument("--datadir", type=str, default="dataset")
    p.add_argument("--nb-heads", type=int, default=4)
    p.add_argument("--nb-layers", type=int, default=3)
    p.add_argument("--dim-hidden", type=int, default=64)
    p.add_argument("--pos-enc", choices=[None, "diffusion", "pstep", "adj"],
                   default=None)
    p.add_argument("--lappe", action="store_true")
    p.add_argument("--lap-dim", type=int, default=2)
    p.add_argument("--p", type=int, default=1)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--normalization", choices=[None, "sym", "rw"],
                   default="sym")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--outdir", type=str, default="")
    p.add_argument("--warmup", type=int, default=None)
    p.add_argument("--batch-norm", action="store_true")
    p.add_argument("--layer-norm", action="store_true",
                   help="use layer norm (ZINC-style scripts default to BN)")
    p.add_argument("--zero-diag", action="store_true")
    p.add_argument("--fold-idx", type=int, default=1)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--test", action="store_true")
    p.add_argument("--gnn_type", type=str, default="ChebConvDynamic")
    p.add_argument("--filter_order", type=int, default=4)
    p.add_argument("--last_layer_filter", action="store_false")
    p.add_argument("--regularization", type=float, default=0.0)
    p.add_argument("--synthetic-graphs", type=int, default=120,
                   help="fallback dataset size when real data is absent")
    p.add_argument("--max-graphs", type=int, default=None,
                   help="head-slice each real split (smoke runs)")
    return p


def resolve_outdir(args, family: str = "transformer") -> Optional[str]:
    """Nested outdir naming (run_transformer_gengcn_cv.py:68-120)."""
    if not args.outdir:
        return None
    lapdir = "NoPE" if not args.lappe else f"Lap{args.lap_dim}"
    bn = "BN" if args.batch_norm else "LN"
    parts = [args.outdir, family, args.dataset]
    if args.zero_diag:
        parts.append("zero_diag")
    parts.append(lapdir)
    parts.append("_".join(str(v) for v in (
        args.weight_decay, args.dropout, args.lr, args.nb_layers,
        args.nb_heads, args.dim_hidden, bn, args.pos_enc,
        args.normalization, args.p, args.beta)))
    if hasattr(args, "fold_idx"):
        parts.append(f"fold-{args.fold_idx}")
    out = os.path.join(*parts)
    os.makedirs(out, exist_ok=True)
    return out


def set_accepted_defaults(model_cls, kwargs: dict, **defaults) -> dict:
    """setdefault() only for constructor fields `model_cls` actually has.

    The config-driven mains share one default block across model families
    whose signatures differ (e.g. GatedGCN has no n_heads/lpe_dim); blindly
    defaulting an unknown kwarg crashes flax's dataclass __init__.
    """
    import dataclasses
    accepted = {f.name for f in dataclasses.fields(model_cls)}
    for k, v in defaults.items():
        if k in accepted:
            kwargs.setdefault(k, v)
    return kwargs


def load_tu_or_synthetic(args):
    """(graphs, in_size, n_classes, used_real_data)."""
    path = os.path.join(args.datadir, args.dataset)
    if os.path.isdir(path):
        graphs, n_tags = load_tu_dataset(args.dataset, args.datadir)
        n_classes = len({int(g.y) for g in graphs})
        in_size = graphs[0].x.shape[-1]
        return graphs, in_size, n_classes, True
    print(f"[warn] dataset dir {path} not found - using synthetic fallback "
          f"({args.synthetic_graphs} graphs)")
    graphs = random_graph_dataset(
        seed=args.seed, n_graphs=args.synthetic_graphs, min_nodes=8,
        max_nodes=24, n_features=7, n_classes=2)
    return graphs, 7, 2, False


def onehot_x(graphs: Sequence[Graph], n_tags: int) -> Sequence[Graph]:
    """Categorical node ids -> one-hot float features, the transformer
    tier's input convention (reference GraphDataset.one_hot,
    transformer/data.py:50-56)."""
    eye = np.eye(n_tags, dtype=np.float32)
    for g in graphs:
        if np.issubdtype(g.x.dtype, np.integer):
            g.x = eye[g.x.reshape(-1).astype(np.int64) % n_tags]
    return graphs


def load_zinc_tier(args, onehot: bool = True):
    """ZINC train/val/test for the run_transformer* family.

    (train, val, test, in_size, used_real). Real pickles under --datadir
    (molecules/ layout) when present; synthetic fallback otherwise. With
    onehot=True node ids become [n, 28] one-hot floats, matching the
    reference's `GraphDataset(..., n_tags=28)` path (transformer/data.py).
    """
    tr, va, te, used = load_zinc_or_synthetic(
        args.datadir, seed=args.seed, n_synthetic=args.synthetic_graphs,
        max_graphs_per_split=getattr(args, "max_graphs", None))
    if onehot:
        for split in (tr, va, te):
            onehot_x(split, NUM_ATOM_TYPE)
    return tr, va, te, NUM_ATOM_TYPE, used


def load_sbm_tier(args, onehot: bool = True):
    """PATTERN/CLUSTER train/val/test for the SBM runners.

    (train, val, test, in_size, n_classes, used_real). Accepts --dataset
    'PATTERN' or 'SBM_PATTERN'; real pickles under --datadir (SBMs/ layout)
    when present.
    """
    name = str(args.dataset)
    if not name.startswith("SBM_"):
        name = f"SBM_{name}"
    tr, va, te, used = load_sbm_or_synthetic(
        args.datadir, name, seed=args.seed,
        n_synthetic=args.synthetic_graphs,
        n_nodes=getattr(args, "n_nodes", 96),
        max_graphs_per_split=getattr(args, "max_graphs", None))
    all_graphs = tr + va + te
    n_tags = int(max(int(g.x.max()) for g in all_graphs)) + 1
    n_classes = int(max(int(g.y.max()) for g in all_graphs)) + 1
    if onehot:
        for split in (tr, va, te):
            onehot_x(split, n_tags)
    return tr, va, te, n_tags, n_classes, used


def load_ogb_tier(args, name: str, synthetic_fn,
                  min_nodes: Optional[int] = None):
    """(train, val, test, used_real) for the OGB runners; real raw-CSV
    layout under --datadir when present."""
    return load_ogb_or_synthetic(
        args.datadir, name, synthetic_fn, min_nodes=min_nodes,
        max_graphs=getattr(args, "max_graphs", None))


def apply_position_encodings(graphs: Sequence[Graph], args,
                             cache_dir: Optional[str] = None):
    """PE wiring of the reference trainers
    (run_transformer_gengcn_cv.py:292-325)."""
    cache = PECache(cache_dir) if cache_dir else None
    if args.pos_enc:
        cls = POSENCODINGS[args.pos_enc]
        if args.pos_enc == "diffusion":
            enc = cls(beta=args.beta, normalization=args.normalization,
                      cache=cache, zero_diag=args.zero_diag)
        elif args.pos_enc == "pstep":
            enc = cls(p=args.p, beta=args.beta,
                      normalization=args.normalization, cache=cache,
                      zero_diag=args.zero_diag)
        else:
            enc = cls(normalization=args.normalization, cache=cache,
                      zero_diag=args.zero_diag)
        enc.apply_to(graphs)
    if args.lappe:
        LapEncoding(args.lap_dim, normalization="sym").apply_to(graphs)
    return graphs


def make_batches(graphs: Sequence[Graph], batch_size: int,
                 max_nodes: Optional[int] = None,
                 shuffle_seed: Optional[int] = None,
                 node_labels: Optional[bool] = None) -> List[GraphBatch]:
    idx = np.arange(len(graphs))
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(idx)
    if max_nodes is None:
        from feta_tmlr_tpu.data.batch import pad_bucket
        max_nodes = pad_bucket(max(g.num_nodes for g in graphs))
    out = []
    for i in range(0, len(idx), batch_size):
        chunk = [graphs[j] for j in idx[i:i + batch_size]]
        out.append(collate_graphs(chunk, max_nodes=max_nodes,
                                  node_labels=node_labels))
    return out


def run_and_log(trainer, train_b, val_b, test_b, args, outdir,
                extra_results=None, rebatch_fn=None):
    logger = CSVLogger(outdir) if outdir else None
    result = trainer.fit(
        train_b, val_batches=val_b, test_batches=test_b,
        epochs=args.epochs, rebatch_fn=rebatch_fn,
        log_fn=(logger.log if logger else
                lambda row: print({k: (round(v, 5)
                                       if isinstance(v, float) else v)
                                   for k, v in row.items()})))
    if logger:
        logger.flush("logs.csv")
        summary = {"best_epoch": result["best_epoch"],
                   "best_val": result["best_val"]}
        if "test" in result:
            summary.update({f"test_{k}": v
                            for k, v in result["test"].items()})
        if extra_results:
            summary.update(extra_results)
        logger.write_results(summary)
    print("best_val:", result["best_val"],
          "test:", result.get("test"))
    return result
