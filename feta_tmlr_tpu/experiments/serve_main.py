"""Serving CLI: expose a trained config-driven model over HTTP.

The reference stops at training scripts; this is the deployment entry:
build the model the SAME way the config-driven trainer does (same JSON
schema, same registry), restore its checkpoint, and serve raw-graph JSON
requests — positional encodings (laplace_decomp / RWPE / k_RW) are
computed SERVER-side with the exact transforms training used, so clients
only send `x` (or `x_int`), `edge_index`, and optional `edge_type`.

  feta-serve --config configs/LPE/ZINC_SAN_NodeLPE_optimized.json \\
      --ckpt-dir runs/ckpt --port 8000 [--wire] [--max-batch 64]

  POST /predict {"graphs": [{"x_int": [...], "edge_index": [[..],[..]],
                             "edge_type": [...]}]} -> {"logits": [...]}
"""

from __future__ import annotations

import argparse

import jax

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.experiments.main_ZINC_graph_regression import (
    construct_model,
    pe_precompute,
    resolve_build,
)
from feta_tmlr_tpu.nn.pna import PNALSPENet
from feta_tmlr_tpu.serve import Predictor
from feta_tmlr_tpu.train import Trainer, TrainConfig
from feta_tmlr_tpu.utils.config import load_config


def build_from_config(config_path=None, model_arg=None, max_freqs=10):
    """(model, preprocess_fn, sample_graphs) for serving — the SAME
    resolve/construct path the trainer main uses."""
    cfg = (load_config(config_path) if config_path
           else {"model": "SAN_NodeSpectra", "params": {},
                 "net_params": {}})
    cls, kwargs = resolve_build(cfg, model_arg)

    def preprocess(graphs):
        pe_precompute(graphs, cls, kwargs, cfg, max_freqs=max_freqs)

    sample = zinc_categorical_dataset(seed=0, n_graphs=4)
    preprocess(sample)
    if cls is PNALSPENet and "avg_d_log" not in kwargs:
        # avg_d_log is a TRAINING-dataset statistic baked into PNA's
        # degree scalers; it must travel with the model. Persist it in
        # the config (net_params.avg_d_log) when training — without it
        # the served function differs from the trained one.
        raise SystemExit(
            "PNA serving needs net_params.avg_d_log in the config "
            "(the training dataset's average log degree)")
    return construct_model(cls, kwargs), preprocess, sample


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default=None,
                   help="orbax checkpoint dir from training "
                        "(--ckpt-dir of the mains); omitted -> fresh "
                        "random weights (smoke mode)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-nodes", type=int, default=64)
    p.add_argument("--max_freqs", type=int, default=10)
    p.add_argument("--wire", action="store_true",
                   help="compact wire format for device upload")
    p.add_argument("--quantize", action="store_true",
                   help="weight-only int8 parameters (quantize.py)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile the serving shape before listening")
    args = p.parse_args(argv)

    model, preprocess, sample = build_from_config(
        args.config, args.model, args.max_freqs)
    sample_batch = collate_graphs(sample, max_nodes=args.max_nodes)
    if args.ckpt_dir:
        # the restore template's opt_state tree must MATCH the training
        # optimizer's — the ZINC main trains with the plateau schedule
        # (injectable lr), so build the template the same way
        trainer = Trainer(model, TrainConfig(task="graph_reg",
                                             schedule="plateau"))
        state_like = trainer.init(jax.random.key(0), sample_batch)
        pred = Predictor(model, ckpt_dir=args.ckpt_dir,
                         state_like=state_like,
                         max_batch=args.max_batch,
                         collate_kwargs={"max_nodes": args.max_nodes},
                         wire=args.wire, quantize=args.quantize)
    else:
        variables = jax.jit(model.init)(jax.random.key(0), sample_batch)
        pred = Predictor(model, variables=variables,
                         max_batch=args.max_batch,
                         collate_kwargs={"max_nodes": args.max_nodes},
                         wire=args.wire, quantize=args.quantize)
    if args.warmup:
        n = pred.warmup(sample[0])
        print(f"warmed up {n} serving shape(s)")

    from feta_tmlr_tpu.serve_http import serve_forever
    serve_forever(pred, args.host, args.port, preprocess=preprocess)


if __name__ == "__main__":
    main()
