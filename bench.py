"""Benchmark: FeTA (ChebConvDynamic) training step on ZINC-shaped graphs.

Prints ONE JSON line:
  {"metric": "edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": R, ...}

The metric follows BASELINE.json ("edges/s/chip + epoch time, ZINC,
ChebConvDynamic"): real (directed) graph edges processed per second of
jitted train-step wall time on one chip, at the reference's canonical ZINC
configuration (run_transformer_gengcn.py defaults: d_model=64, heads=8,
layers=10, ff=128, batch=128, filter_order=4, batch_norm, diffusion PE,
lap-PE dim 8).

The reference repo records no benchmark numbers and its PyTorch/PyG stack
cannot run here (no torch_geometric, no GPU); `vs_baseline` is therefore the
ratio against the pure-torch CPU twin of the same model
(feta_tmlr_tpu/reference_twin) on identical data, measured once and cached
in bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig

BATCH = 128
MAX_NODES = 48
CFG = dict(in_size=28, nb_class=1, d_model=64, nb_heads=8,
           dim_feedforward=128, dropout=0.0, nb_layers=10,
           batch_norm=True, lap_pos_enc=True, lap_pos_enc_dim=8,
           filter_order=4, gnn_type="ChebConvDynamic")
ZINC_TRAIN_GRAPHS = 10000          # ZINC subset size, for epoch-time estimate
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")


def make_batch():
    graphs = zinc_like_dataset(seed=0, n_graphs=BATCH)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=MAX_NODES)
    n_edges = int(sum(g.num_edges for g in graphs))
    return batch, n_edges


def bench_jax(batch, n_edges, warmup=3, iters=20):
    model = DiffGraphTransformerGenGCN(**CFG)
    trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                         sign_flip=True))
    state = trainer.init(jax.random.key(0), batch)
    rng = jax.random.key(1)
    for i in range(warmup):
        state, loss = trainer._jit_step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = trainer._jit_step(state, batch,
                                        jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(float(loss)), "non-finite loss in bench"
    return dt


def bench_torch_baseline(batch, n_edges, iters=3):
    """Pure-torch CPU twin, same model/data; cached across rounds."""
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["sec_per_step"]
    import torch
    from feta_tmlr_tpu.reference_twin.torch_model import TorchFeTA
    model = TorchFeTA(in_size=CFG["in_size"], nb_class=1,
                      d_model=CFG["d_model"], nb_heads=CFG["nb_heads"],
                      dim_feedforward=CFG["dim_feedforward"],
                      nb_layers=CFG["nb_layers"],
                      filter_order=CFG["filter_order"],
                      batch_norm=CFG["batch_norm"], lap_pos_enc=True,
                      lap_pos_enc_dim=8)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    x = torch.from_numpy(batch.x)
    adj = torch.from_numpy(batch.adj)
    mask = torch.from_numpy(batch.node_mask.astype(np.float32))
    pe = torch.from_numpy(batch.pe)
    lap = torch.from_numpy(batch.lap_pe)
    deg = torch.from_numpy(batch.degree)
    y = torch.from_numpy(np.asarray(batch.y, np.float32))

    def step():
        opt.zero_grad()
        out = model(x, adj, mask, pe=pe, lap_pe=lap, degree=deg)
        loss = torch.abs(out.squeeze(-1) - y).mean()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    sec = (time.perf_counter() - t0) / iters
    with open(BASELINE_FILE, "w") as f:
        json.dump({"sec_per_step": sec, "device": "cpu-torch-twin",
                   "config": CFG, "batch": BATCH}, f)
    return sec


def main():
    batch, n_edges = make_batch()
    dev = jax.devices()[0]
    sec_jax = bench_jax(batch, n_edges)
    try:
        sec_torch = bench_torch_baseline(batch, n_edges)
    except Exception:
        sec_torch = None
    edges_per_s = n_edges / sec_jax
    epoch_time = sec_jax * (ZINC_TRAIN_GRAPHS / BATCH)
    out = {
        "metric": "edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": (round(sec_torch / sec_jax, 3)
                        if sec_torch else None),
        "sec_per_step": round(sec_jax, 5),
        "epoch_time_s_zinc10k": round(epoch_time, 2),
        "baseline": "pure-torch CPU twin (reference stack unavailable)",
        "device": str(dev),
        "batch": BATCH,
        "edges_per_batch": n_edges,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
