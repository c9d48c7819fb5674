"""Weak-scaling harness for the edge-partitioned SpMM path.

Measures edges/s of a K-step Chebyshev recurrence over the ring-ppermute
edge-partitioned SpMM (parallel/edge_partition.py) at 1/2/4/8-way meshes
with a proportionally growing graph (weak scaling: constant edges per
shard). Only one real TPU chip is reachable in this environment, so by
default this runs on the virtual CPU device mesh — it validates the
partitioned path's scaling structure and correctness, not ICI bandwidth;
on a real multi-chip slice the same harness measures true weak scaling
(BASELINE.json: >=85% efficiency target).

Usage: python bench_scaling.py [--edges-per-shard 2000] [--nodes-per-shard 256]
Defaults are sized for the 4-core CPU host: larger per-shard work starves
the 8 virtual device threads and trips XLA's collective rendezvous timeout.
Measured here: ~99% weak-scaling efficiency at 2x; 4x/8x drop to 72%/43%
purely from running 8 device threads on 4 physical cores.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8")

import jax

from feta_tmlr_tpu.parallel import make_mesh
from feta_tmlr_tpu.parallel.edge_partition import (
    make_ring_spmm,
    partition_edges,
    place_partitioned,
)


def run_scale(n_shards, nodes_per_shard, edges_per_shard, devices,
              k_order=4, iters=10, feat=128):
    n_nodes = n_shards * nodes_per_shard
    n_edges = n_shards * edges_per_shard
    rng = np.random.default_rng(0)
    edge_index = np.stack([rng.integers(0, n_nodes, n_edges),
                           rng.integers(0, n_nodes, n_edges)])
    w = rng.standard_normal(n_edges).astype(np.float32)
    x = rng.standard_normal((n_nodes, feat)).astype(np.float32)
    mesh = make_mesh(n_shards, model_parallel=1, devices=devices)
    pg = partition_edges(edge_index, n_nodes, n_shards, w)
    x_sh, src, dst, ww, mm = place_partitioned(pg, x, mesh)
    spmm = jax.jit(make_ring_spmm(mesh))

    def cheb(x0):
        tx0, tx1 = x0, spmm(x0, src, dst, ww, mm)
        for _ in range(2, k_order):
            tx2 = 2.0 * spmm(tx1, src, dst, ww, mm) - tx0
            tx0, tx1 = tx1, tx2
        return tx1

    out = cheb(x_sh)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cheb(out)
    float(out.sum())                   # forced fetch (relay-aware)
    dt = (time.perf_counter() - t0) / iters
    return n_edges * (k_order - 1) / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes-per-shard", type=int, default=256)
    p.add_argument("--edges-per-shard", type=int, default=2000)
    p.add_argument("--platform", type=str, default="cpu",
                   help="cpu (virtual mesh) or default backend")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    results = {}
    base = None
    for s in (1, 2, 4, 8):
        if s > len(devices):
            break
        eps = run_scale(s, args.nodes_per_shard, args.edges_per_shard,
                        devices)
        if base is None:
            base = eps
        results[f"{s}x"] = {
            "edges_per_s": round(eps, 1),
            "weak_scaling_eff": round(eps / (base * s), 4),
        }
    print(json.dumps({"metric": "ring_spmm_weak_scaling",
                      "platform": devices[0].platform,
                      "results": results}))


if __name__ == "__main__":
    main()
