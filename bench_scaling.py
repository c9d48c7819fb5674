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

To attribute any efficiency drop, each mesh size is measured twice:
  - ring:  the real schedule (ppermute collectives + local segment-sums)
  - local: identical per-shard FLOPs/gather work with the ppermute REMOVED
           (every step processes buckets against the resident block)
"local" isolates pure compute throughput under s device threads: if its
weak-scaling efficiency falls the same way ring's does, the drop is host
core contention (s threads on 4 physical cores), not collective overhead;
the per-step collective share is (t_ring - t_local) / t_ring. The JSON
reports both plus that share per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# Round-5 controlled-experiment note: pinning every device to one host
# thread (xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1,
# FETA_SCALING_PIN_THREADS=1) was tried and REJECTED as the default — the
# XLA CPU client shares one intra-op pool across virtual devices, so the
# pin serializes the whole mesh (measured 2026-08-19: sharded
# speedup_vs_serial ~1.0 at every scale). The controlled reference that
# stays is the matched-work SERIAL baseline per scale: speedup_vs_serial
# and eff_vs_host_ideal (= speedup / min(shards, physical cores)) are the
# interpretable numbers on an oversubscribed 4-core host.
if os.environ.get("FETA_SCALING_PIN_THREADS", "0") == "1" \
        and "multi_thread_eigen" not in _flags:
    _flags += (" --xla_cpu_multi_thread_eigen=false"
               " intra_op_parallelism_threads=1")
os.environ["XLA_FLAGS"] = _flags

import jax

from feta_tmlr_tpu.parallel import make_mesh
from feta_tmlr_tpu.parallel.edge_partition import (
    make_ring_spmm,
    partition_edges,
    place_partitioned,
)


def _make_local_only_spmm(mesh, n_shards, axis="data"):
    """Same per-shard work as the ring schedule, no ppermute: processes
    every bucket against the RESIDENT block (numerically meaningless,
    computationally identical — used to isolate compute from collectives)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from feta_tmlr_tpu.parallel.edge_partition import _local_agg

    def local_fn(x_local, src, dst, w, m):
        def body(t, carry):
            block, acc = carry
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a[0], t, keepdims=False)
            acc = acc + _local_agg(block, take(src), take(dst), take(w),
                                   take(m), x_local.shape[0])
            return block, acc
        _, acc = jax.lax.fori_loop(
            0, n_shards, body, (x_local, jnp.zeros_like(x_local)))
        return acc

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None))


def run_scale(n_shards, nodes_per_shard, edges_per_shard, devices,
              k_order=4, iters=10, feat=128, mode="ring"):
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
    if mode == "ring":
        spmm = jax.jit(make_ring_spmm(mesh))
    else:
        spmm = jax.jit(_make_local_only_spmm(mesh, n_shards))

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


def run_feta_scale(n_shards, nodes_per_shard, devices, iters=4,
                   ring_attention=False, ring_collectives=True):
    """Weak scaling of the FULL edge-partitioned FeTA training step
    (parallel/feta_partitioned.py): V = n_shards * nodes_per_shard nodes
    of ONE SBM-like graph, constant nodes/edges per shard.
    ring_attention=True streams K/V blocks around the ring instead of
    gathering [V, d] per layer (see feta_partitioned.py)."""
    from jax.sharding import Mesh
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
    from feta_tmlr_tpu.parallel.feta_partitioned import (
        make_feta_train_step, prepare_feta_inputs)
    import jax as _jax

    n_nodes = n_shards * nodes_per_shard
    g = sbm_like_dataset(seed=0, n_graphs=1, n_nodes=n_nodes + 1,
                         n_classes=2)[0]
    mesh = Mesh(np.array(devices[:n_shards]), ("data",))
    cfg = dict(d_model=32, n_heads=4, n_layers=2, filter_order=3)
    model = DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=cfg["d_model"],
        nb_heads=cfg["n_heads"], dim_feedforward=64, dropout=0.0,
        nb_layers=cfg["n_layers"], batch_norm=False,
        filter_order=cfg["filter_order"])
    batch = collate_graphs([g], max_nodes=g.num_nodes, node_labels=False)
    variables = _jax.jit(model.init)(_jax.random.key(0), batch)
    xs = prepare_feta_inputs(g.edge_index, g.x.astype(np.float32),
                             np.asarray(g.y, np.int32), mesh,
                             degree=g.degree)
    x_sh, pe_sh, mask_sh, src, dst, w, m, lab, lmask, deg_sh = xs
    step = make_feta_train_step(mesh, ring_attention=ring_attention,
                                ring_collectives=ring_collectives, **cfg)
    params = variables["params"]
    params, _ = step(params, x_sh, pe_sh, mask_sh, src, dst, w, m, lab,
                     lmask, deg_sh)
    _jax.block_until_ready(_jax.tree_util.tree_leaves(params)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, loss = step(params, x_sh, pe_sh, mask_sh, src, dst, w, m,
                            lab, lmask, deg_sh)
    float(loss)                        # forced fetch
    dt = (time.perf_counter() - t0) / iters
    return n_nodes / dt                # nodes/s (graph grows with mesh)


def run_batched_scale(n_shards, devices, nodes_per_shard=12,
                      graphs_per_data_shard=2, iters=4,
                      ring_attention=False):
    """Weak scaling of the 2-D data x nodes batched FeTA step
    (parallel/feta_batched.py): dp=2 data shards (dp=1 at n_shards=1),
    the rest of the mesh on the node axis, per-shard node count and
    per-data-shard graph count constant. Throughput = total node-rows/s.
    ring_attention=True vmaps the ring K/V schedule over local graphs."""
    from jax.sharding import Mesh
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
    from feta_tmlr_tpu.parallel.feta_batched import (
        make_feta_batched_train_step, prepare_batched_inputs)
    import jax as _jax

    dp = 2 if n_shards > 1 else 1
    sp = n_shards // dp
    n_nodes = sp * nodes_per_shard
    n_graphs = dp * graphs_per_data_shard
    # n_nodes exactly: sbm_like sizes fall in [n_nodes - k, n_nodes], so
    # every graph fits the sharded [*, n_nodes] layout (the former +1
    # could emit a graph one node larger than max_nodes)
    gs = sbm_like_dataset(seed=0, n_graphs=n_graphs, n_nodes=n_nodes,
                          n_classes=2)
    mesh = Mesh(np.array(devices[:n_shards]).reshape(dp, sp),
                ("data", "nodes"))
    cfg = dict(d_model=32, n_heads=4, n_layers=2, filter_order=3)
    model = DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=cfg["d_model"],
        nb_heads=cfg["n_heads"], dim_feedforward=64, dropout=0.0,
        nb_layers=cfg["n_layers"], batch_norm=True,
        filter_order=cfg["filter_order"])
    batch = collate_graphs(gs, max_nodes=n_nodes, node_labels=True)
    variables = _jax.jit(model.init)(_jax.random.key(0), batch)
    xs = prepare_batched_inputs(batch, mesh)
    step = make_feta_batched_train_step(
        mesh, batch_norm=True, ring_attention=ring_attention, **cfg)
    params = variables["params"]
    params, _ = step(params, *xs)
    _jax.block_until_ready(_jax.tree_util.tree_leaves(params)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        params, loss = step(params, *xs)
    float(loss)                        # forced fetch
    dt = (time.perf_counter() - t0) / iters
    return n_graphs * n_nodes / dt     # node-rows/s


def run_pipeline_scale(n_stages, devices, layers_per_stage=2,
                       batch_per_micro=8, iters=4):
    """Weak scaling of GPipe pipeline parallelism (parallel/pipeline.py):
    the layer chain grows with the stage count (L-1 = S * layers_per_stage,
    constant layers per stage) and microbatches = S, so per-stage work is
    constant while total depth scales. Throughput metric is
    layer-applications/s = B_total * (L-1) / t_step; ideal weak scaling
    keeps it growing linearly with S (t_step grows only by the bubble
    factor (M+S-1)/M and collective overhead)."""
    from jax.sharding import Mesh
    from feta_tmlr_tpu.data.synthetic import random_graph_dataset
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.parallel.pipeline import make_pipeline_train_step
    import jax as _jax

    n_layers = n_stages * layers_per_stage + 1
    n_micro = max(n_stages, 2)
    b_total = batch_per_micro * n_micro
    graphs = random_graph_dataset(seed=0, n_graphs=b_total, min_nodes=10,
                                  max_nodes=12, n_features=6)
    from feta_tmlr_tpu.pe import DiffusionEncoding
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=12, node_labels=False)
    batch = batch.replace(y=np.random.default_rng(0).standard_normal(
        (b_total,)).astype(np.float32))
    model = DiffGraphTransformerGenGCN(
        in_size=6, nb_class=1, d_model=16, nb_heads=2, dim_feedforward=32,
        dropout=0.0, nb_layers=n_layers, batch_norm=False, filter_order=2)
    params = _jax.jit(model.init)(_jax.random.key(0), batch)
    mesh = Mesh(np.array(devices[:n_stages]), ("pp",))
    step = make_pipeline_train_step(mesh, model, n_micro, lr=1e-3)
    with mesh:
        params, loss = step(params, batch)
        _jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, loss = step(params, batch)
        float(loss)                    # forced fetch
    dt = (time.perf_counter() - t0) / iters
    return b_total * (n_layers - 1) / dt


def run_serving_scale(n_shards, devices, n_requests=96, n_clients=8,
                      per_shard_batch=4):
    """Multi-chip serving composition (VERDICT r2 item 8): Predictor with
    a data-axis mesh + DynamicBatcher coalescing concurrent single-graph
    requests + compact wire upload, on the virtual mesh. Returns
    (graphs/s, max_abs_diff vs single-device logits) — the diff is the
    composed-stack correctness check (sharded+batched+wire serving must
    produce the single-device numbers)."""
    import threading
    from jax.sharding import Mesh
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
    from feta_tmlr_tpu.serve import Predictor
    from feta_tmlr_tpu.serve_batcher import DynamicBatcher
    import jax as _jax

    graphs = zinc_like_dataset(seed=0, n_graphs=32)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    model = DiffGraphTransformerGenGCN(
        in_size=28, nb_class=1, d_model=32, nb_heads=4,
        dim_feedforward=64, dropout=0.0, nb_layers=2, batch_norm=False,
        lap_pos_enc=True, lap_pos_enc_dim=4, filter_order=2)
    batch0 = collate_graphs(graphs, max_nodes=48)
    variables = _jax.jit(model.init)(_jax.random.key(0), batch0)
    mesh = Mesh(np.array(devices[:n_shards]), ("data",))
    mb = per_shard_batch * n_shards
    pred = Predictor(model, variables=variables, max_batch=mb,
                     collate_kwargs={"max_nodes": 48}, wire=True,
                     mesh=mesh)
    pred.predict(graphs[:mb])                        # compile + warm
    # composed-stack correctness vs a single-device predictor on the SAME
    # wire encoding, so the diff isolates sharding (wire's bf16 PE
    # quantization is a deliberate, separately-tested format choice)
    single = Predictor(model, variables=variables, max_batch=mb,
                       collate_kwargs={"max_nodes": 48}, wire=True)
    diff = float(np.max(np.abs(pred.predict(graphs[:mb])
                               - single.predict(graphs[:mb]))))

    batcher = DynamicBatcher(pred, max_wait_ms=2.0)
    reqs = [graphs[i % len(graphs)] for i in range(n_requests)]
    idx = iter(range(n_requests))
    lock = threading.Lock()
    errors = []

    def worker():
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            try:
                batcher.predict([reqs[i]])
            except Exception as e:
                errors.append(e)
                return

    ts = [threading.Thread(target=worker) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    batcher.close()
    if errors:
        raise errors[0]
    return n_requests / dt, diff


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes-per-shard", type=int, default=256)
    p.add_argument("--edges-per-shard", type=int, default=2000)
    p.add_argument("--feta-nodes-per-shard", type=int, default=24)
    p.add_argument("--platform", type=str, default="cpu",
                   help="cpu (virtual mesh) or default backend")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()

    def best2(fn, *a, **k):
        """Max-of-2 repeats: single-shot virtual-mesh points swing 2x
        across runs on the contended host (relay-noise discipline of
        bench.py applied here)."""
        return max(fn(*a, **k) for _ in range(2))

    results = {}
    base = None
    for s in (1, 2, 4, 8):
        if s > len(devices):
            break
        eps = best2(run_scale, s, args.nodes_per_shard,
                    args.edges_per_shard, devices, mode="ring")
        eps_local = best2(run_scale, s, args.nodes_per_shard,
                          args.edges_per_shard, devices, mode="local")
        # matched-WORK serial baseline: the same s-scaled graph on ONE
        # device (n_shards=1 ring degenerates to a local pass) — the
        # controlled reference point (VERDICT r4 item 7): on an
        # oversubscribed host the achievable ideal speedup is
        # min(s, physical cores), not s
        eps_serial = (eps if s == 1 else best2(
            run_scale, 1, args.nodes_per_shard * s,
            args.edges_per_shard * s, devices, mode="ring"))
        if base is None:
            base = eps
            base_local = eps_local
        ncores = os.cpu_count() or 1
        results[f"{s}x"] = {
            "edges_per_s": round(eps, 1),
            "weak_scaling_eff": round(eps / (base * s), 4),
            "edges_per_s_compute_only": round(eps_local, 1),
            "compute_only_eff": round(eps_local / (base_local * s), 4),
            # share of each ring step spent in collectives (ppermute),
            # inferred from the matched-FLOPs local-only variant
            "collective_share": round(
                max(0.0, 1.0 - eps / eps_local), 4),
            "edges_per_s_serial": round(eps_serial, 1),
            "speedup_vs_serial": round(eps / eps_serial, 3),
            "eff_vs_host_ideal": round(
                (eps / eps_serial) / min(s, ncores), 4),
        }
    feta = {}
    base_f = None
    for s_ in (1, 2, 4, 8):
        if s_ > len(devices):
            break
        nps = best2(run_feta_scale, s_, args.feta_nodes_per_shard,
                    devices)
        nps_ring = best2(run_feta_scale, s_, args.feta_nodes_per_shard,
                         devices, ring_attention=True)
        # matched-FLOPs compute-only control (ppermute removed, same
        # S-step fold): attributes the ring's efficiency gap between
        # collectives and host compute contention (VERDICT r3 item 5)
        nps_ctl = run_feta_scale(s_, args.feta_nodes_per_shard, devices,
                                 ring_attention=True,
                                 ring_collectives=False)
        # matched-work serial baseline for the gathered schedule: the
        # same s-scaled graph, one device (controlled experiment —
        # achievable ideal speedup = min(s, physical cores))
        nps_serial = (nps if s_ == 1 else best2(
            run_feta_scale, 1, args.feta_nodes_per_shard * s_, devices))
        if base_f is None:
            base_f = nps
            base_r = nps_ring
            base_c = nps_ctl
        ncores = os.cpu_count() or 1
        feta[f"{s_}x"] = {
            "nodes_per_s": round(nps, 1),
            "weak_scaling_eff": round(nps / (base_f * s_), 4),
            "nodes_per_s_ring_attention": round(nps_ring, 1),
            "ring_attention_eff": round(nps_ring / (base_r * s_), 4),
            "nodes_per_s_ring_compute_only": round(nps_ctl, 1),
            "ring_compute_only_eff": round(nps_ctl / (base_c * s_), 4),
            "ring_collective_share": round(
                max(0.0, 1.0 - nps_ring / nps_ctl), 4),
            "nodes_per_s_serial": round(nps_serial, 1),
            "speedup_vs_serial": round(nps / nps_serial, 3),
            "eff_vs_host_ideal": round(
                (nps / nps_serial) / min(s_, ncores), 4),
        }
    batched = {}
    base_b = None
    for s_ in (1, 2, 4, 8):
        if s_ > len(devices):
            break
        nps = run_batched_scale(s_, devices)
        nps_ring = run_batched_scale(s_, devices, ring_attention=True)
        if base_b is None:
            base_b = nps
            base_br = nps_ring
        batched[f"{s_}x"] = {
            "node_rows_per_s": round(nps, 1),
            "weak_scaling_eff": round(nps / (base_b * s_), 4),
            "node_rows_per_s_ring": round(nps_ring, 1),
            "ring_eff": round(nps_ring / (base_br * s_), 4),
        }
    pipe = {}
    base_p = None
    for s_ in (1, 2, 4, 8):
        if s_ > len(devices):
            break
        lps = run_pipeline_scale(s_, devices)
        if base_p is None:
            base_p = lps
        n_micro = max(s_, 2)
        pipe[f"{s_}x"] = {
            "layer_apps_per_s": round(lps, 1),
            "weak_scaling_eff": round(lps / (base_p * s_), 4),
            # GPipe's theoretical ceiling: M useful ticks of M+S-1 total.
            # On this 4-core host eff can exceed 1.0 at small S because
            # the fixed lax.scan/dispatch overhead dominates the tiny
            # per-stage compute at S=1 (the baseline), not because the
            # schedule beats its bubble bound.
            "bubble_ideal_eff": round(n_micro / (n_micro + s_ - 1), 4),
        }
    serving = {}
    base_s = None
    for s_ in (1, 2, 4, 8):
        if s_ > len(devices):
            break
        rps, diff = run_serving_scale(s_, devices)
        if base_s is None:
            base_s = rps
        serving[f"{s_}x"] = {
            "graphs_per_s": round(rps, 1),
            "vs_1shard": round(rps / base_s, 3),
            "max_abs_diff_vs_single_device": diff,
        }
    reading = None
    if devices[0].platform == "cpu":
        # Round-5 controlled-experiment conclusion, encoded with the data
        # so the numbers cannot be misread as ICI weak scaling: the
        # matched-work SERIAL baseline (speedup_vs_serial ~0.7-1.0 at
        # every scale and every per-shard size tried) shows a single XLA
        # CPU executable already saturates all physical cores via intra-op
        # parallelism — a virtual 8-device mesh on 4 cores has no spare
        # hardware to scale onto, so weak_scaling_eff here measures host
        # arithmetic, not the partitioned path. The quantities that
        # TRANSFER to real multi-chip hardware are (a) collective_share
        # (matched-FLOPs ring-vs-local control: the full FeTA model's is
        # 0-11%, i.e. >=89% of step time is compute the ICI permute
        # overlaps) and (b) the parity/grad-exactness tests; the >=85%
        # BASELINE.json bar is a real-ICI claim this host can neither
        # prove nor refute.
        reading = ("virtual-cpu mesh: speedup_vs_serial ~1 at all scales "
                   "=> host-bound; transferable signals are "
                   "collective_share and eff_vs_host_ideal")
    print(json.dumps({"metric": "ring_spmm_weak_scaling",
                      "platform": devices[0].platform,
                      **({"reading": reading} if reading else {}),
                      "results": results,
                      "feta_partitioned_full_model": feta,
                      "feta_batched_2d": batched,
                      "pipeline_gpipe": pipe,
                      "serving_dp_batched_wire": serving}))


if __name__ == "__main__":
    main()
