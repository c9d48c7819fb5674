"""GCKN host-vs-accelerator crossover study (VERDICT r2 item 6).

Round 2 pinned the GCKN PE tier to the host CPU from one measurement at
128 ZINC graphs. This driver measures `unsup_train` (k-means pretrain)
and steady-state `encode` on BOTH devices at growing scales — 128 (the
round-2 point), NCI1-scale (~4k graphs), and a PCQM4M-sized slice —
interleaved in one process, and prints one JSON line per scale for the
BASELINE.md crossover table. The result sets the default of
FETA_GCKN_TPU_MIN_PATHS in gckn/models._auto_device.

Round 4 (VERDICT r3 item 7): scales extend ~10x beyond the round-3
ceiling (1.56M paths) toward PCQM4M-sized workloads, and the accel
unsup row now runs the SINGLE-DISPATCH jitted k-means
(gckn/kmeans.spherical_kmeans_jax, one while_loop per layer) instead of
the numpy Lloyd loop whose hundreds of small ops each paid the relay
RTT — the "fair shot" for the accelerator; `unsup_kmeans_impl` records
which implementation each row used.

Encode is timed at steady state (second call onward: the first call on
each device pays the XLA compile for that path-batch shape, reported
separately as *_encode_first_s).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from feta_tmlr_tpu.data.synthetic import zinc_like_dataset  # noqa: E402
from feta_tmlr_tpu.gckn.models import (  # noqa: E402
    GCKNFeature,
    _host_cpu,
    _total_paths,
)
from feta_tmlr_tpu.gckn.paths import build_path_batch  # noqa: E402


def measure(n_graphs, k=3, hidden=32, encode_iters=3):
    graphs = zinc_like_dataset(seed=7, n_graphs=n_graphs)
    batch = build_path_batch(graphs, k)
    n_paths = _total_paths(batch)
    row = {"n_graphs": n_graphs, "n_paths": n_paths,
           "n_nodes": int(sum(g.num_nodes for g in graphs))}
    devices = [("host", _host_cpu())]
    accel = jax.devices()[0]
    if accel.platform != "cpu":
        devices.append(("accel", accel))
    # beyond NCI1 scale a single-dispatch encode over every path OOMs
    # the chip; chunk by graphs (GCKNFeature.encode chunk_graphs — the
    # reference's MAXRAM-chunking regime)
    chunk = 4096 if n_graphs > 4096 else None
    for tag, dev in devices:
        row[f"{tag}_kmeans_impl"] = ("jax" if dev.platform != "cpu"
                                     else "numpy")
        try:
            model = GCKNFeature.create(
                input_size=graphs[0].x.shape[-1], hidden_sizes=[hidden],
                path_sizes=[k])
            t0 = time.perf_counter()
            model.unsup_train(graphs, n_sampling_paths=20000, seed=0,
                              device=dev)
            row[f"{tag}_unsup_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            model.encode(graphs, batch=None if chunk else batch,
                         device=dev, chunk_graphs=chunk)
            row[f"{tag}_encode_first_s"] = round(
                time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            for _ in range(encode_iters):
                feats = model.encode(graphs, batch=None if chunk else batch,
                                     device=dev, chunk_graphs=chunk)
            row[f"{tag}_encode_s"] = round(
                (time.perf_counter() - t0) / encode_iters, 3)
            del feats
        except Exception as e:
            row[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
            continue
    if "accel_encode_s" in row:
        row["encode_speedup_accel"] = round(
            row["host_encode_s"] / row["accel_encode_s"], 2)
        row["unsup_speedup_accel"] = round(
            row["host_unsup_s"] / row["accel_unsup_s"], 2)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scales", default="128,1024,4096,16384,40960")
    args = p.parse_args()
    from bench import _accelerator_available
    if not _accelerator_available():
        print(json.dumps({"error": "accelerator backend unavailable"}),
              flush=True)
        return
    for n in (int(s) for s in args.scales.split(",")):
        try:
            row = measure(n)
        except Exception as e:       # e.g. device OOM at the top scale
            row = {"n_graphs": n,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
