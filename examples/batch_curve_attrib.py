"""Batch-curve attribution (VERDICT r4 item 5): name the XLA buffers whose
HBM footprint grows superlinearly from B=128 to B=1024.

The measured per-edge throughput declines -40% from B=128 to B=1024
(BENCH_r03 edges_per_s_b*), the round-4 Pallas-fused counter-experiment
falsified the elementwise-modulation-chain hypothesis, and the remaining
theory ("score/attn@V operand chains respill at larger B") was asserted
without evidence. This script produces the evidence analytically, from
the COMPILED programs themselves (no timing, no relay noise):

  1. compile the canonical donated train step at B=128 and B=1024;
  2. parse every instruction's output buffer from the optimized HLO,
     bucket by (op kind, per-graph shape signature);
  3. report buffers whose bytes-per-graph GREW at the larger batch (XLA
     materialized something it previously kept fused / in registers),
     plus the totals: memory_analysis temp bytes per graph and
     cost-model bytes-accessed per edge;
  4. optionally (FETA_TRACE_DIR set + real chip) capture an xprof trace
     of each size for TensorBoard.

Run on the chip (`python examples/batch_curve_attrib.py`) — the HLO is
backend-specific and the TPU compilation is the one that matters.
Prints one JSON line per batch size plus a final attribution summary.
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("FETA_COMPUTE_DTYPE", "bfloat16")

import jax  # noqa: E402

from feta_tmlr_tpu.utils.profiling import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8,
                "s16": 2, "u16": 2}
_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(?:\()?(\w+)\[([\d,]*)\]")


def _buffers(hlo_text, min_bytes=1 << 20):
    """(name, dtype, shape, bytes) for every instruction output >= 1MB."""
    out = []
    for line in hlo_text.splitlines():
        m = _INSTR.match(line)
        if not m:
            continue
        name, dtype, dims = m.groups()
        nb = _DTYPE_BYTES.get(dtype)
        if nb is None:
            continue
        shape = tuple(int(x) for x in dims.split(",") if x)
        size = nb
        for d in shape:
            size *= d
        if size >= min_bytes:
            out.append((name, dtype, shape, size))
    return out


def _compile_step(bsz):
    from bench import CFG, MAX_NODES
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.data.synthetic import zinc_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
    from feta_tmlr_tpu.train import Trainer, TrainConfig

    graphs = zinc_like_dataset(seed=1, n_graphs=bsz)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=MAX_NODES)
    model = DiffGraphTransformerGenGCN(**CFG)
    trainer = Trainer(model, TrainConfig(task="graph_reg", lr=1e-3,
                                         sign_flip=True))
    state = trainer.init(jax.random.key(0), batch)
    compiled = trainer._jit_step_donated.lower(
        state, batch, jax.random.key(1)).compile()
    n_edges = int(sum(g.num_edges for g in graphs))
    return compiled, n_edges


def _op_kind(name):
    """'fusion.1234' -> 'fusion'; keep the readable metadata suffix."""
    return re.sub(r"[.\d]+$", "", name)


def main():
    sizes = (128, 1024)
    per_size = {}
    for bsz in sizes:
        compiled, n_edges = _compile_step(bsz)
        hlo = compiled.as_text()
        bufs = _buffers(hlo)
        ma = compiled.memory_analysis()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # bucket: per-graph normalized shape signature per op kind
        sig = collections.defaultdict(lambda: [0, 0])  # bytes, count
        for name, dtype, shape, size in bufs:
            norm = tuple("B" if d in (bsz, 8 * bsz) else d for d in shape)
            key = (_op_kind(name), dtype, norm)
            sig[key][0] += size
            sig[key][1] += 1
        per_size[bsz] = dict(
            sig=sig, n_edges=n_edges,
            temp_bytes=int(ma.temp_size_in_bytes),
            arg_bytes=int(ma.argument_size_in_bytes),
            bytes_accessed=float(cost.get("bytes accessed", 0.0)))
        print(json.dumps({
            "batch": bsz,
            "temp_bytes_per_graph": round(ma.temp_size_in_bytes / bsz),
            "bytes_accessed_per_edge": round(
                per_size[bsz]["bytes_accessed"] / n_edges, 1),
            "n_large_buffers": len(bufs),
        }), flush=True)

    small, big = per_size[sizes[0]], per_size[sizes[1]]
    ratio_b = sizes[1] / sizes[0]
    rows = []
    keys = set(small["sig"]) | set(big["sig"])
    for key in keys:
        b_small = small["sig"].get(key, [0, 0])[0]
        b_big = big["sig"].get(key, [0, 0])[0]
        pg_small = b_small / sizes[0]
        pg_big = b_big / sizes[1]
        if pg_big > pg_small * 1.15 and b_big > (8 << 20):
            rows.append({
                "op": key[0], "dtype": key[1],
                "shape_per_graph": str(key[2]),
                "bytes_per_graph_b128": round(pg_small),
                "bytes_per_graph_b1024": round(pg_big),
                "growth": round(pg_big / max(pg_small, 1), 2),
            })
    rows.sort(key=lambda r: -r["bytes_per_graph_b1024"])
    summary = {
        "temp_bytes_per_graph_growth": round(
            (big["temp_bytes"] / sizes[1])
            / (small["temp_bytes"] / sizes[0]), 3),
        "bytes_accessed_per_edge_growth": round(
            (big["bytes_accessed"] / big["n_edges"])
            / (small["bytes_accessed"] / small["n_edges"]), 3),
        "superlinear_buffers": rows[:12],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
