"""Interleaved XLA vs flash-Pallas A/B at large N (run on the real TPU).

Standalone driver for VERDICT r2 item 2: measures the query-blocked flash
attention kernel (ops/pallas/flash_attention.py) against the XLA dense
path at N in {256, 512, 1024, 2048} on SBM-shaped node classification,
bf16 policy, interleaved in one process. Prints one JSON line per shape.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import bench_pallas_xla_pair

SHAPES = ((256, 16), (512, 4), (1024, 2), (2048, 1))


def main():
    from bench import _accelerator_available
    if not _accelerator_available():
        print(json.dumps({"error": "accelerator backend unavailable"}),
              flush=True)
        return
    shapes = SHAPES
    if len(sys.argv) > 1:                       # e.g. "1024:2,2048:1"
        shapes = tuple(tuple(int(v) for v in s.split(":"))
                       for s in sys.argv[1].split(","))
    for n_nodes, n_graphs in shapes:
        row = {"n_nodes": n_nodes, "n_graphs": n_graphs}
        try:
            res, ne = bench_pallas_xla_pair(n_nodes, n_graphs)
            ms = lambda xs: [round(s * 1e3, 2) for s in xs]
            row.update(xla_ms=ms(res["xla"]), pallas_ms=ms(res["pallas"]),
                       speedup=round(min(res["xla"])
                                     / min(res["pallas"]), 3),
                       edges=ne)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
