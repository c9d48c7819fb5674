"""Interleaved on-chip A/B: decomposed vs materialized PNA pretransform.

Measures bench_tiers.bench_pna_lspe (canonical PNA_ZINC_LSPE.json config,
edge_feat=True/edge_dim=40) under the two pretransform implementations:
the default decomposed _EdgeDense path vs the legacy broadcast-concat
path (edgecat=True, a module attribute). One JSON line per impl per
round.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from bench import _accelerator_available
    if not _accelerator_available():
        print(json.dumps({"error": "accelerator backend unavailable"}),
              flush=True)
        return
    import bench_tiers
    for rnd in range(2):
        for impl, edgecat in (("edgecat", True), ("decomposed", False)):
            sec_train, sec_serve, _, mfu = bench_tiers.bench_pna_lspe(
                edgecat=edgecat)
            row = {"round": rnd, "impl": impl,
                   "train_ms": round(sec_train * 1e3, 2),
                   "serve_ms": round(sec_serve * 1e3, 2)}
            if mfu:
                row.update({k: mfu[k] for k in
                            ("train_achieved_tflops",
                             "train_mfu_vs_bf16_peak",
                             "train_arithmetic_intensity") if k in mfu})
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
