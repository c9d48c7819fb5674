"""Config-grid sweep runner: execute an entire ablation surface in one
command and collect a summary table.

The reference's ablation grids (LPE/configs/ full/{1e-1..1e-8}/node etc.,
SURVEY.md §2.5) are run there by hand, one `main_*.py --config` at a
time. This driver globs config files, runs the chosen main IN-PROCESS
for each (so XLA-compiled programs are reused across grid points with
identical shapes), and writes one CSV row per config with the best-val /
test metrics.

  python -m feta_tmlr_tpu.experiments.sweep \\
      --main main_ZINC_graph_regression \\
      --configs 'configs/LPE/ZINC/ablation/full/*/node.json' \\
      --out sweep_results.csv -- --epochs 20 --synthetic-graphs 64

Arguments after `--` pass through to every main invocation.
"""

from __future__ import annotations

import argparse
import csv
import glob
import importlib
import sys
import time


def run_sweep(main_name: str, config_paths, passthrough,
              out_path: str = None):
    mod = importlib.import_module(
        f"feta_tmlr_tpu.experiments.{main_name}")
    rows = []
    for cfg in config_paths:
        t0 = time.perf_counter()
        argv = ["--config", cfg] + list(passthrough)
        print(f"=== sweep: {cfg}")
        try:
            result = mod.main(argv)
            row = {"config": cfg, "status": "ok",
                   "best_epoch": result.get("best_epoch"),
                   "best_val": result.get("best_val")}
            for k, v in (result.get("test") or {}).items():
                row[f"test_{k}"] = v
        except (Exception, SystemExit) as e:    # keep sweeping: argparse
            # errors raise SystemExit, which plain `except Exception`
            # would let abort the whole grid (and lose the CSV)
            row = {"config": cfg, "status": f"{type(e).__name__}: {e}"}
        row["wall_s"] = round(time.perf_counter() - t0, 2)
        rows.append(row)
    if out_path:
        keys = sorted({k for r in rows for k in r},
                      key=lambda k: (k != "config", k))
        with open(out_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {out_path}")
    return rows


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    passthrough = []
    if "--" in argv:
        i = argv.index("--")
        argv, passthrough = argv[:i], argv[i + 1:]
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--main", required=True,
                   help="experiments module name, e.g. "
                        "main_ZINC_graph_regression")
    p.add_argument("--configs", required=True,
                   help="glob over config files")
    p.add_argument("--out", default="sweep_results.csv")
    args = p.parse_args(argv)
    paths = sorted(glob.glob(args.configs))
    if not paths:
        raise SystemExit(f"no configs match {args.configs!r}")
    rows = run_sweep(args.main, paths, passthrough, args.out)
    bad = [r for r in rows if r["status"] != "ok"]
    print(f"{len(rows) - len(bad)}/{len(rows)} configs succeeded")
    return rows


if __name__ == "__main__":
    main()
