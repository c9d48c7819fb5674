"""Structured metrics logging: CSV files with the reference's layout.

The reference writes `logs.csv` (per-epoch rows) and `results.csv`
(final summary) via pandas (run_transformer_gengcn_cv.py:415-433); we keep
the same artifacts with the stdlib csv module.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional


class CSVLogger:
    def __init__(self, outdir: str):
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.rows: List[Dict] = []

    def log(self, row: Dict) -> None:
        self.rows.append(dict(row))

    def flush(self, filename: str = "logs.csv") -> str:
        path = os.path.join(self.outdir, filename)
        if not self.rows:
            return path
        keys: List[str] = []
        for r in self.rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)
        return path

    def write_results(self, results: Dict,
                      filename: str = "results.csv") -> str:
        path = os.path.join(self.outdir, filename)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(results.keys()))
            w.writeheader()
            w.writerow(results)
        return path
