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


class TensorBoardLogger:
    """Per-epoch scalars as TensorBoard event files.

    The reference's LPE/LSPE mains stream train/val/test scalars through
    tensorboardX (LPE/main_ZINC_graph_regression.py:167-173); torch's
    bundled SummaryWriter writes the same event format. Silently no-ops
    when the writer is unavailable so headless runs never fail on it.
    """

    def __init__(self, outdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir=outdir)
        except Exception:
            self._writer = None

    def log(self, row: Dict) -> None:
        if self._writer is None:
            return
        step = int(row.get("epoch", 0))
        for key, val in row.items():
            if key != "epoch" and isinstance(val, (int, float)):
                self._writer.add_scalar(key, float(val), step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
