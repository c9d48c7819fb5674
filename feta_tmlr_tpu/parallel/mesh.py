"""Device meshes for data/tensor-parallel training.

The reference's only parallelism is single-process nn.DataParallel
(run_transformer_gckn_gengcn_molpcba.py:469-475; SURVEY.md §2.8). The
TPU-native design replaces it with a jax.sharding.Mesh:
  - 'data'  axis: graphs (leading batch dim) — the default scaling axis;
  - 'model' axis: attention heads / feedforward width for tensor parallelism
    on larger configs.
Collectives are inserted by XLA/GSPMD; over a multi-host slice the 'data'
axis maps to DCN and 'model' to ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))
