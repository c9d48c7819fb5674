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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host entry: wire this process into the jax.distributed
    runtime so `jax.devices()` spans every host's chips and the meshes
    above (plus shard_map collectives) ride ICI/DCN across the slice.

    With no arguments, reads the standard env (JAX auto-detects on TPU
    pods from the metadata server; elsewhere set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Idempotent: re-initialization
    attempts are ignored. Returns the global device count.

    Single-process runs (including this repo's CI) skip initialization
    entirely when no coordinator is configured.
    """
    import os
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        np_env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(np_env) if np_env else None
    if process_id is None:
        pid_env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid_env) if pid_env else None
    if coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            # re-init raises "distributed.initialize should only be
            # called once." (jax 0.9); treat as already-initialized
            msg = str(e).lower()
            if "once" not in msg and "already" not in msg:
                raise
    return len(jax.devices())
