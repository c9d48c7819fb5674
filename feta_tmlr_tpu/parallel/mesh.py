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


def shard_dataset_for_host(items, num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Deterministic per-host slice of a dataset: host p takes
    items[p::P] (interleaved — robust to sorted-by-size inputs).

    The reference's nn.DataParallel splits a batch across GPUs inside
    one process; on a multi-host slice each process must instead load
    its own shard of the DATASET and contribute the local part of every
    global batch (see `global_batch_from_local`).
    """
    num = (num_processes if num_processes is not None
           else jax.process_count())
    pid = process_id if process_id is not None else jax.process_index()
    return items[pid::num]


def global_batch_from_local(local_batch, mesh: Mesh,
                            data_axis: str = "data"):
    """Assemble the global on-device batch from THIS host's local batch.

    Every array leaf of the (GraphBatch) pytree becomes a jax.Array
    sharded `P(data_axis, None, ...)` over `mesh`, whose addressable
    shards are this process's local data
    (`jax.make_array_from_process_local_data` — no cross-host transfer;
    the global batch dim is num_processes x local B when the mesh spans
    hosts). Single-process: equivalent to `jax.device_put` with the same
    sharding, so the jitted step's GSPMD partitioning is identical in CI
    and on a pod.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(a):
        arr = np.asarray(a)
        spec = P(data_axis, *([None] * (arr.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr)

    return jax.tree_util.tree_map(leaf, local_batch)
