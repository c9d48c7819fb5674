"""FeTA-TPU: a TPU-native framework for spectral graph transformers.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the FeTA
reference codebase (ansonb/FeTA_TMLR): dynamic Chebyshev spectral filters
applied to attention-head outputs, kernel-modulated graph attention
(GraphiT-style), Laplacian/diffusion positional encodings, GCKN path-kernel
features, and padded-dense batched graph processing — all designed around the
TPU's MXU (dense batched matmuls), HBM bandwidth (fused elementwise chains),
and ICI (sharded meshes with XLA collectives).

Layout:
  data/      GraphBatch pytree, bucketed collation, dataset readers
  pe/        host-side positional-encoding precompute + cache
  ops/       device ops: laplacians, Chebyshev recurrences, attention, segments
  nn/        flax modules: encoder layers, FeTA block, model zoo
  parallel/  meshes, sharding rules, edge-partitioned multi-chip paths
  train/     trainers, optimizers, metrics, checkpointing
"""

__version__ = "0.1.0"

from feta_tmlr_tpu.data.batch import GraphBatch  # noqa: F401

# Opt-in persistent XLA-executable cache: FETA_COMPILE_CACHE=<dir> (or "1"
# for the default path). Critical behind a device relay where each unique
# jitted program costs minutes to compile (utils/profiling.py).
import os as _os

_cache = _os.environ.get("FETA_COMPILE_CACHE", "").strip()
if _cache and _cache.lower() not in ("0", "off", "false", "no"):
    from feta_tmlr_tpu.utils.profiling import (
        enable_persistent_compile_cache as _epcc,
    )

    _epcc("/tmp/feta_jax_cache" if _cache == "1" else _cache)
