"""Inference/serving: jitted bucketed predictor over a trained model.

The reference has no serving story (training scripts only); this module is
the production-inference counterpart the framework is deployed with:

  - `Predictor` wraps a model (+ params or an orbax checkpoint dir) behind
    a `predict(graphs)` call that collates into the same static node
    buckets training uses (data/batch.py::pad_bucket), so at most one XLA
    compile per bucket size ever happens and every subsequent request of
    that size reuses the compiled program;
  - eval-mode semantics (deterministic, running batch-norm statistics);
  - micro-batching: arbitrarily many graphs per call are chunked to the
    configured max batch and streamed through the device;
  - data-parallel serving: pass `mesh=` to shard each micro-batch's
    graph axis over the mesh's data axis (params replicated) — logits
    identical to single-device serving (tests/test_serve.py);
  - weight-only int8 (`quantize=True`, quantize.py): kernels held as
    per-channel int8 + scales, dequant fused into the jitted forward.

Measured (TPU v5e behind the axon relay, canonical ZINC config, bf16,
B=128 per call, host collation + upload + fetch included): 118 ms/call
= 1082 graphs/s (bench.py FETA_BENCH_SERVE=1, 2026-08-17).

TPU notes: inputs are device_put per chunk (one transfer), outputs
fetched once per call; with FETA_COMPUTE_DTYPE=bfloat16 the same 1.4x
step speedup applies to serving.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax

from feta_tmlr_tpu.data.batch import Graph, collate_graphs, pad_bucket
from feta_tmlr_tpu.data.wire import from_wire, to_wire


class Predictor:
    """Bucketed jitted inference over host Graphs.

    Args:
      model: a flax module whose __call__ takes (batch, deterministic=...).
      variables: full variable collection ({'params': ..., optionally
        'batch_stats': ...}); alternatively pass `ckpt_dir` + `state_like`
        to restore a Trainer checkpoint.
      max_batch: micro-batch size per device dispatch.
      node_buckets: padding buckets (defaults to the training buckets).
      postprocess: 'logits' | 'probs' | 'label'.
      quantize: store weight matrices as per-channel int8 (quantize.py) —
        4x smaller parameter footprint, dequant fused into the forward.
    """

    def __init__(self, model, variables=None, ckpt_dir: Optional[str] = None,
                 state_like=None, max_batch: int = 128,
                 node_buckets: Optional[Sequence[int]] = None,
                 collate_kwargs: Optional[dict] = None,
                 node_level: bool = False, mesh=None,
                 data_axis: str = "data", wire: bool = False,
                 quantize: bool = False):
        if variables is None:
            if ckpt_dir is None or state_like is None:
                raise ValueError(
                    "pass `variables`, or `ckpt_dir` + `state_like` "
                    "(a TrainState template) to restore a checkpoint")
            from feta_tmlr_tpu.train.checkpoint import CheckpointManager
            mgr = CheckpointManager(ckpt_dir)
            state = mgr.restore(state_like)
            mgr.close()
            # TrainState.params is already a {"params": ...} variable dict
            # (train/trainer.py::Trainer.init)
            variables = dict(state.params)
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
        self.model = model
        # int8 (quantize.py): kernels live on device as int8 +
        # per-channel scales (4x less HBM / transfer). quantize=True/"w8"
        # dequants into the forward (weight-only); "w8a8" additionally
        # runs every Dense as an int8 x int8 MXU dot with dynamic
        # activation scales (2x bf16 matmul throughput on v5e).
        if quantize not in (False, True, "w8", "w8a8"):
            raise ValueError(f"quantize={quantize!r}: use True, 'w8' "
                             "or 'w8a8'")
        self.quantize = quantize
        if quantize:
            from feta_tmlr_tpu.quantize import quantize_variables
            variables = quantize_variables(variables)
        # data-parallel serving: shard each micro-batch's leading (graph)
        # axis over `mesh`'s data_axis, replicate the params; XLA/GSPMD
        # runs every chip on its slice with no code changes below
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_shards = mesh.shape[data_axis]
            if max_batch % n_shards:
                raise ValueError(
                    f"max_batch={max_batch} not divisible by the "
                    f"{data_axis}-axis size {n_shards}")
            self._batch_sharding = NamedSharding(mesh, P(data_axis))
            variables = jax.device_put(
                variables, NamedSharding(mesh, P()))
            self.variables = variables
        else:
            self._batch_sharding = None
            self.variables = jax.device_put(variables)
        self.max_batch = max_batch
        self.node_buckets = node_buckets
        self.collate_kwargs = collate_kwargs or {}
        # node_level must be EXPLICIT: a shape heuristic would misfire for
        # unlabeled inference graphs and for multi-task heads whose task
        # count coincides with the node bucket
        self.node_level = node_level
        # compact wire format (data/wire.py): ~3x fewer relay upload
        # bytes per call; adjacency/ids exact, PE kernels travel as bf16
        self.wire = wire
        self._compiled = {}

    def _apply_fn(self):
        from feta_tmlr_tpu.quantize import (
            dequantize_variables, int8_dense_interceptor)
        import flax.linen as nn
        a8 = self.quantize == "w8a8"

        @partial(jax.jit)
        def fn(variables, batch):
            batch = from_wire(batch)       # no-op for full-precision input
            variables = dequantize_variables(variables)  # no-op if unquantized
            if a8:
                with nn.intercept_methods(int8_dense_interceptor):
                    out = self.model.apply(variables, batch,
                                           deterministic=True)
            else:
                out = self.model.apply(variables, batch,
                                       deterministic=True)
            logits = out[0] if isinstance(out, tuple) else out
            return logits

        return fn

    def predict(self, graphs: Sequence[Graph]) -> np.ndarray:
        """Logits for each graph (graph-level heads) or node (node-level),
        stacked over the input order."""
        if not graphs:
            return np.zeros((0,), np.float32)
        fn = self._compiled.setdefault("fn", self._apply_fn())
        # bounded-window async pipeline: dispatch up to `window` chunks
        # ahead, fetching the oldest as new ones enqueue — chunk i's
        # device->host fetch overlaps chunk i+window's upload + compute,
        # while peak device memory stays at `window` in-flight batches
        # (an unbounded dispatch-all would hold the whole request in HBM)
        window = 4
        outs = []
        in_flight: list = []            # [(chunk, device_logits), ...]

        def drain_one():
            chunk, dl = in_flight.pop(0)
            logits = np.asarray(dl)
            if self.node_level:
                # node-level head: strip padding per graph
                for i, g in enumerate(chunk):
                    outs.append(logits[i, : g.num_nodes])
            else:
                outs.extend(logits[: len(chunk)])

        for lo in range(0, len(graphs), self.max_batch):
            chunk = list(graphs[lo: lo + self.max_batch])
            kw = dict(self.collate_kwargs)
            if self.node_buckets is not None:
                kw.setdefault("node_buckets", self.node_buckets)
            if len(chunk) < self.max_batch:
                # pad the tail chunk so EVERY dispatch keeps the same
                # leading dim: one compiled program per node bucket
                # (warmup() covers them all; an unpadded tail would
                # compile a fresh shape at request time — minutes behind
                # a relay). Padded rows are sliced off below.
                pad = [chunk[0]] * (self.max_batch - len(chunk))
                batch = collate_graphs(chunk + pad, **kw)
            else:
                batch = collate_graphs(chunk, **kw)
            if self.wire:
                batch = to_wire(batch)
            dev_batch = (jax.device_put(batch, self._batch_sharding)
                         if self._batch_sharding is not None
                         else jax.device_put(batch))
            in_flight.append((chunk, fn(self.variables, dev_batch)))
            if len(in_flight) >= window:
                drain_one()
        while in_flight:
            drain_one()
        try:
            return np.stack(outs)
        except ValueError:                       # ragged node-level outputs
            return np.asarray(outs, dtype=object)

    def warmup(self, sample: Graph,
               buckets: Optional[Sequence[int]] = None) -> int:
        """Precompile one program per node bucket BEFORE serving traffic
        (first-request latency otherwise includes an XLA compile, which
        behind this deployment's relay can take minutes). `sample` fixes
        the feature layout (dims + which optional fields are present);
        returns the number of bucketed shapes compiled."""
        from feta_tmlr_tpu.data.batch import _DEFAULT_NODE_BUCKETS
        fn = self._compiled.setdefault("fn", self._apply_fn())
        if buckets is not None:
            bks = list(buckets)
        elif self.collate_kwargs.get("max_nodes") is not None:
            # fixed-max_nodes predictors serve exactly one shape
            bks = [self.collate_kwargs["max_nodes"]]
        else:
            bks = list(self.node_buckets or _DEFAULT_NODE_BUCKETS)
        n_compiled = 0
        for bucket in bks:
            if bucket < sample.num_nodes:
                continue
            kw = dict(self.collate_kwargs)
            kw["max_nodes"] = bucket
            kw.pop("node_buckets", None)
            batch = collate_graphs([sample] * self.max_batch, **kw)
            if self.wire:
                batch = to_wire(batch)
            dev = (jax.device_put(batch, self._batch_sharding)
                   if self._batch_sharding is not None
                   else jax.device_put(batch))
            jax.block_until_ready(fn(self.variables, dev))
            n_compiled += 1
        return n_compiled

    def compile_stats(self) -> dict:
        """One compile per distinct bucketed batch shape (XLA caches by
        shape under the single jitted fn)."""
        return {"buckets": self.node_buckets or "default",
                "max_batch": self.max_batch}


def bucketize(graphs: Sequence[Graph],
              node_buckets: Optional[Sequence[int]] = None):
    """Group graphs by their padded bucket size — serving-side batching
    helper that keeps every dispatch at one of the static shapes."""
    groups = {}
    for g in graphs:
        b = pad_bucket(g.num_nodes, node_buckets) if node_buckets \
            else pad_bucket(g.num_nodes)
        groups.setdefault(b, []).append(g)
    return groups
