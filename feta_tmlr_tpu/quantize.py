"""Weight-only int8 quantization for serving.

The reference has no quantization story; this is the deployment-side
counterpart of `serve.py` for memory- and transfer-bound serving: every
2-D parameter matrix (dense kernels, embeddings, attention projections)
is stored as symmetric per-output-channel int8 plus an f32 scale row —
4x smaller than f32 (2x vs bf16) in HBM, in checkpoint-restore relay
transfers, and in replicated-parameter broadcasts. Dequantization
happens INSIDE the jitted forward (`dequantize_variables`), so XLA
fuses `q.astype(f32) * scale` into the consuming matmul and no
full-precision copy of the weights ever lives in HBM between calls.

This is W8A16-style weight-only quantization (activations stay in the
configured compute dtype): numerically it perturbs each weight column
by at most scale/2 = max|w|/254, and the end-to-end logit error is
bounded by the tests. True int8xint8 MXU matmuls (which on TPU v5e
double bf16 throughput) additionally need dynamic activation
quantization; the per-channel scales stored here are the required
weight half of that scheme.

Usage:
    qvars = quantize_variables(variables)          # host or device
    logits = model.apply(dequantize_variables(qvars), batch, ...)
or simply `Predictor(model, variables, quantize=True)`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np


class QTensor(flax.struct.PyTreeNode):
    """Symmetric per-channel int8 weight: w ~= q * scale.

    q: int8, same shape as the original weight.
    scale: f32, shape [1, ..., channels] (broadcast over all axes but
      the last — flax kernels are [in, out], so channels = out).
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def nbytes(self):
        return self.q.size + 4 * self.scale.size


def _default_predicate(leaf) -> bool:
    # 2-D float matrices big enough for the int8 savings to matter;
    # biases, norm scales, and batch_stats vectors stay full precision
    return (hasattr(leaf, "ndim") and leaf.ndim == 2
            and jnp.issubdtype(np.asarray(leaf).dtype, np.floating)
            and leaf.size >= 256)


def quantize_tensor(w) -> QTensor:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    w = jnp.asarray(w, dtype=jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                   keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def dequantize_tensor(t: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    return t.q.astype(dtype) * t.scale.astype(dtype)


def quantize_variables(variables: Any,
                       predicate: Optional[Callable] = None,
                       collection: str = "params") -> Any:
    """Quantize every predicate-matching leaf of `variables[collection]`.

    Other collections (batch_stats, ...) pass through untouched. The
    returned tree has the same structure with matching leaves replaced
    by `QTensor`s — still a valid pytree for device_put/jit/sharding.
    """
    predicate = predicate or _default_predicate
    out = dict(variables)
    out[collection] = jax.tree_util.tree_map(
        lambda w: quantize_tensor(w) if predicate(w) else w,
        variables[collection])
    return out


def dequantize_variables(variables: Any, dtype=jnp.float32) -> Any:
    """Inverse of `quantize_variables` — call INSIDE jit so XLA fuses
    the scaling into each weight's consumer."""
    return jax.tree_util.tree_map(
        lambda w: dequantize_tensor(w, dtype) if isinstance(w, QTensor)
        else w,
        variables, is_leaf=lambda w: isinstance(w, QTensor))


def tree_nbytes(variables: Any) -> int:
    """Parameter-memory footprint in bytes (QTensor-aware)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            variables, is_leaf=lambda w: isinstance(w, QTensor)):
        if isinstance(leaf, QTensor):
            total += int(leaf.nbytes)
        else:
            total += int(np.asarray(leaf).nbytes)
    return total
