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

Two serving modes build on it:

  - **w8** (weight-only, `Predictor(quantize=True)`): activations stay
    in the configured compute dtype; each weight column is perturbed by
    at most scale/2 = max|w|/254 and the end-to-end logit error is
    bounded by the tests.
  - **w8a8** (`Predictor(quantize="w8a8")`): every `nn.Dense` call is
    intercepted (`int8_dense_interceptor`) and executed as an
    int8 x int8 -> int32 `dot_general` — the dot the TPU v5e MXU runs at
    2x its bf16 rate (394.7 vs 196.9 TOPS) — with dynamic per-token
    activation scales and per-output-channel weight scales folded back
    in f32 afterwards. Non-Dense consumers (Chebyshev contractions,
    attention score einsums, embedding gathers) keep full precision, so
    the numerics risk is confined to the projection/FFN matmuls where
    the FLOPs are.

Usage:
    qvars = quantize_variables(variables)          # host or device
    logits = model.apply(dequantize_variables(qvars), batch, ...)
or simply `Predictor(model, variables, quantize=True)` / `"w8a8"`.
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


def dynamic_quantize(x, axis: int = -1):
    """Symmetric dynamic int8 quantization along `axis` (per token for
    the default last-axis contraction)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = (jnp.where(amax > 0, amax, 1.0) / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense_interceptor(next_fun, args, kwargs, context):
    """Flax method interceptor: run every big-enough `nn.Dense` as an
    int8 x int8 -> int32 MXU dot with dynamic activation scales.

    Use inside apply:
        with nn.intercept_methods(int8_dense_interceptor):
            out = model.apply(variables, batch, deterministic=True)
    Weights are (re-)quantized per call — O(in*out) against the dot's
    O(tokens*in*out), fused by XLA, and exactly idempotent for weights
    that came through `quantize_variables` (q * scale requantizes to
    the same q).
    """
    import flax.linen as nn

    m = context.module
    if not (isinstance(m, nn.Dense)
            and context.method_name == "__call__"):
        return next_fun(*args, **kwargs)
    x = jnp.asarray(args[0])
    kernel = m.variables["params"]["kernel"]
    if (kernel.ndim != 2 or kernel.size < 256
            or x.shape[-1] != kernel.shape[0]):
        return next_fun(*args, **kwargs)
    xq, sx = dynamic_quantize(x)
    wt = quantize_tensor(kernel)
    acc = jax.lax.dot_general(
        xq, wt.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * wt.scale
    if m.use_bias:
        y = y + m.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


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
