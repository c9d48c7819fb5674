"""Segment and COO sparse primitives (jnp reference implementations).

TPU-native replacements for the reference's native kernels:
  - dynamic segment pooling (gckn/dynamic_pooling/pooling.cpp:53-219,
    pooling_cuda_kernel.cu) -> `jax.ops.segment_{sum,max}` wrappers with
    static segment counts;
  - SpMM for message passing over COO edges (PyG `propagate` in
    ChebNetDynamic.py:177-184) -> `coo_spmm` (gather + segment_sum);
  - edge softmax for the sparse attention tier (DGL `edge_softmax` used by
    LPE/layers/graph_transformer_spectra_layer.py) -> `segment_softmax`.

These jnp forms are the golden twins; Pallas kernels (ops/pallas/) must match
them bit-for-bit on the same inputs. Backward passes come from JAX autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments)

def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    s = jax.ops.segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments)
    cnt = jnp.where(cnt > 0, cnt, 1.0)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Softmax of per-edge logits within destination-node segments.

    The sparse twin of dense masked softmax — this is DGL's edge_softmax,
    used by the SAN/LPE attention (graph_transformer_spectra_layer.py:315-327
    computes exp/clamp then a wV/z normalize; the math is identical).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    z = jax.ops.segment_sum(e, segment_ids, num_segments)
    z = jnp.where(z > 0, z, 1.0)
    return e / z[segment_ids]


def coo_spmm(edge_index, edge_weight, x, num_nodes: int, edge_mask=None):
    """y[dst] = sum_{edges e: dst(e)=i} w_e * x[src(e)]  — flat COO SpMM.

    Equivalent of the reference's `propagate` with message norm*x_j
    (ChebNetDynamic.py:192-193; flow source->target).

    Args:
      edge_index: [2, E] int (src, dst).
      edge_weight: [E] or None.
      x: [V, D] node features.
      num_nodes: static V.
      edge_mask: [E] bool for padded edges.
    """
    src, dst = edge_index[0], edge_index[1]
    msg = x[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    if edge_mask is not None:
        msg = jnp.where(edge_mask[:, None], msg, 0.0)
    return jax.ops.segment_sum(msg, dst, num_nodes)
