"""GCKN device ops: path convolution + kernel + segment pooling, jnp.

TPU-native rebuilds of the reference's native kernels:
  - path_conv (gckn/gckn_fast/gckn_fast.cpp:50-117 + CUDA): a gather-mean
    along path positions -> here one `take` + mean that XLA fuses; backward
    comes from autodiff (the reference hand-writes the scatter).
  - dynamic pooling (gckn/dynamic_pooling/pooling.cpp, *_cuda_kernel.cu):
    variable-length per-node segment sum/mean/max -> jax.ops.segment_* with
    static padded shapes.
  - kernel functions (gckn/kernels.py:7-27): exp kernel exp(alpha*(x-1)).
  - matrix inverse sqrt (gckn/ops.py:5-45, torch.symeig autograd) ->
    jnp.linalg.eigh (autodiff for free).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-6


def exp_kernel(x, alpha):
    """kappa(x) = exp(alpha * (x - 1)) (gckn/kernels.py:7-8)."""
    return jnp.exp(alpha * (x - 1.0))


def linear_kernel(x, *_):
    return x


KERNELS = {"exp": exp_kernel, "linear": linear_kernel}


def path_conv(features, path_indices, path_mask=None):
    """emb[p] = mean_j features[path[p, j], j, :].

    Args:
      features: [V+1, S, H] node features per path position (dummy last row).
      path_indices: [P, s] int32 (s <= S).
      path_mask: [P] bool (padded rows produce zeros downstream anyway since
        they index the zero dummy row; mask kept for max pooling).
    Returns: [P, H]
    """
    s = path_indices.shape[1]
    gathered = features[path_indices, jnp.arange(s)[None, :], :]
    return gathered.mean(axis=1)


def segment_pool(values, segment_ids, num_segments, pooling="mean",
                 path_mask=None):
    """Per-node pooling over variable path counts (dpooling equivalent)."""
    if pooling in ("sum", "mean"):
        if path_mask is not None:
            values = jnp.where(path_mask[:, None], values, 0.0)
        out = jax.ops.segment_sum(values, segment_ids, num_segments)
        if pooling == "mean":
            ones = jnp.where(path_mask, 1.0, 0.0) if path_mask is not None \
                else jnp.ones(values.shape[:1])
            cnt = jax.ops.segment_sum(ones, segment_ids, num_segments)
            out = out / jnp.maximum(cnt, 1.0)[:, None]
        return out
    if pooling == "max":
        if path_mask is not None:
            values = jnp.where(path_mask[:, None], values, -jnp.inf)
        out = jax.ops.segment_max(values, segment_ids, num_segments)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"unknown pooling {pooling!r}")


def path_conv_agg(features, path_indices, segment_ids, num_segments,
                  pooling="mean", kappa=None, path_mask=None):
    """Fused path_conv -> kappa -> segment pooling
    (gckn/path_conv_agg.py:22-99). XLA fuses the chain; no RAM chunking
    needed (the reference streams on CPU with MAXRAM=5e9)."""
    emb = path_conv(features, path_indices, path_mask)
    if kappa is not None:
        emb = kappa(emb)
    return segment_pool(emb, segment_ids, num_segments, pooling, path_mask)


def matrix_inverse_sqrt(mat, eps: float = 1e-2):
    """kappa(Gram)^{-1/2} via eigh, exact reference semantics
    (gckn/ops.py:13-28): eigenvalues clamped at 0, then 1/(sqrt(e)+eps)
    with the reference's default eps=1e-2 (call site gckn/layers.py:81
    uses the default). Backward comes from eigh autodiff where the
    reference hand-derives the same expression (gckn/ops.py:30-45)."""
    w, v = jnp.linalg.eigh(mat)
    inv = 1.0 / (jnp.sqrt(jnp.maximum(w, 0.0)) + eps)
    return (v * inv[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def normalize_rows(x, axis=-1):
    """L2 row normalization with EPS clamp (gckn/utils.py normalize_)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, EPS)
