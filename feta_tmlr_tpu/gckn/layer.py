"""Functional GCKN path layer.

Rebuild of `PathLayer` (/root/reference/gckn/layers.py:17-187) as a
functional jax layer (parameters are explicit pytrees; the layer is used
both as a host-side PE precompute and inside supervised GCKN models).

forward semantics (layers.py:88-148):
  1. row-normalize anchor weights W [path_size, hidden, input];
  2. project: out = tensordot(features, W) / ||features||  (per position);
  3. per path size: path_conv (gather-mean) -> kappa -> per-node pooling;
  4. rescale by node norms;
  5. multiply by lintrans = kappa(mean_j W_j W_j^T)^{-1/2} (Nystrom
     normalization; cumsum/divider variant in aggregation mode).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.gckn.kmeans import spherical_kmeans
from feta_tmlr_tpu.gckn.ops import (
    EPS,
    KERNELS,
    matrix_inverse_sqrt,
    normalize_rows,
    path_conv_agg,
)
from feta_tmlr_tpu.gckn.paths import PathBatch


@dataclasses.dataclass
class PathLayerParams:
    weight: jnp.ndarray            # [path_size, hidden, input]
    path_size: int
    kernel_func: str = "exp"
    kernel_arg: float = 0.5        # sigma; alpha = 1/sigma^2 for exp
    pooling: str = "mean"
    aggregation: bool = False

    @property
    def alpha(self) -> float:
        if self.kernel_func == "exp":
            return 1.0 / self.kernel_arg ** 2
        return self.kernel_arg

    @property
    def hidden_size(self) -> int:
        return self.weight.shape[1]

    @property
    def input_size(self) -> int:
        return self.weight.shape[2]


def init_path_layer(rng, input_size, hidden_size, path_size,
                    kernel_func="exp", kernel_arg=0.5, pooling="mean",
                    aggregation=False) -> PathLayerParams:
    stdv = 1.0 / np.sqrt(hidden_size)
    w = jax.random.uniform(rng, (path_size, hidden_size, input_size),
                           minval=-stdv, maxval=stdv)
    w = normalize_rows(w)
    return PathLayerParams(weight=w, path_size=path_size,
                           kernel_func=kernel_func, kernel_arg=kernel_arg,
                           pooling=pooling,
                           aggregation=aggregation and path_size > 1)


def compute_lintrans(params: PathLayerParams):
    w = normalize_rows(params.weight)
    gram = jnp.einsum("shd,sgd->shg", w, w)       # [S, H, H]
    if params.aggregation:
        divider = jnp.arange(1.0, params.path_size + 1)[:, None, None]
        gram = jnp.cumsum(gram, axis=0) / divider
        kappa = KERNELS[params.kernel_func]
        return matrix_inverse_sqrt(kappa(gram, params.alpha))
    gram = gram.mean(axis=0)
    kappa = KERNELS[params.kernel_func]
    return matrix_inverse_sqrt(kappa(gram, params.alpha))


def path_layer_forward(params: PathLayerParams, features,
                       batch: PathBatch):
    """features: [V+1, F] (or [V+1, Q, F] for stacked layers).

    Returns [V+1, Q*path_size(or 1), hidden] per the reference layout.
    """
    w = normalize_rows(params.weight)
    kappa = partial(KERNELS[params.kernel_func], alpha=params.alpha)

    squeeze_q = features.ndim == 2
    if squeeze_q:
        features = features[:, None, :]            # [V+1, 1, F]
    v1, q, _ = features.shape
    norms = jnp.linalg.norm(features, axis=-1, keepdims=True)  # [V+1, Q, 1]
    out = jnp.einsum("vqf,shf->vsqh", features, w)
    out = out / jnp.maximum(norms, EPS)[:, None, :, :]
    out = out.reshape(v1, params.path_size, q * params.hidden_size)

    num_segments = v1                              # includes dummy slot
    if params.aggregation:
        embeds = []
        for s in range(params.path_size):
            e = path_conv_agg(
                out, jnp.asarray(batch.path_indices[s]),
                jnp.asarray(batch.segment_ids[s]), num_segments,
                pooling=params.pooling, kappa=kappa,
                path_mask=jnp.asarray(batch.path_mask[s]))
            embeds.append(e)
        emb = jnp.stack(embeds, 0)                 # [S, V+1, Q*H]
        emb = emb.reshape(params.path_size, v1 * q, params.hidden_size)
        emb = norms.reshape(1, -1, 1) * emb
        lintrans = compute_lintrans(params)        # [S, H, H]
        emb = jnp.einsum("svh,shg->svg", emb, lintrans)
        emb = emb.reshape(params.path_size, v1, q, params.hidden_size)
        emb = emb.transpose(1, 2, 0, 3).reshape(
            v1, q * params.path_size, params.hidden_size)
        return emb
    else:
        s = params.path_size
        emb = path_conv_agg(
            out, jnp.asarray(batch.path_indices[s - 1]),
            jnp.asarray(batch.segment_ids[s - 1]), num_segments,
            pooling=params.pooling, kappa=kappa,
            path_mask=jnp.asarray(batch.path_mask[s - 1]))
        emb = emb.reshape(v1, q, params.hidden_size)
        emb = norms * emb
        lintrans = compute_lintrans(params)        # [H, H]
        emb = jnp.einsum("vqh,hg->vqg", emb, lintrans)
        return emb


def sample_paths(params: PathLayerParams, features, batch: PathBatch,
                 n_sampling_paths: int = 1000, seed: int = 0):
    """Sample path feature tensors for k-means (layers.py:150-172)."""
    rng = np.random.default_rng(seed)
    s = params.path_size
    feats = np.asarray(features)
    if feats.ndim == 2:
        feats = feats[:, None, :]
    pi = batch.path_indices[s - 1]
    mask = batch.path_mask[s - 1]
    pi = pi[mask]
    if s == 1:
        flat = feats.transpose(1, 0, 2).reshape(-1, feats.shape[-1])
        n = min(len(flat), n_sampling_paths)
        idx = rng.permutation(len(flat))[:n]
        return flat[idx][:, None, :]
    n = min(pi.shape[0], n_sampling_paths)
    idx = rng.permutation(pi.shape[0])[:n]
    paths = feats[pi[idx]]                         # [n, s, Q, F]
    paths = paths.transpose(0, 2, 1, 3).reshape(-1, s, feats.shape[-1])
    return paths[:n]


def unsup_train_layer(params: PathLayerParams, paths,
                      seed: int = 0,
                      use_jax: bool = False) -> PathLayerParams:
    """Spherical k-means over sampled paths -> anchor weights
    (layers.py:174-187). use_jax=True runs the Lloyd loop as one jitted
    while_loop on the current default device (kmeans.spherical_kmeans_jax
    — the single-dispatch variant for remote accelerators)."""
    if use_jax:
        from feta_tmlr_tpu.gckn.kmeans import spherical_kmeans_jax
        centers = spherical_kmeans_jax(paths, params.hidden_size,
                                       seed=seed)
    else:
        centers = spherical_kmeans(paths, params.hidden_size, seed=seed)
    w = jnp.asarray(centers).transpose(1, 0, 2)    # [path_size, hidden, in]
    return dataclasses.replace(params, weight=normalize_rows(w))
