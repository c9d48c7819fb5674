"""Per-graph largest-eigenvalue estimation for Chebyshev scaling.

The reference requires an explicit `lambda_max` for non-sym Laplacian
normalizations, precomputed via PyG's LaplacianLambdaMax transform
(ChebNetDynamic.py:68-74). TPU-native equivalent: batched power iteration
over the dense Laplacian — a handful of [B, N, N] x [B, N] matmuls, jit-
friendly, no host eigensolver round trip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from feta_tmlr_tpu.ops.laplacian import graph_laplacian_dense


def power_iteration_lambda_max(mat, node_mask, n_iters: int = 50,
                               eps: float = 1e-12):
    """Largest |eigenvalue| per batch element of symmetric mat [B, N, N]."""
    b, n, _ = mat.shape
    # deterministic but non-degenerate start: the all-ones vector is the
    # NULL eigenvector of D - A, so use a varying profile instead
    profile = 1.0 + jnp.sin(jnp.arange(n, dtype=mat.dtype) * 1.7)
    v = node_mask.astype(mat.dtype) * profile
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    def body(_, v):
        w = jnp.einsum("bmn,bn->bm", mat, v)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                               eps)

    v = jax.lax.fori_loop(0, n_iters, body, v)
    w = jnp.einsum("bmn,bn->bm", mat, v)
    # Rayleigh quotient (|.| since power iteration tracks |lambda|max)
    num = jnp.abs(jnp.einsum("bm,bm->b", v, w))
    den = jnp.maximum(jnp.einsum("bm,bm->b", v, v), eps)
    return num / den


def laplacian_lambda_max(adj, node_mask,
                         normalization: Optional[str] = None,
                         n_iters: int = 50):
    """lambda_max [B] of the graph Laplacian under `normalization`."""
    lap = graph_laplacian_dense(adj, node_mask, normalization)
    return power_iteration_lambda_max(lap, node_mask, n_iters)
