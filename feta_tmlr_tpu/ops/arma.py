"""Dynamic ARMA spectral filter, dense batched.

Rebuild of `ARMAConvDynamic` (/root/reference/transformer/ChebNetDynamic.py:
201-358): ARMA_K with T=1 layer whose per-stack scales are *runtime inputs*:
per graph (and per head, after the FeTA head-folding) the coefficient vector
[a_1..a_K, b_1..b_K] modulates the stack weights:

  out = mean_k act( Anorm @ (x @ (W_init_k * a_k))
                    + dropout(x) @ (W_root_k * b_k) + bias_k )

with Anorm = D^{-1/2} A D^{-1/2} (gcn_norm WITHOUT self loops,
ChebNetDynamic.py:302-304). The reference's `_batch_multiply_coeff` bmm
gymnastics (per-node repeated weights) collapse into einsums with per-graph
weight tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

from feta_tmlr_tpu.ops.laplacian import jax_rsqrt
from feta_tmlr_tpu.ops.masking import pair_mask


def gcn_norm_no_self_loops(adj, node_mask):
    """D^{-1/2} A D^{-1/2} over the masked adjacency (no added self loops)."""
    pm = pair_mask(node_mask).astype(adj.dtype)
    a = adj * pm
    deg = a.sum(-1)
    dis = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
    return dis[..., :, None] * a * dis[..., None, :]


def arma_filter_dynamic(x, anorm, coeff, init_weight, root_weight, bias=None,
                        activation=jnp.tanh):
    """One-layer dynamic ARMA filter.

    Args:
      x: [B, H, N, D] per-head signals.
      anorm: [B, N, N] normalized adjacency.
      coeff: [B, H, 2K] dynamic coefficients (a | b halves).
      init_weight: [K, D, D] learned stack weights.
      root_weight: [K, D, D] learned root weights.
      bias: optional [K, 1, D].
      activation: sigma (reference default ReLU; FeTA's `filter` wraps the
        result in tanh — pass the activation the call-site needs).

    Returns: [B, H, N, D] (mean over the K stacks).
    """
    k_stacks = init_weight.shape[0]
    a = coeff[..., :k_stacks]                       # [B, H, K]
    b = coeff[..., k_stacks:]
    # w_k per (graph, head): [B,H,K,D,D]
    w_init = init_weight[None, None] * a[..., None, None]
    w_root = root_weight[None, None] * b[..., None, None]
    xw = jnp.einsum("bhnd,bhkde->bhkne", x, w_init)
    prop = jnp.einsum("bmn,bhkne->bhkme", anorm, xw)
    root = jnp.einsum("bhnd,bhkde->bhkne", x, w_root)
    out = prop + root
    if bias is not None:
        out = out + bias[None, None]
    if activation is not None:
        out = activation(out)
    return out.mean(axis=2)
