"""Dynamic Chebyshev spectral filters, dense batched.

Re-design of the reference's `ChebConvDynamic`
(/root/reference/transformer/ChebNetDynamic.py:29-198): a Chebyshev graph
convolution whose filter weights are *runtime inputs* (produced per graph and
per attention head by the coefficient GCN), not parameters.

Reference semantics:
  Tx_0 = x ; Tx_1 = Lhat x ; Tx_k = 2 Lhat Tx_{k-1} - Tx_{k-2}
  out  = sum_k Tx_k @ W_k            (dynamic mode: W_k per (head, graph),
                                      applied per node via repeat_interleave +
                                      bmm, ChebNetDynamic.py:146-155,167-183)
  out  = sum_k c_k * (Tx_k @ W_k)    (learn_only_filter_order_coeff mode:
                                      static W, per-graph scalar coefficients,
                                      ChebNetDynamic.py:91-92,165-181)

TPU-first mapping: heads and graphs stay batch axes; the per-node
repeat_interleave disappears — weights are indexed per graph and contracted
with a single einsum per Chebyshev order; the recurrence is K-1 batched dense
matmuls on the MXU (graphs are small, so dense Lhat beats gather/scatter
SpMM by a wide margin on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def cheb_filter_dynamic(x, lhat, weights, bias=None):
    """Chebyshev filter with per-(graph, head) dynamic weight tensors.

    Args:
      x: [B, H, N, Din] per-head node signals.
      lhat: [B, N, N] scaled Laplacian (see `cheb_scaled_laplacian`).
      weights: [B, H, K, Din, Dout] dynamic filter weights.
      bias: optional [Dout] (the reference layer's bias, zero-init).

    Returns:
      [B, H, N, Dout]
    """
    k_order = weights.shape[2]
    tx_prev = x                                             # Tx_0
    out = jnp.einsum("bhnd,bhde->bhne", tx_prev, weights[:, :, 0])
    if k_order > 1:
        tx_cur = jnp.einsum("bmn,bhnd->bhmd", lhat, x)      # Tx_1
        out = out + jnp.einsum("bhnd,bhde->bhne", tx_cur, weights[:, :, 1])
        for k in range(2, k_order):
            tx_next = 2.0 * jnp.einsum("bmn,bhnd->bhmd", lhat, tx_cur) - tx_prev
            out = out + jnp.einsum(
                "bhnd,bhde->bhne", tx_next, weights[:, :, k])
            tx_prev, tx_cur = tx_cur, tx_next
    if bias is not None:
        out = out + bias
    return out


def cheb_filter_dynamic_per_node(x, lhat, weights, bias=None):
    """Dynamic Chebyshev filter with per-NODE weight tensors.

    The packed-batch variant: each node carries the weights of the graph it
    belongs to (gathered by graph_id), so graphs sharing a row use different
    filters under one block-diagonal Laplacian.

    Args:
      x: [B, H, N, Din]; lhat: [B, N, N];
      weights: [B, H, N, K, Din, Dout]; bias: optional [Dout].
    """
    k_order = weights.shape[3]
    tx_prev = x
    out = jnp.einsum("bhnd,bhnde->bhne", tx_prev, weights[:, :, :, 0])
    if k_order > 1:
        tx_cur = jnp.einsum("bmn,bhnd->bhmd", lhat, x)
        out = out + jnp.einsum("bhnd,bhnde->bhne", tx_cur,
                               weights[:, :, :, 1])
        for k in range(2, k_order):
            tx_next = 2.0 * jnp.einsum("bmn,bhnd->bhmd", lhat, tx_cur) - tx_prev
            out = out + jnp.einsum("bhnd,bhnde->bhne", tx_next,
                                   weights[:, :, :, k])
            tx_prev, tx_cur = tx_cur, tx_next
    if bias is not None:
        out = out + bias
    return out


def cheb_filter_scalar_coeff(x, lhat, coeff, weight, bias=None):
    """Chebyshev filter with static weights scaled by per-graph scalars.

    The reference's `learn_only_filter_order_coeff=True` mode
    (ChebNetDynamic.py:164-183): out = sum_k (c_k * Tx_k) @ W_k.

    Args:
      x: [B, H, N, Din].
      lhat: [B, N, N].
      coeff: [B, H, K] per-graph per-head scalar coefficients.
      weight: [K, Din, Dout] learned static weights.
      bias: optional [Dout].
    """
    k_order = weight.shape[0]
    tx_prev = x
    out = jnp.einsum("bhnd,de->bhne",
                     coeff[:, :, 0, None, None] * tx_prev, weight[0])
    if k_order > 1:
        tx_cur = jnp.einsum("bmn,bhnd->bhmd", lhat, x)
        out = out + jnp.einsum("bhnd,de->bhne",
                               coeff[:, :, 1, None, None] * tx_cur, weight[1])
        for k in range(2, k_order):
            tx_next = 2.0 * jnp.einsum("bmn,bhnd->bhmd", lhat, tx_cur) - tx_prev
            out = out + jnp.einsum(
                "bhnd,de->bhne",
                coeff[:, :, k, None, None] * tx_next, weight[k])
            tx_prev, tx_cur = tx_cur, tx_next
    if bias is not None:
        out = out + bias
    return out
