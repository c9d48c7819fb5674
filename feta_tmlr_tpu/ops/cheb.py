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


def _block_diag_weights(weights):
    """[B, H, K, d, e] -> [B, K, H*d, H*e] block-diagonal weight matrices.

    TPU layout trick: contracting per-head signals [N, dh] with per-head
    [dh, dh] weights runs the MXU at dh/128 lane utilization; flattening
    heads and using one block-diagonal [H*dh, H*dh] matrix per (graph, k)
    turns K*H tiny matmuls into K full-width batched matmuls."""
    b, h, k, d, e = weights.shape
    eye = jnp.eye(h, dtype=weights.dtype)
    # [B, K, H(out-block), H(in-block), d, e] masked to the diagonal blocks
    wbd = weights.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :] \
        * eye[None, None, :, :, None, None]
    return wbd.transpose(0, 1, 2, 4, 3, 5).reshape(b, k, h * d, h * e)


def cheb_filter_dynamic(x, lhat, weights, bias=None):
    """Chebyshev filter with per-(graph, head) dynamic weight tensors.

    Args:
      x: [B, H, N, Din] per-head node signals.
      lhat: [B, N, N] scaled Laplacian (see `cheb_scaled_laplacian`).
      weights: [B, H, K, Din, Dout] dynamic filter weights.
      bias: optional [Dout] (the reference layer's bias, zero-init).

    Returns:
      [B, H, N, Dout]

    Implementation: heads are flattened to one [B, N, H*Din] signal; the
    recurrence is K-1 batched [N, N] x [N, H*D] matmuls and the dynamic
    contraction uses block-diagonal [H*Din, H*Dout] weights — every matmul
    contracts over >= H*dh lanes instead of dh (see _block_diag_weights).
    """
    b, h, n, din = x.shape
    k_order = weights.shape[2]
    dout = weights.shape[-1]
    wbd = _block_diag_weights(weights)                     # [B,K,HDin,HDout]
    xf = x.transpose(0, 2, 1, 3).reshape(b, n, h * din)
    tx_prev = xf
    out = jnp.einsum("bnd,bde->bne", tx_prev, wbd[:, 0])
    if k_order > 1:
        tx_cur = jnp.einsum("bmn,bnd->bmd", lhat, xf)
        out = out + jnp.einsum("bnd,bde->bne", tx_cur, wbd[:, 1])
        for k in range(2, k_order):
            tx_next = 2.0 * jnp.einsum("bmn,bnd->bmd", lhat, tx_cur) - tx_prev
            out = out + jnp.einsum("bnd,bde->bne", tx_next, wbd[:, k])
            tx_prev, tx_cur = tx_cur, tx_next
    out = out.reshape(b, n, h, dout).transpose(0, 2, 1, 3)
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
    b, h, n, din = x.shape
    k_order = weight.shape[0]
    dout = weight.shape[-1]
    # flattened-head layout (see cheb_filter_dynamic): static weight is
    # shared across heads, so its block-diagonal form is kron(I_H, W_k)
    eye = jnp.eye(h, dtype=weight.dtype)
    wbd = jnp.einsum("hg,kde->khdge", eye, weight).reshape(
        k_order, h * din, h * dout)
    xf = x.transpose(0, 2, 1, 3).reshape(b, n, h * din)
    # per-head scalar coeffs expanded over each head's block of lanes
    cvec = jnp.repeat(coeff, din, axis=1)                   # [B, H*Din, K]

    tx_prev = xf
    out = (tx_prev * cvec[:, None, :, 0]) @ wbd[0]
    if k_order > 1:
        tx_cur = jnp.einsum("bmn,bnd->bmd", lhat, xf)
        out = out + (tx_cur * cvec[:, None, :, 1]) @ wbd[1]
        for k in range(2, k_order):
            tx_next = 2.0 * jnp.einsum("bmn,bnd->bmd", lhat, tx_cur) - tx_prev
            out = out + (tx_next * cvec[:, None, :, k]) @ wbd[k]
            tx_prev, tx_cur = tx_cur, tx_next
    out = out.reshape(b, n, h, dout).transpose(0, 2, 1, 3)
    if bias is not None:
        out = out + bias
    return out
