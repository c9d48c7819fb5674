"""Kernel-modulated masked multi-head attention (GraphiT semantics).

This is the compute core of the reconstructed `DiffTransformerEncoderLayer` —
the layer is *missing from the reference snapshot* (transformer/layers.py is a
stray copy of gckn/layers.py; see SURVEY.md §2.7). Semantics are rebuilt from
the call-site contract (transformer/models.py:92-93,166-167,275) and the
GraphiT description in DiffGraphTransformer's docstring
(transformer/models.py:388-391, "node positional information is injected in
the attention score"):

  p   = softmax(Q K^T / sqrt(dh), masked over keys)
  p   = p * pe            (relative PE kernel, broadcast across heads)
  p   = p * degree        (optional 1/sqrt(1+deg) key rescale, data.py:41)
  p   = p / sum_k p       (row re-normalization; mirrors the explicit wV/z
                           normalization in LPE's sparse twin,
                           LPE/layers/graph_transformer_spectra_layer.py:364)
  out = p V

Rows of fully-masked (padded) queries are zeroed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


_NEG_INF = -1e30


def kernel_modulated_attention(
    q, k, v,
    node_mask,
    pe: Optional[jnp.ndarray] = None,
    degree: Optional[jnp.ndarray] = None,
    eps: float = 1e-9,
    pair_mask: Optional[jnp.ndarray] = None,
):
    """Batched dense attention with PE-kernel modulation.

    Args:
      q, k, v: [B, H, N, dh].
      node_mask: [B, N] bool, True = valid.
      pe: optional [B, N, N] positional kernel.
      degree: optional [B, N] per-node rescale applied to keys.
      pair_mask: optional [B, N, N] bool of admissible (query, key) pairs —
        used by packed batches to make attention block-diagonal across the
        graphs sharing a row; defaults to valid-key columns only.

    Returns:
      out: [B, H, N, dh] (padded rows zero)
      attn: [B, H, N, N] final (re-normalized) attention probabilities.
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    return modulated_attention_from_scores(
        scores, v, node_mask, pe=pe, degree=degree, eps=eps,
        pair_mask=pair_mask)


def modulated_attention_from_scores(
    scores, v,
    node_mask,
    pe: Optional[jnp.ndarray] = None,
    degree: Optional[jnp.ndarray] = None,
    eps: float = 1e-9,
    pair_mask: Optional[jnp.ndarray] = None,
    values_needed: bool = True,
    modulation_dtype=None,
):
    """GraphiT masking/softmax/PE-renormalization given precomputed scores.

    `scores` must already include the 1/sqrt(dh) scaling. Split out so
    layers can compute scores with MXU-friendlier contractions
    (x (Wq Wk^T) x^T) while sharing the exact modulation semantics.

    `modulation_dtype`: optional compute dtype for the post-softmax
    modulation chain (PE multiply, degree rescale, renormalization) —
    bf16 here halves the [B, H, N, N] HBM traffic of the whole chain;
    attention probabilities and PE entries are positive O(1) values, so
    bf16's ~3 decimal digits bound the relative error at ~1e-2 of a
    probability (softmax itself always stays f32).
    """
    if pair_mask is not None:
        admissible = pair_mask[:, None, :, :]
    else:
        admissible = node_mask[:, None, None, :]
    scores = jnp.where(admissible, scores, _NEG_INF)
    attn = jax_softmax_stable(scores)
    if modulation_dtype is not None:
        attn = attn.astype(modulation_dtype)
    if pe is not None:
        attn = attn * pe[:, None, :, :].astype(attn.dtype)
    if degree is not None:
        attn = attn * degree[:, None, None, :].astype(attn.dtype)
    if pe is not None or degree is not None:
        denom = attn.sum(-1, keepdims=True)
        attn = attn / jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    # zero rows of padded queries and inadmissible keys
    attn = attn * node_mask[:, None, :, None]
    attn = attn * (admissible if pair_mask is not None
                   else node_mask[:, None, None, :])
    if not values_needed:
        return None, attn
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out, attn


def jax_softmax_stable(scores):
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    e = jnp.exp(scores - m)
    return e / e.sum(-1, keepdims=True)
