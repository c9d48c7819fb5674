"""Pure-numpy golden twins of the device ops.

Following the reference's own test idiom (each native kernel ships a
pure-torch twin compared by max-abs-diff, e.g. gckn/gckn_fast/gckn_fast.py:
55-130), every jnp/Pallas op here has a straightforward numpy implementation
that follows the reference's COO semantics step by step. Tests assert
allclose between the TPU-native dense ops and these twins.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def coo_cheb_norm(edge_index, num_nodes, normalization="sym",
                  lambda_max=2.0):
    """ChebConvDynamic.__norm__ (transformer/ChebNetDynamic.py:108-130) in
    numpy COO, returning the dense Lhat it implies."""
    row, col = edge_index[0], edge_index[1]
    keep = row != col
    row, col = row[keep], col[keep]
    a = np.zeros((num_nodes, num_nodes))
    a[row, col] = 1.0
    deg = a.sum(1)
    if normalization == "sym":
        dis = np.where(deg > 0, deg.clip(min=1e-30) ** -0.5, 0.0)
        lap = np.eye(num_nodes) - dis[:, None] * a * dis[None, :]
    elif normalization == "rw":
        dinv = np.where(deg > 0, 1.0 / deg.clip(min=1e-30), 0.0)
        lap = np.eye(num_nodes) - dinv[:, None] * a
    elif normalization is None:
        lap = np.diag(deg) - a
    else:
        raise ValueError(normalization)
    scaled = 2.0 * lap / lambda_max
    scaled[np.isinf(scaled)] = 0.0
    return scaled - np.eye(num_nodes)


def cheb_dynamic_single(x, lhat, weights, bias=None):
    """Per-graph dynamic Chebyshev filter, direct recurrence.

    x: [N, Din]; lhat: [N, N]; weights: [K, Din, Dout].
    Mirrors ChebConvDynamic.forward (ChebNetDynamic.py:162-189).
    """
    k_order = weights.shape[0]
    tx0 = x
    out = tx0 @ weights[0]
    if k_order > 1:
        tx1 = lhat @ x
        out = out + tx1 @ weights[1]
        for k in range(2, k_order):
            tx2 = 2.0 * (lhat @ tx1) - tx0
            out = out + tx2 @ weights[k]
            tx0, tx1 = tx1, tx2
    if bias is not None:
        out = out + bias
    return out


def gcn_norm_np(a, add_self_loops=True):
    """PyG gcn_norm over a dense weighted adjacency."""
    a = a.copy()
    n = a.shape[0]
    if add_self_loops:
        np.fill_diagonal(a, 0.0)
        a = a + np.eye(n)
    deg = a.sum(1)
    dis = np.where(deg > 0, deg.clip(min=1e-30) ** -0.5, 0.0)
    return dis[:, None] * a * dis[None, :]


def graphit_attention_np(q, k, v, valid, pe=None, degree=None, eps=1e-9):
    """Single-head GraphiT attention on one graph (numpy).

    q,k,v: [N, dh]; valid: [N] bool; pe: [N, N]; degree: [N].
    """
    dh = q.shape[-1]
    scores = q @ k.T / np.sqrt(dh)
    scores = np.where(valid[None, :], scores, -1e30)
    m = scores.max(-1, keepdims=True)
    e = np.exp(scores - m)
    attn = e / e.sum(-1, keepdims=True)
    if pe is not None:
        attn = attn * pe
    if degree is not None:
        attn = attn * degree[None, :]
    if pe is not None or degree is not None:
        denom = attn.sum(-1, keepdims=True)
        attn = attn / np.where(np.abs(denom) > eps, denom, 1.0)
    attn = attn * valid[:, None] * valid[None, :]
    return attn @ v, attn
