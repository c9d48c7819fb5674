"""Mask utilities for padded-dense graph batches."""

from __future__ import annotations

import jax.numpy as jnp


def pair_mask(node_mask):
    """[B, N] bool -> [B, N, N] bool of valid (query, key) node pairs."""
    m = node_mask.astype(jnp.bool_)
    return m[..., :, None] & m[..., None, :]


def pair_mask_no_diag(node_mask):
    """Valid node pairs excluding self-pairs: the DGL tiers' 'full graph'
    is nx.complete_graph (no self loops, LSPE/data/molecules.py:202), so a
    node never attends to itself there."""
    pm = pair_mask(node_mask)
    n = pm.shape[-1]
    return pm & ~jnp.eye(n, dtype=bool)


def in_edge_mask(adj, node_mask):
    """[.., i(dst), j(src)] bool: edge j -> i exists.

    collate_graphs writes adj[src, dst]; attention/eta tensors here index
    [dst, src], so the adjacency is transposed before masking (equal for
    undirected graphs, correct for directed ones)."""
    return (jnp.swapaxes(adj, -1, -2) > 0) & pair_mask(node_mask)


def masked_mean(x, mask, axis, eps: float = 0.0):
    """Mean of x over `axis`, counting only entries where mask is True.

    Matches the reference's GlobalAvg1D (transformer/models.py:586-595):
    sum over valid entries divided by the valid count (no epsilon there; an
    empty graph would divide by zero in the reference too — eps guards it).
    """
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    s = jnp.sum(x * m, axis=axis)
    d = jnp.sum(m, axis=axis)
    if eps:
        d = d + eps
    return s / d
