"""Dense batched graph Laplacians and GCN normalizations.

TPU-first: instead of the reference's per-edge COO pipeline
(remove_self_loops -> get_laplacian -> scale -> add_self_loops, see
/root/reference/transformer/ChebNetDynamic.py:108-130), we build the scaled
Laplacian as a dense [B, N, N] matrix in one fused elementwise chain — every
downstream Chebyshev step is then a batched matmul on the MXU.

Semantics replicated exactly from the reference (`ChebConvDynamic.__norm__`):
  1. self loops removed from A;
  2. L per `normalization`:
       None : L = D - A
       sym  : L = I - D^{-1/2} A D^{-1/2}   (PyG get_laplacian: diag = 1 for
              every node unconditionally, off-diag = -a_ij/sqrt(d_i d_j) with
              d^{-1/2}=0 where d=0)
       rw   : L = I - D^{-1} A
  3. scale: Lhat = (2/lambda_max) * L, inf -> 0 (ChebNetDynamic.py:122-123);
  4. add self loops with fill -1 (ChebNetDynamic.py:125-127) — in COO these
     *coexist* with step-2's diagonal and sum in SpMM, so the dense diagonal
     is (2/lambda_max) * diag(L) - 1. With the default lambda_max=2 and sym
     norm the net diagonal is 0 for every node.
Padded rows/cols are zeroed so phantom nodes never propagate signal.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from feta_tmlr_tpu.ops.masking import pair_mask


def _strip_diag(a):
    n = a.shape[-1]
    return a * (1.0 - jnp.eye(n, dtype=a.dtype))


def cheb_scaled_laplacian(
    adj,
    node_mask,
    normalization: Optional[str] = "sym",
    lambda_max=None,
):
    """Scaled Chebyshev Laplacian Lhat = 2 L / lambda_max - I, dense batched.

    Args:
      adj: [B, N, N] dense adjacency (may carry edge weights).
      node_mask: [B, N] bool validity mask.
      normalization: None | 'sym' | 'rw' (reference ChebNetDynamic.py:86).
      lambda_max: scalar or [B] per-graph spectral bound. Defaults to 2.0
        only under 'sym' normalization (where eigenvalues are bounded by 2);
        for 'rw'/None an explicit value is REQUIRED, exactly as the
        reference refuses to run without one (ChebNetDynamic.py:135-140).

    Returns:
      Lhat: [B, N, N], rows/cols of padded nodes zeroed.
    """
    if lambda_max is None:
        if normalization != "sym":
            raise ValueError(
                "lambda_max is required for non-'sym' normalization "
                "(the spectrum of D-A / I-D^-1 A is not bounded by 2; "
                "reference ChebNetDynamic.py:135-140 raises here too)")
        lambda_max = 2.0
    mask = node_mask.astype(adj.dtype)
    pm = pair_mask(node_mask).astype(adj.dtype)
    a = _strip_diag(adj * pm)
    deg = a.sum(-1)
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)

    if normalization == "sym":
        dis = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
        off = -dis[..., :, None] * a * dis[..., None, :]
        diag = mask  # = 1 on every (real) node, PyG get_laplacian behavior
    elif normalization == "rw":
        dinv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
        off = -dinv[..., :, None] * a
        diag = mask
    elif normalization is None:
        off = -a
        diag = deg
    else:
        raise ValueError(f"invalid normalization {normalization!r}")

    lam = jnp.asarray(lambda_max, dtype=a.dtype)
    scale = 2.0 / lam
    scale = jnp.where(jnp.isinf(scale), 0.0, scale)
    if scale.ndim == 1:  # per-graph lambda_max
        scale = scale[:, None, None]
    lhat = scale * (off + diag[..., :, None] * eye) - mask[..., :, None] * eye
    return lhat * pm


def gcn_norm_dense(adj, node_mask, add_self_loops: bool = True,
                   improved: bool = False):
    """Dense batched GCN normalization for SYMMETRIC adjacencies.

    Equivalent of the reference's local `gcn_norm`
    (transformer/GenGCN.py:55-102) when the graph is undirected:
    `add_remaining_self_loops` keeps an existing self-loop's weight and only
    fills missing diagonals with 1 (2 if improved); degrees are edge-weight
    sums (row == column sums under symmetry).

    For the *directed* attention graph of the coefficient GCN use
    `gcn_norm_directed` — in-degrees and destination aggregation differ.
    """
    pm = pair_mask(node_mask).astype(adj.dtype)
    a = adj * pm
    n = a.shape[-1]
    if add_self_loops:
        fill = 2.0 if improved else 1.0
        eye = jnp.eye(n, dtype=a.dtype)
        diag = jnp.diagonal(a, axis1=-2, axis2=-1)
        missing = (diag == 0) & node_mask.astype(bool)
        a = a + fill * missing.astype(a.dtype)[..., :, None] * eye
    deg = a.sum(-1)
    dis = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
    return dis[..., :, None] * a * dis[..., None, :]


def gcn_norm_directed(a, node_mask, fill: float = 1.0):
    """PyG gcn_norm over a DIRECTED weighted graph, dense batched.

    Exact semantics of the reference coefficient-GCN normalization
    (transformer/GenGCN.py:89-102 over the detached attention graph,
    models.py:240-287): a[..., i, j] is the weight of edge i -> j;
    `add_remaining_self_loops` keeps existing (i, i) weights and fills only
    missing ones; deg[j] = sum_i a[i, j] (in-degree via scatter_add over
    col); norm(i->j) = deg^{-1/2}[i] * a[i, j] * deg^{-1/2}[j].

    Returns anorm with the same [., i(src), j(dst)] layout; aggregate at the
    destination with einsum('...ij,...ic->...jc', anorm, x).
    """
    pm = pair_mask(node_mask).astype(a.dtype)
    a = a * pm
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    missing = (diag == 0) & node_mask.astype(bool)
    a = a + fill * missing.astype(a.dtype)[..., :, None] * eye
    deg_in = a.sum(-2)                                 # column sums
    dis = jnp.where(deg_in > 0, jax_rsqrt(deg_in), 0.0)
    return dis[..., :, None] * a * dis[..., None, :]


def graph_laplacian_dense(adj, node_mask, normalization: Optional[str] = "sym"):
    """Dense unscaled Laplacian: None D-A | sym I-An | rw I-D^-1 A.

    The one L builder shared by GENGCN polynomials (nn/gnn.py) and
    lambda_max estimation (ops/lambda_max.py) — keep any semantic change
    in sync with cheb_scaled_laplacian above."""
    pm = pair_mask(node_mask).astype(adj.dtype)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    a = adj * pm * (1.0 - eye)
    deg = a.sum(-1)
    mask = node_mask.astype(adj.dtype)
    if normalization == "sym":
        dis = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
        lap = -dis[..., :, None] * a * dis[..., None, :] \
            + mask[..., :, None] * eye
    elif normalization == "rw":
        dinv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
        lap = -dinv[..., :, None] * a + mask[..., :, None] * eye
    else:
        lap = -a + deg[..., :, None] * eye
    return lap * pm


def jax_rsqrt(x):
    # rsqrt with the deg>0 guard applied by callers; avoid NaN grads at 0
    return jnp.where(x > 0, x, 1.0) ** -0.5
