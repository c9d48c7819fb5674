"""Packed-batch FeTA models: many graphs per lane-aligned node row.

Numerically equivalent to DiffGraphTransformerGenGCN on the same graphs
(verified in tests/test_packed.py) but with ~row_len/avg_nodes graphs per
row: every feature matmul runs at full MXU lane width and the number of
rows drops ~5x for molecule-sized graphs. Attention, the coefficient GCN
and the Chebyshev Laplacian become block-diagonal via the graph_id pair
mask; per-graph quantities (filter coefficients, pooled readouts) use a
membership matrix [B, N, G] so pooling is a single matmul.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.feta import FilterCoefficientHead
from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer
from feta_tmlr_tpu.nn.models import ClassifierMLP, coefficient_regularizer
from feta_tmlr_tpu.ops.cheb import cheb_filter_dynamic_per_node
from feta_tmlr_tpu.ops.laplacian import (
    cheb_scaled_laplacian,
    gcn_norm_directed,
)


def membership(graph_id, node_mask, n_graphs: int):
    """[B, N, G] one-hot graph membership (0 on padding)."""
    gid = jnp.where(node_mask, graph_id, n_graphs)
    onehot = jax.nn.one_hot(gid, n_graphs + 1, dtype=jnp.float32)
    return onehot[..., :n_graphs]


def per_graph_mean(x, memb):
    """x: [B, (H,) N, D], memb: [B, N, G] -> per-graph mean [B, (H,) G, D]."""
    cnt = jnp.maximum(memb.sum(axis=-2), 1.0)          # [B, G]
    if x.ndim == 4:
        s = jnp.einsum("bhnd,bng->bhgd", x, memb)
        return s / cnt[:, None, :, None]
    s = jnp.einsum("bnd,bng->bgd", x, memb)
    return s / cnt[:, :, None]


class PackedFilterCoefficientHead(nn.Module):
    """Coefficient GCN over the (block-diagonal) attention graph, pooled
    per graph slot. Same math as FilterCoefficientHead
    (transformer/models.py:240-287) with the mean pool taken per packed
    graph instead of per row."""

    num_coefficients: int

    @nn.compact
    def __call__(self, attn, node_mask, memb):
        a = jax.lax.stop_gradient(attn)
        mask_h = node_mask[:, None, :]
        a_norm = gcn_norm_directed(a, mask_h)          # [B,H,N(src),N(dst)]
        c = self.num_coefficients
        w = self.param("gcn_kernel", nn.initializers.glorot_uniform(),
                       (c, c))
        b = self.param("gcn_bias", nn.initializers.zeros, (c,))
        # ones node features -> outer-product form (see FilterCoefficientHead)
        s = a_norm.sum(axis=2)
        h = jnp.tanh(s[..., None] * w.sum(axis=0) + b)
        pooled = per_graph_mean(h, memb)               # [B, H, G, C]
        return nn.Dense(c, name="coeff_linear")(pooled)


class PackedFeTAEncoder(nn.Module):
    """FeTA encoder over packed rows (ChebConvDynamic mode)."""

    d_model: int
    n_heads: int
    n_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    batch_norm: bool = False
    filter_order: int = 4
    last_layer_filter: bool = True
    use_skip_conn: bool = True
    laplacian_norm: Optional[str] = "sym"

    @nn.compact
    def __call__(self, x, pe, adj, node_mask, graph_id, graph_mask,
                 degree=None, deterministic=True):
        b, n, d = x.shape
        h = self.n_heads
        dh = d // h
        k_ord = self.filter_order
        n_coeff = k_ord * dh * dh
        g_max = graph_mask.shape[1]

        pair = ((graph_id[:, :, None] == graph_id[:, None, :])
                & node_mask[:, :, None] & node_mask[:, None, :])
        memb = membership(graph_id, node_mask, g_max)
        if self.laplacian_norm != "sym":
            raise NotImplementedError(
                "packed batches support only 'sym' Chebyshev normalization:"
                " rw/None need PER-GRAPH lambda_max, and a row-level power "
                "iteration over the block-diagonal Laplacian would scale "
                "every packed graph by the row maximum — use the unpacked "
                "FeTAEncoder for those modes")
        lhat = cheb_scaled_laplacian(adj, node_mask,
                                     normalization=self.laplacian_norm)
        coeff_head = PackedFilterCoefficientHead(n_coeff, name="coeff_head")
        cheb_bias = self.param("cheb_bias", nn.initializers.zeros, (dh,))

        out = x
        allout = None
        coeffs = []
        for layer_idx in range(self.n_layers):
            filtered = (not self.last_layer_filter
                        or layer_idx + 1 == self.n_layers)
            out, attn, out_each_head = GraphiTEncoderLayer(
                self.d_model, self.n_heads, self.dim_feedforward,
                self.dropout, self.batch_norm, name=f"layer_{layer_idx}")(
                    out, pe, node_mask, degree=degree,
                    deterministic=deterministic, pair_mask=pair,
                    need_heads=filtered)
            if not filtered:
                continue
            coeff = coeff_head(attn, node_mask, memb)  # [B, H, G, C]
            coeffs.append(coeff)
            w_graph = coeff.reshape(b, h, g_max, k_ord, dh, dh)
            gid = jnp.clip(graph_id, 0, g_max - 1)
            # per-node weights: gather each node's graph's filter
            w_node = jnp.take_along_axis(
                w_graph, gid[:, None, :, None, None, None], axis=2)
            heads = out_each_head.transpose(0, 2, 1, 3)
            filt = cheb_filter_dynamic_per_node(heads, lhat, w_node,
                                                cheb_bias)
            filt = filt.transpose(0, 2, 1, 3).reshape(b, n, d)
            filt = filt * node_mask.astype(filt.dtype)[..., None]
            if self.use_skip_conn:
                allout = filt if allout is None else allout + filt
            else:
                # reference: filtered output replaces AND feeds forward
                # (models.py:214-216)
                allout = filt
                out = allout

        if self.use_skip_conn and allout is not None:
            out = nn.Dense(self.d_model, name="linear_cat")(
                jnp.concatenate([out, allout], -1))
        elif allout is not None:
            out = allout
        coeffs = (jnp.concatenate(coeffs, axis=1) if coeffs
                  else jnp.zeros((b, 0, g_max, n_coeff)))
        return out, memb, coeffs


class PackedDiffGraphTransformerGenGCN(nn.Module):
    """Packed twin of DiffGraphTransformerGenGCN: per-graph logits
    [B, G, nb_class] plus graph_mask-aware regularizer."""

    in_size: int
    nb_class: int
    d_model: int
    nb_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    nb_layers: int = 4
    batch_norm: bool = False
    lap_pos_enc: bool = False
    lap_pos_enc_dim: int = 0
    filter_order: int = 4
    last_layer_filter: bool = True
    use_skip_conn: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        out, memb, coeff = PackedFeTAEncoder(
            d_model=self.d_model, n_heads=self.nb_heads,
            n_layers=self.nb_layers, dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, batch_norm=self.batch_norm,
            filter_order=self.filter_order,
            last_layer_filter=self.last_layer_filter,
            use_skip_conn=self.use_skip_conn, name="encoder")(
                x, batch.pe, batch.adj, batch.node_mask, batch.graph_id,
                batch.graph_mask, degree=batch.degree,
                deterministic=deterministic)
        pooled = per_graph_mean(out, memb)             # [B, G, D]
        logits = ClassifierMLP(self.d_model, self.nb_class,
                               name="classifier")(pooled)
        if regularization > 0 and coeff.shape[1] > 0:
            # [B, Lf*H, G, C] -> flatten graphs into batch for the
            # pairwise-Frobenius regularizer, masking empty slots
            bb, lh, gg, cc = coeff.shape
            flat = coeff.transpose(0, 2, 1, 3).reshape(bb * gg, lh, cc)
            gmask = batch.graph_mask.reshape(-1)
            # sqrt at exactly 0 has an inf VJP: empty slots have coeff==0,
            # so guard the norm (their contribution is masked out anyway)
            sq = (flat ** 2).sum(axis=(1, 2))
            norms = jnp.sqrt(jnp.where(gmask, sq, 1.0))
            reg = jnp.sum(norms * gmask) / jnp.maximum(gmask.sum(), 1.0)
        else:
            reg = jnp.asarray(0.0)
        return logits, reg
