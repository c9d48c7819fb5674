"""Model zoo: graph transformers with and without FeTA spectral filtering.

TPU-native rebuilds of the reference zoo in /root/reference/transformer/models.py:
  GraphTransformer             (models.py:45-85)   vanilla encoder, abs PE
  DiffGraphTransformer         (models.py:387-431) GraphiT kernel-PE attention
  DiffGraphTransformerGenGCN   (models.py:487-584) FeTA: + dynamic Cheb filter
  DiffGraphTransformerGenGCNSBM(models.py:1008-1110) node-level classifier

All models take a `GraphBatch` and return logits (plus the coefficient
regularizer for the FeTA models). Parameters live in flax; everything is
jit/pjit-friendly (static shapes, no python branching on data).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.feta import FeTAEncoder
from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer
from feta_tmlr_tpu.ops.masking import masked_mean


class ClassifierMLP(nn.Module):
    """2-layer MLP head (models.py:411-415,512-516)."""

    d_model: int
    nb_class: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_model, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.nb_class, name="fc2")(x)


def _classifier(d_model: int, nb_class: int, name: str = "classifier"):
    return ClassifierMLP(d_model, nb_class, name=name)


def coefficient_regularizer(coeff, reg_type: str = "pairwise"):
    """Filter-coefficient regularizer (models.py:554-584).

    'pairwise': the reference computes a cosine-Gram matrix then overwrites it
    with `torch.norm(coeff, p=2, dim=[1,2]).mean()` (models.py:578) — the
    effective regularizer is the mean Frobenius norm; we replicate the
    effective behavior. 'max': sum over graphs of the max off-diagonal cosine
    similarity between per-head coefficient vectors (models.py:555-569).
    """
    if coeff.shape[1] == 0:
        return jnp.asarray(0.0, coeff.dtype)
    if reg_type == "pairwise":
        return jnp.sqrt((coeff ** 2).sum(axis=(1, 2))).mean()
    if reg_type == "max":
        gm = jnp.einsum("bic,bjc->bij", coeff, coeff)
        eye = jnp.eye(coeff.shape[1], dtype=coeff.dtype)
        norms = jnp.sqrt((coeff ** 2).sum(-1))
        denom = norms[:, :, None] * norms[:, None, :]
        cos = gm * (1.0 - eye) / jnp.where(denom > 0, denom, 1.0)
        return cos.max(axis=(1, 2)).sum()
    raise ValueError(f"unknown reg_type {reg_type}")


class GraphTransformer(nn.Module):
    """Vanilla transformer over padded node sets (models.py:45-85).

    Absolute (Laplacian) PE added to embeddings; no attention-kernel PE.
    """

    in_size: int
    nb_class: int
    d_model: int
    nb_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    nb_layers: int = 4
    lap_pos_enc: bool = False
    lap_pos_enc_dim: int = 0

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        for i in range(self.nb_layers):
            x, _, _ = GraphiTEncoderLayer(
                self.d_model, self.nb_heads, self.dim_feedforward,
                self.dropout, batch_norm=False, name=f"layer_{i}")(
                    x, None, batch.node_mask, deterministic=deterministic, need_heads=False)
        pooled = masked_mean(x, batch.node_mask, axis=1)
        return _classifier(self.d_model, self.nb_class)(pooled)


class DiffGraphTransformer(nn.Module):
    """GraphiT: PE kernel injected into attention scores (models.py:387-431)."""

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

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        for i in range(self.nb_layers):
            x, _, _ = GraphiTEncoderLayer(
                self.d_model, self.nb_heads, self.dim_feedforward,
                self.dropout, self.batch_norm, name=f"layer_{i}")(
                    x, batch.pe, batch.node_mask, degree=batch.degree,
                    deterministic=deterministic, need_heads=False)
        pooled = masked_mean(x, batch.node_mask, axis=1)
        return _classifier(self.d_model, self.nb_class)(pooled)


def masked_max_pool(x, node_mask):
    """Global max pool over valid nodes (gmp in models.py:479)."""
    neg = jnp.finfo(x.dtype).min
    masked = jnp.where(node_mask[..., None], x, neg)
    return masked.max(axis=1)


class DiffGraphTransformerGCN(nn.Module):
    """GraphiT + last-layer GCN over the original graph (models.py:433-485):
    mean-pooled transformer output plus max-pooled ReLU(GCN) features.
    """

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

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        from feta_tmlr_tpu.nn.gnn import DenseGCNConv
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        for i in range(self.nb_layers):
            x, _, _ = GraphiTEncoderLayer(
                self.d_model, self.nb_heads, self.dim_feedforward,
                self.dropout, self.batch_norm, name=f"layer_{i}")(
                    x, batch.pe, batch.node_mask, degree=batch.degree,
                    deterministic=deterministic, need_heads=False)
        gcn_out = nn.relu(DenseGCNConv(self.d_model, name="gcn")(
            x, batch.adj, batch.node_mask))
        pooled = (masked_mean(x, batch.node_mask, axis=1)
                  + masked_max_pool(gcn_out, batch.node_mask))
        return _classifier(self.d_model, self.nb_class)(pooled)


class DiffGraphTransformerGenGCN(nn.Module):
    """FeTA graph-level model (models.py:487-584): GraphiT attention +
    dynamic spectral filtering of head outputs, masked mean pool, MLP head.
    """

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
    gnn_type: str = "ChebConvDynamic"
    last_layer_filter: bool = True
    learn_only_filter_order_coeff: bool = False
    use_skip_conn: bool = True
    scan_layers: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0,
                 return_filter_coeff: bool = False):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        out, _attn, coeff = FeTAEncoder(
            d_model=self.d_model, n_heads=self.nb_heads,
            n_layers=self.nb_layers, dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, batch_norm=self.batch_norm,
            filter_order=self.filter_order, gnn_type=self.gnn_type,
            last_layer_filter=self.last_layer_filter,
            learn_only_filter_order_coeff=self.learn_only_filter_order_coeff,
            use_skip_conn=self.use_skip_conn,
            scan_layers=self.scan_layers, remat=self.remat,
            name="encoder")(
                x, batch.pe, batch.adj, batch.node_mask,
                degree=batch.degree, deterministic=deterministic)
        pooled = masked_mean(out, batch.node_mask, axis=1)
        logits = _classifier(self.d_model, self.nb_class)(pooled)
        reg = (coefficient_regularizer(coeff)
               if regularization > 0 else jnp.asarray(0.0))
        if return_filter_coeff:
            return logits, reg, coeff
        return logits, reg


class DiffGraphTransformerSBM(nn.Module):
    """Plain GraphiT node-level classifier (models.py:1177-1244): no
    spectral filtering, per-node logits."""

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

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        for i in range(self.nb_layers):
            x, _, _ = GraphiTEncoderLayer(
                self.d_model, self.nb_heads, self.dim_feedforward,
                self.dropout, self.batch_norm, name=f"layer_{i}")(
                    x, batch.pe, batch.node_mask, degree=batch.degree,
                    deterministic=deterministic, need_heads=False)
        return _classifier(self.d_model, self.nb_class)(x)


class DiffGraphTransformerMolHiv(nn.Module):
    """Plain GraphiT with OGB atom encoder and sigmoid binary head
    (models.py:1112-1175)."""

    d_model: int
    nb_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    nb_layers: int = 4
    batch_norm: bool = False
    lap_pos_enc: bool = False
    lap_pos_enc_dim: int = 0

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        from feta_tmlr_tpu.nn.ogb import OGBAtomEncoder
        x = OGBAtomEncoder(self.d_model, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        for i in range(self.nb_layers):
            x, _, _ = GraphiTEncoderLayer(
                self.d_model, self.nb_heads, self.dim_feedforward,
                self.dropout, self.batch_norm, name=f"layer_{i}")(
                    x, batch.pe, batch.node_mask, degree=batch.degree,
                    deterministic=deterministic, need_heads=False)
        pooled = masked_mean(x, batch.node_mask, axis=1)
        h = nn.Dense(self.d_model, name="cls_fc1")(pooled)
        h = nn.leaky_relu(h)
        logits = nn.Dense(1, name="cls_fc2")(h).squeeze(-1)
        # (logits, reg, extra) trainer contract — _model_outputs reads
        # element 1 as the scalar regularizer, so probs go in slot 2
        return logits, 0.0, nn.sigmoid(logits)


class DiffGraphTransformerGenGCNSBM(nn.Module):
    """FeTA node-level classifier for SBM PATTERN/CLUSTER
    (models.py:1008-1110): per-node logits instead of pooled ones.
    """

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
    gnn_type: str = "ChebConvDynamic"
    last_layer_filter: bool = True
    learn_only_filter_order_coeff: bool = False
    use_skip_conn: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0):
        x = nn.Dense(self.d_model, use_bias=False, name="embedding")(batch.x)
        if self.lap_pos_enc and batch.lap_pe is not None:
            x = x + nn.Dense(self.d_model, name="embedding_lap_pos_enc")(
                batch.lap_pe)
        out, _attn, coeff = FeTAEncoder(
            d_model=self.d_model, n_heads=self.nb_heads,
            n_layers=self.nb_layers, dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, batch_norm=self.batch_norm,
            filter_order=self.filter_order, gnn_type=self.gnn_type,
            last_layer_filter=self.last_layer_filter,
            learn_only_filter_order_coeff=self.learn_only_filter_order_coeff,
            use_skip_conn=self.use_skip_conn, name="encoder")(
                x, batch.pe, batch.adj, batch.node_mask,
                degree=batch.degree, deterministic=deterministic)
        # per-node logits over the padded layout; padded nodes are masked by
        # the loss (the reference selects real nodes via ~mask,
        # models.py:1039-1076 — dense-equivalently we keep [B, N, C]).
        logits = _classifier(self.d_model, self.nb_class)(out)
        reg = (coefficient_regularizer(coeff)
               if regularization > 0 else jnp.asarray(0.0))
        return logits, reg
