"""OGB molecular model family (MolHiv / MolPcba / PCQM4M).

Rebuilds of transformer/models.py:598-1006 with the OGB feature encoders
reimplemented locally (the ogb package is not available in this image; the
vocab sizes below are the published `get_atom_feature_dims()` /
`get_bond_feature_dims()` constants of ogb.utils.features).

AtomEncoder/BondEncoder = sum of one embedding per categorical feature
column — exactly ogb.graphproppred.mol_encoder.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.feta import FeTAEncoder
from feta_tmlr_tpu.nn.models import coefficient_regularizer
from feta_tmlr_tpu.ops.masking import masked_mean

# ogb.utils.features.get_atom_feature_dims() / get_bond_feature_dims()
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)


class OGBAtomEncoder(nn.Module):
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        """x: [..., 9] int atom features -> [..., emb_dim]."""
        out = 0.0
        for i, vocab in enumerate(ATOM_FEATURE_DIMS):
            out = out + nn.Embed(vocab, self.emb_dim,
                                 name=f"atom_emb_{i}")(
                x[..., i].astype(jnp.int32))
        return out


class OGBBondEncoder(nn.Module):
    emb_dim: int

    @nn.compact
    def __call__(self, e):
        out = 0.0
        for i, vocab in enumerate(BOND_FEATURE_DIMS):
            out = out + nn.Embed(vocab, self.emb_dim,
                                 name=f"bond_emb_{i}")(
                e[..., i].astype(jnp.int32))
        return out


class _OGBFeTABase(nn.Module):
    """Shared trunk: AtomEncoder -> FeTA encoder -> masked mean pool."""

    nb_class: int
    d_model: int = 128
    nb_heads: int = 8
    dim_feedforward: int = 256
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

    def trunk(self, batch: GraphBatch, deterministic: bool):
        x = OGBAtomEncoder(self.d_model, name="embedding")(batch.x)
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
        return masked_mean(out, batch.node_mask, axis=1), coeff

    def head(self, pooled):
        h = nn.Dense(self.d_model, name="cls_fc1")(pooled)
        h = nn.leaky_relu(h)
        return nn.Dense(self.nb_class, name="cls_fc2")(h)


class DiffGraphTransformerGenGCNMolHiv(_OGBFeTABase):
    """models.py:598-742: binary head, returns (logits, reg, sigmoid)."""

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0):
        pooled, coeff = self.trunk(batch, deterministic)
        logits = self.head(pooled).squeeze(-1)
        reg = (coefficient_regularizer(coeff, "max")
               if regularization > 0 else jnp.asarray(0.0))
        return logits, reg, nn.sigmoid(logits)


class DiffGraphTransformerGenGCNMolPcba(_OGBFeTABase):
    """models.py:745-916: 128-task multi-label head."""

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0):
        pooled, coeff = self.trunk(batch, deterministic)
        logits = self.head(pooled)
        reg = (coefficient_regularizer(coeff, "max")
               if regularization > 0 else jnp.asarray(0.0))
        return logits, reg


class DiffGraphTransformerGenGCNPCQM4M(_OGBFeTABase):
    """models.py:919-1006: scalar regression (HOMO-LUMO gap)."""

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True,
                 regularization: float = 0.0):
        pooled, coeff = self.trunk(batch, deterministic)
        pred = self.head(pooled).squeeze(-1)
        reg = (coefficient_regularizer(coeff, "max")
               if regularization > 0 else jnp.asarray(0.0))
        return pred, reg
