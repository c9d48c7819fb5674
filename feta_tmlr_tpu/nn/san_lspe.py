"""SAN with LSPE, dense-batched.

Rebuild of /root/reference/LSPE/layers/san_gt_lspe_layer.py and the SAN
LSPE net: gamma-weighted full-graph SAN attention over the concatenated
(h, p) channel plus a positional attention channel over p alone — the SAN
counterpart of the GraphiT-LSPE layer, without spectral filtering.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.nn.san import MLPReadout, SANAttention
from feta_tmlr_tpu.ops.masking import masked_mean


class SANGTLSPELayer(nn.Module):
    out_dim: int
    num_heads: int
    gamma: float = 1e-5
    full_graph: bool = True
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    use_bias: bool = False
    edge_features: bool = True

    @nn.compact
    def __call__(self, h, p, e_emb, adj, node_mask, deterministic=True,
                 gamma_value=None):
        dh = self.out_dim // self.num_heads
        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        h_in, p_in = h, p

        h_attn, _, _ = SANAttention(
            dh, self.num_heads, self.gamma, self.full_graph, self.use_bias,
            self.edge_features, name="attention_h")(
                jnp.concatenate([h, p], -1), e_emb, adj, node_mask,
                gamma_value=gamma_value)
        h = drop(h_attn)
        h = nn.Dense(self.out_dim, name="O_h")(h)
        if self.residual and h_in.shape[-1] == self.out_dim:
            h = h_in + h
        h = self._norm(h, node_mask, "norm1", deterministic)
        h_in2 = h
        ff = nn.Dense(2 * self.out_dim, name="ffn1")(h)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.out_dim, name="ffn2")(ff)
        h = (h_in2 + ff) if self.residual else ff
        h = self._norm(h, node_mask, "norm2", deterministic)

        p_attn, _, _ = SANAttention(
            dh, self.num_heads, self.gamma, self.full_graph, self.use_bias,
            self.edge_features, name="attention_p")(
                p, e_emb, adj, node_mask, gamma_value=gamma_value)
        p = drop(p_attn)
        p = jnp.tanh(nn.Dense(self.out_dim, name="O_p")(p))
        if self.residual and p_in.shape[-1] == self.out_dim:
            p = p_in + p

        mask_f = node_mask.astype(h.dtype)[..., None]
        return h * mask_f, p * mask_f

    def _norm(self, x, node_mask, name, deterministic):
        if self.layer_norm:
            return nn.LayerNorm(epsilon=1e-5, name=f"ln_{name}")(x)
        if self.batch_norm:
            return MaskedBatchNorm(name=f"bn_{name}")(
                x, node_mask, use_running_average=deterministic)
        return x


class SANLSPENet(nn.Module):
    """SAN (+LSPE p channel) net for ZINC-style regression."""

    num_atom_type: int
    num_bond_type: int
    hidden_dim: int = 64
    out_dim: int = 64
    n_heads: int = 8
    n_layers: int = 6
    pos_enc_dim: int = 20
    pe_init: str = "rand_walk"
    gamma: float = 1e-5            # init value; LEARNED net-wide parameter
    full_graph: bool = True
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    readout: str = "mean"
    n_out: int = 1

    categorical_input: bool = True
    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, self.hidden_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            # TU tier: float feature vectors through a linear embedding
            h = nn.Dense(self.hidden_dim, name="embedding_h")(batch.x)
        e_emb = nn.Embed(self.num_bond_type, self.hidden_dim,
                         name="embedding_e")(
            batch.edge_type.astype(jnp.int32)) \
            if batch.edge_type is not None else None
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)
        if self.pe_init == "rand_walk":
            p = nn.Dense(self.hidden_dim, name="embedding_p")(batch.lap_pe)
        else:
            p = jnp.zeros_like(h)

        # reference SAN-LSPE learns gamma as one shared parameter, clamped
        # to [0, 1] at use (san_net.py / san_gt_lspe_layer.py)
        gamma_param = self.param(
            "gamma", lambda rng: jnp.asarray(self.gamma, jnp.float32))
        gamma_value = jnp.clip(gamma_param, 0.0, 1.0)

        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            h, p = SANGTLSPELayer(
                out_dim=(self.out_dim if is_last else self.hidden_dim),
                num_heads=self.n_heads, gamma=self.gamma,
                full_graph=self.full_graph, dropout=self.dropout,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                residual=self.residual, edge_features=e_emb is not None,
                name=f"layer_{i}")(h, p, e_emb, batch.adj, batch.node_mask,
                                   deterministic, gamma_value=gamma_value)

        if self.pe_init == "rand_walk":
            p = nn.Dense(self.pos_enc_dim, name="p_out")(p)
            h = nn.Dense(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], -1))
        if self.readout == "sum":
            hg = (h * batch.node_mask[..., None]).sum(1)
        elif self.readout == "max":
            hg = jnp.where(batch.node_mask[..., None], h,
                           jnp.finfo(h.dtype).min).max(1)
        else:
            hg = masked_mean(h, batch.node_mask, axis=1)
        return MLPReadout(self.n_out, name="mlp_readout")(hg)
