"""GAT + FeTA tier, dense-batched.

Rebuild of /root/reference/LPE/layers/gat_feta_layer.py (GATFeTALayer over
DGL's GATConv with `get_attention=True`) and
LPE/nets/ZINC_graph_regression/gat_feta_net.py.

DenseGATConv follows DGL GATConv semantics: per-head scores
e_ij = LeakyReLU(a_src . Wh_j + a_dst . Wh_i) softmaxed over each
destination's incoming real edges, with attention/feature dropout; the FeTA
block (coefficient GCN over the detached attention + static-weight
scalar-coefficient Chebyshev over the real-graph structure Laplacian with
degree clip(1)) is identical to the LPE spectra layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.nn.san import MLPReadout, SANCoeffHead, \
    san_structure_laplacian
from feta_tmlr_tpu.ops.cheb import cheb_filter_scalar_coeff
from feta_tmlr_tpu.ops.masking import in_edge_mask, masked_mean, pair_mask


class DenseGATConv(nn.Module):
    """DGL-style GATConv over a dense adjacency; returns attention."""

    out_dim: int                  # per-head
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    # None -> FETA_COMPUTE_DTYPE env. Under bf16 the fc projection, the
    # score broadcast field and the attn@V contraction run half-width
    # (f32 accumulation); softmax stays f32 (round-5 tier playbook).
    compute_dtype: object = None

    @nn.compact
    def __call__(self, h, adj, node_mask, deterministic=True):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        hh, dh = self.num_heads, self.out_dim
        h = nn.Dropout(self.feat_drop)(h, deterministic=deterministic)
        feat = nn.Dense(hh * dh, use_bias=False, dtype=cdt,
                        name="fc")(h.astype(cdt))
        feat = feat.reshape(b, n, hh, dh)
        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(),
                            (hh, dh))
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(),
                            (hh, dh))
        el = jnp.einsum("bnhd,hd->bnh", feat, attn_l.astype(cdt),
                        preferred_element_type=jnp.float32)  # src term
        er = jnp.einsum("bnhd,hd->bnh", feat, attn_r.astype(cdt),
                        preferred_element_type=jnp.float32)  # dst term
        # scores[b,h,i(dst),j(src)] = leaky(el[j] + er[i])
        scores = nn.leaky_relu(
            el[:, None, :, :].transpose(0, 3, 1, 2)
            + er[:, :, None, :].transpose(0, 3, 1, 2),
            negative_slope=self.negative_slope)
        real = in_edge_mask(adj, node_mask)   # [dst, src] edge j->i
        scores = jnp.where(real[:, None], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = attn * real[:, None]
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bjhd->bihd", attn.astype(cdt), feat,
                         preferred_element_type=jnp.float32)  # [B,N,H,dh]
        return out.astype(jnp.float32), attn


class GATFeTALayer(nn.Module):
    """gat_feta_layer.py:247-330, dense."""

    out_dim: int                  # per-head
    num_heads: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = False
    filter_order: int = 4
    use_activation: bool = True   # F.elu
    compute_dtype: object = None  # see DenseGATConv

    @nn.compact
    def __call__(self, h, adj, node_mask, deterministic=True):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        dh = self.out_dim
        h_in = h
        residual = self.residual and h.shape[-1] == dh * self.num_heads

        heads_out, attn = DenseGATConv(
            dh, self.num_heads, self.dropout, self.dropout,
            compute_dtype=self.compute_dtype, name="gatconv")(
                h, adj, node_mask, deterministic)

        coeff = SANCoeffHead(self.filter_order, name="coeff_head")(
            attn, node_mask)
        struct = in_edge_mask(adj, node_mask).astype(h.dtype)
        lhat = san_structure_laplacian(struct, node_mask)
        heads = heads_out.transpose(0, 2, 1, 3)          # [B,H,N,dh]
        w = self.param("cheb_weight", nn.initializers.glorot_uniform(),
                       (self.filter_order, dh, dh))
        cb = self.param("cheb_bias", nn.initializers.zeros, (dh,))
        filt = cheb_filter_scalar_coeff(
            heads.astype(cdt), lhat.astype(cdt), coeff.astype(cdt),
            w.astype(cdt), cb.astype(cdt)).astype(jnp.float32)
        filt = nn.Dense(dh, name="filt_linear")(jnp.tanh(filt))
        filt = filt.transpose(0, 2, 1, 3).reshape(b, n, -1)

        h = heads_out.reshape(b, n, -1) + filt
        if self.batch_norm:
            h = MaskedBatchNorm(name="batchnorm_h")(
                h, node_mask, use_running_average=deterministic)
        if self.use_activation:
            h = nn.elu(h)
        if residual:
            h = h_in + h
        return h * node_mask.astype(h.dtype)[..., None]


class GATFeTANet(nn.Module):
    """gat_feta_net.py: embeddings + GATFeTA stack + MLP readout."""

    num_atom_type: int
    hidden_dim: int = 18
    out_dim: int = 18
    num_heads: int = 8
    n_layers: int = 4
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    filter_order: int = 4
    readout: str = "mean"
    n_out: int = 1
    compute_dtype: object = None  # see DenseGATConv

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        h = nn.Embed(self.num_atom_type, self.hidden_dim * self.num_heads,
                     name="embedding_h")(batch.x.astype(jnp.int32))
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)
        for i in range(self.n_layers - 1):
            h = GATFeTALayer(self.hidden_dim, self.num_heads, self.dropout,
                             self.batch_norm, self.residual,
                             self.filter_order,
                             compute_dtype=self.compute_dtype,
                             name=f"layer_{i}")(
                h, batch.adj, batch.node_mask, deterministic)
        h = GATFeTALayer(self.out_dim, 1, self.dropout, self.batch_norm,
                         self.residual, self.filter_order,
                         compute_dtype=self.compute_dtype,
                         name=f"layer_{self.n_layers - 1}")(
            h, batch.adj, batch.node_mask, deterministic)
        if self.readout == "sum":
            hg = (h * batch.node_mask[..., None]).sum(1)
        elif self.readout == "max":
            hg = jnp.where(batch.node_mask[..., None], h,
                           jnp.finfo(h.dtype).min).max(1)
        else:
            hg = masked_mean(h, batch.node_mask, axis=1)
        return MLPReadout(self.n_out, name="mlp_readout")(hg)


class GATLayer(nn.Module):
    """Plain GAT layer (LPE layers/gat_layer.py:15-60 'GATLayer'):
    multi-head DenseGATConv, concat heads, BN, ELU, residual — no
    spectral filter (that variant is GATFeTALayer above)."""

    out_dim: int                  # per-head
    num_heads: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = False

    @nn.compact
    def __call__(self, h, adj, node_mask, deterministic=True):
        b, n, _ = h.shape
        h_in = h
        residual = self.residual and \
            h.shape[-1] == self.out_dim * self.num_heads
        heads_out, _ = DenseGATConv(
            self.out_dim, self.num_heads, self.dropout, self.dropout,
            name="gatconv")(h, adj, node_mask, deterministic)
        h = heads_out.reshape(b, n, -1)
        if self.batch_norm:
            h = MaskedBatchNorm(name="batchnorm_h")(
                h, node_mask, use_running_average=deterministic)
        h = nn.elu(h)
        if residual:
            h = h_in + h
        return h * node_mask.astype(h.dtype)[..., None]


class GATNet(nn.Module):
    """Plain GAT baseline of the LPE tier
    (LPE/nets/ZINC_graph_regression/gat_net.py:15-58, config LPE='gat'):
    atom embedding to hidden*heads, (L-1) multi-head GAT layers, a final
    single-head layer to out_dim, MLP readout."""

    num_atom_type: int
    hidden_dim: int = 18
    out_dim: int = 18
    num_heads: int = 8
    n_layers: int = 4
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    readout: str = "mean"
    n_out: int = 1
    node_level: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        h = nn.Embed(self.num_atom_type, self.hidden_dim * self.num_heads,
                     name="embedding_h")(batch.x.astype(jnp.int32))
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)
        for i in range(self.n_layers - 1):
            h = GATLayer(self.hidden_dim, self.num_heads, self.dropout,
                         self.batch_norm, self.residual,
                         name=f"layer_{i}")(
                h, batch.adj, batch.node_mask, deterministic)
        h = GATLayer(self.out_dim, 1, self.dropout, self.batch_norm,
                     self.residual, name=f"layer_{self.n_layers - 1}")(
            h, batch.adj, batch.node_mask, deterministic)
        if self.node_level:
            return MLPReadout(self.n_out, name="mlp_readout")(h)
        if self.readout == "sum":
            hg = (h * batch.node_mask[..., None]).sum(1)
        elif self.readout == "max":
            hg = jnp.where(batch.node_mask[..., None], h,
                           jnp.finfo(h.dtype).min).max(1)
        else:
            hg = masked_mean(h, batch.node_mask, axis=1)
        return MLPReadout(self.n_out, name="mlp_readout")(hg)
