"""LSPE tier: GraphiT-LSPE with FeTA spectral filtering, dense-batched.

Rebuild of /root/reference/LSPE/layers/graphit_spectra_lspe_layer.py and
LSPE/nets/ZINC_graph_regression/graphit_spectra_net.py: a decoupled
positional channel `p` (RWPE-initialized) threads through every layer next
to `h`; the h-attention consumes concat(h, p).

Reference semantics kept exactly:
  - attention scores: sum_d(K_src*Q_dst*E_edge)/sqrt(dh), plain exp clamp
    (applied to ALL edges — the LSPE variant has no gamma weighting,
    graphit_spectra_lspe_layer.py:377); optional adaptive edge PE multiplies
    score_soft by the k-step random-walk kernel k_RW = (I - gamma*L)^p
    (:268-274, built in LSPE/data/molecules.py:247-262 — densely that is
    exactly the p-step PE kernel carried in GraphBatch.pe);
  - h branch: FeTA filtering identical to the LPE spectra layer;
  - p branch: attention over p only, O_p, tanh, residual. NOTE (reference
    fidelity): the reference computes a p-channel spectral filter but then
    overwrites it (`p = p_attn_out.view(...)` appears twice,
    graphit_spectra_lspe_layer.py:578-583), so the p filter never affects
    the output; we skip that dead compute and document it here;
  - net: Embedding h/e, Linear p (rand_walk), layers, p_out, Whp fusion of
    concat(h, p), readout, MLP; `use_lapeig_loss` raises NotImplementedError
    exactly as the reference net does (graphit_spectra_net.py:140-143).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.nn.san import (
    MLPReadout,
    SANCoeffHead,
    san_structure_laplacian,
)
from feta_tmlr_tpu.ops.cheb import cheb_filter_scalar_coeff
from feta_tmlr_tpu.ops.masking import (
    in_edge_mask,
    masked_mean,
    pair_mask_no_diag,
)


class LSPEAttention(nn.Module):
    """MultiHeadAttentionLayer of the LSPE tier (:280-446)."""

    out_dim: int                  # per-head
    num_heads: int
    full_graph: bool = True
    use_bias: bool = False
    edge_features: bool = True
    adaptive_edge_pe: bool = False
    compute_dtype: object = None   # see nn/san.SANAttention

    @nn.compact
    def __call__(self, x, e_emb, adj, node_mask, k_rw=None,
                 e_table=None, edge_ids=None):
        from feta_tmlr_tpu.config import default_compute_dtype
        from feta_tmlr_tpu.nn.san import typed_edge_scores
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = x.shape
        hh, dh = self.num_heads, self.out_dim
        dense = lambda name: nn.Dense(hh * dh, use_bias=self.use_bias,
                                      dtype=cdt, name=name)
        split = lambda t: t.reshape(b, n, hh, dh).transpose(0, 2, 1, 3)
        xc = x.astype(cdt)
        q, k, v = (split(dense(nm)(xc)) for nm in ("Q", "K", "V"))

        # full graph = complete graph without self loops; edge j -> i
        pm = pair_mask_no_diag(node_mask)
        real = in_edge_mask(adj, node_mask)
        typed = (self.edge_features and e_table is not None
                 and edge_ids is not None)
        use_field = (self.edge_features and e_emb is not None
                     and not typed)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        et = jnp.swapaxes(edge_ids, 1, 2) if typed else None

        def scores_of(qm, km, em):
            if em is None:
                return jnp.einsum(
                    "bhid,bhjd->bhij", qm, km,
                    preferred_element_type=jnp.float32) * scale
            prod = jnp.einsum("bhid,bhjd->bhijd", qm, km)
            prod = prod * em.reshape(
                b, n, n, hh, dh).transpose(0, 3, 1, 2, 4)
            return prod.sum(-1).astype(jnp.float32) * scale

        if typed:
            tbl_r = dense("E")(e_table.astype(cdt)).reshape(-1, hh, dh)
            s = typed_edge_scores(q, k, tbl_r, et, scale, carry_dtype=cdt)
        else:
            e_r = dense("E")(e_emb.astype(cdt)) if use_field else None
            s = scores_of(q, k, jnp.swapaxes(e_r, 1, 2)
                          if e_r is not None else None)
        if self.full_graph:
            q2, k2 = split(dense("Q_2")(xc)), split(dense("K_2")(xc))
            if typed:
                tbl_f = dense("E_2")(e_table.astype(cdt)).reshape(
                    -1, hh, dh)
                s2 = typed_edge_scores(q2, k2, tbl_f, et, scale,
                                       carry_dtype=cdt)
            else:
                e_f = dense("E_2")(e_emb.astype(cdt)) if use_field else None
                s2 = scores_of(q2, k2, jnp.swapaxes(e_f, 1, 2)
                               if e_f is not None else None)
            score = jnp.where(real[:, None], s, s2)
            attn = jnp.where(pm[:, None],
                             jnp.exp(jnp.clip(score, -5.0, 5.0)), 0.0)
        else:
            attn = jnp.where(real[:, None],
                             jnp.exp(jnp.clip(s, -5.0, 5.0)), 0.0)

        if self.adaptive_edge_pe and self.full_graph and k_rw is not None:
            attn = attn * k_rw[:, None]            # (:268-274, :377-380)

        attn = attn.astype(cdt)
        wv = jnp.einsum("bhij,bhjd->bhid", attn, v,
                        preferred_element_type=jnp.float32)
        z = attn.sum(-1, keepdims=True, dtype=jnp.float32)
        out = (wv / (z + 1e-6)).transpose(0, 2, 1, 3).reshape(
            b, n, hh * dh).astype(x.dtype)
        struct = pm.astype(x.dtype) if self.full_graph \
            else real.astype(x.dtype)
        return out * node_mask.astype(x.dtype)[..., None], attn, struct


class GraphiTSpectraLSPELayer(nn.Module):
    """GraphiT_Spectra_LSPE_Layer (:449-608), dense."""

    out_dim: int
    num_heads: int
    full_graph: bool = True
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    adaptive_edge_pe: bool = False
    use_bias: bool = False
    filter_order: int = 4
    edge_features: bool = True
    spectra: bool = True           # False -> plain GraphiT_GT_LSPE layer
    compute_dtype: object = None

    @nn.compact
    def __call__(self, h, p, e_emb, adj, node_mask, k_rw=None,
                 deterministic=True, e_table=None, edge_ids=None):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        dh = self.out_dim // self.num_heads
        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        h_in1, p_in1 = h, p

        # ---- h channel: attention over concat(h, p) + FeTA filter -------
        h_attn, attn, struct = LSPEAttention(
            dh, self.num_heads, self.full_graph, self.use_bias,
            self.edge_features, self.adaptive_edge_pe,
            compute_dtype=self.compute_dtype, name="attention_h")(
                jnp.concatenate([h, p], -1), e_emb, adj, node_mask, k_rw,
                e_table=e_table, edge_ids=edge_ids)
        if self.spectra:
            coeff = SANCoeffHead(self.filter_order, name="coeff_head")(
                attn, node_mask)
            lhat = san_structure_laplacian(struct, node_mask)
            heads = h_attn.reshape(
                b, n, self.num_heads, dh).transpose(0, 2, 1, 3)
            w = self.param("cheb_weight", nn.initializers.glorot_uniform(),
                           (self.filter_order, dh, dh))
            cb = self.param("cheb_bias", nn.initializers.zeros, (dh,))
            filt = cheb_filter_scalar_coeff(
                heads.astype(cdt), lhat.astype(cdt), coeff.astype(cdt),
                w.astype(cdt), cb.astype(cdt))
            filt = nn.Dense(dh, dtype=cdt,
                            name="filt_linear")(jnp.tanh(filt))
            filt = filt.transpose(0, 2, 1, 3).reshape(
                b, n, self.out_dim).astype(h_attn.dtype)
            h = h_attn + filt
        else:
            h = h_attn
        h = drop(h)
        h = nn.Dense(self.out_dim, name="O_h")(h)
        if self.residual and h_in1.shape[-1] == self.out_dim:
            h = h_in1 + h
        h = self._norm(h, node_mask, "norm1", deterministic)
        h_in2 = h
        ff = nn.Dense(2 * self.out_dim, name="ffn1")(h)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.out_dim, name="ffn2")(ff)
        h = (h_in2 + ff) if self.residual else ff
        h = self._norm(h, node_mask, "norm2", deterministic)

        # ---- p channel (reference's p-filter is dead code; see module
        # docstring) ------------------------------------------------------
        p_attn, _, _ = LSPEAttention(
            dh, self.num_heads, self.full_graph, self.use_bias,
            self.edge_features, self.adaptive_edge_pe,
            compute_dtype=self.compute_dtype, name="attention_p")(
                p, e_emb, adj, node_mask, k_rw,
                e_table=e_table, edge_ids=edge_ids)
        p = drop(p_attn)
        p = jnp.tanh(nn.Dense(self.out_dim, name="O_p")(p))
        if self.residual and p_in1.shape[-1] == self.out_dim:
            p = p_in1 + p

        mask_f = node_mask.astype(h.dtype)[..., None]
        return h * mask_f, p * mask_f

    def _norm(self, x, node_mask, name, deterministic):
        if self.layer_norm:
            return nn.LayerNorm(epsilon=1e-5, name=f"ln_{name}")(x)
        if self.batch_norm:
            return MaskedBatchNorm(name=f"bn_{name}")(
                x, node_mask, use_running_average=deterministic)
        return x


class GraphiTSpectraNet(nn.Module):
    """GraphiTSpectraNet (LSPE/nets/ZINC_graph_regression/graphit_spectra_net.py)."""

    num_atom_type: int
    num_bond_type: int
    hidden_dim: int = 64
    out_dim: int = 64
    n_heads: int = 8
    n_layers: int = 6
    pos_enc_dim: int = 20
    pe_init: str = "rand_walk"     # rand_walk (LSPE) | lap_pe | no_pe
    gamma: float = 1e-5            # kept for config parity (unused in attn)
    full_graph: bool = True
    adaptive_edge_pe: bool = False
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    filter_order: int = 4
    use_lapeig_loss: bool = False
    readout: str = "mean"
    n_out: int = 1
    spectra: bool = True           # False -> plain GraphiT-LSPE net
    node_level: bool = False       # per-node logits (LSPE SBM tier)
    typed_edges: Optional[bool] = None   # see nn/san.SANNet
    compute_dtype: object = None

    categorical_input: bool = True
    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        if self.use_lapeig_loss:
            raise NotImplementedError(
                "use_lapeig_loss raises in the reference spectra net too "
                "(graphit_spectra_net.py:140-143)")
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, self.hidden_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            # TU tier: float feature vectors through a linear embedding
            # (reference nets/TU_graph_classification/*_net.py use
            # nn.Linear(in_dim, hidden) instead of nn.Embedding)
            h = nn.Dense(self.hidden_dim, name="embedding_h")(batch.x)
        typed = self.typed_edges
        if typed is None:
            typed = self.num_bond_type <= 16
        e_emb = e_table = e_ids = None
        if batch.edge_type is not None:
            embed_e = nn.Embed(self.num_bond_type, self.hidden_dim,
                               name="embedding_e")
            if typed:
                e_table = embed_e(jnp.arange(self.num_bond_type))
                e_ids = batch.edge_type.astype(jnp.int32)
            else:
                e_emb = embed_e(batch.edge_type.astype(jnp.int32))
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)

        if self.pe_init == "rand_walk":
            p = nn.Dense(self.hidden_dim, name="embedding_p")(batch.lap_pe)
        else:
            p = jnp.zeros_like(h)
        k_rw = batch.pe                       # dense (I - gamma L)^p kernel

        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            h, p = GraphiTSpectraLSPELayer(
                out_dim=(self.out_dim if is_last else self.hidden_dim),
                num_heads=self.n_heads, full_graph=self.full_graph,
                dropout=self.dropout, layer_norm=self.layer_norm,
                batch_norm=self.batch_norm, residual=self.residual,
                adaptive_edge_pe=self.adaptive_edge_pe,
                filter_order=self.filter_order,
                edge_features=(e_emb is not None or e_table is not None),
                spectra=self.spectra, compute_dtype=self.compute_dtype,
                name=f"layer_{i}")(h, p, e_emb, batch.adj, batch.node_mask,
                                   k_rw, deterministic, e_table=e_table,
                                   edge_ids=e_ids)

        if self.pe_init == "rand_walk":
            p = nn.Dense(self.pos_enc_dim, name="p_out")(p)
            h = nn.Dense(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], -1))

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
