"""GatedGCN with LSPE, dense-batched.

Rebuild of /root/reference/LSPE/layers/gatedgcn_lspe_layer.py and
LSPE/nets/ZINC_graph_regression/gatedgcn_net.py. Edge features live as a
dense [B, N, N, D] field masked to real edges; all DGL message passing
collapses into masked einsums:

  hat_eta_ij = B1 h_j + B2 h_i + B3 e_ij           (u_add_v + edge term)
  eta_ij     = sigma(hat_eta)_ij / (sum_j' sigma(hat_eta)_ij' + 1e-6)
  h_i'       = A1 [h_i, p_i] + sum_j eta_ij * A2 [h_j, p_j]
  p_i'       = C1 p_i + sum_j eta_ij * C2 p_j
  e_ij'      = hat_eta_ij
then graph-size norm h *= 1/sqrt(n), BN(h)/BN(e), relu/relu/tanh,
residuals, dropout (gatedgcn_lspe_layer.py:55-131).

The LapEig positional loss (gatedgcn_net.py:137-162) is provided as
`lapeig_loss`: (trace(p^T L p) + lambda * sum_g ||p_g^T p_g - I||_F^2)
/ (k * B * n).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.nn.san import MLPReadout
from feta_tmlr_tpu.ops.masking import in_edge_mask, masked_mean, pair_mask


class GatedGCNLSPELayer(nn.Module):
    output_dim: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    # None -> FETA_COMPUTE_DTYPE env (default f32). Under bf16 the
    # [B, N, N, D] edge fields — this layer's HBM traffic — are computed
    # and carried in bf16; params, BatchNorm statistics, the gate
    # denominator and the eta@x accumulations stay f32.
    compute_dtype: object = None

    @nn.compact
    def __call__(self, h, p, e, adj, node_mask, snorm_n, deterministic=True,
                 edges=None):
        """Dense mode (edges=None): e is the [B, N, N, D] edge field.

        Sparse mode: `edges` is an ops/sparse_agg.SparseEdges (built once
        per step by the net) and e is the [B, E, D] per-edge field — same
        parameters, same math restricted to the real edges the dense path
        masks to (~15x less HBM traffic at molecular densities). Gathers
        and segment sums all ride one-hot MXU matmuls (see sparse_agg's
        module docstring for the on-chip gather pitfall)."""
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        sparse = edges is not None
        residual = self.residual and h.shape[-1] == self.output_dim
        h_in, p_in, e_in = h, p, e
        h, p, e = h.astype(cdt), p.astype(cdt), e.astype(cdt)

        dense = lambda name: nn.Dense(self.output_dim, dtype=cdt, name=name)
        a1 = dense("A1")(jnp.concatenate([h, p], -1))
        a2 = dense("A2")(jnp.concatenate([h, p], -1))
        b1 = dense("B1")(h)
        b2 = dense("B2")(h)
        b3 = dense("B3")(e)
        c1 = dense("C1")(p)
        c2 = dense("C2")(p)

        if sparse:
            emask = edges.edge_mask
            emf = emask.astype(cdt)[..., None]
            # hat_eta_k = B1 h_src + B2 h_dst + B3 e_k  (edge k: src->dst)
            hat_eta = (edges.gather_src(b1) + edges.gather_dst(b2) + b3)
            sigma = nn.sigmoid(hat_eta) * emf
            denom = edges.segment_sum(sigma) + 1e-6          # [B,N,D] f32
            # pad edges gather a ZERO row (masked one-hot): guard the
            # division so 0-sigma / 0-denominator stays 0, not NaN
            ed = edges.gather_dst(denom).astype(cdt)
            eta = sigma / jnp.where(ed > 0, ed, 1.0)
            msg = jnp.concatenate(
                [eta * edges.gather_src(a2), eta * edges.gather_src(c2)],
                axis=-1)
            agg2 = edges.segment_sum(msg).astype(cdt)        # [B,N,2D]
            h_new = a1 + agg2[..., :self.output_dim]
            p_new = c1 + agg2[..., self.output_dim:]
            e_new = hat_eta                                  # [B,E,D]
        else:
            real = in_edge_mask(adj, node_mask).astype(cdt)
            # hat_eta[b, i(dst), j(src)] = B1 h_j + B2 h_i + B3 e_ij
            hat_eta = (b1[:, None, :, :] + b2[:, :, None, :]
                       + jnp.swapaxes(b3, 1, 2))
            sigma = nn.sigmoid(hat_eta) * real[..., None]
            # f32 accumulation of the gate denominator (N bf16 terms)
            denom = sigma.sum(axis=2, keepdims=True,
                              dtype=jnp.float32) + 1e-6
            eta = (sigma / denom.astype(cdt)).astype(cdt)
            agg = lambda x2: jnp.einsum(
                "bijd,bjd->bid", eta, x2,
                preferred_element_type=jnp.float32).astype(cdt)
            h_new = a1 + agg(a2)
            p_new = c1 + agg(c2)
            e_new = jnp.swapaxes(hat_eta, 1, 2)    # back to [b, src, dst, d]

        # norms and residuals in f32 (BatchNorm statistics especially);
        # outputs re-cast to cdt so the carried edge field stays
        # half-width between layers
        f32 = jnp.float32
        h_new = h_new.astype(f32) * snorm_n.astype(f32)[..., None]
        e_new = e_new.astype(f32)
        p_new = p_new.astype(f32)
        if self.batch_norm:
            h_new = MaskedBatchNorm(name="bn_node_h")(
                h_new, node_mask, use_running_average=deterministic)
            # edge BN over real edges: flatten pair mask as 'nodes'
            if sparse:
                e_new = MaskedBatchNorm(name="bn_node_e")(
                    e_new, emask, use_running_average=deterministic)
            else:
                e_flat = e_new.reshape(b, n * n, -1)
                e_mask = (real > 0).reshape(b, n * n)
                e_flat = MaskedBatchNorm(name="bn_node_e")(
                    e_flat, e_mask, use_running_average=deterministic)
                e_new = e_flat.reshape(b, n, n, -1)
        h_new = nn.relu(h_new)
        e_new = nn.relu(e_new)
        p_new = jnp.tanh(p_new)
        if residual:
            h_new = h_in.astype(f32) + h_new
            p_new = p_in.astype(f32) + p_new
            e_new = e_in.astype(f32) + e_new
        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        mask_f = node_mask.astype(cdt)[..., None]
        e_out_mask = emf if sparse else real[..., None]
        return (drop(h_new).astype(cdt) * mask_f,
                drop(p_new).astype(cdt) * mask_f,
                drop(e_new).astype(cdt) * e_out_mask)


def lapeig_loss(p, adj, node_mask, pos_enc_dim: int, lambda_loss: float):
    """Laplacian-eigenvector loss over the batch (gatedgcn_net.py:137-162)."""
    pm = pair_mask(node_mask).astype(p.dtype)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=p.dtype)
    a = adj * pm * (1.0 - eye)
    deg = jnp.maximum(a.sum(-1), 1.0)
    dis = deg ** -0.5
    lap = (node_mask.astype(p.dtype)[..., None] * eye
           - dis[..., :, None] * a * dis[..., None, :]) * pm
    pmask = p * node_mask[..., None]
    trace = jnp.einsum("bnk,bnm,bmk->", pmask, lap, pmask)
    # the reference computes the orthogonality term from DETACHED tensors
    # via scipy (gatedgcn_net.py:152-156) — it contributes no gradient
    p_det = jax.lax.stop_gradient(pmask)
    ptp = jnp.einsum("bnk,bnl->bkl", p_det, p_det)
    frob = jnp.sum((ptp - jnp.eye(pos_enc_dim)) ** 2)
    n_total = jnp.maximum(node_mask.sum(), 1)
    bsz = p.shape[0]
    return (trace + lambda_loss * frob) / (pos_enc_dim * bsz * n_total)


class GatedGCNLSPENet(nn.Module):
    """GatedGCN (+LSPE p channel) net for ZINC-style regression."""

    num_atom_type: int
    num_bond_type: int
    hidden_dim: int = 64
    out_dim: int = 64
    n_layers: int = 16
    pos_enc_dim: int = 20
    pe_init: str = "rand_walk"     # rand_walk | lap_pe | no_pe
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    use_lapeig_loss: bool = False
    lambda_loss: float = 1.0
    alpha_loss: float = 1e-4
    readout: str = "mean"
    n_out: int = 1
    # None = auto: run the layers over the batch's padded COO edge list
    # when it is present (collate_graphs(with_coo=True)) instead of the
    # dense [B, N, N, D] mailbox — same parameters and math (see layer
    # docstring), ~15x less HBM traffic at molecular edge densities
    sparse_edges: Optional[bool] = None
    compute_dtype: object = None

    categorical_input: bool = True
    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        from feta_tmlr_tpu.config import default_compute_dtype
        from feta_tmlr_tpu.ops.sparse_agg import (
            edge_ids_from_dense,
            make_sparse_edges,
        )
        cdt = self.compute_dtype or default_compute_dtype()
        sparse = self.sparse_edges
        if sparse is None:
            sparse = batch.edge_index is not None
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, self.hidden_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            # TU tier: float feature vectors through a linear embedding
            # (reference nets/TU_graph_classification/*_net.py use
            # nn.Linear(in_dim, hidden) instead of nn.Embedding)
            h = nn.Dense(self.hidden_dim, name="embedding_h")(batch.x)
        edges = None
        if sparse:
            edges = make_sparse_edges(batch, dtype=cdt)
            if batch.edge_type is not None:
                et_e = edge_ids_from_dense(
                    batch.edge_type.astype(jnp.int32), edges.src,
                    edges.dst)
                e = nn.Embed(self.num_bond_type, self.hidden_dim,
                             name="embedding_e")(et_e)
            else:
                e = jnp.zeros(edges.src.shape + (self.hidden_dim,))
        else:
            e = (nn.Embed(self.num_bond_type, self.hidden_dim,
                          name="embedding_e")(
                batch.edge_type.astype(jnp.int32))
                if batch.edge_type is not None
                else jnp.zeros(batch.adj.shape + (self.hidden_dim,)))
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)
        if self.pe_init == "rand_walk":
            p = nn.Dense(self.hidden_dim, name="embedding_p")(batch.lap_pe)
        elif self.pe_init == "lap_pe" and batch.lap_pe is not None:
            # reference LapPE variant embeds the PE and ADDS it to h
            # (gatedgcn_net.py: h = h + embedding_p(p); p = None); the p
            # channel then stays zero
            h = h + nn.Dense(self.hidden_dim, name="embedding_p")(
                batch.lap_pe)
            p = jnp.zeros_like(h)
        else:
            p = jnp.zeros_like(h)

        n_per_graph = jnp.maximum(batch.node_mask.sum(-1, keepdims=True), 1)
        snorm_n = (batch.node_mask.astype(h.dtype)
                   / jnp.sqrt(n_per_graph.astype(h.dtype)))

        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            h, p, e = GatedGCNLSPELayer(
                output_dim=(self.out_dim if is_last else self.hidden_dim),
                dropout=self.dropout, batch_norm=self.batch_norm,
                residual=self.residual, compute_dtype=self.compute_dtype,
                name=f"layer_{i}")(
                    h, p, e, batch.adj, batch.node_mask, snorm_n,
                    deterministic, edges=edges)

        p_final = None
        if self.pe_init == "rand_walk":
            p = nn.Dense(self.pos_enc_dim, name="p_out")(p)
            if self.use_lapeig_loss:
                # batch-wise center and l2-normalize p per graph
                mean = masked_mean(p, batch.node_mask, axis=1)
                p = (p - mean[:, None, :]) * batch.node_mask[..., None]
                norms = jnp.sqrt((p ** 2).sum(axis=1, keepdims=True) + 1e-6)
                p = p / norms
            p_final = p
            h = nn.Dense(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], -1))

        if self.readout == "sum":
            hg = (h * batch.node_mask[..., None]).sum(1)
        elif self.readout == "max":
            hg = jnp.where(batch.node_mask[..., None], h,
                           jnp.finfo(h.dtype).min).max(1)
        else:
            hg = masked_mean(h, batch.node_mask, axis=1)
        out = MLPReadout(self.n_out, name="mlp_readout")(
            hg.astype(jnp.float32))
        if self.use_lapeig_loss:
            # reference adds alpha * lapeig_loss to the task loss in its
            # train loop (LSPE train_ZINC_graph_regression.py via
            # model.loss: loss_A + alpha * loss_B); return it pre-weighted
            # as the scalar aux term the Trainer adds with
            # regularization=1.0
            aux = self.alpha_loss * lapeig_loss(
                p_final.astype(jnp.float32), batch.adj, batch.node_mask,
                self.pos_enc_dim, self.lambda_loss)
            return out, aux
        return out
