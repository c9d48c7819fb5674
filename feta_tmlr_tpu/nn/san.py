"""SAN / LPE tier: sparse edge-softmax attention nets, dense-batched.

TPU-native rebuild of /root/reference/LPE/layers/graph_transformer_spectra_layer.py
and LPE/nets/*/SAN_NodeSpectra.py. The reference's DGL SDDMM/segment pipeline
over batched sparse graphs maps to masked dense [B, H, N, N] tensors: the
"fake edge" set of full-graph SAN is exactly the complement pair mask, and
the per-layer `dgl.unbatch/batch` head-replication round trip
(graph_transformer_spectra_layer.py:485-489 — a python-level graph copy per
layer!) disappears into a heads axis.

Reference semantics kept exactly:
  - per-edge score = sum_d(K_src * Q_dst * E_edge)/sqrt(dh), exp-clamped to
    [-5, 5]; real edges weighted 1/(gamma+1), fake edges gamma/(gamma+1)
    (:226-243, :315-322); out = wV / (z + 1e-6) (:364);
  - coefficient GCN is *unnormalized* edge-weighted aggregation then Linear
    (GCNLayer, :25-47), tanh, mean over nodes, Linear (FFN_filter_coeff);
  - ChebLayer: static weights, runtime scalar coeffs, Laplacian from the
    attention-graph *structure* with degree clip(1) (get_laplacian_sp
    :119-125), scaled 2L/2 - I; the reference rebuilds this via scipy every
    forward (host round trip) — here it's a fused dense build;
  - fuse: h = h_attn + filt_linear(tanh(cheb)); dropout; O_h; residual;
    LN/BN; FFN; residual; norm (:415-478).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.ops.cheb import cheb_filter_scalar_coeff
from feta_tmlr_tpu.ops.masking import (
    in_edge_mask,
    masked_mean,
    pair_mask,
    pair_mask_no_diag,
)


def san_structure_laplacian(struct_adj, node_mask):
    """Lhat = 2L/2 - I with L = I - D^{-1/2} A D^{-1/2}, deg clipped at 1
    (get_laplacian_sp, graph_transformer_spectra_layer.py:119-125).
    Net effect: Lhat = -D_clip^{-1/2} A D_clip^{-1/2}, zero diagonal."""
    pm = pair_mask(node_mask).astype(struct_adj.dtype)
    n = struct_adj.shape[-1]
    a = struct_adj * pm * (1.0 - jnp.eye(n, dtype=struct_adj.dtype))
    deg = jnp.maximum(a.sum(-1), 1.0)
    dis = deg ** -0.5
    return -(dis[..., :, None] * a * dis[..., None, :]) * pm


def typed_edge_scores(q, k, table_hd, edge_ids, scale, carry_dtype=None):
    """score[b,h,i,j] = sum_d q[b,h,i,d] * k[b,h,j,d] * table[et[b,i,j],h,d].

    The edge-feature-modulated SDDMM of SAN/GraphiT attention
    (graph_transformer_spectra_layer.py:299-306) when edge features are an
    embedding lookup: instead of materializing the [B, N, N, H*dh]
    projected edge field and a [B, H, N, N, dh] outer-product chain (all
    VPU work + an HBM round trip per op), run one MXU matmul per edge-type
    with the type's modulation folded into K, and select per pair. Exact
    up to float reassociation (T is the bond vocabulary, 4 for ZINC).

    Args:
      q, k: [B, H, N, dh]; table_hd: [T, H, dh] projected type table;
      edge_ids: [B, N, N] int types in (dst i, src j) layout; scale: 1/sqrt(dh).
      carry_dtype: dtype of the T-round select chain (the [B, H, N, N]
        carry is this function's HBM traffic; bf16 under the compute
        policy, f32 default). Matmuls always accumulate f32.
    Returns [B, H, N, N] scores at carry_dtype.
    """
    b, hh, n, dh = q.shape
    cdt = carry_dtype or jnp.float32
    s = jnp.zeros((b, hh, n, n), cdt)
    for t in range(table_hd.shape[0]):
        kt = k * table_hd[t][None, :, None, :]
        st = jnp.einsum("bhid,bhjd->bhij", q, kt,
                        preferred_element_type=jnp.float32)
        s = jnp.where((edge_ids == t)[:, None],
                      (st * scale).astype(cdt), s)
    return s


class SANAttention(nn.Module):
    """Dense twin of MultiHeadAttentionLayer (:250-367)."""

    out_dim: int                  # per-head dim
    num_heads: int
    gamma: float = 1e-5
    full_graph: bool = True
    use_bias: bool = False
    edge_features: bool = True
    # None -> FETA_COMPUTE_DTYPE env (default f32). Under bf16 the QKV/E
    # projections, the score matmuls and the [B, H, N, N] attention field
    # run in bf16 with f32 accumulation; exp/clip, the wV/z normalization
    # and the outputs stay f32.
    compute_dtype: object = None

    @nn.compact
    def __call__(self, h, e_emb, adj, node_mask, gamma_value=None,
                 e_table=None, edge_ids=None):
        """h: [B,N,D]; e_emb: [B,N,N,D] dense edge-feature embeddings or
        None; adj: [B,N,N] real-edge adjacency. Returns (h_out [B,N,H*dh],
        attn [B,H,N,N], struct_adj [B,N,N]).

        gamma_value: optional traced override of the static `gamma` field —
        the SAN-LSPE net learns gamma as a parameter (san_gt_lspe_layer
        clamps a shared nn.Parameter to [0, 1]).

        e_table/edge_ids: typed-edge fast path — when edge features are an
        embedding of a small type vocabulary, pass the [V, D] embedding
        table and the dense [B, N, N] int type ids (in adj's (src, dst)
        layout) instead of the materialized e_emb field; the E/E_2
        projections then run on V rows instead of B*N^2 and the score is
        a per-type MXU matmul (see `typed_edge_scores`)."""
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        hh, dh = self.num_heads, self.out_dim
        dense = lambda name: nn.Dense(hh * dh, use_bias=self.use_bias,
                                      dtype=cdt, name=name)
        split = lambda t: t.reshape(b, n, hh, dh).transpose(0, 2, 1, 3)
        hc = h.astype(cdt)
        q = split(dense("Q")(hc))
        k = split(dense("K")(hc))
        v = split(dense("V")(hc))

        # admissible pairs exclude (i, i): the reference full graph is
        # nx.complete_graph — no self loops (LSPE/data/molecules.py:202)
        pm = pair_mask_no_diag(node_mask)
        real = in_edge_mask(adj, node_mask)
        typed = (self.edge_features and e_table is not None
                 and edge_ids is not None)
        use_field = (self.edge_features and e_emb is not None
                     and not typed)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        # edge (j -> i) carries ids/e_emb[b, j, i]; transpose to (i, j)
        et = jnp.swapaxes(edge_ids, 1, 2) if typed else None

        # score[b,h,i,j]: dst/query i, src/key j (DGL edge j->i convention)
        def scores_of(qm, km, em):
            if em is None:
                return jnp.einsum(
                    "bhid,bhjd->bhij", qm, km,
                    preferred_element_type=jnp.float32) * scale
            # generic dense-field path (e.g. learned edge LPE):
            # em is [B, i(dst), j(src), H*dh] -> [B, H, i, j, dh]
            prod = jnp.einsum("bhid,bhjd->bhijd", qm, km)
            prod = prod * em.reshape(
                b, n, n, hh, dh).transpose(0, 3, 1, 2, 4)
            return prod.sum(-1).astype(jnp.float32) * scale

        if typed:
            tbl_r = dense("E")(e_table.astype(cdt)).reshape(-1, hh, dh)
            s_real = typed_edge_scores(q, k, tbl_r, et, scale,
                                       carry_dtype=cdt)
        else:
            e_r = dense("E")(e_emb.astype(cdt)) if use_field else None
            e_r_t = jnp.swapaxes(e_r, 1, 2) if e_r is not None else None
            s_real = scores_of(q, k, e_r_t)

        if self.full_graph:
            q2 = split(dense("Q_2")(hc))
            k2 = split(dense("K_2")(hc))
            if typed:
                tbl_f = dense("E_2")(e_table.astype(cdt)).reshape(
                    -1, hh, dh)
                s_fake = typed_edge_scores(q2, k2, tbl_f, et, scale,
                                           carry_dtype=cdt)
            else:
                e_f = dense("E_2")(e_emb.astype(cdt)) if use_field else None
                e_f_t = jnp.swapaxes(e_f, 1, 2) if e_f is not None else None
                s_fake = scores_of(q2, k2, e_f_t)
            g = self.gamma if gamma_value is None else gamma_value
            w_real = jnp.exp(jnp.clip(s_real, -5.0, 5.0)) / (g + 1.0)
            w_fake = g * jnp.exp(jnp.clip(s_fake, -5.0, 5.0)) / (g + 1.0)
            attn = jnp.where(real[:, None], w_real,
                             jnp.where(pm[:, None], w_fake, 0.0))
        else:
            w_real = jnp.exp(jnp.clip(s_real, -5.0, 5.0))
            attn = jnp.where(real[:, None], w_real, 0.0)

        # carry the [B, H, N, N] field at compute dtype; normalize in f32
        attn = attn.astype(cdt)
        wv = jnp.einsum("bhij,bhjd->bhid", attn, v,
                        preferred_element_type=jnp.float32)
        z = attn.sum(-1, keepdims=True, dtype=jnp.float32)
        h_out = wv / (z + 1e-6)
        h_out = h_out.transpose(0, 2, 1, 3).reshape(b, n, hh * dh)
        h_out = h_out.astype(h.dtype)
        struct = pm.astype(h.dtype) if self.full_graph \
            else real.astype(h.dtype)
        mask_f = node_mask.astype(h.dtype)[..., None]
        return h_out * mask_f, attn, struct


class SANCoeffHead(nn.Module):
    """LPE coefficient head: unnormalized edge-weighted GCN + tanh + mean
    pool + Linear (GCNLayer :25-47 + get_filter_coeff :482-520)."""

    filter_order: int

    @nn.compact
    def __call__(self, attn, node_mask):
        a = jax.lax.stop_gradient(attn)            # [B,H,N,N] detached
        k = self.filter_order
        # the coefficient GCN's node features are ones((N, K)) (reference
        # get_filter_coeff :510), so the edge-weighted aggregation
        # A @ ones is just the attention row-sum broadcast over K — one
        # reduction pass instead of an einsum against a ones tensor
        rowsum = a.sum(-1, dtype=jnp.float32)      # [B,H,N]
        agg = jnp.broadcast_to(rowsum[..., None], rowsum.shape + (k,))
        hgc = jnp.tanh(nn.Dense(k, name="gcn_linear")(agg))
        pooled = masked_mean(hgc, node_mask[:, None, :], axis=2)
        return nn.Dense(k, name="ffn_filter_coeff")(pooled)  # [B,H,K]


class SANSpectraLayer(nn.Module):
    """GraphTransformerLayerSpectra, dense (:370-478)."""

    out_dim: int
    num_heads: int
    gamma: float = 1e-5
    full_graph: bool = True
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    use_bias: bool = False
    filter_order: int = 4
    edge_features: bool = True
    spectra: bool = True           # False -> plain SAN layer (:no filter)
    compute_dtype: object = None   # see SANAttention

    @nn.compact
    def __call__(self, h, e_emb, adj, node_mask, deterministic=True,
                 e_table=None, edge_ids=None):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, _ = h.shape
        dh = self.out_dim // self.num_heads
        h_in1 = h
        h_attn, attn, struct = SANAttention(
            dh, self.num_heads, self.gamma, self.full_graph, self.use_bias,
            self.edge_features, compute_dtype=self.compute_dtype,
            name="attention")(h, e_emb, adj, node_mask,
                              e_table=e_table, edge_ids=edge_ids)

        if self.spectra:
            coeff = SANCoeffHead(self.filter_order, name="coeff_head")(
                attn, node_mask)
            lhat = san_structure_laplacian(struct, node_mask)
            heads = h_attn.reshape(b, n, self.num_heads, dh) \
                .transpose(0, 2, 1, 3)
            w = self.param("cheb_weight", nn.initializers.glorot_uniform(),
                           (self.filter_order, dh, dh))
            cb = self.param("cheb_bias", nn.initializers.zeros, (dh,))
            filt = cheb_filter_scalar_coeff(
                heads.astype(cdt), lhat.astype(cdt),
                coeff.astype(cdt), w.astype(cdt), cb.astype(cdt))
            filt = nn.Dense(dh, dtype=cdt,
                            name="filt_linear")(jnp.tanh(filt))
            filt = filt.transpose(0, 2, 1, 3).reshape(
                b, n, self.out_dim).astype(h_attn.dtype)
            h = h_attn + filt
        else:
            h = h_attn

        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        h = drop(h)
        h = nn.Dense(self.out_dim, name="O_h")(h)
        if self.residual and h_in1.shape[-1] == self.out_dim:
            h = h_in1 + h
        h = self._norm(h, node_mask, "norm1", deterministic)
        h_in2 = h
        ff = nn.Dense(2 * self.out_dim, name="ffn1")(h)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.out_dim, name="ffn2")(ff)
        if self.residual:
            h = h_in2 + ff
        else:
            h = ff
        h = self._norm(h, node_mask, "norm2", deterministic)
        return h * node_mask.astype(h.dtype)[..., None]

    def _norm(self, x, node_mask, name, deterministic):
        if self.layer_norm:
            return nn.LayerNorm(epsilon=1e-5, name=f"ln_{name}")(x)
        if self.batch_norm:
            return MaskedBatchNorm(name=f"bn_{name}")(
                x, node_mask, use_running_average=deterministic)
        return x


class _DenseParams(nn.Module):
    """Param-tree twin of nn.Dense (same names/shapes/inits) that hands
    the raw kernel/bias to a fused kernel instead of applying them."""

    features: int

    @nn.compact
    def __call__(self, in_features):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class FreqTransformer(nn.Module):
    """Small transformer over the frequency (eigenvector) axis used by the
    learned-PE heads: tokens [S, M, C_in] -> Linear(C_in -> lpe_dim) ->
    encoder layers with frequency masking -> masked sum pool [S, lpe_dim].

    The reference builds torch nn.TransformerEncoderLayer with its DEFAULTS
    (SAN_NodeSpectra.py:51): dim_feedforward=2048, dropout=0.1 — kept here.
    """

    lpe_dim: int
    lpe_heads: int
    lpe_layers: int
    ff_dim: int = 2048
    dropout: float = 0.1
    # None -> FETA_COMPUTE_DTYPE env. The [B*N, m, ff_dim=2048] FFN field
    # is this head's dominant HBM stream (the reference keeps torch's
    # dim_feedforward default); under bf16 the matmuls and that field run
    # half-width, softmax and LayerNorms stay f32.
    compute_dtype: object = None

    @nn.compact
    def __call__(self, tokens, freq_mask, deterministic=True):
        s, m, _ = tokens.shape
        x = nn.Dense(self.lpe_dim, name="linear_A")(tokens)
        for i in range(self.lpe_layers):
            x = self._encoder_layer(x, freq_mask, i, deterministic)
        x = jnp.where(freq_mask[..., None], x, 0.0)
        return x.sum(axis=1)                               # nansum pool

    def _encoder_layer(self, x, mask, idx, deterministic):
        # torch nn.TransformerEncoderLayer semantics over the frequency axis
        # (helper of the compact __call__, shares its param scope)
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        s, m, d = x.shape
        hn = self.lpe_heads
        dh = d // hn
        qkv = nn.Dense(3 * d, dtype=cdt, name=f"qkv_{idx}")(x.astype(cdt))
        q, k, v = jnp.split(qkv, 3, -1)
        shape = (s, m, hn, dh)
        q, k, v = (t.reshape(shape).transpose(0, 2, 1, 3) for t in (q, k, v))
        sc = jnp.einsum("shmd,shnd->shmn", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32))
        sc = jnp.where(mask[:, None, None, :], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        p = jnp.where(mask[:, None, :, None], p, 0.0)
        out = jnp.einsum("shmn,shnd->shmd", p.astype(cdt), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(s, m, d).astype(x.dtype)
        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        x = x + drop(nn.Dense(d, name=f"proj_{idx}")(out))
        x = nn.LayerNorm(epsilon=1e-5, name=f"n1_{idx}")(x)
        # FFN: the ff_dim=2048 hidden field over s*m rows is this head's
        # dominant HBM stream (68% of SAN's FLOPs, BASELINE.md round 4).
        # On accelerators it runs through the row-blocked fused-MLP
        # Pallas kernel (hidden stays in VMEM, in-kernel regenerable
        # dropout); param tree is identical to the nn.Dense pair.
        from feta_tmlr_tpu.config import use_fused_mlp
        w1, b1 = _DenseParams(self.ff_dim, name=f"ff1_{idx}")(d)
        w2, b2 = _DenseParams(d, name=f"ff2_{idx}")(self.ff_dim)
        rate = 0.0 if deterministic else self.dropout
        if use_fused_mlp(self.ff_dim):
            from feta_tmlr_tpu.ops.pallas.fused_mlp import fused_mlp
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, 2 ** 24)
            ff = fused_mlp(x.reshape(s * m, d).astype(cdt),
                           w1.astype(cdt), b1.astype(jnp.float32),
                           w2.astype(cdt), b2.astype(jnp.float32),
                           dropout_rate=rate, seed=seed)
            ff = ff.reshape(s, m, d)
        else:
            ff = jnp.dot(x.astype(cdt), w1.astype(cdt)) + b1.astype(cdt)
            ff = jnp.dot(drop(nn.relu(ff)), w2.astype(cdt)) \
                + b2.astype(cdt)
        x = nn.LayerNorm(epsilon=1e-5,
                         name=f"n2_{idx}")(x + drop(ff).astype(x.dtype))
        return x


class LPETransformer(nn.Module):
    """Learned node eigen-PE of SAN_NodeSpectra / SAN_NodeLPE (:48-90):
    tokens are (eigvec_im, eigval_m) pairs per frequency."""

    lpe_dim: int
    lpe_heads: int
    lpe_layers: int
    compute_dtype: object = None

    @nn.compact
    def __call__(self, eigvecs, eigvals, node_mask, deterministic=True):
        b, n, m = eigvecs.shape
        vals = jnp.broadcast_to(eigvals[:, None, :], (b, n, m))
        tokens = jnp.stack([eigvecs, vals], axis=-1)       # [B,N,M,2]
        freq_mask = ~jnp.isnan(tokens[..., 0])
        tokens = jnp.where(jnp.isnan(tokens), 0.0, tokens)
        pos = FreqTransformer(self.lpe_dim, self.lpe_heads, self.lpe_layers,
                              compute_dtype=self.compute_dtype,
                              name="freq_transformer")(
            tokens.reshape(b * n, m, 2), freq_mask.reshape(b * n, m),
            deterministic)
        pos = pos.reshape(b, n, self.lpe_dim)
        return pos * node_mask.astype(pos.dtype)[..., None]


class EdgeLPETransformer(nn.Module):
    """Learned edge eigen-PE of SAN_EdgeLPE: per node pair (i, j) the
    frequency tokens are (eigvec_i - eigvec_j, eigvec_i * eigvec_j,
    eigval_m); transformer over frequencies, sum-pooled, concatenated to
    the edge embedding (SAN_EdgeLPE.py:59-85)."""

    lpe_dim: int
    lpe_heads: int
    lpe_layers: int

    @nn.compact
    def __call__(self, eigvecs, eigvals, node_mask, deterministic=True):
        b, n, m = eigvecs.shape
        diff = eigvecs[:, :, None, :] - eigvecs[:, None, :, :]
        prod = eigvecs[:, :, None, :] * eigvecs[:, None, :, :]
        vals = jnp.broadcast_to(eigvals[:, None, None, :], (b, n, n, m))
        tokens = jnp.stack([diff, prod, vals], axis=-1)    # [B,N,N,M,3]
        freq_mask = ~jnp.isnan(tokens[..., 0])
        tokens = jnp.where(jnp.isnan(tokens), 0.0, tokens)
        pos = FreqTransformer(self.lpe_dim, self.lpe_heads, self.lpe_layers,
                              name="freq_transformer")(
            tokens.reshape(b * n * n, m, 3),
            freq_mask.reshape(b * n * n, m), deterministic)
        pos = pos.reshape(b, n, n, self.lpe_dim)
        pm = (node_mask[:, :, None] & node_mask[:, None, :])
        return pos * pm[..., None].astype(pos.dtype)


class MLPReadout(nn.Module):
    """Halving MLP readout (LPE/layers/mlp_readout_layer.py)."""

    out_dim: int
    n_layers: int = 2

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        for i in range(self.n_layers):
            x = nn.relu(nn.Dense(max(d // 2 ** (i + 1), 1),
                                 name=f"fc_{i}")(x))
        return nn.Dense(self.out_dim, name="fc_out")(x)


class SANNet(nn.Module):
    """Plain SAN family (LPE/nets/*/SAN.py, SAN_NodeLPE.py, SAN_EdgeLPE.py):
    gamma-weighted full-graph attention without spectral filtering, with the
    eigen-PE used nowhere ('none'), concatenated to node embeddings
    ('node'), or concatenated to edge embeddings ('edge')."""

    num_atom_type: int
    num_bond_type: int
    lpe: str = "none"              # none | node | edge
    hidden_dim: int = 64
    out_dim: int = 64
    n_heads: int = 8
    n_layers: int = 6
    lpe_dim: int = 8
    lpe_heads: int = 2
    lpe_layers: int = 2
    gamma: float = 1e-5
    full_graph: bool = True
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    readout: str = "mean"
    n_out: int = 1
    node_level: bool = False       # per-node logits (SBM tier)
    categorical_input: bool = True  # False: float features (TU tier)
    # None = auto: use the typed-edge score path (see SANAttention) when
    # the bond vocabulary is small and no learned edge-PE is concatenated
    typed_edges: Optional[bool] = None
    compute_dtype: object = None

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        h_dim = (self.hidden_dim - self.lpe_dim if self.lpe == "node"
                 else self.hidden_dim)
        e_dim = (self.hidden_dim - self.lpe_dim if self.lpe == "edge"
                 else self.hidden_dim)
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, h_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            h = nn.Dense(h_dim, name="embedding_h")(batch.x)
        typed = self.typed_edges
        if typed is None:
            typed = self.num_bond_type <= 16 and self.lpe != "edge"
        e_emb = e_table = e_ids = None
        if batch.edge_type is not None:
            embed_e = nn.Embed(self.num_bond_type, e_dim,
                               name="embedding_e")
            if typed:
                e_table = embed_e(jnp.arange(self.num_bond_type))
                e_ids = batch.edge_type.astype(jnp.int32)
            else:
                e_emb = embed_e(batch.edge_type.astype(jnp.int32))
        if self.lpe == "node":
            pos = LPETransformer(self.lpe_dim, self.lpe_heads,
                                 self.lpe_layers, name="pe_transformer")(
                batch.eigvecs, batch.eigvals, batch.node_mask, deterministic)
            h = jnp.concatenate([h, pos], -1)
        elif self.lpe == "edge":
            epos = EdgeLPETransformer(self.lpe_dim, self.lpe_heads,
                                      self.lpe_layers,
                                      name="pe_transformer")(
                batch.eigvecs, batch.eigvals, batch.node_mask, deterministic)
            if e_emb is None:
                e_emb = epos
            else:
                e_emb = jnp.concatenate([e_emb, epos], -1)
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)

        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            h = SANSpectraLayer(
                out_dim=(self.out_dim if is_last else self.hidden_dim),
                num_heads=self.n_heads, gamma=self.gamma,
                full_graph=self.full_graph, dropout=self.dropout,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                residual=self.residual,
                edge_features=(e_emb is not None or e_table is not None),
                spectra=False, compute_dtype=self.compute_dtype,
                name=f"layer_{i}")(
                    h, e_emb, batch.adj, batch.node_mask, deterministic,
                    e_table=e_table, edge_ids=e_ids)

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


class SANNodeSpectra(nn.Module):
    """SAN_NodeSpectra net (LPE/nets/ZINC_graph_regression/SAN_NodeSpectra.py).

    Node/edge inputs are categorical ids (ZINC atoms/bonds); the learned
    eigen-PE is concatenated into the node embedding.
    """

    num_atom_type: int
    num_bond_type: int
    hidden_dim: int = 64
    out_dim: int = 64
    n_heads: int = 8
    n_layers: int = 6
    lpe_dim: int = 8
    lpe_heads: int = 2
    lpe_layers: int = 2
    gamma: float = 1e-5
    full_graph: bool = True
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    filter_order: int = 4
    last_layer_filter: bool = False
    readout: str = "mean"
    n_out: int = 1
    node_level: bool = False
    categorical_input: bool = True
    typed_edges: Optional[bool] = None   # see SANNet
    compute_dtype: object = None

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, self.hidden_dim - self.lpe_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            h = nn.Dense(self.hidden_dim - self.lpe_dim,
                         name="embedding_h")(batch.x)
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

        pos = LPETransformer(self.lpe_dim, self.lpe_heads, self.lpe_layers,
                             compute_dtype=self.compute_dtype,
                             name="pe_transformer")(
            batch.eigvecs, batch.eigvals, batch.node_mask, deterministic)
        h = jnp.concatenate([h, pos], axis=-1)
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)

        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            spectra = is_last if self.last_layer_filter else True
            h = SANSpectraLayer(
                out_dim=(self.out_dim if is_last else self.hidden_dim),
                num_heads=self.n_heads, gamma=self.gamma,
                full_graph=self.full_graph, dropout=self.dropout,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                residual=self.residual, filter_order=self.filter_order,
                edge_features=(e_emb is not None or e_table is not None),
                spectra=spectra, compute_dtype=self.compute_dtype,
                name=f"layer_{i}")(h, e_emb, batch.adj, batch.node_mask,
                                   deterministic, e_table=e_table,
                                   edge_ids=e_ids)

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
