"""The FeTA block: attention-graph coefficient GCN + dynamic spectral filter.

TPU-native rebuild of `DiffTransformerEncoderGenGCN`
(/root/reference/transformer/models.py:103-368):

per encoder layer (or only the last, per `last_layer_filter`):
  1. run the GraphiT attention layer, keeping per-head outputs;
  2. treat the (detached) dense attention matrix itself as a weighted graph
     and run a small GCN over it to produce per-(graph, head) Chebyshev
     coefficients (`get_filter_coefficients`, models.py:240-287);
  3. apply a dynamic Chebyshev filter parameterized by those coefficients to
     the per-head value outputs, over the *original* graph Laplacian
     (`filter` -> ChebConvDynamic, models.py:346-368);
  4. skip-accumulate the filtered signal and fuse by concat + linear
     (models.py:209-228).

Where the reference round-trips through host numpy to build a dense
fully-connected edge list per graph (np.mgrid, models.py:246-263) and
flattens heads into a batched sparse graph, we keep everything as batched
dense [B, H, N, N] tensors: the attention graph is complete by construction,
so the coefficient GCN is a masked batched matmul (the zero-attention entries
the reference filters out contribute zero in both the propagation and the
gcn_norm degrees — mathematically identical, no host sync).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer
from feta_tmlr_tpu.ops.arma import arma_filter_dynamic, gcn_norm_no_self_loops
from feta_tmlr_tpu.ops.cheb import cheb_filter_dynamic, cheb_filter_scalar_coeff
from feta_tmlr_tpu.ops.laplacian import (
    cheb_scaled_laplacian,
    gcn_norm_directed,
)
from feta_tmlr_tpu.ops.masking import masked_mean


class _ScannedGraphiTBody(nn.Module):
    """scan body: one GraphiT layer, carry = node features."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    batch_norm: bool
    deterministic: bool
    compute_dtype: Optional[object] = None

    @nn.compact
    def __call__(self, carry, pe, node_mask, degree):
        x, _, _ = GraphiTEncoderLayer(
            self.d_model, self.n_heads, self.dim_feedforward,
            self.dropout, self.batch_norm,
            compute_dtype=self.compute_dtype, name="layer")(
                carry, pe, node_mask, degree=degree,
                deterministic=self.deterministic, need_heads=False)
        return x, ()


class FilterCoefficientHead(nn.Module):
    """Coefficient GCN over the (detached) attention graph.

    Rebuild of `get_filter_coefficients` (transformer/models.py:240-287):
    node features = ones(num_coefficients) (models.py:280), one
    GCNConv(num_coeff, num_coeff) with detached attention edge weights and
    tanh (models.py:282), global mean pool per graph (models.py:283), then a
    Linear(num_coeff, num_coeff) (models.py:284).
    """

    num_coefficients: int

    @nn.compact
    def __call__(self, attn, node_mask, precomputed_s=None):
        # attn: [B, H, N, N]; heads stay a batch axis (the reference flattens
        # them into a H*B sparse graph with index offsets, models.py:178-186).
        # attn[i, j] is the weight of directed edge i -> j; PyG's GCNConv
        # normalizes with in-degrees and aggregates at the destination
        # (gcn_norm_directed), so propagation contracts over the SOURCE axis.
        mask_h = node_mask[:, None, :]                # broadcast over heads
        if precomputed_s is not None:
            # streamed flash path: s came out of the attention kernel's
            # column-stat passes (already detached + gcn-normalized;
            # ops/pallas/flash_attention.flash_graphit_attention_heads)
            s = precomputed_s                         # [B, H, N(dst)]
        else:
            a = jax.lax.stop_gradient(attn)           # detach (models.py:282)
            a_norm = gcn_norm_directed(a, mask_h)     # [B, H, N(src), N(dst)]
            s = a_norm.sum(axis=2)                    # [B, H, N(dst)]

        c = self.num_coefficients
        w = self.param(
            "gcn_kernel",
            nn.initializers.glorot_uniform(), (c, c))
        b = self.param("gcn_bias", nn.initializers.zeros, (c,))
        # the reference hardcodes ones as node features (models.py:280), so
        # GCN(ones) = (col-sums of a_norm) outer (column-sums of W) — the
        # [N, C] x [C, C] matmul collapses to an outer product (exact)
        h = jnp.tanh(s[..., None] * w.sum(axis=0) + b)
        pooled = masked_mean(h, mask_h, axis=2)       # [B, H, C] mean pool
        return nn.Dense(c, name="coeff_linear")(pooled)


class FeTAEncoder(nn.Module):
    """Stack of GraphiT layers with spectral filtering of head outputs.

    Returns (out [B,N,D], last_attn [B,H,N,N], coefficients [B, Lf*H, C])
    where Lf = number of filtered layers (1 if last_layer_filter).
    """

    d_model: int
    n_heads: int
    n_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    batch_norm: bool = False
    filter_order: int = 4
    gnn_type: str = "ChebConvDynamic"
    last_layer_filter: bool = True
    learn_only_filter_order_coeff: bool = False
    use_skip_conn: bool = True
    laplacian_norm: Optional[str] = "sym"
    remat: bool = False            # rematerialize layers (trade FLOPs for HBM)
    scan_layers: bool = False      # lax.scan over the unfiltered layers:
                                   # ~L-times smaller XLA program (compile
                                   # time), same math; params stack [L-1,...]
    compute_dtype: Optional[object] = None  # None -> FETA_COMPUTE_DTYPE env

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def num_coefficients(self) -> int:
        """Coefficient-vector size per (graph, head).

        Dynamic mode expands K to K*dh*dh (models.py:130-134); scalar mode
        keeps K (models.py:126-128); ARMA uses 2K (models.py:135-139).
        """
        if self.gnn_type == "ChebConvDynamic":
            if self.learn_only_filter_order_coeff:
                return self.filter_order
            return self.filter_order * self.head_dim * self.head_dim
        if self.gnn_type == "ARMAConvDynamic":
            return self.filter_order * 2
        return self.filter_order

    @nn.compact
    def __call__(self, x, pe, adj, node_mask, degree=None,
                 deterministic: bool = True):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, d = x.shape
        h, dh = self.n_heads, self.head_dim
        dynamic = "dynamic" in self.gnn_type.lower()

        lhat = None
        anorm = None
        if self.gnn_type == "ChebConvDynamic":
            lam = None
            if self.laplacian_norm != "sym":
                # the reference demands an explicit per-graph lambda_max
                # for non-sym norms (ChebNetDynamic.py:68-74, via PyG's
                # LaplacianLambdaMax transform); compute it on device
                from feta_tmlr_tpu.ops.lambda_max import \
                    laplacian_lambda_max
                lam = laplacian_lambda_max(
                    adj, node_mask, normalization=self.laplacian_norm)
            lhat = cheb_scaled_laplacian(
                adj, node_mask, normalization=self.laplacian_norm,
                lambda_max=lam)
        elif self.gnn_type == "ARMAConvDynamic":
            anorm = gcn_norm_no_self_loops(adj, node_mask)

        coeff_head = FilterCoefficientHead(
            self.num_coefficients, name="coeff_head")
        cheb_bias = None
        static_weight = None
        arma_params = None
        if self.gnn_type == "ChebConvDynamic":
            cheb_bias = self.param(
                "cheb_bias", nn.initializers.zeros, (dh,))
            if self.learn_only_filter_order_coeff:
                static_weight = self.param(
                    "cheb_weight",
                    nn.initializers.glorot_uniform(),
                    (self.filter_order, dh, dh))
        elif self.gnn_type == "ARMAConvDynamic":
            arma_params = dict(
                init_weight=self.param(
                    "arma_init_weight", nn.initializers.glorot_uniform(),
                    (self.filter_order, dh, dh)),
                root_weight=self.param(
                    "arma_root_weight", nn.initializers.glorot_uniform(),
                    (self.filter_order, dh, dh)),
                bias=self.param(
                    "arma_bias", nn.initializers.zeros,
                    (self.filter_order, 1, dh)),
            )

        out = x
        attn = None
        allout_filtered = None
        coefficients = []
        # static argnums (self=0): deterministic=5, need_heads=7 — both feed
        # python control flow inside the layer
        layer_cls = (nn.remat(GraphiTEncoderLayer, static_argnums=(5, 7))
                     if self.remat else GraphiTEncoderLayer)

        start_layer = 0
        if (self.scan_layers and self.n_layers > 1
                and (self.last_layer_filter or not dynamic)):
            scanned = nn.scan(
                _ScannedGraphiTBody,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.n_layers - 1,
            )(d_model=self.d_model, n_heads=self.n_heads,
              dim_feedforward=self.dim_feedforward, dropout=self.dropout,
              batch_norm=self.batch_norm, deterministic=deterministic,
              compute_dtype=self.compute_dtype, name="scan_layers")
            out, _ = scanned(out, pe, node_mask, degree)
            start_layer = self.n_layers - 1

        for layer_idx in range(start_layer, self.n_layers):
            filtered = dynamic and (not self.last_layer_filter
                                    or layer_idx + 1 == self.n_layers)
            out, attn, out_each_head = layer_cls(
                self.d_model, self.n_heads, self.dim_feedforward,
                self.dropout, self.batch_norm,
                compute_dtype=self.compute_dtype,
                name=f"layer_{layer_idx}")(
                    out, pe, node_mask, degree, deterministic, None,
                    filtered)
            if not filtered:
                continue

            from feta_tmlr_tpu.nn.layers import AttnColStats
            if isinstance(attn, AttnColStats):
                # streamed flash path: the layer emitted the detached
                # column statistics instead of dense [B, H, N, N] attention
                coeff = coeff_head(None, node_mask, precomputed_s=attn.s)
            else:
                coeff = coeff_head(attn, node_mask)   # [B, H, C]
            coefficients.append(coeff)
            heads = out_each_head.transpose(0, 2, 1, 3)  # [B, H, N, dh]
            if self.gnn_type == "ChebConvDynamic":
                # the Cheb recurrence/contraction is the second-largest
                # matmul chain: run it in cdt, accumulate back in f32
                heads_c = heads.astype(cdt)
                lhat_c = lhat.astype(cdt)
                if self.learn_only_filter_order_coeff:
                    filt = cheb_filter_scalar_coeff(
                        heads_c, lhat_c, coeff.astype(cdt),
                        static_weight.astype(cdt), cheb_bias.astype(cdt))
                else:
                    w = coeff.reshape(
                        b, h, self.filter_order, dh, dh)
                    filt = cheb_filter_dynamic(heads_c, lhat_c,
                                               w.astype(cdt),
                                               cheb_bias.astype(cdt))
                filt = filt.astype(jnp.float32)
            elif self.gnn_type == "ARMAConvDynamic":
                filt = arma_filter_dynamic(
                    heads, anorm, coeff, activation=nn.relu, **arma_params)
            else:
                raise NotImplementedError(
                    f"gnn_type {self.gnn_type} filter not implemented yet")
            # [B,H,N,dh] -> [B,N,H*dh]; reference scatters the flat filtered
            # output back into the padded layout (models.py:200-202) — here
            # it's already padded-dense.
            filt = filt.transpose(0, 2, 1, 3).reshape(b, n, d)
            filt = filt * node_mask.astype(filt.dtype)[..., None]
            if self.use_skip_conn:
                allout_filtered = (
                    filt if allout_filtered is None else allout_filtered + filt)
            else:
                allout_filtered = filt
                out = allout_filtered

        if self.use_skip_conn and allout_filtered is not None:
            out = nn.Dense(self.d_model, name="linear_cat")(
                jnp.concatenate([out, allout_filtered], axis=-1))
        elif not self.use_skip_conn and allout_filtered is not None:
            out = allout_filtered

        if coefficients:
            coeffs = jnp.concatenate(
                coefficients, axis=1)                 # [B, Lf*H, C]
        else:
            coeffs = jnp.zeros((b, 0, self.num_coefficients), x.dtype)
        return out, attn, coeffs
