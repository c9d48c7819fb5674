"""Pure-torch (CPU) twin of the FeTA forward pass, for parity and baselines.

The build environment has no torch_geometric/DGL, so the PyTorch reference
cannot run here. Following the reference's own testing idiom — every native
kernel ships a pure-torch twin compared by max-abs-diff
(gckn/gckn_fast/gckn_fast.py:55-130) — this module re-expresses the
reference's FeTA semantics (transformer/models.py + ChebNetDynamic.py) in
dense plain torch with NO dependency on the new framework's code paths.
It serves two purposes:
  1. activation-parity goldens for the JAX models (tests/test_parity.py);
  2. the CPU baseline measurement for bench.py's vs_baseline ratio.

This is an independent reimplementation from the written semantics, not a
copy: PyG/DGL machinery (MessagePassing, repeat_interleave scatter) is
replaced by the equivalent dense linear algebra.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def cheb_scaled_laplacian_t(adj, node_mask, lambda_max=2.0):
    """Dense Lhat with ChebConvDynamic.__norm__ semantics (sym norm)."""
    pm = node_mask[:, :, None] * node_mask[:, None, :]
    n = adj.shape[-1]
    eye = torch.eye(n, dtype=adj.dtype)
    a = adj * pm * (1 - eye)
    deg = a.sum(-1)
    dis = torch.where(deg > 0, deg.clamp(min=1e-30) ** -0.5,
                      torch.zeros_like(deg))
    off = -dis[:, :, None] * a * dis[:, None, :]
    lap = off + node_mask[:, :, None] * eye
    lhat = (2.0 / lambda_max) * lap - node_mask[:, :, None] * eye
    return lhat * pm


def gcn_norm_t(a, node_mask):
    """PyG gcn_norm over the DIRECTED attention graph (a[i,j] = edge i->j):
    keep existing self-loop weights, fill missing with 1, in-degree
    normalization (GenGCN.py:89-102); aggregate at dst via a^T x."""
    n = a.shape[-1]
    eye = torch.eye(n, dtype=a.dtype)
    diag = a.diagonal(dim1=-2, dim2=-1)
    missing = ((diag == 0) & node_mask.bool()).to(a.dtype)
    a = a + missing.unsqueeze(-1) * eye
    deg_in = a.sum(-2)
    dis = torch.where(deg_in > 0, deg_in.clamp(min=1e-30) ** -0.5,
                      torch.zeros_like(deg_in))
    return dis.unsqueeze(-1) * a * dis.unsqueeze(-2)


class TorchGraphiTLayer(nn.Module):
    def __init__(self, d_model, n_heads, dim_feedforward, batch_norm=False):
        super().__init__()
        self.d_model, self.h = d_model, n_heads
        self.dh = d_model // n_heads
        self.qkv = nn.Linear(d_model, 3 * d_model)
        self.out_proj = nn.Linear(d_model, d_model)
        self.ff1 = nn.Linear(d_model, dim_feedforward)
        self.ff2 = nn.Linear(dim_feedforward, d_model)
        self.batch_norm = batch_norm
        if batch_norm:
            self.norm1 = nn.BatchNorm1d(d_model)
            self.norm2 = nn.BatchNorm1d(d_model)
        else:
            self.norm1 = nn.LayerNorm(d_model)
            self.norm2 = nn.LayerNorm(d_model)

    def _norm(self, norm, x, node_mask):
        if not self.batch_norm:
            return norm(x)
        b, n, d = x.shape
        flat = x.reshape(b * n, d)
        out = torch.empty_like(flat)
        valid = node_mask.reshape(-1).bool()
        out[valid] = norm(flat[valid])
        out[~valid] = 0.0
        return out.reshape(b, n, d)

    def forward(self, x, pe, node_mask, degree=None):
        b, n, d = x.shape
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        shp = (b, n, self.h, self.dh)
        q = q.reshape(shp).permute(0, 2, 1, 3)
        k = k.reshape(shp).permute(0, 2, 1, 3)
        v = v.reshape(shp).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.dh)
        scores = scores.masked_fill(~node_mask[:, None, None, :].bool(), -1e30)
        attn = torch.softmax(scores, -1)
        if pe is not None:
            attn = attn * pe[:, None]
        if degree is not None:
            attn = attn * degree[:, None, None, :]
        if pe is not None or degree is not None:
            den = attn.sum(-1, keepdim=True)
            attn = attn / torch.where(den.abs() > 1e-9,
                                      den, torch.ones_like(den))
        attn = attn * node_mask[:, None, :, None] * node_mask[:, None, None, :]
        heads = attn @ v                              # [B,H,N,dh]
        out_each_head = heads.permute(0, 2, 1, 3)     # [B,N,H,dh]
        x = x + self.out_proj(out_each_head.reshape(b, n, d))
        x = self._norm(self.norm1, x, node_mask)
        x = x + self.ff2(F.relu(self.ff1(x)))
        x = self._norm(self.norm2, x, node_mask)
        m = node_mask.unsqueeze(-1)
        return x * m, attn, out_each_head * m.unsqueeze(-1)


class TorchFeTA(nn.Module):
    """Dense torch DiffGraphTransformerGenGCN twin (ChebConvDynamic mode)."""

    def __init__(self, in_size, nb_class, d_model, nb_heads,
                 dim_feedforward, nb_layers, filter_order=4,
                 batch_norm=False, lap_pos_enc=False, lap_pos_enc_dim=0,
                 last_layer_filter=True, gnn_type="ChebConvDynamic",
                 learn_only_filter_order_coeff=False):
        super().__init__()
        self.embedding = nn.Linear(in_size, d_model, bias=False)
        self.lap_pos_enc = lap_pos_enc
        if lap_pos_enc and lap_pos_enc_dim > 0:
            self.embedding_lap = nn.Linear(lap_pos_enc_dim, d_model)
        self.layers = nn.ModuleList([
            TorchGraphiTLayer(d_model, nb_heads, dim_feedforward, batch_norm)
            for _ in range(nb_layers)])
        self.h = nb_heads
        self.dh = d_model // nb_heads
        self.k_order = filter_order
        self.gnn_type = gnn_type
        self.scalar_mode = learn_only_filter_order_coeff
        if gnn_type == "ARMAConvDynamic":
            # reference ARMAConvDynamic (ChebNetDynamic.py:201-358): 2K
            # dynamic scales over learned init/root stack weights
            self.n_coeff = 2 * filter_order
            self.arma_init = nn.Parameter(
                torch.zeros(filter_order, self.dh, self.dh))
            self.arma_root = nn.Parameter(
                torch.zeros(filter_order, self.dh, self.dh))
            self.arma_bias = nn.Parameter(
                torch.zeros(filter_order, 1, self.dh))
        elif learn_only_filter_order_coeff:
            # scalar-coefficient mode (ChebNetDynamic.py:91-92,164-183)
            self.n_coeff = filter_order
            self.cheb_weight = nn.Parameter(
                torch.zeros(filter_order, self.dh, self.dh))
        else:
            self.n_coeff = filter_order * self.dh * self.dh
        self.coeff_gcn = nn.Linear(self.n_coeff, self.n_coeff)
        self.coeff_linear = nn.Linear(self.n_coeff, self.n_coeff)
        self.cheb_bias = nn.Parameter(torch.zeros(self.dh))
        self.linear_cat = nn.Linear(2 * d_model, d_model)
        self.classifier = nn.Sequential(
            nn.Linear(d_model, d_model), nn.ReLU(True),
            nn.Linear(d_model, nb_class))
        self.last_layer_filter = last_layer_filter

    def coeff_head(self, attn, node_mask):
        a = attn.detach()
        an = gcn_norm_t(a, node_mask[:, None, :])     # [B,H,src,dst]
        ones = torch.ones(a.shape[:3] + (self.n_coeff,), dtype=a.dtype)
        # destination aggregation: out[j] = sum_i an[i,j] x[i]
        hcoef = torch.tanh(self.coeff_gcn(an.transpose(-1, -2) @ ones))
        m = node_mask[:, None, :, None]
        pooled = (hcoef * m).sum(2) / m.sum(2).clamp(min=1.0)
        return self.coeff_linear(pooled)              # [B,H,C]

    def cheb_dynamic(self, heads, lhat, w):
        # heads [B,H,N,dh], lhat [B,N,N], w [B,H,K,dh,dh]
        tx0 = heads
        out = torch.einsum("bhnd,bhde->bhne", tx0, w[:, :, 0])
        if self.k_order > 1:
            tx1 = torch.einsum("bmn,bhnd->bhmd", lhat, heads)
            out = out + torch.einsum("bhnd,bhde->bhne", tx1, w[:, :, 1])
            for k in range(2, self.k_order):
                tx2 = 2 * torch.einsum("bmn,bhnd->bhmd", lhat, tx1) - tx0
                out = out + torch.einsum("bhnd,bhde->bhne", tx2, w[:, :, k])
                tx0, tx1 = tx1, tx2
        return out + self.cheb_bias

    def cheb_scalar(self, heads, lhat, coeff):
        # out = sum_k c_{h,k} * (Tx_k @ W_k)  (static weights, per-graph
        # per-head scalars; ChebNetDynamic.py:164-183)
        w = self.cheb_weight
        c = coeff  # [B, H, K]
        tx0 = heads
        out = c[:, :, 0, None, None] * (tx0 @ w[0])
        if self.k_order > 1:
            tx1 = torch.einsum("bmn,bhnd->bhmd", lhat, heads)
            out = out + c[:, :, 1, None, None] * (tx1 @ w[1])
            for k in range(2, self.k_order):
                tx2 = 2 * torch.einsum("bmn,bhnd->bhmd", lhat, tx1) - tx0
                out = out + c[:, :, k, None, None] * (tx2 @ w[k])
                tx0, tx1 = tx1, tx2
        return out + self.cheb_bias

    def arma_dynamic(self, heads, anorm, coeff):
        # ops/arma.py::arma_filter_dynamic twin (reference
        # ChebNetDynamic.py:201-358, T=1, relu, mean over K stacks)
        k = self.k_order
        a, bcoef = coeff[..., :k], coeff[..., k:]
        w_init = self.arma_init[None, None] * a[..., None, None]
        w_root = self.arma_root[None, None] * bcoef[..., None, None]
        xw = torch.einsum("bhnd,bhkde->bhkne", heads, w_init)
        prop = torch.einsum("bmn,bhkne->bhkme", anorm, xw)
        root = torch.einsum("bhnd,bhkde->bhkne", heads, w_root)
        out = F.relu(prop + root + self.arma_bias[None, None])
        return out.mean(dim=2)

    def forward(self, x, adj, node_mask, pe=None, lap_pe=None, degree=None):
        b, n, _ = x.shape
        out = self.embedding(x)
        if self.lap_pos_enc and lap_pe is not None:
            out = out + self.embedding_lap(lap_pe)
        if self.gnn_type == "ARMAConvDynamic":
            # gcn_norm WITHOUT self loops (ChebNetDynamic.py:302-304)
            pm = (node_mask[:, :, None] * node_mask[:, None, :])
            a = adj * pm
            deg = a.sum(-1)
            dis = torch.where(deg > 0, deg.clamp(min=1e-12).rsqrt(),
                              torch.zeros_like(deg))
            anorm = dis[:, :, None] * a * dis[:, None, :]
        else:
            lhat = cheb_scaled_laplacian_t(adj, node_mask)
        allout = None
        for i, layer in enumerate(self.layers):
            out, attn, out_each_head = layer(out, pe, node_mask, degree)
            if self.last_layer_filter and i + 1 != len(self.layers):
                continue
            coeff = self.coeff_head(attn, node_mask)
            heads = out_each_head.permute(0, 2, 1, 3)
            if self.gnn_type == "ARMAConvDynamic":
                filt = self.arma_dynamic(heads, anorm, coeff)
            elif self.scalar_mode:
                filt = self.cheb_scalar(heads, lhat, coeff)
            else:
                w = coeff.reshape(b, self.h, self.k_order, self.dh, self.dh)
                filt = self.cheb_dynamic(heads, lhat, w)
            filt = filt.permute(0, 2, 1, 3).reshape(b, n, -1)
            filt = filt * node_mask.unsqueeze(-1)
            allout = filt if allout is None else allout + filt
        out = self.linear_cat(torch.cat([out, allout], dim=-1))
        m = node_mask.unsqueeze(-1)
        pooled = (out * m).sum(1) / m.sum(1)
        return self.classifier(pooled)
