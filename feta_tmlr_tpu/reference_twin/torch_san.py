"""Pure-torch twin of the SAN/LPE tier (SANNodeSpectra).

Counterpart of `reference_twin/torch_model.py` for tier 2: the actual
reference stack (LPE/, DGL) cannot run here, so this twin re-expresses
its documented semantics — gamma-weighted full-graph attention with
exp-clamped scores and wV/z normalization
(/root/reference/LPE/layers/graph_transformer_spectra_layer.py:226-243,
315-327, 364), the unnormalized coefficient GCN (:25-47, :482-520), the
scalar-coefficient ChebLayer over the structure Laplacian with degree
clip(1) (:119-201), the learned eigen-PE transformer
(LPE/nets/ZINC_graph_regression/SAN_NodeSpectra.py:48-90), and the
halving MLP readout — independently in plain torch over dense batches.
Loading identical weights into this twin and the JAX `nn/san.py` stack
and comparing logits + training trajectories validates the whole tier
(tests/test_parity_san.py).
"""

from __future__ import annotations

import math

import torch
import torch.nn as tnn

NEG = -1e30


def masked_mean(x, mask, dim):
    m = mask.to(x.dtype).unsqueeze(-1)
    return (x * m).sum(dim) / m.sum(dim).clamp(min=1e-9)


class TorchFreqLayer(tnn.Module):
    """torch twin of FreqTransformer._encoder_layer (nn/san.py)."""

    def __init__(self, d, heads, ff_dim):
        super().__init__()
        self.h = heads
        self.qkv = tnn.Linear(d, 3 * d)
        self.proj = tnn.Linear(d, d)
        self.ff1 = tnn.Linear(d, ff_dim)
        self.ff2 = tnn.Linear(ff_dim, d)
        self.n1 = tnn.LayerNorm(d, eps=1e-5)
        self.n2 = tnn.LayerNorm(d, eps=1e-5)

    def forward(self, x, mask):
        s, m, d = x.shape
        hn, dh = self.h, d // self.h
        q, k, v = self.qkv(x).chunk(3, -1)
        shp = (s, m, hn, dh)
        q, k, v = (t.reshape(shp).permute(0, 2, 1, 3) for t in (q, k, v))
        sc = torch.einsum("shmd,shnd->shmn", q, k) / math.sqrt(dh)
        sc = sc.masked_fill(~mask[:, None, None, :], NEG)
        p = torch.softmax(sc, -1)
        p = p * mask[:, None, :, None].to(p.dtype)
        out = torch.einsum("shmn,shnd->shmd", p, v)
        out = out.permute(0, 2, 1, 3).reshape(s, m, d)
        x = self.n1(x + self.proj(out))
        ff = self.ff2(torch.relu(self.ff1(x)))
        return self.n2(x + ff)


class TorchLPE(tnn.Module):
    """torch twin of LPETransformer + FreqTransformer."""

    def __init__(self, lpe_dim, lpe_heads, lpe_layers, ff_dim=2048):
        super().__init__()
        self.linear_A = tnn.Linear(2, lpe_dim)
        self.layers = tnn.ModuleList(
            [TorchFreqLayer(lpe_dim, lpe_heads, ff_dim)
             for _ in range(lpe_layers)])

    def forward(self, eigvecs, eigvals, node_mask):
        b, n, m = eigvecs.shape
        vals = eigvals[:, None, :].expand(b, n, m)
        tokens = torch.stack([eigvecs, vals], -1)          # [B,N,M,2]
        freq_mask = ~torch.isnan(tokens[..., 0])
        tokens = torch.nan_to_num(tokens, nan=0.0)
        x = self.linear_A(tokens.reshape(b * n, m, 2))
        fm = freq_mask.reshape(b * n, m)
        for lay in self.layers:
            x = lay(x, fm)
        x = x * fm.unsqueeze(-1).to(x.dtype)
        pos = x.sum(1).reshape(b, n, -1)
        return pos * node_mask.unsqueeze(-1).to(pos.dtype)


class TorchSANLayer(tnn.Module):
    """torch twin of SANSpectraLayer (spectra=True, LayerNorm)."""

    def __init__(self, in_dim, out_dim, heads, gamma, k_order,
                 edge_features=True):
        super().__init__()
        self.heads, self.gamma, self.k = heads, gamma, k_order
        self.dh = out_dim // heads
        hd = heads * self.dh
        mk = lambda: tnn.Linear(in_dim, hd, bias=False)
        self.Q, self.K, self.V = mk(), mk(), mk()
        self.Q2, self.K2 = mk(), mk()
        self.edge_features = edge_features
        if edge_features:
            self.E, self.E2 = mk(), mk()
        self.gcn_linear = tnn.Linear(k_order, k_order)
        self.ffn_filter_coeff = tnn.Linear(k_order, k_order)
        self.cheb_weight = tnn.Parameter(
            torch.zeros(k_order, self.dh, self.dh))
        self.cheb_bias = tnn.Parameter(torch.zeros(self.dh))
        self.filt_linear = tnn.Linear(self.dh, self.dh)
        self.O_h = tnn.Linear(out_dim, out_dim)
        self.ffn1 = tnn.Linear(out_dim, 2 * out_dim)
        self.ffn2 = tnn.Linear(2 * out_dim, out_dim)
        self.norm1 = tnn.LayerNorm(out_dim, eps=1e-5)
        self.norm2 = tnn.LayerNorm(out_dim, eps=1e-5)
        self.out_dim = out_dim

    def _attention(self, h, e_emb, adj, node_mask):
        b, n, _ = h.shape
        hh, dh = self.heads, self.dh
        split = lambda t: t.reshape(b, n, hh, dh).permute(0, 2, 1, 3)
        pm = (node_mask[:, :, None] & node_mask[:, None, :]) \
            & ~torch.eye(n, dtype=torch.bool)[None]
        real = (adj > 0) & pm

        def scores(qm, km, em):
            prod = torch.einsum("bhid,bhjd->bhijd", qm, km)
            if em is not None:
                prod = prod * em.reshape(b, n, n, hh, dh) \
                    .permute(0, 3, 1, 2, 4)
            return prod.sum(-1) / math.sqrt(dh)

        e_r = self.E(e_emb).transpose(1, 2) if (self.edge_features and
                                                e_emb is not None) else None
        e_f = self.E2(e_emb).transpose(1, 2) if (self.edge_features and
                                                 e_emb is not None) else None
        s_real = scores(split(self.Q(h)), split(self.K(h)), e_r)
        s_fake = scores(split(self.Q2(h)), split(self.K2(h)), e_f)
        g = self.gamma
        w_real = torch.exp(s_real.clamp(-5, 5)) / (g + 1.0)
        w_fake = g * torch.exp(s_fake.clamp(-5, 5)) / (g + 1.0)
        attn = torch.where(real[:, None], w_real,
                           torch.where(pm[:, None], w_fake,
                                       torch.zeros_like(w_fake)))
        v = split(self.V(h))
        wv = torch.einsum("bhij,bhjd->bhid", attn, v)
        h_out = wv / (attn.sum(-1, keepdim=True) + 1e-6)
        h_out = h_out.permute(0, 2, 1, 3).reshape(b, n, hh * dh)
        mask_f = node_mask.unsqueeze(-1).to(h.dtype)
        return h_out * mask_f, attn, pm.to(h.dtype)

    def forward(self, h, e_emb, adj, node_mask):
        b, n, _ = h.shape
        h_in1 = h
        h_attn, attn, struct = self._attention(h, e_emb, adj, node_mask)

        # coefficient head on detached attention
        a = attn.detach()
        ones = torch.ones(a.shape[:3] + (self.k,), dtype=a.dtype)
        agg = torch.einsum("bhij,bhjk->bhik", a, ones)
        hgc = torch.tanh(self.gcn_linear(agg))
        coeff = self.ffn_filter_coeff(
            masked_mean(hgc, node_mask[:, None, :], dim=2))   # [B,H,K]

        # structure Laplacian: -D_clip^{-1/2} A D_clip^{-1/2}, no diag
        pmf = struct
        deg = pmf.sum(-1).clamp(min=1.0)
        dis = deg.pow(-0.5)
        lhat = -(dis[:, :, None] * pmf * dis[:, None, :])

        heads = h_attn.reshape(b, n, self.heads, self.dh) \
            .permute(0, 2, 1, 3)
        tx_prev = heads

        # Chebyshev recurrence with per-(graph, head) scalar coeffs
        def apply_k(tx, k):
            return torch.einsum("bhnd,de->bhne", tx * coeff[..., k][
                :, :, None, None], self.cheb_weight[k])
        out = apply_k(tx_prev, 0)
        if self.k > 1:
            tx_cur = torch.einsum("bmn,bhnd->bhmd", lhat, heads)
            out = out + apply_k(tx_cur, 1)
            for k in range(2, self.k):
                tx_next = 2.0 * torch.einsum("bmn,bhnd->bhmd", lhat,
                                             tx_cur) - tx_prev
                out = out + apply_k(tx_next, k)
                tx_prev, tx_cur = tx_cur, tx_next
        filt = out + self.cheb_bias
        filt = self.filt_linear(torch.tanh(filt))
        filt = filt.permute(0, 2, 1, 3).reshape(b, n, self.out_dim)
        h = h_attn + filt

        h = self.O_h(h)
        if h_in1.shape[-1] == self.out_dim:
            h = h_in1 + h
        h = self.norm1(h)
        h_in2 = h
        ff = self.ffn2(torch.relu(self.ffn1(h)))
        h = self.norm2(h_in2 + ff)
        return h * node_mask.unsqueeze(-1).to(h.dtype)


class TorchSANNodeSpectra(tnn.Module):
    """torch twin of nn/san.py::SANNodeSpectra (LayerNorm config)."""

    def __init__(self, num_atom_type, num_bond_type, hidden_dim, out_dim,
                 n_heads, n_layers, lpe_dim, lpe_heads, lpe_layers,
                 gamma, filter_order, n_out=1, lpe_ff_dim=2048,
                 node_level=False, categorical_input=True, in_feat_dim=0,
                 edge_features=True):
        super().__init__()
        if categorical_input:
            self.embedding_h = tnn.Embedding(num_atom_type,
                                             hidden_dim - lpe_dim)
        else:
            # PATTERN/SBM tier: float features through a Linear embedding
            self.embedding_h = tnn.Linear(in_feat_dim,
                                          hidden_dim - lpe_dim)
        self.categorical_input = categorical_input
        self.edge_features = edge_features
        if edge_features:
            self.embedding_e = tnn.Embedding(num_bond_type, hidden_dim)
        self.pe = TorchLPE(lpe_dim, lpe_heads, lpe_layers, lpe_ff_dim)
        dims = [hidden_dim] * (n_layers - 1) + [out_dim]
        self.layers = tnn.ModuleList()
        in_d = hidden_dim
        for d in dims:
            self.layers.append(TorchSANLayer(in_d, d, n_heads, gamma,
                                             filter_order,
                                             edge_features=edge_features))
            in_d = d
        self.node_level = node_level
        self.readout = tnn.ModuleList(
            [tnn.Linear(out_dim, max(out_dim // 2, 1)),
             tnn.Linear(max(out_dim // 2, 1), max(out_dim // 4, 1))])
        self.fc_out = tnn.Linear(max(out_dim // 4, 1), n_out)

    def forward(self, x, edge_type, adj, node_mask, eigvecs, eigvals):
        h = self.embedding_h(x)
        e_emb = (self.embedding_e(edge_type) if self.edge_features
                 else None)
        pos = self.pe(eigvecs, eigvals, node_mask)
        h = torch.cat([h, pos], -1)
        for lay in self.layers:
            h = lay(h, e_emb, adj, node_mask)
        hg = h if self.node_level else masked_mean(h, node_mask, dim=1)
        for fc in self.readout:
            hg = torch.relu(fc(hg))
        return self.fc_out(hg)
