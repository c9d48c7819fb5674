"""Pure-torch twin of the LSPE tier (GraphiTSpectraNet, rand_walk PE).

Tier-3 counterpart of `torch_model.py` (FeTA core) and `torch_san.py`
(SAN/LPE): re-expresses the reference's GraphiT-Spectra-LSPE semantics
(/root/reference/LSPE/layers/graphit_spectra_lspe_layer.py,
LSPE/nets/ZINC_graph_regression/graphit_spectra_net.py) independently in
plain torch over dense batches: dual h/p attention channels over
concat(h, p) / p, scores merged real-vs-fake BEFORE one exp clamp
(:377 — no gamma weighting in this tier), optional adaptive k_RW edge-PE
multiply, the FeTA coefficient-GCN -> scalar-coeff Chebyshev filter on
the h channel, tanh O_p positional update, p_out/Whp fusion, halving
readout. The reference's dead p-channel filter (:578-583 overwrite) is
skipped on both sides. tests/test_parity_lspe.py loads shared weights
and asserts logit + training-trajectory agreement.
"""

from __future__ import annotations

import math

import torch
import torch.nn as tnn

from feta_tmlr_tpu.reference_twin.torch_san import masked_mean


class TorchLSPEAttention(tnn.Module):
    def __init__(self, in_dim, heads, dh, edge_dim, adaptive_edge_pe):
        super().__init__()
        self.h, self.dh = heads, dh
        hd = heads * dh
        mk = lambda d: tnn.Linear(d, hd, bias=False)
        self.Q, self.K, self.V = mk(in_dim), mk(in_dim), mk(in_dim)
        self.Q2, self.K2 = mk(in_dim), mk(in_dim)
        self.E, self.E2 = mk(edge_dim), mk(edge_dim)
        self.adaptive_edge_pe = adaptive_edge_pe

    def forward(self, x, e_emb, adj, node_mask, k_rw):
        b, n, _ = x.shape
        hh, dh = self.h, self.dh
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

        e_r = self.E(e_emb).transpose(1, 2) if e_emb is not None else None
        e_f = self.E2(e_emb).transpose(1, 2) if e_emb is not None else None
        s = scores(split(self.Q(x)), split(self.K(x)), e_r)
        s2 = scores(split(self.Q2(x)), split(self.K2(x)), e_f)
        score = torch.where(real[:, None], s, s2)
        attn = torch.where(pm[:, None],
                           torch.exp(score.clamp(-5, 5)),
                           torch.zeros_like(score))
        if self.adaptive_edge_pe and k_rw is not None:
            attn = attn * k_rw[:, None]
        v = split(self.V(x))
        wv = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = wv / (attn.sum(-1, keepdim=True) + 1e-6)
        out = out.permute(0, 2, 1, 3).reshape(b, n, hh * dh)
        mask_f = node_mask.unsqueeze(-1).to(out.dtype)
        return out * mask_f, attn, pm.to(out.dtype)


class TorchLSPELayer(tnn.Module):
    def __init__(self, in_dim, out_dim, heads, k_order, edge_dim,
                 adaptive_edge_pe):
        super().__init__()
        self.heads, self.k = heads, k_order
        self.dh = out_dim // heads
        self.out_dim = out_dim
        self.attention_h = TorchLSPEAttention(
            2 * in_dim, heads, self.dh, edge_dim, adaptive_edge_pe)
        self.attention_p = TorchLSPEAttention(
            in_dim, heads, self.dh, edge_dim, adaptive_edge_pe)
        self.gcn_linear = tnn.Linear(k_order, k_order)
        self.ffn_filter_coeff = tnn.Linear(k_order, k_order)
        self.cheb_weight = tnn.Parameter(
            torch.zeros(k_order, self.dh, self.dh))
        self.cheb_bias = tnn.Parameter(torch.zeros(self.dh))
        self.filt_linear = tnn.Linear(self.dh, self.dh)
        self.O_h = tnn.Linear(out_dim, out_dim)
        self.O_p = tnn.Linear(out_dim, out_dim)
        self.ffn1 = tnn.Linear(out_dim, 2 * out_dim)
        self.ffn2 = tnn.Linear(2 * out_dim, out_dim)
        self.norm1 = tnn.LayerNorm(out_dim, eps=1e-5)
        self.norm2 = tnn.LayerNorm(out_dim, eps=1e-5)

    def forward(self, h, p, e_emb, adj, node_mask, k_rw):
        b, n, _ = h.shape
        h_in1, p_in1 = h, p
        h_attn, attn, struct = self.attention_h(
            torch.cat([h, p], -1), e_emb, adj, node_mask, k_rw)

        a = attn.detach()
        ones = torch.ones(a.shape[:3] + (self.k,), dtype=a.dtype)
        agg = torch.einsum("bhij,bhjk->bhik", a, ones)
        hgc = torch.tanh(self.gcn_linear(agg))
        coeff = self.ffn_filter_coeff(
            masked_mean(hgc, node_mask[:, None, :], dim=2))

        deg = struct.sum(-1).clamp(min=1.0)
        dis = deg.pow(-0.5)
        lhat = -(dis[:, :, None] * struct * dis[:, None, :])

        heads = h_attn.reshape(b, n, self.heads, self.dh) \
            .permute(0, 2, 1, 3)

        def apply_k(tx, k):
            return torch.einsum(
                "bhnd,de->bhne",
                tx * coeff[..., k][:, :, None, None], self.cheb_weight[k])

        tx_prev = heads
        out = apply_k(tx_prev, 0)
        if self.k > 1:
            tx_cur = torch.einsum("bmn,bhnd->bhmd", lhat, heads)
            out = out + apply_k(tx_cur, 1)
            for k in range(2, self.k):
                tx_next = 2.0 * torch.einsum("bmn,bhnd->bhmd", lhat,
                                             tx_cur) - tx_prev
                out = out + apply_k(tx_next, k)
                tx_prev, tx_cur = tx_cur, tx_next
        filt = self.filt_linear(torch.tanh(out + self.cheb_bias))
        filt = filt.permute(0, 2, 1, 3).reshape(b, n, self.out_dim)
        h = h_attn + filt

        h = self.O_h(h)
        if h_in1.shape[-1] == self.out_dim:
            h = h_in1 + h
        h = self.norm1(h)
        h_in2 = h
        h = self.norm2(h_in2 + self.ffn2(torch.relu(self.ffn1(h))))

        p_attn, _, _ = self.attention_p(p, e_emb, adj, node_mask, k_rw)
        p = torch.tanh(self.O_p(p_attn))
        if p_in1.shape[-1] == self.out_dim:
            p = p_in1 + p
        mask_f = node_mask.unsqueeze(-1).to(h.dtype)
        return h * mask_f, p * mask_f


class TorchGraphiTSpectraNet(tnn.Module):
    def __init__(self, num_atom_type, num_bond_type, hidden_dim, out_dim,
                 n_heads, n_layers, pos_enc_dim, filter_order, n_out=1,
                 adaptive_edge_pe=False):
        super().__init__()
        self.embedding_h = tnn.Embedding(num_atom_type, hidden_dim)
        self.embedding_e = tnn.Embedding(num_bond_type, hidden_dim)
        self.embedding_p = tnn.Linear(pos_enc_dim, hidden_dim)
        dims = [hidden_dim] * (n_layers - 1) + [out_dim]
        self.layers = tnn.ModuleList()
        in_d = hidden_dim
        for d in dims:
            self.layers.append(TorchLSPELayer(
                in_d, d, n_heads, filter_order, hidden_dim,
                adaptive_edge_pe))
            in_d = d
        self.p_out = tnn.Linear(out_dim, pos_enc_dim)
        self.Whp = tnn.Linear(out_dim + pos_enc_dim, out_dim)
        self.readout = tnn.ModuleList(
            [tnn.Linear(out_dim, max(out_dim // 2, 1)),
             tnn.Linear(max(out_dim // 2, 1), max(out_dim // 4, 1))])
        self.fc_out = tnn.Linear(max(out_dim // 4, 1), n_out)

    def forward(self, x_ids, edge_type, adj, node_mask, rwpe, k_rw=None):
        h = self.embedding_h(x_ids)
        e_emb = self.embedding_e(edge_type)
        p = self.embedding_p(rwpe)
        for lay in self.layers:
            h, p = lay(h, p, e_emb, adj, node_mask, k_rw)
        p = self.p_out(p)
        h = self.Whp(torch.cat([h, p], -1))
        hg = masked_mean(h, node_mask, dim=1)
        for fc in self.readout:
            hg = torch.relu(fc(hg))
        return self.fc_out(hg)
