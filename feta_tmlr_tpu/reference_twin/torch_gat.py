"""Pure-torch twin of the GATFeTA tier (nn/gat.py).

Re-expresses /root/reference/LPE/layers/gat_feta_layer.py semantics —
DGL-style GATConv (LeakyReLU(a_src.Wh_j + a_dst.Wh_i) softmaxed over real
in-edges, get_attention=True) followed by the FeTA coefficient-GCN +
scalar-coefficient Chebyshev filter — independently in plain torch over
dense batches. Used for weight-shared logit parity
(tests/test_parity_gat.py) and as bench_tiers.py's CPU baseline.
"""

from __future__ import annotations

import torch
import torch.nn as tnn

from feta_tmlr_tpu.reference_twin.torch_gatedgcn import (
    TorchMaskedBN,
    masked_mean,
)

NEG = -1e30


class TorchGATFeTALayer(tnn.Module):
    def __init__(self, in_dim, out_dim, heads, k_order, batch_norm=True,
                 residual=True, negative_slope=0.2):
        super().__init__()
        self.heads, self.dh, self.k = heads, out_dim, k_order
        self.fc = tnn.Linear(in_dim, heads * out_dim, bias=False)
        self.attn_l = tnn.Parameter(torch.zeros(heads, out_dim))
        self.attn_r = tnn.Parameter(torch.zeros(heads, out_dim))
        self.slope = negative_slope
        self.gcn_linear = tnn.Linear(k_order, k_order)
        self.ffn_filter_coeff = tnn.Linear(k_order, k_order)
        self.cheb_weight = tnn.Parameter(
            torch.zeros(k_order, out_dim, out_dim))
        self.cheb_bias = tnn.Parameter(torch.zeros(out_dim))
        self.filt_linear = tnn.Linear(out_dim, out_dim)
        self.batch_norm = batch_norm
        if batch_norm:
            self.bn_h = TorchMaskedBN(heads * out_dim)
        self.residual = residual

    def forward(self, h, adj, node_mask):
        b, n, _ = h.shape
        hh, dh = self.heads, self.dh
        h_in = h
        feat = self.fc(h).reshape(b, n, hh, dh)
        el = torch.einsum("bnhd,hd->bnh", feat, self.attn_l)   # src
        er = torch.einsum("bnhd,hd->bnh", feat, self.attn_r)   # dst
        scores = torch.nn.functional.leaky_relu(
            el[:, None, :, :].permute(0, 3, 1, 2)
            + er[:, :, None, :].permute(0, 3, 1, 2), self.slope)
        pm = node_mask[:, :, None] & node_mask[:, None, :]
        real = (adj.transpose(1, 2) > 0) & pm
        scores = torch.where(real[:, None], scores,
                             torch.full_like(scores, NEG))
        attn = torch.softmax(scores, -1) * real[:, None].to(scores.dtype)
        heads_out = torch.einsum("bhij,bjhd->bihd", attn, feat)

        # coefficient head on detached attention (A @ ones == row-sum)
        a = attn.detach()
        agg = a.sum(-1).unsqueeze(-1).expand(b, hh, n, self.k)
        hgc = torch.tanh(self.gcn_linear(agg))
        coeff = self.ffn_filter_coeff(
            masked_mean(hgc, node_mask[:, None, :], dim=2))    # [B,H,K]

        # structure Laplacian over the REAL graph, degree clip(1)
        struct = real.to(h.dtype)
        deg = struct.sum(-1).clamp(min=1.0)
        dis = deg.pow(-0.5)
        lhat = -(dis[:, :, None] * struct * dis[:, None, :])

        heads_t = heads_out.permute(0, 2, 1, 3)                # [B,H,N,dh]
        tx_prev = heads_t

        def apply_k(tx, k):
            return torch.einsum(
                "bhnd,de->bhne",
                tx * coeff[..., k][:, :, None, None], self.cheb_weight[k])

        out = apply_k(tx_prev, 0)
        if self.k > 1:
            tx_cur = torch.einsum("bmn,bhnd->bhmd", lhat, heads_t)
            out = out + apply_k(tx_cur, 1)
            for k in range(2, self.k):
                tx_next = 2.0 * torch.einsum("bmn,bhnd->bhmd", lhat,
                                             tx_cur) - tx_prev
                out = out + apply_k(tx_next, k)
                tx_prev, tx_cur = tx_cur, tx_next
        filt = self.filt_linear(torch.tanh(out + self.cheb_bias))
        filt = filt.permute(0, 2, 1, 3).reshape(b, n, -1)

        h = heads_out.reshape(b, n, -1) + filt
        if self.batch_norm:
            h = self.bn_h(h, node_mask)
        h = torch.nn.functional.elu(h)
        if self.residual and h_in.shape[-1] == h.shape[-1]:
            h = h_in + h
        return h * node_mask.unsqueeze(-1).to(h.dtype)


class TorchGATFeTANet(tnn.Module):
    """Twin of nn/gat.py::GATFeTANet."""

    def __init__(self, num_atom_type, hidden_dim, out_dim, num_heads,
                 n_layers, filter_order, n_out=1):
        super().__init__()
        self.embedding_h = tnn.Embedding(num_atom_type,
                                         hidden_dim * num_heads)
        self.layers = tnn.ModuleList()
        in_d = hidden_dim * num_heads
        for _ in range(n_layers - 1):
            self.layers.append(TorchGATFeTALayer(
                in_d, hidden_dim, num_heads, filter_order))
            in_d = hidden_dim * num_heads
        self.layers.append(TorchGATFeTALayer(
            in_d, out_dim, 1, filter_order))
        self.readout = tnn.ModuleList(
            [tnn.Linear(out_dim, max(out_dim // 2, 1)),
             tnn.Linear(max(out_dim // 2, 1), max(out_dim // 4, 1))])
        self.fc_out = tnn.Linear(max(out_dim // 4, 1), n_out)

    def forward(self, x_ids, adj, node_mask):
        h = self.embedding_h(x_ids)
        for lay in self.layers:
            h = lay(h, adj, node_mask)
        hg = masked_mean(h, node_mask, dim=1)
        for fc in self.readout:
            hg = torch.relu(fc(hg))
        return self.fc_out(hg)
