"""Pure-torch twin of the GatedGCN-LSPE tier (nn/gatedgcn.py).

The actual reference stack (LSPE/, DGL) cannot run here, so this twin
re-expresses its documented semantics — the gated edge feature chain
hat_eta = B1 h_src + B2 h_dst + B3 e, sigmoid-gated sum aggregation with
the 1e-6 denominator, decoupled p channel, graph-size norm, BN, residuals
(/root/reference/LSPE/layers/gatedgcn_lspe_layer.py:55-131) and the
p_out/Whp fusion of gatedgcn_net.py — independently in plain torch over
dense batches. Loading identical weights into this twin and the JAX net
validates the tier (tests/test_parity_gatedgcn.py); bench_tiers.py times
it as the tier's CPU baseline.
"""

from __future__ import annotations

import torch
import torch.nn as tnn


def masked_mean(x, mask, dim):
    m = mask.to(x.dtype).unsqueeze(-1)
    return (x * m).sum(dim) / m.sum(dim).clamp(min=1e-9)


class TorchMaskedBN(tnn.Module):
    """Twin of nn/layers.py::MaskedBatchNorm (stats over valid entries)."""

    def __init__(self, d, momentum=0.9, eps=1e-5):
        super().__init__()
        self.scale = tnn.Parameter(torch.ones(d))
        self.bias = tnn.Parameter(torch.zeros(d))
        self.register_buffer("mean", torch.zeros(d))
        self.register_buffer("var", torch.ones(d))
        self.momentum, self.eps = momentum, eps

    def forward(self, x, mask):
        if self.training:
            m = mask.to(x.dtype).unsqueeze(-1)
            cnt = m.sum().clamp(min=1.0)
            mean = (x * m).sum(dim=(0, 1)) / cnt
            var = (((x - mean) ** 2) * m).sum(dim=(0, 1)) / cnt
            with torch.no_grad():
                self.mean.mul_(self.momentum).add_(
                    (1 - self.momentum) * mean)
                self.var.mul_(self.momentum).add_((1 - self.momentum) * var)
        else:
            mean, var = self.mean, self.var
        return (x - mean) * torch.rsqrt(var + self.eps) \
            * self.scale + self.bias


class TorchGatedGCNLSPELayer(tnn.Module):
    def __init__(self, in_dim, out_dim, batch_norm=True, residual=True):
        super().__init__()
        self.A1 = tnn.Linear(2 * in_dim, out_dim)
        self.A2 = tnn.Linear(2 * in_dim, out_dim)
        self.B1 = tnn.Linear(in_dim, out_dim)
        self.B2 = tnn.Linear(in_dim, out_dim)
        self.B3 = tnn.Linear(in_dim, out_dim)
        self.C1 = tnn.Linear(in_dim, out_dim)
        self.C2 = tnn.Linear(in_dim, out_dim)
        self.batch_norm = batch_norm
        if batch_norm:
            self.bn_h = TorchMaskedBN(out_dim)
            self.bn_e = TorchMaskedBN(out_dim)
        self.residual = residual
        self.out_dim = out_dim

    def forward(self, h, p, e, adj, node_mask, snorm_n):
        b, n, _ = h.shape
        pm = node_mask[:, :, None] & node_mask[:, None, :]
        real = ((adj.transpose(1, 2) > 0) & pm).to(h.dtype)
        residual = self.residual and h.shape[-1] == self.out_dim
        h_in, p_in, e_in = h, p, e

        hp = torch.cat([h, p], -1)
        a1, a2 = self.A1(hp), self.A2(hp)
        b1, b2, b3 = self.B1(h), self.B2(h), self.B3(e)
        c1, c2 = self.C1(p), self.C2(p)

        hat_eta = (b1[:, None, :, :] + b2[:, :, None, :]
                   + b3.transpose(1, 2))
        sigma = torch.sigmoid(hat_eta) * real.unsqueeze(-1)
        denom = sigma.sum(dim=2, keepdim=True) + 1e-6
        eta = sigma / denom
        h_new = a1 + torch.einsum("bijd,bjd->bid", eta, a2)
        p_new = c1 + torch.einsum("bijd,bjd->bid", eta, c2)
        e_new = hat_eta.transpose(1, 2)

        h_new = h_new * snorm_n.unsqueeze(-1)
        if self.batch_norm:
            h_new = self.bn_h(h_new, node_mask)
            e_new = self.bn_e(
                e_new.reshape(b, n * n, -1),
                (real > 0).reshape(b, n * n)).reshape(b, n, n, -1)
        h_new = torch.relu(h_new)
        e_new = torch.relu(e_new)
        p_new = torch.tanh(p_new)
        if residual:
            h_new, p_new, e_new = h_in + h_new, p_in + p_new, e_in + e_new
        mask_f = node_mask.unsqueeze(-1).to(h.dtype)
        return (h_new * mask_f, p_new * mask_f,
                e_new * real.unsqueeze(-1))


class TorchGatedGCNLSPENet(tnn.Module):
    """Twin of nn/gatedgcn.py::GatedGCNLSPENet (rand_walk PE)."""

    def __init__(self, num_atom_type, num_bond_type, hidden_dim, out_dim,
                 n_layers, pos_enc_dim, n_out=1, batch_norm=True):
        super().__init__()
        self.embedding_h = tnn.Embedding(num_atom_type, hidden_dim)
        self.embedding_e = tnn.Embedding(num_bond_type, hidden_dim)
        self.embedding_p = tnn.Linear(pos_enc_dim, hidden_dim)
        dims = [hidden_dim] * (n_layers - 1) + [out_dim]
        self.layers = tnn.ModuleList()
        in_d = hidden_dim
        for d in dims:
            self.layers.append(
                TorchGatedGCNLSPELayer(in_d, d, batch_norm=batch_norm))
            in_d = d
        self.p_out = tnn.Linear(out_dim, pos_enc_dim)
        self.Whp = tnn.Linear(out_dim + pos_enc_dim, out_dim)
        self.readout = tnn.ModuleList(
            [tnn.Linear(out_dim, max(out_dim // 2, 1)),
             tnn.Linear(max(out_dim // 2, 1), max(out_dim // 4, 1))])
        self.fc_out = tnn.Linear(max(out_dim // 4, 1), n_out)

    def forward(self, x_ids, edge_type, adj, node_mask, rw_pe):
        h = self.embedding_h(x_ids)
        e = self.embedding_e(edge_type)
        p = self.embedding_p(rw_pe)
        n_per = node_mask.sum(-1, keepdim=True).clamp(min=1)
        snorm_n = node_mask.to(h.dtype) / n_per.to(h.dtype).sqrt()
        for lay in self.layers:
            h, p, e = lay(h, p, e, adj, node_mask, snorm_n)
        p = self.p_out(p)
        h = self.Whp(torch.cat([h, p], -1))
        hg = masked_mean(h, node_mask, dim=1)
        for fc in self.readout:
            hg = torch.relu(fc(hg))
        return self.fc_out(hg)
