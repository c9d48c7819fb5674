"""Pure-torch twin of the PNA-LSPE tier (nn/pna.py).

Re-expresses /root/reference/LSPE/layers/pna_lspe_layer.py (+pna_utils.py)
semantics — per-edge pretransform MLP over cat(src, dst[, ef]),
{mean,max,min,std} aggregators x {identity,amplification,attenuation}
degree scalers, towers with divide_input, posttrans/mixing, decoupled p
channel, p_out/Whp fusion — independently in plain torch over dense
batches. Used for weight-shared logit parity (tests/test_parity_pna.py)
and as bench_tiers.py's CPU baseline for the tier.
"""

from __future__ import annotations

import torch
import torch.nn as tnn

from feta_tmlr_tpu.reference_twin.torch_gatedgcn import (
    TorchMaskedBN,
    masked_mean,
)

EPS = 1e-5


def aggregate(msg, mask, deg, names):
    m = mask.unsqueeze(-1).to(msg.dtype)
    d_safe = deg.clamp(min=1.0).unsqueeze(-1)
    mean = (msg * m).sum(2) / d_safe
    outs = []
    for name in names:
        if name == "mean":
            outs.append(mean)
        elif name == "sum":
            outs.append((msg * m).sum(2))
        elif name == "max":
            big = torch.where(m > 0, msg,
                              torch.full_like(msg, float("-inf")))
            outs.append(torch.where(deg.unsqueeze(-1) > 0, big.max(2).values,
                                    torch.zeros_like(mean)))
        elif name == "min":
            small = torch.where(m > 0, msg,
                                torch.full_like(msg, float("inf")))
            outs.append(torch.where(deg.unsqueeze(-1) > 0,
                                    small.min(2).values,
                                    torch.zeros_like(mean)))
        elif name in ("std", "var"):
            mean_sq = (msg * msg * m).sum(2) / d_safe
            var = torch.relu(mean_sq - mean * mean)
            out = torch.sqrt(var + EPS) if name == "std" else var
            outs.append(torch.where(deg.unsqueeze(-1) > 0, out,
                                    torch.zeros_like(out)))
        else:
            raise ValueError(name)
    return torch.cat(outs, -1)


def scale(agg, deg, names, avg_d_log):
    logd = torch.log(deg + 1.0).unsqueeze(-1)
    outs = []
    for name in names:
        if name == "identity":
            outs.append(agg)
        elif name == "amplification":
            outs.append(agg * (logd / avg_d_log))
        elif name == "attenuation":
            outs.append(agg * (avg_d_log / logd.clamp(min=EPS)))
        else:
            raise ValueError(name)
    return torch.cat(outs, -1)


class TorchMLP(tnn.Module):
    def __init__(self, in_dim, hidden, out, layers=1, act="relu"):
        super().__init__()
        self.act = torch.relu if act == "relu" else torch.tanh
        self.mid = tnn.ModuleList()
        d = in_dim
        for _ in range(layers - 1):
            self.mid.append(tnn.Linear(d, hidden))
            d = hidden
        self.fc_out = tnn.Linear(d, out)

    def forward(self, x):
        for fc in self.mid:
            x = self.act(fc(x))
        return self.fc_out(x)


class TorchPNATower(tnn.Module):
    def __init__(self, in_2d, in_d, de, out_dim, aggregators, scalers,
                 avg_d_log, pretrans_layers=1, posttrans_layers=1,
                 graph_norm=True, batch_norm=True):
        super().__init__()
        self.aggregators, self.scalers = aggregators, scalers
        self.avg_d_log = avg_d_log
        d = in_d
        self.pretrans_h = TorchMLP(2 * in_2d + de, d, d, pretrans_layers,
                                   "relu")
        self.pretrans_p = TorchMLP(2 * in_d + de, d, d, pretrans_layers,
                                   "tanh")
        f = len(aggregators) * len(scalers) * d
        self.posttrans_h = TorchMLP(in_2d + f, out_dim, out_dim,
                                    posttrans_layers, "relu")
        self.posttrans_p = TorchMLP(in_d + f, out_dim, out_dim,
                                    posttrans_layers, "tanh")
        self.graph_norm, self.batch_norm = graph_norm, batch_norm
        if batch_norm:
            self.bn_h = TorchMaskedBN(out_dim)

    def forward(self, h, p, e_field, real, node_mask, snorm_n):
        b, n, _ = h.shape
        deg = real.to(h.dtype).sum(2)

        def edge_cat(x):
            parts = [x[:, None, :, :].expand(b, n, n, x.shape[-1]),
                     x[:, :, None, :].expand(b, n, n, x.shape[-1])]
            if e_field is not None:
                parts.append(e_field.transpose(1, 2))
            return torch.cat(parts, -1)

        msg_h = self.pretrans_h(edge_cat(h))
        msg_p = self.pretrans_p(edge_cat(p))
        agg_h = scale(aggregate(msg_h, real, deg, self.aggregators),
                      deg, self.scalers, self.avg_d_log)
        agg_p = scale(aggregate(msg_p, real, deg, self.aggregators),
                      deg, self.scalers, self.avg_d_log)
        h_out = self.posttrans_h(torch.cat([h, agg_h], -1))
        p_out = self.posttrans_p(torch.cat([p, agg_p], -1))
        if self.graph_norm:
            h_out = h_out * snorm_n.unsqueeze(-1)
        if self.batch_norm:
            h_out = self.bn_h(h_out, node_mask)
        return h_out, p_out


class TorchPNALSPELayer(tnn.Module):
    def __init__(self, in_dim, out_dim, towers, de, aggregators, scalers,
                 avg_d_log, pretrans_layers=1, posttrans_layers=1,
                 residual=True):
        super().__init__()
        self.towers = towers
        self.t_in = in_dim // towers
        t_out = out_dim // towers
        self.tower_mods = tnn.ModuleList([
            TorchPNATower(2 * self.t_in, self.t_in, de, t_out, aggregators,
                          scalers, avg_d_log, pretrans_layers,
                          posttrans_layers)
            for _ in range(towers)])
        self.mixing_h = tnn.Linear(out_dim, out_dim)
        self.mixing_p = tnn.Linear(out_dim, out_dim)
        self.residual = residual
        self.out_dim = out_dim

    def forward(self, h, p, e_field, adj, node_mask, snorm_n):
        pm = node_mask[:, :, None] & node_mask[:, None, :]
        real = (adj.transpose(1, 2) > 0) & pm
        residual = self.residual and h.shape[-1] == self.out_dim
        h_in, p_in = h, p
        hp = torch.cat([h, p], -1)
        t_in = self.t_in
        h_outs, p_outs = [], []
        for t, tower in enumerate(self.tower_mods):
            h_slice = hp[..., t * 2 * t_in:(t + 1) * 2 * t_in]
            p_slice = p[..., t * t_in:(t + 1) * t_in]
            ho, po = tower(h_slice, p_slice, e_field, real, node_mask,
                           snorm_n)
            h_outs.append(ho)
            p_outs.append(po)
        h_out = torch.nn.functional.leaky_relu(
            self.mixing_h(torch.cat(h_outs, -1)))
        p_out = torch.tanh(self.mixing_p(torch.cat(p_outs, -1)))
        if residual:
            h_out, p_out = h_in + h_out, p_in + p_out
        mask_f = node_mask.unsqueeze(-1).to(h.dtype)
        return h_out * mask_f, p_out * mask_f


class TorchPNALSPENet(tnn.Module):
    """Twin of nn/pna.py::PNALSPENet (rand_walk PE)."""

    def __init__(self, num_atom_type, num_bond_type, hidden_dim, out_dim,
                 n_layers, pos_enc_dim, towers, avg_d_log, n_out=1,
                 aggregators=("mean", "max", "min", "std"),
                 scalers=("identity", "amplification", "attenuation"),
                 edge_feat=False, edge_dim=0, readout="sum"):
        super().__init__()
        self.embedding_h = tnn.Embedding(num_atom_type, hidden_dim)
        de = 0
        if edge_feat:
            de = edge_dim or hidden_dim
            self.embedding_e = tnn.Embedding(num_bond_type, de)
        self.edge_feat = edge_feat
        self.embedding_p = tnn.Linear(pos_enc_dim, hidden_dim)
        dims = [hidden_dim] * (n_layers - 1) + [out_dim]
        self.layers = tnn.ModuleList()
        in_d = hidden_dim
        for d in dims:
            self.layers.append(TorchPNALSPELayer(
                in_d, d, towers, de, aggregators, scalers, avg_d_log))
            in_d = d
        self.p_out = tnn.Linear(out_dim, pos_enc_dim)
        self.Whp = tnn.Linear(out_dim + pos_enc_dim, out_dim)
        self.readout_kind = readout
        self.readout = tnn.ModuleList(
            [tnn.Linear(out_dim, max(out_dim // 2, 1)),
             tnn.Linear(max(out_dim // 2, 1), max(out_dim // 4, 1))])
        self.fc_out = tnn.Linear(max(out_dim // 4, 1), n_out)

    def forward(self, x_ids, edge_type, adj, node_mask, rw_pe):
        h = self.embedding_h(x_ids)
        e_field = self.embedding_e(edge_type) if self.edge_feat else None
        p = self.embedding_p(rw_pe)
        n_per = node_mask.sum(-1, keepdim=True).clamp(min=1)
        snorm_n = node_mask.to(h.dtype) / n_per.to(h.dtype).sqrt()
        for lay in self.layers:
            h, p = lay(h, p, e_field, adj, node_mask, snorm_n)
        p = self.p_out(p)
        h = self.Whp(torch.cat([h, p], -1))
        if self.readout_kind == "sum":
            hg = (h * node_mask.unsqueeze(-1).to(h.dtype)).sum(1)
        else:
            hg = masked_mean(h, node_mask, dim=1)
        for fc in self.readout:
            hg = torch.relu(fc(hg))
        return self.fc_out(hg)
