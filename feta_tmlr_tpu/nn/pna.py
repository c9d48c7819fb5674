"""PNA with LSPE, dense-batched.

Rebuild of /root/reference/LSPE/layers/pna_lspe_layer.py (+pna_utils.py) and
LSPE/nets/ZINC_graph_regression/pna_net.py: Principal Neighbourhood
Aggregation towers over edge-pretransformed messages with
{mean,max,min,std} aggregators x {identity,amplification,attenuation}
degree scalers, a decoupled positional channel p, tower mixing networks and
Whp/p_out fusion. DGL mailboxes map to masked dense [B, N, N, D] message
fields; degree bucketing becomes the per-node in-degree.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import MaskedBatchNorm
from feta_tmlr_tpu.nn.san import MLPReadout
from feta_tmlr_tpu.ops.masking import in_edge_mask, masked_mean, pair_mask
from feta_tmlr_tpu.ops.sparse_agg import (
    SparseEdges,
    edge_ids_from_dense,
    incidence_max,
    incidence_min,
    make_sparse_edges,
)

EPS = 1e-5


def _aggregate_sparse(msg, edges: SparseEdges, names: Sequence[str]):
    """Sparse twin of `_aggregate`: msg [B, E, F] -> concat aggs [B, N, *].

    Sums/means/std ride one-hot matmuls (f32 accumulation); max/min ride
    the incidence one-hot. Identical summands to the dense masked forms.
    """
    mf = edges.edge_mask.astype(msg.dtype)[..., None]
    msg_m = msg * mf
    deg = edges.deg
    d_safe = jnp.maximum(deg, 1.0)[..., None]
    sums = edges.segment_sum(msg_m)                        # [B,N,F] f32
    mean = sums / d_safe
    outs = []
    for name in names:
        if name == "mean":
            outs.append(mean)
        elif name == "sum":
            outs.append(sums)
        elif name == "max":
            outs.append(incidence_max(msg, edges))
        elif name == "min":
            outs.append(incidence_min(msg, edges))
        elif name in ("std", "var"):
            mean_sq = edges.segment_sum(msg_m * msg) / d_safe
            var = nn.relu(mean_sq - mean * mean)
            out = jnp.sqrt(var + EPS) if name == "std" else var
            outs.append(jnp.where(deg[..., None] > 0, out, 0.0))
        else:
            raise ValueError(f"unsupported aggregator {name!r}")
    return jnp.concatenate([o.astype(msg.dtype) for o in outs], axis=-1)


def _aggregate(msg, mask, deg, names: Sequence[str]):
    """msg [B,N(dst),N(src),D]; mask [B,N,N] real in-edges; deg [B,N].

    Returns concat of the requested aggregations over the src axis.
    Sums accumulate in f32 (under the bf16 compute policy the
    mean_sq - mean^2 cancellation would otherwise lose the variance);
    outputs return at msg's dtype."""
    m = mask[..., None].astype(msg.dtype)
    f32 = jnp.float32
    d_safe = jnp.maximum(deg, 1.0)[..., None].astype(f32)
    outs = []
    mean = (msg * m).sum(2, dtype=f32) / d_safe
    for name in names:
        if name == "mean":
            outs.append(mean)
        elif name == "sum":
            outs.append((msg * m).sum(2, dtype=f32))
        elif name == "max":
            outs.append(jnp.where(
                deg[..., None] > 0,
                jnp.where(m > 0, msg, -jnp.inf).max(2).astype(f32), 0.0))
        elif name == "min":
            outs.append(jnp.where(
                deg[..., None] > 0,
                jnp.where(m > 0, msg, jnp.inf).min(2).astype(f32), 0.0))
        elif name in ("std", "var"):
            mean_sq = (msg * msg * m).sum(2, dtype=f32) / d_safe
            var = nn.relu(mean_sq - mean * mean)
            out = jnp.sqrt(var + EPS) if name == "std" else var
            # zero-fill degree-0 nodes like DGL's update_all (otherwise
            # sqrt(EPS) leaks and the attenuation scaler amplifies it)
            outs.append(jnp.where(deg[..., None] > 0, out, 0.0))
        else:
            raise ValueError(f"unsupported aggregator {name!r}")
    return jnp.concatenate([o.astype(msg.dtype) for o in outs], axis=-1)


def _scale(agg, deg, names: Sequence[str], avg_d_log: float):
    logd = jnp.log(deg + 1.0)[..., None]
    outs = []
    for name in names:
        if name == "identity":
            outs.append(agg)
        elif name == "amplification":
            outs.append(agg * (logd / avg_d_log))
        elif name == "attenuation":
            outs.append(agg * (avg_d_log / jnp.maximum(logd, EPS)))
        else:
            raise ValueError(f"unsupported scaler {name!r}")
    return jnp.concatenate(outs, axis=-1)


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 1
    mid_activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = {"relu": nn.relu, "tanh": jnp.tanh}[self.mid_activation]
        for i in range(self.layers - 1):
            x = act(nn.Dense(self.hidden, name=f"fc_{i}")(x))
        return nn.Dense(self.out, name="fc_out")(x)


class _EdgeDense(nn.Module):
    """First pretransform Dense over cat(src, dst[, ef]), decomposed.

    The reference applies one Linear to the per-edge concatenation
    (pna_lspe_layer.py:30-33,44-51), which dense-batched would mean
    materializing a [B, N, N, 2d+de] field and a matmul over B*N^2 rows.
    Because the src/dst blocks of that input are rank-1 broadcasts along
    the dst/src axes, the kernel splits exactly: the src and dst blocks
    each multiply the [B, N, d] node tensor once (B*N rows) and
    broadcast-add into the [B, dst, src, F] message field; only the
    edge-feature block (if present) needs an N^2-row matmul. Parameter
    name/shape/init are identical to the nn.Dense it replaces, so
    checkpoints, twins and the param tree are unchanged. Outputs agree
    with the fused concat matmul to allclose (NOT bitwise — the split
    groups accumulations differently); equivalence is pinned for ef
    present/absent and pretrans_layers 1/2 by tests/test_pna.py."""

    features: int

    @nn.compact
    def __call__(self, x, ef, edges=None):
        dx = x.shape[-1]
        de = 0 if ef is None else ef.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * dx + de, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(x.dtype)
        src = x @ kernel[:dx]                      # varies along axis 2
        dst = x @ kernel[dx:2 * dx]                # varies along axis 1
        if edges is not None:
            # sparse: per-edge messages [B, E, F]; ef is [B, E, de]
            # aligned to (src, dst) — no swap needed. Gathers are one-hot
            # matmuls (sparse_agg.SparseEdges), so pad edges carry zeros
            # + bias; every consumer masks them
            out = (edges.gather_src(src).astype(x.dtype)
                   + edges.gather_dst(dst).astype(x.dtype)
                   + bias.astype(x.dtype))
            if ef is not None:
                out = out + ef.astype(x.dtype) @ kernel[2 * dx:]
            return out
        out = src[:, None, :, :] + dst[:, :, None, :] + bias.astype(x.dtype)
        if ef is not None:
            # ef arrives in [B, src, dst, de] layout; project then swap
            out = out + jnp.swapaxes(ef.astype(x.dtype) @ kernel[2 * dx:],
                                     1, 2)
        return out


class _EdgeMLP(nn.Module):
    """Pretransform MLP whose first layer is the decomposed _EdgeDense;
    later layers (pretrans_layers > 1) run on the [B, N, N, hidden]
    field like the reference's MLP. Param naming mirrors _MLP exactly."""

    hidden: int
    out: int
    layers: int = 1
    mid_activation: str = "relu"

    @nn.compact
    def __call__(self, x, ef, edges=None):
        act = {"relu": nn.relu, "tanh": jnp.tanh}[self.mid_activation]
        if self.layers == 1:
            return _EdgeDense(self.out, name="fc_out")(x, ef, edges)
        y = act(_EdgeDense(self.hidden, name="fc_0")(x, ef, edges))
        for i in range(1, self.layers - 1):
            y = act(nn.Dense(self.hidden, dtype=x.dtype,
                             name=f"fc_{i}")(y))
        return nn.Dense(self.out, dtype=x.dtype, name="fc_out")(y)


class PNATower(nn.Module):
    out_dim: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...]
    avg_d_log: float
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    # True selects the legacy materialized-concat pretransform (kept for
    # on-chip A/Bs); a module attribute so the choice is visible in the
    # module config and stable per instance (advisor round-3 finding:
    # the former trace-time os.environ read could silently diverge
    # across processes)
    edgecat: bool = False
    compute_dtype: object = None

    @nn.compact
    def __call__(self, h, p, e_field, real, node_mask, snorm_n,
                 deterministic=True, edges=None):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        # h [B,N,2d] (concat h,p slice), p [B,N,d]
        b, n, two_d = h.shape
        d = p.shape[-1]
        h_f32, p_f32 = h, p
        h, p = h.astype(cdt), p.astype(cdt)
        if e_field is not None:
            e_field = e_field.astype(cdt)
        if edges is not None:
            deg = edges.deg.astype(h.dtype)
        else:
            deg = real.astype(h.dtype).sum(2)          # in-degree per dst

        # pretransformation per edge (src j -> dst i): cat(src, dst, ef)
        if self.edgecat and edges is None:
            # legacy materialized-concat path, kept for on-chip A/Bs
            def edge_cat(x):
                return jnp.concatenate([
                    jnp.broadcast_to(x[:, None, :, :],
                                     (b, n, n, x.shape[-1])),
                    jnp.broadcast_to(x[:, :, None, :],
                                     (b, n, n, x.shape[-1])),
                ] + ([jnp.swapaxes(e_field, 1, 2)] if e_field is not None
                     else []), axis=-1)

            msg_h = _MLP(d, d, self.pretrans_layers, "relu",
                         name="pretrans_h")(edge_cat(h))
            msg_p = _MLP(d, d, self.pretrans_layers, "tanh",
                         name="pretrans_p")(edge_cat(p))
        else:
            msg_h = _EdgeMLP(d, d, self.pretrans_layers, "relu",
                             name="pretrans_h")(h, e_field, edges)
            msg_p = _EdgeMLP(d, d, self.pretrans_layers, "tanh",
                             name="pretrans_p")(p, e_field, edges)

        if edges is not None:
            agg_h = _scale(_aggregate_sparse(msg_h, edges, self.aggregators),
                           deg, self.scalers, self.avg_d_log)
            agg_p = _scale(_aggregate_sparse(msg_p, edges, self.aggregators),
                           deg, self.scalers, self.avg_d_log)
        else:
            agg_h = _scale(_aggregate(msg_h, real, deg, self.aggregators),
                           deg, self.scalers, self.avg_d_log)
            agg_p = _scale(_aggregate(msg_p, real, deg, self.aggregators),
                           deg, self.scalers, self.avg_d_log)

        h_out = _MLP(self.out_dim, self.out_dim, self.posttrans_layers,
                     "relu", name="posttrans_h")(
            jnp.concatenate([h_f32, agg_h.astype(h_f32.dtype)], -1))
        p_out = _MLP(self.out_dim, self.out_dim, self.posttrans_layers,
                     "tanh", name="posttrans_p")(
            jnp.concatenate([p_f32, agg_p.astype(p_f32.dtype)], -1))

        if self.graph_norm:
            h_out = h_out * snorm_n[..., None]
        if self.batch_norm:
            h_out = MaskedBatchNorm(name="batchnorm_h")(
                h_out, node_mask, use_running_average=deterministic)
        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)
        return drop(h_out), drop(p_out)


class PNALSPELayer(nn.Module):
    out_dim: int
    aggregators: Tuple[str, ...] = ("mean", "max", "min", "std")
    scalers: Tuple[str, ...] = ("identity", "amplification", "attenuation")
    avg_d_log: float = 1.0
    towers: int = 1
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    divide_input: bool = True
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    edgecat: bool = False
    compute_dtype: object = None
    # None = auto: run ALL towers as one nn.vmap'd PNATower (params
    # stacked [T, ...] under scope "towers") when divide_input holds.
    # The python tower loop issues ~(towers x channels x aggregator)
    # small kernels per layer and measured LAUNCH-bound on chip (the
    # dominant cost of the tier, BASELINE.md round 4); the vmapped form
    # batches every one of them across towers. vmap_towers=False keeps
    # the per-tower scopes tower_0..T-1 (the twin/checkpoint layout).
    vmap_towers: Optional[bool] = None

    @nn.compact
    def __call__(self, h, p, e_field, adj, node_mask, snorm_n,
                 deterministic=True, edges=None):
        b, n, d = h.shape
        real = (in_edge_mask(adj, node_mask)   # [dst, src] edge j->i
                if edges is None else None)
        residual = self.residual and d == self.out_dim
        h_in, p_in = h, p
        hp = jnp.concatenate([h, p], -1)
        t_in = d // self.towers if self.divide_input else d
        t_out = self.out_dim // self.towers
        vmap_towers = self.vmap_towers
        if vmap_towers is None:
            vmap_towers = self.divide_input and self.towers > 1
        tower_kw = dict(
            aggregators=self.aggregators, scalers=self.scalers,
            avg_d_log=self.avg_d_log, dropout=self.dropout,
            graph_norm=self.graph_norm, batch_norm=self.batch_norm,
            pretrans_layers=self.pretrans_layers,
            posttrans_layers=self.posttrans_layers,
            edgecat=self.edgecat, compute_dtype=self.compute_dtype)
        if vmap_towers and self.divide_input:
            tt = self.towers
            hp_t = hp.reshape(b, n, tt, 2 * t_in).transpose(2, 0, 1, 3)
            p_t = p.reshape(b, n, tt, t_in).transpose(2, 0, 1, 3)
            vtower = nn.vmap(
                PNATower,
                in_axes=(0, 0, None, None, None, None, None, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
            )(t_out, name="towers", **tower_kw)
            ho, po = vtower(hp_t, p_t, e_field, real, node_mask, snorm_n,
                            deterministic, edges)
            cat_h = ho.transpose(1, 2, 0, 3).reshape(b, n, -1)
            cat_p = po.transpose(1, 2, 0, 3).reshape(b, n, -1)
        else:
            h_outs, p_outs = [], []
            for t in range(self.towers):
                if self.divide_input:
                    h_slice = hp[..., t * 2 * t_in:(t + 1) * 2 * t_in]
                    p_slice = p[..., t * t_in:(t + 1) * t_in]
                else:
                    h_slice, p_slice = hp, p
                ho, po = PNATower(t_out, name=f"tower_{t}", **tower_kw)(
                    h_slice, p_slice, e_field, real, node_mask, snorm_n,
                    deterministic, edges=edges)
                h_outs.append(ho)
                p_outs.append(po)
            cat_h = jnp.concatenate(h_outs, -1)
            cat_p = jnp.concatenate(p_outs, -1)
        h_out = nn.leaky_relu(nn.Dense(self.out_dim,
                                       name="mixing_h")(cat_h))
        p_out = jnp.tanh(nn.Dense(self.out_dim, name="mixing_p")(cat_p))
        if residual:
            h_out = h_in + h_out
            p_out = p_in + p_out
        mask_f = node_mask.astype(h.dtype)[..., None]
        return h_out * mask_f, p_out * mask_f


class PNALSPENet(nn.Module):
    """PNA (+LSPE p channel) net for ZINC-style regression."""

    num_atom_type: int
    num_bond_type: int
    hidden_dim: int = 64
    out_dim: int = 64
    n_layers: int = 4
    pos_enc_dim: int = 20
    pe_init: str = "rand_walk"
    towers: int = 4
    aggregators: Tuple[str, ...] = ("mean", "max", "min", "std")
    scalers: Tuple[str, ...] = ("identity", "amplification", "attenuation")
    avg_d_log: float = 1.0
    dropout: float = 0.0
    in_feat_dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    edge_feat: bool = False
    # bond-embedding width (pna_net.py:39,61 embeds at edge_dim, not
    # hidden_dim); 0 keeps the old hidden_dim behavior
    edge_dim: int = 0
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    edgecat: bool = False
    readout: str = "mean"
    n_out: int = 1
    # optional between-layer GRU (pna_net.py:95-96,118-119: h_t =
    # GRU(input=h_pre_layer, hidden=h_layer_out), shared across layers,
    # skipped after the last layer)
    gru: bool = False
    # Sparse-COO towers (scatter/gather-free one-hot matmuls,
    # ops/sparse_agg.py) are OPT-IN (None = dense): unlike GatedGCN
    # (5.5x faster sparse, one message field per layer), PNA's
    # towers x {h,p} channels x aggregators structure issues ~60 tiny
    # segment ops per layer, and at canonical ZINC shapes the sparse
    # path measured launch-bound on chip (59.9 vs 18.8 ms dense,
    # 2026-08-19 — BASELINE.md). Sparse remains the memory-scaling
    # option for node counts where [B, N, N, *] mailboxes cannot fit.
    sparse_edges: Optional[bool] = None
    compute_dtype: object = None
    vmap_towers: Optional[bool] = None   # see PNALSPELayer

    categorical_input: bool = True
    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        from feta_tmlr_tpu.config import default_compute_dtype
        cdt = self.compute_dtype or default_compute_dtype()
        sparse = bool(self.sparse_edges)
        if sparse and (batch.edge_index is None or batch.in_edges is None):
            raise ValueError("sparse_edges=True needs a batch collated "
                             "with with_coo=True")
        if self.categorical_input:
            h = nn.Embed(self.num_atom_type, self.hidden_dim,
                         name="embedding_h")(batch.x.astype(jnp.int32))
        else:
            # TU tier: float feature vectors through a linear embedding
            h = nn.Dense(self.hidden_dim, name="embedding_h")(batch.x)
        h = nn.Dropout(self.in_feat_dropout)(h, deterministic=deterministic)
        edges = None
        if sparse:
            edges = make_sparse_edges(batch, dtype=cdt,
                                      with_incidence=True)
        e_field = None
        if self.edge_feat and batch.edge_type is not None:
            embed_e = nn.Embed(self.num_bond_type,
                               self.edge_dim or self.hidden_dim,
                               name="embedding_e")
            if sparse:
                e_field = embed_e(edge_ids_from_dense(
                    batch.edge_type.astype(jnp.int32), edges.src,
                    edges.dst))
            else:
                e_field = embed_e(batch.edge_type.astype(jnp.int32))
        if self.pe_init == "rand_walk":
            p = nn.Dense(self.hidden_dim, name="embedding_p")(batch.lap_pe)
        else:
            p = jnp.zeros_like(h)

        n_per = jnp.maximum(batch.node_mask.sum(-1, keepdims=True), 1)
        snorm_n = (batch.node_mask.astype(h.dtype)
                   / jnp.sqrt(n_per.astype(h.dtype)))

        gru_cell = (nn.GRUCell(features=self.hidden_dim, name="gru")
                    if self.gru else None)
        for i in range(self.n_layers):
            is_last = i + 1 == self.n_layers
            h_t, p = PNALSPELayer(
                out_dim=(self.out_dim if is_last else self.hidden_dim),
                aggregators=self.aggregators, scalers=self.scalers,
                avg_d_log=self.avg_d_log, towers=self.towers,
                dropout=self.dropout, graph_norm=self.graph_norm,
                batch_norm=self.batch_norm, residual=self.residual,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                edgecat=self.edgecat, compute_dtype=self.compute_dtype,
                vmap_towers=self.vmap_towers,
                name=f"layer_{i}")(h, p, e_field, batch.adj,
                                   batch.node_mask, snorm_n, deterministic,
                                   edges=edges)
            if gru_cell is not None and not is_last:
                # one GRU step per node: carry = the layer output,
                # input = the pre-layer features (pna_utils.py:345-360)
                h_t, _ = gru_cell(h_t, h)
                h_t = h_t * batch.node_mask.astype(h_t.dtype)[..., None]
            h = h_t

        if self.pe_init == "rand_walk":
            p = nn.Dense(self.pos_enc_dim, name="p_out")(p)
            h = nn.Dense(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], -1))

        if self.readout == "sum":
            hg = (h * batch.node_mask[..., None]).sum(1)
        elif self.readout == "max":
            hg = jnp.where(batch.node_mask[..., None], h,
                           jnp.finfo(h.dtype).min).max(1)
        else:
            hg = masked_mean(h, batch.node_mask, axis=1)
        return MLPReadout(self.n_out, name="mlp_readout")(hg)


def average_log_degree(graphs) -> float:
    """avg_d['log'] of the training set (pna_net.py net_params['avg_d'])."""
    import numpy as np
    logs = []
    for g in graphs:
        deg = np.zeros(g.num_nodes)
        np.add.at(deg, g.edge_index[1], 1.0)
        logs.extend(np.log(deg + 1.0))
    return float(np.mean(logs)) if logs else 1.0
