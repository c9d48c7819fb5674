"""Multi-graph batches of node-sharded FeTA graphs (2-D data x nodes mesh).

`feta_partitioned.py` scales ONE large graph across a mesh axis; real
PATTERN/CLUSTER training (reference run_transformer_gengcn_SBM_cv.py:276-282)
feeds BATCHES of medium graphs. This module shards both ways at once:

  - the graph batch axis over a 'data' mesh axis (pure data parallelism),
  - each graph's padded node axis over a 'nodes' mesh axis, so one graph's
    [N, N] attention/Laplacian work is split across chips.

Per layer each device holds [B/dp, N/sp, ...] query rows; keys/values are
one `all_gather` over the 'nodes' axis (the [N, d] gather is linear in N
while the local [N/sp, N] score matmul is quadratic — the classic sequence
-parallel trade). The coefficient GCN's degree/column-sum reductions psum
over 'nodes'; BatchNorm statistics psum over BOTH axes (the global masked
moments of `nn.layers.MaskedBatchNorm`). The Chebyshev recurrence uses the
row-sharded dense scaled Laplacian [B/dp, N/sp, N] — dense block matmuls
on the MXU (graphs here are dense-collated, same reasoning as ops/cheb.py)
with one all_gather per order.

Parameters are the UNMODIFIED flax tree of DiffGraphTransformerGenGCNSBM,
like the single-graph path; parity is tested against the dense model in
tests/test_feta_batched.py. Supports batch_norm (train-mode statistics)
and last_layer_filter=False (all-layers filtering, skip-summed) — the
canonical reference configs (run_transformer_gengcn_cv.py:57,76).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feta_tmlr_tpu.parallel.feta_partitioned import (
    _layer_norm,
    _masked_batch_norm,
    make_ring_attention_core,
)

_NEG_INF = -1e30


def make_feta_batched_forward(mesh: Mesh, d_model: int, n_heads: int,
                              n_layers: int, filter_order: int,
                              data_axis: str = "data",
                              node_axis: str = "nodes",
                              batch_norm: bool = False,
                              last_layer_filter: bool = True,
                              ring_attention: bool = False,
                              ring_collectives: bool = True):
    """forward(params, x, pe, lhat, mask, deg) -> logits [B, N, C], all
    arrays sharded P(data, nodes, ...). pe/deg may be None.

    ring_attention=True streams every graph's K/V blocks around the
    'nodes' ring instead of gathering them: the shared single-graph core
    (`feta_partitioned.make_ring_attention_core`) is vmapped over the
    local graph-batch axis — collectives batch transparently, so one
    ppermute per ring step rotates ALL local graphs' blocks at once. No
    [Bl, h, Vs, V] score tensor exists at any N; filtered layers stream
    their coefficient statistics too (two stop-gradient ring passes per
    graph, vmapped the same way)."""
    h, dh = n_heads, d_model // n_heads
    na = node_axis
    n_shards = mesh.shape[na]
    gather = lambda t: jax.lax.all_gather(t, na, axis=1, tiled=True)
    ring_core = (make_ring_attention_core(na, n_shards, d_model, n_heads,
                                          collectives=ring_collectives)
                 if ring_attention else None)

    def attention_layer(lp, x, x_all, pe_local, deg_all, mask_local,
                        mask_all, need_heads, coeff_params=None,
                        n_valid=None):
        """GraphiTEncoderLayer semantics (nn/layers.py:79-183); queries
        [Bl, Vs, d], keys/values gathered [Bl, V, d] — or streamed around
        the ring when x_all is None (ring_attention mode; the middle
        return value is then the READY per-graph coefficient tensor for
        filtered layers instead of the attention matrix)."""
        if x_all is None:
            ax = lambda t: None if t is None else 0
            attn_out, out_heads, ring_coeff = jax.vmap(
                ring_core,
                in_axes=(None, 0, ax(pe_local), ax(deg_all), 0, 0,
                         None, 0))(
                lp, x, pe_local, deg_all, mask_local, mask_all,
                coeff_params if need_heads else None, n_valid)
            mask_f = mask_local[..., None].astype(x.dtype)
            norm = ((lambda t, p: _masked_batch_norm(t, p, mask_f,
                                                     (data_axis, na)))
                    if batch_norm else _layer_norm)
            x = norm(x + attn_out, lp["norm1"])
            ff = x @ lp["ff1"]["kernel"] + lp["ff1"]["bias"]
            ff = jax.nn.relu(ff)
            ff = ff @ lp["ff2"]["kernel"] + lp["ff2"]["bias"]
            x = norm(x + ff, lp["norm2"])
            return x * mask_f, ring_coeff, (out_heads if need_heads
                                            else None)
        d = d_model
        wqkv = lp["qkv"].reshape(d, 3, h, dh)
        bqkv = lp["qkv_bias"].reshape(3, h, dh)
        wq, wk, wv = wqkv[:, 0], wqkv[:, 1], wqkv[:, 2]
        bq, bk, bv = bqkv[0], bqkv[1], bqkv[2]

        a_mix = jnp.einsum("dhe,ghe->hdg", wq, wk)
        xa = jnp.einsum("bnd,hdg->bhng", x, a_mix)        # [Bl, h, Vs, d]
        scores = jnp.einsum("bhng,bmg->bhnm", xa, x_all)  # [Bl, h, Vs, V]
        c_q = jnp.einsum("bnd,dhe,he->bnh", x, wq, bk)
        c_k = jnp.einsum("bmd,dhe,he->bmh", x_all, wk, bq)
        c_0 = jnp.einsum("he,he->h", bq, bk)
        scores = (scores + c_q.transpose(0, 2, 1)[:, :, :, None]
                  + c_k.transpose(0, 2, 1)[:, :, None, :]
                  + c_0[None, :, None, None]) \
            / jnp.sqrt(jnp.asarray(dh, x.dtype))

        scores = jnp.where(mask_all[:, None, None, :] > 0, scores,
                           _NEG_INF)
        mx = jax.lax.stop_gradient(scores.max(-1, keepdims=True))
        e = jnp.exp(scores - mx)
        attn = e / e.sum(-1, keepdims=True)
        if pe_local is not None:
            attn = attn * pe_local[:, None, :, :]
        if deg_all is not None:
            attn = attn * deg_all[:, None, None, :]
        if pe_local is not None or deg_all is not None:
            denom = attn.sum(-1, keepdims=True)
            attn = attn / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
        attn = attn * mask_local[:, None, :, None] \
            * mask_all[:, None, None, :]

        v_all = jnp.einsum("bmd,dhe->bmhe", x_all, wv) + bv
        heads = jnp.einsum("bhnm,bmhe->bhne", attn, v_all)
        out_heads = heads.transpose(0, 2, 1, 3)           # [Bl, Vs, h, dh]
        attn_out = out_heads.reshape(*x.shape[:2], d) \
            @ lp["out_proj_kernel"] + lp["out_proj_bias"]

        mask_f = mask_local[..., None].astype(x.dtype)
        norm = ((lambda t, p: _masked_batch_norm(t, p, mask_f,
                                                 (data_axis, na)))
                if batch_norm else _layer_norm)
        x = x + attn_out
        x = norm(x, lp["norm1"])
        ff = x @ lp["ff1"]["kernel"] + lp["ff1"]["bias"]
        ff = jax.nn.relu(ff)
        ff = ff @ lp["ff2"]["kernel"] + lp["ff2"]["bias"]
        x = norm(x + ff, lp["norm2"])
        x = x * mask_f
        if not need_heads:
            return x, None, None
        return x, attn, out_heads * mask_f[..., None]

    def coeff_head(cp, attn, mask_local, mask_all, n_valid):
        """FilterCoefficientHead (nn/feta.py:66-100): in-degree norm +
        GCN(ones) column-sum collapse over sharded attention rows
        [Bl, h, Vs(src), V(dst)]; reductions psum over 'nodes'."""
        a = jax.lax.stop_gradient(attn)
        a = a * mask_local[:, None, :, None] * mask_all[:, None, None, :]
        vs, v = a.shape[2], a.shape[3]
        my = jax.lax.axis_index(na)
        cols = my * vs + jnp.arange(vs)                   # global col ids
        diag = jnp.take_along_axis(
            a, cols[None, None, :, None], axis=3)[..., 0]  # [Bl, h, Vs]
        missing = ((diag == 0)
                   & (mask_local[:, None, :] > 0)).astype(a.dtype)
        a = a + missing[..., None] * jax.nn.one_hot(cols, v, dtype=a.dtype)
        deg_in = jax.lax.psum(a.sum(axis=2), na)          # [Bl, h, V]
        dis = jnp.where(deg_in > 0, 1.0 / jnp.sqrt(deg_in), 0.0)
        dis_src = jnp.take_along_axis(dis, cols[None, None, :], axis=2)
        a_norm = dis_src[..., None] * a * dis[:, :, None, :]
        s_all = jax.lax.psum(a_norm.sum(axis=2), na)      # [Bl, h, V]
        s_local = jax.lax.dynamic_slice_in_dim(s_all, my * vs, vs, axis=2)
        hfeat = jnp.tanh(s_local[..., None] * cp["gcn_kernel"].sum(axis=0)
                         + cp["gcn_bias"])                # [Bl, h, Vs, C]
        pooled = jax.lax.psum(
            (hfeat * mask_local[:, None, :, None]).sum(axis=2), na) \
            / jnp.maximum(n_valid, 1.0)[:, None, None]    # [Bl, h, C]
        return pooled @ cp["coeff_linear"]["kernel"] \
            + cp["coeff_linear"]["bias"]

    def cheb_filter(heads, coeff, cheb_bias, lhat_local, mask_local):
        """cheb_filter_dynamic (ops/cheb.py:46-80) with the Lhat matvec as
        row-sharded dense matmul + nodes all_gather per order."""
        bl, vs = heads.shape[0], heads.shape[1]
        weights = coeff.reshape(bl, h, filter_order, dh, dh)
        xf = heads.reshape(bl, vs, h * dh)

        def spmm(t):
            return jnp.einsum("bnm,bmf->bnf", lhat_local, gather(t))

        contract = lambda t, k: jnp.einsum(
            "bnhd,bhde->bnhe", t.reshape(bl, vs, h, dh), weights[:, :, k])
        tx_prev = xf
        out = contract(tx_prev, 0)
        if filter_order > 1:
            tx_cur = spmm(xf)
            out = out + contract(tx_cur, 1)
            for k in range(2, filter_order):
                tx_next = 2.0 * spmm(tx_cur) - tx_prev
                out = out + contract(tx_next, k)
                tx_prev, tx_cur = tx_cur, tx_next
        out = out + cheb_bias
        return (out * mask_local[..., None, None]).reshape(bl, vs, h * dh)

    def local_fn(params, x_sh, pe_sh, lhat_sh, mask_sh, deg_sh):
        enc = params["encoder"]
        mask_local = mask_sh.astype(x_sh.dtype)           # [Bl, Vs]
        mask_all = gather(mask_local)                     # [Bl, V]
        n_valid = jax.lax.psum(mask_local.sum(axis=1), na)  # [Bl]
        pe_local = pe_sh if pe_sh is not None else None
        deg_all = gather(deg_sh) if deg_sh is not None else None

        x = x_sh @ params["embedding"]["kernel"]
        allout_filt = None
        for i in range(n_layers):
            filtered = (not last_layer_filter) or (i + 1 == n_layers)
            if ring_attention:
                x, coeff, out_heads = attention_layer(
                    enc[f"layer_{i}"], x, None, pe_local, deg_all,
                    mask_local, mask_all, need_heads=filtered,
                    coeff_params=enc["coeff_head"] if filtered else None,
                    n_valid=n_valid)
            else:
                x_all = gather(x)
                x, attn, out_heads = attention_layer(
                    enc[f"layer_{i}"], x, x_all, pe_local, deg_all,
                    mask_local, mask_all, need_heads=filtered)
            if not filtered:
                continue
            if not ring_attention:
                coeff = coeff_head(enc["coeff_head"], attn, mask_local,
                                   mask_all, n_valid)     # [Bl, h, C]
            filt = cheb_filter(out_heads, coeff, enc["cheb_bias"],
                               lhat_sh, mask_local)
            allout_filt = (filt if allout_filt is None
                           else allout_filt + filt)

        out = jnp.concatenate([x, allout_filt], axis=-1) \
            @ enc["linear_cat"]["kernel"] + enc["linear_cat"]["bias"]
        cl = params["classifier"]
        hcl = jax.nn.relu(out @ cl["fc1"]["kernel"] + cl["fc1"]["bias"])
        return hcl @ cl["fc2"]["kernel"] + cl["fc2"]["bias"]

    def forward(params, x_sh, pe_sh, lhat_sh, mask_sh, deg_sh=None):
        da = data_axis
        pe_spec = P(da, na, None) if pe_sh is not None else P()
        deg_spec = P(da, na) if deg_sh is not None else P()
        fn = shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(da, na, None), pe_spec, P(da, na, None),
                      P(da, na), deg_spec),
            out_specs=P(da, na, None))
        return fn(params, x_sh, pe_sh, lhat_sh, mask_sh, deg_sh)

    return forward


def make_feta_batched_train_step(mesh: Mesh, d_model: int, n_heads: int,
                                 n_layers: int, filter_order: int,
                                 lr: float = 1e-3,
                                 data_axis: str = "data",
                                 node_axis: str = "nodes",
                                 batch_norm: bool = False,
                                 last_layer_filter: bool = True,
                                 optimizer=None, donate: bool = False,
                                 ring_attention: bool = False,
                                 ring_collectives: bool = True):
    """Train step: masked per-node CE over the sharded logits (loss and
    grads composed by GSPMD outside the shard_map).

    optimizer=None keeps plain SGD(lr):
        step(params, *inputs) -> (params, loss).
    With an optax GradientTransformation (AdamW, schedules, chains —
    what the reference's SBM protocol actually trains with), pair the
    returned step with `optimizer.init(params)`:
        step(params, opt_state, *inputs) -> (params, opt_state, loss).
    """
    forward = make_feta_batched_forward(
        mesh, d_model, n_heads, n_layers, filter_order, data_axis,
        node_axis, batch_norm=batch_norm,
        last_layer_filter=last_layer_filter,
        ring_attention=ring_attention, ring_collectives=ring_collectives)

    from feta_tmlr_tpu.parallel._step_util import build_step

    def loss_fn(p, x_sh, pe_sh, lhat_sh, mask_sh, labels, label_mask,
                deg_sh=None):
        logits = forward(p, x_sh, pe_sh, lhat_sh, mask_sh, deg_sh)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), logits.shape[-1])
        ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
        mk = label_mask.astype(ce.dtype)
        return jnp.sum(ce * mk) / jnp.maximum(mk.sum(), 1.0)

    return build_step(loss_fn, lr, optimizer, donate=donate)


def prepare_batched_inputs(batch, mesh: Mesh, data_axis: str = "data",
                           node_axis: str = "nodes"):
    """Shard a dense host GraphBatch (collate_graphs output, node labels
    in batch.y) over the 2-D mesh; computes the 'sym' scaled Laplacian
    rows (lambda_max=2) that the dense FeTAEncoder derives internally
    (ops/laplacian.py::cheb_scaled_laplacian)."""
    from feta_tmlr_tpu.ops.laplacian import cheb_scaled_laplacian
    b, n = batch.node_mask.shape
    dp, sp = mesh.shape[data_axis], mesh.shape[node_axis]
    if b % dp or n % sp:
        raise ValueError(f"batch {b} / nodes {n} must divide the "
                         f"({dp}, {sp}) mesh")
    lhat = np.asarray(cheb_scaled_laplacian(
        jnp.asarray(batch.adj), jnp.asarray(batch.node_mask)))
    sh2 = NamedSharding(mesh, P(data_axis, node_axis))
    sh3 = NamedSharding(mesh, P(data_axis, node_axis, None))
    put2 = lambda a: jax.device_put(np.asarray(a), sh2)
    put3 = lambda a: jax.device_put(np.asarray(a), sh3)
    x_sh = put3(batch.x)
    pe_sh = put3(batch.pe) if batch.pe is not None else None
    lhat_sh = put3(lhat)
    mask_sh = put2(batch.node_mask)
    deg_sh = put2(batch.degree) if batch.degree is not None else None
    lab = np.asarray(batch.y, np.int32)
    lab_sh = put2(lab)
    lmask_sh = put2(np.asarray(batch.node_mask) & (lab >= 0))
    return x_sh, pe_sh, lhat_sh, mask_sh, lab_sh, lmask_sh, deg_sh
