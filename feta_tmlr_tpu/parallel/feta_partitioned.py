"""Edge/node-partitioned FULL FeTA model for one large SBM-scale graph.

The BASELINE north-star workload is SBM node classification with the FeTA
model (`DiffGraphTransformerGenGCNSBM`, reference
experiments/run_transformer_gengcn_SBM_cv.py:368-370). This module runs that
model's complete forward — kernel-modulated GraphiT attention, the
coefficient GCN over the (detached) attention graph, and the dynamic
Chebyshev filter — over a node-sharded mesh:

  - node features, per-node logits, the PE kernel rows and the attention
    rows stay sharded [V/D, ...] across the mesh axis;
  - attention gathers keys/values with one fused `all_gather` per layer
    (V is node-count of ONE graph; for SBM ~100-1000 nodes the [V, d]
    gather is tiny next to the [V/D, V] score matmul that stays local);
  - the coefficient GCN's in-degree normalization and column-sum collapse
    (FilterCoefficientHead: GCN(ones) = outer product) reduce across
    devices with `psum`;
  - the Chebyshev recurrence over the ORIGINAL graph Laplacian runs on the
    edge-partitioned ring SpMM (`ring_spmm_local`, ppermute over ICI) —
    the [V, V] Laplacian is never materialized on any chip.

Parameters are the UNMODIFIED flax param tree of
`DiffGraphTransformerGenGCNSBM` (replicated), so dense <-> partitioned
parity is checked against the very model users train on one chip
(tests/test_feta_partitioned.py), and `__graft_entry__.dryrun_multichip`
drives a training step of it on the virtual mesh.

Scope notes: no dropout (the partitioned path is a scale-out
inference/training core; stochastic augmentation lives in the host
trainer); ChebConvDynamic with 'sym' normalization (lambda_max=2).
Both norms are supported: `batch_norm=True` reproduces the canonical TU
config (reference run_transformer_gengcn_cv.py:57 `--batch-norm`) with
masked batch statistics psum-reduced across node shards (train mode —
exactly `nn.layers.MaskedBatchNorm`'s masked moments over the global
node set), and `last_layer_filter=False` filters EVERY layer with the
shared coefficient head + skip-sum like the dense FeTAEncoder
(run_transformer_gengcn_cv.py:76). Multi-graph batches of node-sharded
graphs live in `parallel/feta_batched.py`. `ring_attention=True` swaps
the per-layer K/V all_gather for a ring schedule with online-softmax
accumulation (the multi-chip analogue of the single-chip flash kernel),
including the filtered layers' coefficient head — see
`make_feta_partitioned_forward`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feta_tmlr_tpu.parallel.edge_partition import (
    partition_edges,
    place_partitioned,
    ring_spmm_local,
)

_NEG_INF = -1e30


def _layer_norm(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _masked_batch_norm(x, p, mask_f, axes, eps=1e-5):
    """Train-mode MaskedBatchNorm (nn/layers.py:40-62) with the masked
    moments psum-reduced over the mesh axes: statistics are over the
    GLOBAL valid-node set, bit-matching the dense module's
    `(x*m).sum((0,1)) / m.sum()` on one chip. x: [..., D], mask_f last
    dim 1-broadcastable."""
    red = tuple(range(x.ndim - 1))
    cnt = jnp.maximum(jax.lax.psum(mask_f.sum(), axes), 1.0)
    mean = jax.lax.psum((x * mask_f).sum(red), axes) / cnt
    var = jax.lax.psum((((x - mean) ** 2) * mask_f).sum(red), axes) / cnt
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y * p["scale"] + p["bias"]


def _coeff_tail(cp, s_local, mask_local, n_valid, axis):
    """Shared FilterCoefficientHead tail (nn/feta.py:64-98): per-node
    tanh GCN feature from the symmetric-normalized column sums, masked
    global mean pool (psum over the node `axis`), linear head."""
    hfeat = jnp.tanh(s_local[..., None] * cp["gcn_kernel"].sum(axis=0)
                     + cp["gcn_bias"])                    # [h, Vs, C]
    pooled = jax.lax.psum(
        (hfeat * mask_local[None, :, None]).sum(axis=1), axis) \
        / jnp.maximum(n_valid, 1.0)                       # [h, C]
    return pooled @ cp["coeff_linear"]["kernel"] \
        + cp["coeff_linear"]["bias"]


def make_ring_attention_core(axis: str, n_shards: int, d_model: int,
                             n_heads: int, collectives: bool = True):
    """Factory for the ring-streamed GraphiT attention core.

    Module-level so both distributed FeTA paths share one
    implementation: `make_feta_partitioned_forward` (single graph,
    1-D node mesh) calls it directly; `feta_batched.py` vmaps it over
    the local graph-batch axis (collectives batch transparently, the
    ring rotates every graph's K/V blocks at once). Returns
    ring_attention_core(lp, x_local, pe_local, deg_all, mask_local,
    mask_all, coeff_params=None, n_valid=None) ->
    (attn_out, out_heads, coeff-or-None).

    collectives=False is the matched-FLOPs compute-only CONTROL for the
    weak-scaling benchmark (bench_scaling.py, VERDICT r3 item 5): the
    same S-step fold runs with the ppermute removed (each step re-reads
    the local block), so t_ring - t_compute_only isolates the
    collectives' cost from host-side compute contention. Results are
    numerically wrong by construction — benchmarking only.
    """
    h, dh = n_heads, d_model // n_heads

    def ring_attention_core(lp, x_local, pe_local, deg_all, mask_local,
                            mask_all, coeff_params=None, n_valid=None):
        """GraphiT modulated attention with K/V blocks rotating the ring.

        Online accumulation keeps a triple of row statistics per head —
        m (running max), S_e = sum_k e, S_u = sum_k e*pd — because the
        renormalization denominator is sum_k(a * pe * deg) = S_u / S_e;
        the closed form out = acc / (|S_u/S_e| > eps ? S_u : S_e)
        reproduces the gathered path's `where(|denom|>eps, denom, 1)`
        exactly (same derivation as flash_attention.py's docstring).
        Rows whose keys are all masked get uniform e=1 in both schedules
        (exp(-1e30 - (-1e30)) = 1), so padded rows stay finite and equal.
        Each ring step is jax.checkpoint'ed: the backward re-derives the
        [h, Vs, Vs] score block instead of storing one per step, so bwd
        memory matches fwd.

        With coeff_params set (a FILTERED layer), the FilterCoefficientHead
        statistics are accumulated in two more ring passes so the filtered
        layer streams too: the head consumes only column reductions of the
        (detached, nn/feta.py stop-gradient) attention — in-degree column
        sums with the missing-diagonal fill, then dis-weighted column sums
        — and both are [h, V] vectors a scan can build block by block and
        psum. No gradient flows through them (the dense model detaches the
        coefficient GCN's input), so the recompute passes run whole under
        stop_gradient. Returns (attn_out, out_heads, coeff).
        """
        d = d_model
        vs = x_local.shape[0]
        wqkv = lp["qkv"].reshape(d, 3, h, dh)
        bqkv = lp["qkv_bias"].reshape(3, h, dh)
        wq, wk, wv = wqkv[:, 0], wqkv[:, 1], wqkv[:, 2]
        bq, bk, bv = bqkv[0], bqkv[1], bqkv[2]

        a_mix = jnp.einsum("dhe,ghe->hdg", wq, wk)
        xa = jnp.einsum("nd,hdg->hng", x_local, a_mix)        # [h, Vs, d]
        c_q = jnp.einsum("nd,dhe,he->nh", x_local, wq, bk)
        c_q = c_q.T[:, :, None]                               # [h, Vs, 1]
        c_0 = jnp.einsum("he,he->h", bq, bk)[:, None, None]
        inv = 1.0 / jnp.sqrt(jnp.asarray(dh, x_local.dtype))
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        # stat/accumulator dtype: f32 floor (bf16 io still accumulates in
        # f32, like the flash kernel), widens with the io dtype (f64 runs)
        f32 = jnp.promote_types(jnp.float32, x_local.dtype)
        total = n_shards * vs

        def score_block(xa_, cq_, wk_, bq_, c0_, x_blk, s):
            kmask = jax.lax.dynamic_slice_in_dim(
                mask_all, s * vs, vs)                         # [Vs]
            scores = jnp.einsum("hng,mg->hnm", xa_, x_blk)
            c_k = jnp.einsum("md,dhe,he->mh", x_blk, wk_, bq_)
            scores = (scores + cq_ + c_k.T[:, None, :] + c0_) * inv
            return jnp.where(kmask[None, None, :] > 0,
                             scores.astype(f32), _NEG_INF), kmask

        def pd_block(s):
            pd = None
            if pe_local is not None:
                pd = jax.lax.dynamic_slice_in_dim(
                    pe_local, s * vs, vs, axis=1).astype(f32)  # [Vs, Vs]
            if deg_all is not None:
                dblk = jax.lax.dynamic_slice_in_dim(
                    deg_all, s * vs, vs).astype(f32)[None, :]
                pd = dblk if pd is None else pd * dblk
            return pd

        def ring_fold(process, stats0, x0, grad=False):
            """Fold process(stats, x_blk, s) over the ring-rotated K/V
            blocks: the LOCAL block first, then S-1 permute-then-process
            steps — no trailing rotation of a block nobody consumes.
            grad=True checkpoints `process` only (not the ppermute), so
            the backward recomputes score blocks without replaying any
            collective."""
            fn = jax.checkpoint(process) if grad else process
            stats = fn(stats0, x0, my)
            if n_shards == 1:
                return stats

            def body(carry, t):
                x_blk, st = carry
                if collectives:
                    x_blk = jax.lax.ppermute(x_blk, axis, perm)
                st = fn(st, x_blk, (my - t) % n_shards)
                return (x_blk, st), None

            (_, stats), _ = jax.lax.scan(body, (x0, stats),
                                         jnp.arange(1, n_shards))
            return stats

        def pass_online(stats, x_blk, s):
            m, se, su, acc = stats
            scores, _ = score_block(xa, c_q, wk, bq, c_0, x_blk, s)
            m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
            scale = jnp.exp(m - m_new)
            e = jnp.exp(scores - m_new)                       # [h, Vs, Vs]
            pd = pd_block(s)
            w_mod = e if pd is None else e * pd[None]
            v_blk = jnp.einsum("md,dhe->mhe", x_blk, wv) + bv
            se = se * scale + e.sum(-1, keepdims=True)
            su = su * scale + w_mod.sum(-1, keepdims=True)
            acc = acc * scale + jnp.einsum(
                "hnm,mhe->hne", w_mod.astype(x_blk.dtype), v_blk)
            return (m_new, se, su, acc)

        # the stat carries become device-varying after step 1 — mark the
        # replicated zero inits as varying up front (shard_map + scan)
        vary = lambda t: jax.lax.pcast(t, (axis,), to="varying")
        m_fin, se, su, acc = ring_fold(
            pass_online,
            (vary(jnp.full((h, vs, 1), -jnp.inf, f32)),
             vary(jnp.zeros((h, vs, 1), f32)),
             vary(jnp.zeros((h, vs, 1), f32)),
             vary(jnp.zeros((h, vs, dh), f32))),
            x_local, grad=True)
        guard = jnp.abs(su / se) > 1e-9
        div = jnp.where(guard, su, se)
        heads = (acc / div).astype(x_local.dtype)             # [h, Vs, dh]
        out_heads = heads.transpose(1, 0, 2) \
            * mask_local[:, None, None]                       # [Vs, h, dh]
        attn_out = out_heads.reshape(vs, d) @ lp["out_proj_kernel"] \
            + lp["out_proj_bias"]
        if coeff_params is None:
            return attn_out, out_heads, None

        # ---- FilterCoefficientHead statistics (stop-gradient ring passes)
        # EVERY score ingredient is detached — including wk/bq/c_0, which
        # enter through the key-side rank-1 correction recomputed per
        # block. (Detaching only xa/c_q/x once leaked a bq gradient
        # through these passes: the dense head detaches the whole
        # attention tensor, nn/feta.py stop_gradient.)
        sg = jax.lax.stop_gradient
        xa_s, cq_s, x_s = sg(xa), sg(c_q), sg(x_local)
        wk_s, bq_s, c0_s = sg(wk), sg(bq), sg(c_0)
        m_f, div_f = sg(m_fin), sg(div)
        qmask = mask_local[None, :, None].astype(f32)

        def attn_block(x_blk, s):
            """Recompute one renormalized-attention block [h, Vs, Vs],
            bit-matching the gathered coeff_head's double-masked input."""
            scores, kmask = score_block(xa_s, cq_s, wk_s, bq_s, c0_s,
                                        x_blk, s)
            e = jnp.exp(scores - m_f)
            pd = pd_block(s)
            w_mod = e if pd is None else e * pd[None]
            return (w_mod / div_f) * qmask * kmask[None, None, :]

        def pass_cols(stats, x_blk, s):
            colsum, miss = stats
            a = attn_block(x_blk, s)
            on_diag = jnp.where(s == my, 1.0, 0.0)
            dg = jnp.diagonal(a, axis1=1, axis2=2)            # [h, Vs]
            missing = ((dg == 0.0)
                       & (mask_local[None, :] > 0)).astype(f32) * on_diag
            csum = a.sum(axis=1) + missing      # filled diag adds 1 at col
            colsum = jax.lax.dynamic_update_slice_in_dim(
                colsum, csum, s * vs, axis=1)
            return colsum, miss + missing

        colsum, missing = ring_fold(
            pass_cols, (vary(jnp.zeros((h, total), f32)),
                        vary(jnp.zeros((h, vs), f32))), x_s)
        deg_in = jax.lax.psum(colsum, axis)                   # [h, V]
        dis = jnp.where(deg_in > 0, jax.lax.rsqrt(deg_in), 0.0)
        dis_src = jax.lax.dynamic_slice_in_dim(
            dis, my * vs, vs, axis=1)                         # [h, Vs]

        def pass_wcols(wcol, x_blk, s):
            a = attn_block(x_blk, s)
            wblk = jnp.einsum("hn,hnm->hm", dis_src, a)       # [h, Vs]
            on_diag = jnp.where(s == my, 1.0, 0.0)
            wblk = wblk + missing * dis_src * on_diag  # filled-diag weight
            return jax.lax.dynamic_update_slice_in_dim(
                wcol, wblk, s * vs, axis=1)

        wcol = ring_fold(pass_wcols, vary(jnp.zeros((h, total), f32)),
                         x_s)
        s_all = dis * jax.lax.psum(wcol, axis)                # [h, V]
        s_local = jax.lax.dynamic_slice_in_dim(s_all, my * vs, vs, axis=1)
        coeff = _coeff_tail(coeff_params, s_local, mask_local,
                            n_valid, axis)
        return attn_out, out_heads, coeff

    return ring_attention_core


def make_feta_partitioned_forward(mesh: Mesh, d_model: int, n_heads: int,
                                  n_layers: int, filter_order: int,
                                  axis: str = "data",
                                  batch_norm: bool = False,
                                  last_layer_filter: bool = True,
                                  ring_attention: bool = False,
                                  ring_collectives: bool = True):
    """Builds forward(params, x_sh, pe_sh, mask_sh, src, dst, w, m)
    -> per-node logits (sharded [V/D, nb_class]).

    params is flax's `variables["params"]` for DiffGraphTransformerGenGCNSBM
    (replicated). pe_sh may be None (no relative PE kernel).

    ring_attention=True streams key/value blocks around the mesh ring
    (ppermute) with online-softmax accumulation for EVERY layer:
    per-layer peak memory drops from O(h * Vs * V) score rows +
    O(V * d) gathered features to O(h * Vs * Vs) per ring step — the
    multi-chip complement of the single-chip query-blocked Pallas kernel
    (ops/pallas/flash_attention.py; same (m, S_e, S_u) triple statistics,
    see `ring_attention_core` below). Filtered layers stream too: the
    FilterCoefficientHead consumes only column reductions of the detached
    attention, accumulated in two extra stop-gradient ring passes, so no
    [h, Vs, V] tensor exists anywhere in the model at any V.
    """
    n_shards = mesh.shape[axis]
    h, dh = n_heads, d_model // n_heads
    ring = ring_spmm_local(axis, n_shards)
    ring_attention_core = make_ring_attention_core(
        axis, n_shards, d_model, n_heads, collectives=ring_collectives)

    def attention_layer(lp, x_local, x_all, pe_local, deg_all, mask_local,
                        mask_all, need_heads, coeff_params=None,
                        n_valid=None):
        """GraphiTEncoderLayer semantics (nn/layers.py:79-183), node-sharded
        queries; keys/values gathered, or streamed around the ring when
        x_all is None (ring_attention mode). In ring mode the middle
        return value is the READY coefficient vector for filtered layers
        (accumulated ring-wise; attention itself is never materialized),
        where the gathered mode returns the attention matrix instead."""
        if x_all is None:
            attn_out, out_heads, ring_coeff = ring_attention_core(
                lp, x_local, pe_local, deg_all, mask_local, mask_all,
                coeff_params=coeff_params if need_heads else None,
                n_valid=n_valid)
            mask_f = mask_local[:, None].astype(x_local.dtype)
            norm = ((lambda t, p: _masked_batch_norm(t, p, mask_f, (axis,)))
                    if batch_norm else _layer_norm)
            x = norm(x_local + attn_out, lp["norm1"])
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
        xa = jnp.einsum("nd,hdg->hng", x_local, a_mix)        # [h, Vs, d]
        scores = jnp.einsum("hng,mg->hnm", xa, x_all)         # [h, Vs, V]
        c_q = jnp.einsum("nd,dhe,he->nh", x_local, wq, bk)
        c_k = jnp.einsum("md,dhe,he->mh", x_all, wk, bq)
        c_0 = jnp.einsum("he,he->h", bq, bk)
        scores = (scores + c_q.T[:, :, None] + c_k.T[:, None, :]
                  + c_0[:, None, None]) / jnp.sqrt(jnp.asarray(dh, x_local.dtype))

        # masked softmax over the full key set, then PE modulation +
        # renormalization (ops/attention.py:65-100 semantics)
        scores = jnp.where(mask_all[None, None, :], scores, _NEG_INF)
        mx = jax.lax.stop_gradient(scores.max(-1, keepdims=True))
        e = jnp.exp(scores - mx)
        attn = e / e.sum(-1, keepdims=True)
        if pe_local is not None:
            attn = attn * pe_local[None, :, :]
        if deg_all is not None:
            # 1/sqrt(1+deg) key rescale (ops/attention.py:88-90)
            attn = attn * deg_all[None, None, :]
        if pe_local is not None or deg_all is not None:
            denom = attn.sum(-1, keepdims=True)
            attn = attn / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
        attn = attn * mask_local[None, :, None] * mask_all[None, None, :]

        v_all = jnp.einsum("md,dhe->mhe", x_all, wv) + bv     # [V, h, dh]
        heads = jnp.einsum("hnm,mhe->hne", attn, v_all)       # [h, Vs, dh]
        out_heads = heads.transpose(1, 0, 2)                  # [Vs, h, dh]
        attn_out = out_heads.reshape(-1, d) @ lp["out_proj_kernel"] \
            + lp["out_proj_bias"]

        mask_f = mask_local[:, None].astype(x_local.dtype)
        norm = ((lambda t, p: _masked_batch_norm(t, p, mask_f, (axis,)))
                if batch_norm else _layer_norm)
        x = x_local + attn_out
        x = norm(x, lp["norm1"])
        ff = x @ lp["ff1"]["kernel"] + lp["ff1"]["bias"]
        ff = jax.nn.relu(ff)
        ff = ff @ lp["ff2"]["kernel"] + lp["ff2"]["bias"]
        x = norm(x + ff, lp["norm2"])
        mask_f = mask_local[:, None].astype(x.dtype)
        x = x * mask_f
        if not need_heads:
            return x, None, None
        return x, attn, out_heads * mask_f[:, :, None]

    def coeff_head(cp, attn, mask_local, mask_all, n_valid):
        """FilterCoefficientHead (nn/feta.py:64-98) on sharded attention
        rows [h, Vs(src), V(dst)]: in-degree norm + GCN(ones) column-sum
        collapse, cross-device reductions via psum."""
        a = jax.lax.stop_gradient(attn)
        a = a * mask_local[None, :, None] * mask_all[None, None, :]
        # self-loop fill for missing diagonals: local row i's diagonal sits
        # at global column (my_offset + i)
        vs = a.shape[1]
        my = jax.lax.axis_index(axis)
        cols = my * vs + jnp.arange(vs)
        diag = jnp.take_along_axis(
            a, cols[None, :, None], axis=2)[..., 0]          # [h, Vs]
        missing = ((diag == 0) & (mask_local[None, :] > 0)).astype(a.dtype)
        a = a + missing[:, :, None] * jax.nn.one_hot(cols, a.shape[2],
                                                     dtype=a.dtype)
        deg_in = jax.lax.psum(a.sum(axis=1), axis)           # [h, V]
        dis = jnp.where(deg_in > 0, 1.0 / jnp.sqrt(deg_in), 0.0)
        # src-side dis for my local rows
        dis_src = jnp.take_along_axis(dis, cols[None, :], axis=1)  # [h, Vs]
        a_norm = dis_src[:, :, None] * a * dis[:, None, :]
        s_all = jax.lax.psum(a_norm.sum(axis=1), axis)       # [h, V] col sums
        s_local = jax.lax.dynamic_slice_in_dim(s_all, my * vs, vs, axis=1)
        return _coeff_tail(cp, s_local, mask_local, n_valid, axis)

    def cheb_filter(heads, coeff, cheb_bias, src, dst, w, m, mask_local):
        """cheb_filter_dynamic (ops/cheb.py:45-80) with the Lhat matvec on
        the ring SpMM. heads: [Vs, h, dh]; coeff: [h, K*dh*dh]."""
        vs = heads.shape[0]
        weights = coeff.reshape(h, filter_order, dh, dh)
        xf = heads.reshape(vs, h * dh)

        def spmm(t):
            return ring(t, src, dst, w, m, vs)

        per_head = lambda t: t.reshape(vs, h, dh)
        contract = lambda t, k: jnp.einsum(
            "nhd,hde->nhe", per_head(t), weights[:, k])
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
        return (out * mask_local[:, None, None]).reshape(vs, h * dh)

    def local_fn(params, x_sh, pe_sh, deg_sh, mask_sh, src, dst, w, m):
        enc = params["encoder"]
        mask_local = mask_sh.astype(x_sh.dtype)
        mask_all = jax.lax.all_gather(mask_local, axis).reshape(-1)
        n_valid = jax.lax.psum(mask_local.sum(), axis)
        pe_local = pe_sh if pe_sh is not None else None
        deg_all = (jax.lax.all_gather(deg_sh, axis).reshape(-1)
                   if deg_sh is not None else None)

        x = x_sh @ params["embedding"]["kernel"]
        allout_filt = None
        for i in range(n_layers):
            # dense semantics (nn/feta.py:225-273): filter only the last
            # layer, or EVERY layer when last_layer_filter=False — shared
            # coefficient head, skip-summed filtered signal
            filtered = (not last_layer_filter) or (i + 1 == n_layers)
            x_all = (None if ring_attention
                     else jax.lax.all_gather(x, axis).reshape(-1, d_model))
            x, attn, out_heads = attention_layer(
                enc[f"layer_{i}"], x, x_all, pe_local, deg_all,
                mask_local, mask_all, need_heads=filtered,
                coeff_params=enc["coeff_head"], n_valid=n_valid)
            if not filtered:
                continue
            # ring mode accumulated the coefficients block-wise already
            coeff = attn if ring_attention else coeff_head(
                enc["coeff_head"], attn, mask_local,
                mask_all, n_valid)                           # [h, C]
            filt = cheb_filter(out_heads, coeff, enc["cheb_bias"],
                               src[0], dst[0], w[0], m[0], mask_local)
            allout_filt = (filt if allout_filt is None
                           else allout_filt + filt)

        out = jnp.concatenate([x, allout_filt], axis=-1) \
            @ enc["linear_cat"]["kernel"] + enc["linear_cat"]["bias"]

        cl = params["classifier"]
        hcl = jax.nn.relu(out @ cl["fc1"]["kernel"] + cl["fc1"]["bias"])
        return hcl @ cl["fc2"]["kernel"] + cl["fc2"]["bias"]

    def forward(params, x_sh, pe_sh, mask_sh, src, dst, w, m,
                deg_sh=None):
        pe_spec = P(axis, None) if pe_sh is not None else P()
        deg_spec = P(axis) if deg_sh is not None else P()
        fn = shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(axis, None), pe_spec, deg_spec, P(axis),
                      P(axis, None, None), P(axis, None, None),
                      P(axis, None, None), P(axis, None, None)),
            out_specs=P(axis, None))
        return fn(params, x_sh, pe_sh, deg_sh, mask_sh, src, dst, w, m)

    return forward


def make_feta_train_step(mesh: Mesh, d_model: int, n_heads: int,
                         n_layers: int, filter_order: int, lr: float = 1e-3,
                         axis: str = "data", batch_norm: bool = False,
                         last_layer_filter: bool = True,
                         ring_attention: bool = False,
                         ring_collectives: bool = True,
                         optimizer=None, donate: bool = False):
    """Train step over the partitioned forward: masked per-node CE, grads
    psum-reduced by shard_map autodiff, params replicated.

    optimizer=None keeps plain SGD(lr): step(params, *inputs) ->
    (params, loss). With an optax GradientTransformation, pair with
    `optimizer.init(params)`: step(params, opt_state, *inputs) ->
    (params, opt_state, loss)."""
    forward = make_feta_partitioned_forward(
        mesh, d_model, n_heads, n_layers, filter_order, axis,
        batch_norm=batch_norm, last_layer_filter=last_layer_filter,
        ring_attention=ring_attention, ring_collectives=ring_collectives)

    from feta_tmlr_tpu.parallel._step_util import build_step

    def loss_fn(p, x_sh, pe_sh, mask_sh, src, dst, w, m, labels,
                label_mask, deg_sh=None):
        logits = forward(p, x_sh, pe_sh, mask_sh, src, dst, w, m, deg_sh)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), logits.shape[-1])
        ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
        mk = label_mask.astype(ce.dtype)
        return jnp.sum(ce * mk) / jnp.maximum(mk.sum(), 1.0)

    return build_step(loss_fn, lr, optimizer, donate=donate)


def prepare_feta_inputs(edge_index: np.ndarray, x: np.ndarray,
                        labels: Optional[np.ndarray], mesh: Mesh,
                        pe: Optional[np.ndarray] = None,
                        degree: Optional[np.ndarray] = None,
                        axis: str = "data"):
    """Partition one large graph for the full-FeTA path.

    Edge weights are the 'sym' scaled-Laplacian entries (Lhat = L - I at
    lambda_max=2: off-diagonal -1/sqrt(d_i d_j), zero diagonal — matches
    ops/laplacian.py::cheb_scaled_laplacian exactly; see
    parallel/partitioned_model.py::prepare_inputs)."""
    n_nodes = x.shape[0]
    keep = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, keep]
    deg = np.zeros(n_nodes)
    np.add.at(deg, edge_index[0], 1.0)
    dis = np.where(deg > 0, np.clip(deg, 1e-12, None) ** -0.5, 0.0)
    w = -(dis[edge_index[0]] * dis[edge_index[1]]).astype(np.float32)
    pg = partition_edges(edge_index, n_nodes, mesh.shape[axis], w)
    x_sh, src, dst, ww, mm = place_partitioned(pg, x, mesh, axis)
    total = pg.n_shards * pg.nodes_per_shard

    mask = np.zeros(total, bool)
    mask[: n_nodes] = True
    sh1 = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    mask_sh = jax.device_put(mask, sh1)

    pe_sh = None
    if pe is not None:
        pe_pad = np.zeros((total, total), np.float32)
        pe_pad[: n_nodes, : n_nodes] = pe
        pe_sh = jax.device_put(pe_pad, sh2)

    deg_sh = None
    if degree is not None:
        degp = np.zeros(total, np.float32)
        degp[: n_nodes] = degree
        deg_sh = jax.device_put(degp, sh1)

    lab_sh = lmask_sh = None
    if labels is not None:
        lab = np.full(total, -1, np.int32)
        lab[: n_nodes] = labels
        lmask = np.zeros(total, bool)
        lmask[: n_nodes] = labels >= 0
        lab_sh = jax.device_put(lab, sh1)
        lmask_sh = jax.device_put(lmask, sh1)
    return (x_sh, pe_sh, mask_sh, src, dst, ww, mm, lab_sh, lmask_sh,
            deg_sh)
