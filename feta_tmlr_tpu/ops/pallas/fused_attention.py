"""Pallas TPU kernel: fully fused GraphiT attention (flash-style).

For layers that don't need per-head outputs (need_heads=False — all but the
filtered layer in a FeTA encoder), the whole attention chain

  scores_h = (xa_h x^T + cq + ck + c0) / sqrt(dh)
  attn_h   = renormalize(softmax_masked(scores_h) * pe * degree) * masks
  out      = sum_h attn_h @ vw_h + b_out

runs inside the kernel: the [H, N, N] score/attention tensors live only in
VMEM and never touch HBM in either direction (the XLA path writes+reads
them in forward AND backward). The backward kernel recomputes attention
(flash-attention style) and emits gradients w.r.t. xa, x, the
bias-correction terms and vw; pe/degree/masks are data.

Grid layout: one program per (batch row, head) — the head axis is a grid
dimension, not a block dimension, so VMEM holds ONE head's [N, D] blocks
plus one [N, N] score tile at a time. (The earlier (batch,)-grid variant
loaded [H, N, D] xa/vw blocks whole: 8 MB each at N=512/H=8/D=64, which
overflowed VMEM — measured failure recorded in BASELINE.md.) The
cross-head output sum accumulates in a persistent f32 VMEM scratch that
TPU pallas carries across the sequential inner grid iterations.

Inputs are the MXU-friendly factorization used by GraphiTEncoderLayer:
xa = x @ (Wq_h Wk_h^T), vw = v_h @ Wout_h, cq/ck/c0 the rank-1 bias terms.
jnp twin: `fused_graphit_attention_ref` (tests/test_pallas_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-9


def _attn_from_scores(scores, pd, qmask, kmask):
    s = jnp.where(kmask > 0, scores, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e / e.sum(-1, keepdims=True)
    u = a * pd
    denom = u.sum(-1, keepdims=True)
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    guard = (jnp.abs(denom) > _EPS).astype(s.dtype)
    attn = (u / safe) * qmask * kmask
    return a, u, safe, guard, attn


def _head_scores(xa_ref, x, cq_ref, ck_ref, c0_ref, inv_sqrt):
    """One head's [N, N] modulated-attention scores (pre-softmax)."""
    return (jnp.dot(xa_ref[0, 0], x.T,
                    preferred_element_type=jnp.float32)
            + cq_ref[0, 0] + ck_ref[0, 0] + c0_ref[0, 0]) * inv_sqrt


def _fwd_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref, out_ref,
                acc_ref):
    j = pl.program_id(1)
    nh = pl.num_programs(1)
    x = x_ref[0]                                   # [N, D]
    pd = pe_ref[0] * deg_ref[0]                    # [N, N]
    kmask = kmask_ref[0]                           # [1, N]
    qmask = qmask_ref[0]                           # [N, 1]
    inv_sqrt = inv_sqrt_ref[0, 0]
    scores = _head_scores(xa_ref, x, cq_ref, ck_ref, c0_ref, inv_sqrt)
    _, _, _, _, attn = _attn_from_scores(scores, pd, qmask, kmask)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(attn.astype(vw_ref.dtype), vw_ref[0, 0],
                            preferred_element_type=jnp.float32)

    @pl.when(j == nh - 1)
    def _emit():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _bwd_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref, g_ref,
                dxa_ref, dx_ref, dcq_ref, dck_ref, dc0_ref, dvw_ref,
                dx_acc_ref):
    j = pl.program_id(1)
    nh = pl.num_programs(1)
    x = x_ref[0]
    pd = pe_ref[0] * deg_ref[0]
    kmask = kmask_ref[0]
    qmask = qmask_ref[0]
    inv_sqrt = inv_sqrt_ref[0, 0]
    g = g_ref[0]                                   # [N, D]
    scores = _head_scores(xa_ref, x, cq_ref, ck_ref, c0_ref, inv_sqrt)
    a, u, safe, guard, attn = _attn_from_scores(scores, pd, qmask, kmask)

    # d attn from the product; d vw from attn^T g
    d_attn = jnp.dot(g, vw_ref[0, 0].T,
                     preferred_element_type=jnp.float32)
    dvw_ref[0, 0] = jnp.dot(
        attn.astype(g.dtype).T, g,
        preferred_element_type=jnp.float32).astype(dvw_ref.dtype)

    # through the masks and renormalization (see modulation.py)
    gm = d_attn * qmask * kmask
    r = (gm * u).sum(-1, keepdims=True)
    du = gm / safe - (r / (safe * safe)) * guard
    da = du * pd
    ds = a * (da - (da * a).sum(-1, keepdims=True))
    ds = ds * inv_sqrt

    ds_c = ds.astype(x.dtype)            # bf16 MXU dots under the policy
    dxa_ref[0, 0] = jnp.dot(
        ds_c, x, preferred_element_type=jnp.float32).astype(dxa_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dx_acc_ref[...] = jnp.zeros_like(dx_acc_ref)

    dx_acc_ref[...] += jnp.dot(ds_c.T, xa_ref[0, 0],
                               preferred_element_type=jnp.float32)

    @pl.when(j == nh - 1)
    def _emit():
        dx_ref[0] = dx_acc_ref[...].astype(dx_ref.dtype)

    dcq_ref[0, 0] = ds.sum(-1, keepdims=True).astype(dcq_ref.dtype)
    dck_ref[0, 0] = ds.sum(0, keepdims=True).astype(dck_ref.dtype)
    dc0_ref[0, 0] = ds.sum(keepdims=True).reshape(1, 1).astype(
        dc0_ref.dtype)


def _specs(n, d):
    """Input BlockSpecs over the (batch, head) grid. Per-head operands
    load one head's block; per-row operands are replicated across the
    head dimension. cq/ck arrive pre-shaped [B, H, N, 1] / [B, H, 1, N]
    so the kernel adds them without lane<->sublane transposes; c0 is
    [H, 1, 1]."""
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    per_row = lambda lead: vm((1,) + lead,
                              lambda i, j: (i,) + (0,) * len(lead))
    per_head = lambda lead: vm((1, 1) + lead,
                               lambda i, j: (i, j) + (0,) * len(lead))
    return [
        per_head((n, d)),      # xa
        per_row((n, d)),       # x
        per_head((n, 1)),      # cq (column layout)
        per_head((1, n)),      # ck (row layout)
        vm((1, 1, 1), lambda i, j: (j, 0, 0)),    # c0 [H,1,1]
        per_head((n, d)),      # vw
        per_row((n, n)),       # pe
        per_row((1, n)),       # deg
        per_row((n, 1)),       # qmask
        per_row((1, n)),       # kmask
        vm((1, 1), lambda i, j: (0, 0)),          # inv_sqrt (replicated)
    ]


def _call_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt):
    b, h, n, d = xa.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b, h),
        in_specs=_specs(n, d),
        out_specs=pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), xa.dtype),
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
    )(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)


def _call_bwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt, g):
    b, h, n, d = xa.shape
    specs = _specs(n, d)
    specs.append(pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM))   # g
    per_row = lambda lead: pl.BlockSpec(
        (1,) + lead, lambda i, j: (i,) + (0,) * len(lead),
        memory_space=pltpu.VMEM)
    per_head = lambda lead: pl.BlockSpec(
        (1, 1) + lead, lambda i, j: (i, j) + (0,) * len(lead),
        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((b, h, n, d), xa.dtype),   # dxa
        jax.ShapeDtypeStruct((b, n, d), x.dtype),       # dx
        jax.ShapeDtypeStruct((b, h, n, 1), cq.dtype),   # dcq
        jax.ShapeDtypeStruct((b, h, 1, n), ck.dtype),   # dck
        jax.ShapeDtypeStruct((b, h, 1, 1), c0.dtype),   # dc0 (summed later)
        jax.ShapeDtypeStruct((b, h, n, d), vw.dtype),   # dvw
    )
    out_specs = (per_head((n, d)), per_row((n, d)), per_head((n, 1)),
                 per_head((1, n)), per_head((1, 1)), per_head((n, d)))
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b, h),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
    )(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt, g)


@jax.custom_vjp
def _fused(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt):
    return _call_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)


def _fused_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt):
    out = _call_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)
    return out, (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)


def _fused_bwd(res, g):
    xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt = res
    dxa, dx, dcq, dck, dc0, dvw = _call_bwd(
        xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt, g)
    dc0 = dc0.sum(0)                   # [B,H,1,1] -> [H,1,1] (c0 primal)
    zeros = lambda t: jnp.zeros_like(t)
    return (dxa, dx, dcq, dck, dc0, dvw, zeros(pe), zeros(deg),
            zeros(qmask), zeros(kmask), zeros(inv_sqrt))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_graphit_attention(xa, x, cq, ck, c0, vw, node_mask, pe=None,
                            degree=None):
    """out[b, n, d] = sum_h modulated_attn_h @ vw_h, fully fused.

    Args (B batch, H heads, N nodes, D model dim):
      xa: [B, H, N, D] = x @ (Wq_h Wk_h^T); x: [B, N, D];
      cq, ck: [B, N, H] rank-1 bias corrections; c0: [H];
      vw: [B, H, N, D] = v_h @ Wout_h; node_mask [B, N];
      pe [B, N, N] / degree [B, N] optional modulation (data, no grads).
    """
    b, h, n, d = xa.shape
    dh = d // h
    # MXU-dot operands (xa/x/vw) may be bf16; every small/aux operand
    # stays f32 — softmax math is f32 inside the kernel, and Mosaic can't
    # lower 1x1 bf16 scalar extracts (inv_sqrt/c0) anyway
    f32 = jnp.float32
    pe_arr = (pe.astype(f32) if pe is not None
              else jnp.ones((b, n, n), f32))
    deg_arr = (degree.astype(f32) if degree is not None
               else jnp.ones((b, n), f32)).reshape(b, 1, n)
    qmask = node_mask.astype(f32).reshape(b, n, 1)
    kmask = node_mask.astype(f32).reshape(b, 1, n)
    inv_sqrt = jnp.full((1, 1), 1.0 / (dh ** 0.5), f32)
    # kernel-layout bias terms: [B,H,N,1] column / [B,H,1,N] row (avoids
    # in-kernel transposes), c0 [H,1,1]
    # kernel-layout adapters are plain jnp ops, so autodiff maps the
    # kernel's kernel-layout cotangents (dcq [B,H,N,1], ...) back to the
    # caller's [B,N,H] layouts automatically
    cq_k = cq.astype(f32).transpose(0, 2, 1)[:, :, :, None]
    ck_k = ck.astype(f32).transpose(0, 2, 1)[:, :, None, :]
    c0_k = c0.reshape(h, 1, 1).astype(f32)
    return _fused(xa, x.astype(xa.dtype), cq_k, ck_k, c0_k, vw, pe_arr,
                  deg_arr, qmask, kmask, inv_sqrt)


def fused_graphit_attention_ref(xa, x, cq, ck, c0, vw, node_mask, pe=None,
                                degree=None):
    """jnp twin (same math, materialized tensors)."""
    from feta_tmlr_tpu.ops.attention import modulated_attention_from_scores
    b, h, n, d = xa.shape
    dh = d // h
    scores = (jnp.einsum("bhnd,bmd->bhnm", xa, x)
              + cq.transpose(0, 2, 1)[:, :, :, None]
              + ck.transpose(0, 2, 1)[:, :, None, :]
              + c0.reshape(1, h, 1, 1)) / (dh ** 0.5)
    _, attn = modulated_attention_from_scores(
        scores, None, node_mask, pe=pe, degree=degree, values_needed=False)
    return jnp.einsum("bhnm,bhmf->bnf", attn, vw)
