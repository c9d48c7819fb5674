"""Pallas TPU kernel: fused GraphiT attention modulation.

The GraphiT probability chain — masked softmax over keys, elementwise
multiply by the PE kernel, per-key degree rescale, row re-normalization,
query/key masking (transformer/models.py semantics, see
ops/attention.py) — is a soup of ~8 elementwise/row-reduce ops over
[B, H, N, N] tensors; unfused it costs one HBM round trip per op in both
directions. This kernel computes the whole chain in VMEM in one pass per
(batch, head) grid cell, with a hand-derived backward kernel (gradients are
needed only w.r.t. the scores: pe/degree/masks are data).

The jnp twin is `ops.attention.modulated_attention_from_scores` (attention
output); `tests/test_pallas_modulation.py` asserts fwd and bwd equality.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-9


def _fwd_kernel(scores_ref, pe_ref, deg_ref, qmask_ref, kmask_ref, out_ref):
    # one grid cell per (batch row, head block, query-row block). At
    # small N the block is ALL heads and ALL rows; at large N `_tile`
    # shrinks heads, then query rows, so the block plus temporaries fits
    # the scoped-VMEM stack (all-heads overflowed at N=512/H=8, all-rows
    # at N=1024/H=8 — BASELINE.md). The chain is row-local, so query
    # tiling is exact.
    kmask = kmask_ref[0]                          # [1, N] broadcast row
    qmask = qmask_ref[0]                          # [N, 1]
    pd = pe_ref[0] * deg_ref[0]                   # [N, N] modulation
    h = scores_ref.shape[1]
    for hi in range(h):                           # static unroll, in-VMEM
        s = scores_ref[0, hi]                     # [N, N]
        s = jnp.where(kmask > 0, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / e.sum(-1, keepdims=True)
        t = a * pd
        denom = t.sum(-1, keepdims=True)
        attn = t / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
        out_ref[0, hi] = attn * qmask * kmask


def _bwd_kernel(scores_ref, pe_ref, deg_ref, qmask_ref, kmask_ref, g_ref,
                ds_ref):
    # recompute forward internals (cheaper than saving them)
    kmask = kmask_ref[0]
    qmask = qmask_ref[0]
    p = pe_ref[0] * deg_ref[0]                    # combined modulation
    h = scores_ref.shape[1]
    for hi in range(h):
        s = scores_ref[0, hi]
        s = jnp.where(kmask > 0, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / e.sum(-1, keepdims=True)
        u = a * p
        denom = u.sum(-1, keepdims=True)
        safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
        guard = (jnp.abs(denom) > _EPS).astype(s.dtype)

        g = g_ref[0, hi] * qmask * kmask          # [N, N]
        r = (g * u).sum(-1, keepdims=True)
        # guard applies only to the denominator's own dependence on u: when
        # |denom| <= eps the jnp twin divides by the constant 1.0, whose
        # autodiff is the identity (du = g), NOT zero
        du = g / safe - (r / (safe * safe)) * guard
        da = du * p
        ds = a * (da - (da * a).sum(-1, keepdims=True))
        ds_ref[0, hi] = ds


def _tile(h: int, n: int, itemsize: int):
    """(head block, query-row block): the whole modulation chain is
    row-local (softmax over keys, rowsum renorm), so programs can tile
    the query axis freely. Shrink heads first (keeps full [N] rows per
    VPU op), then rows, until the score block plus ~6 working
    temporaries fits a conservative slice of the 16 MB scoped-VMEM
    stack (the all-rows variant overflowed the compile at N=1024/H=8 —
    `Scoped allocation ... 25.02M and limit 16.00M`)."""
    budget = 6 * 1024 * 1024
    cost = lambda hb, bq: hb * bq * n * itemsize * 6
    hb, bq = h, n
    while cost(hb, bq) > budget and hb > 1:
        hb -= 1
        while h % hb:
            hb -= 1
    # query rows shrink all the way to 1 if needed (row blocks prefer
    # multiples of 8 sublanes but correctness only needs a divisor of n):
    # at hb=1, bq=1 the cost is n*itemsize*6, feasible for any realistic N
    # — the earlier floor of 128 made N>=~4096 f32 bust the budget
    while cost(hb, bq) > budget and bq > 1:
        nb = bq // 2
        while n % nb and nb > 1:
            nb -= 1
        if nb == bq:
            break
        bq = nb
    return hb, bq


def modulation_tile_feasible(h: int, n: int, itemsize: int = 4) -> bool:
    """True if `_tile` can find a block assignment within the VMEM
    budget — consulted by the auto gate so enormous N falls back to the
    XLA chain instead of failing to compile."""
    hb, bq = _tile(h, n, itemsize)
    return hb * bq * n * itemsize * 6 <= 6 * 1024 * 1024


def _pallas_call(kernel, scores, pe, deg, qmask, kmask, extra=()):
    b, h, n, _ = scores.shape
    hb, bq = _tile(h, n, scores.dtype.itemsize)
    hspec = lambda: pl.BlockSpec((1, hb, bq, n),
                                 lambda i, j, q: (i, j, q, 0),
                                 memory_space=pltpu.VMEM)
    specs = [
        hspec(),                                         # scores block
        pl.BlockSpec((1, bq, n), lambda i, j, q: (i, q, 0),
                     memory_space=pltpu.VMEM),           # pe (query rows)
        pl.BlockSpec((1, 1, n), lambda i, j, q: (i, 0, 0),
                     memory_space=pltpu.VMEM),           # degree row
        pl.BlockSpec((1, bq, 1), lambda i, j, q: (i, q, 0),
                     memory_space=pltpu.VMEM),           # query mask col
        pl.BlockSpec((1, 1, n), lambda i, j, q: (i, 0, 0),
                     memory_space=pltpu.VMEM),           # key mask row
    ]
    args = [scores, pe, deg, qmask, kmask]
    for arr in extra:
        specs.append(hspec())
        args.append(arr)
    return pl.pallas_call(
        kernel,
        grid=(b, h // hb, n // bq),
        in_specs=specs,
        out_specs=hspec(),
        out_shape=jax.ShapeDtypeStruct(scores.shape, scores.dtype),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _modulate(scores, pe, deg, qmask, kmask):
    return _pallas_call(_fwd_kernel, scores, pe, deg, qmask, kmask)


def _modulate_fwd(scores, pe, deg, qmask, kmask):
    out = _pallas_call(_fwd_kernel, scores, pe, deg, qmask, kmask)
    return out, (scores, pe, deg, qmask, kmask)


def _modulate_bwd(res, g):
    scores, pe, deg, qmask, kmask = res
    ds = _pallas_call(_bwd_kernel, scores, pe, deg, qmask, kmask,
                      extra=(g,))
    # pe/degree/masks are dataset constants — zero cotangents
    return (ds, jnp.zeros_like(pe), jnp.zeros_like(deg),
            jnp.zeros_like(qmask), jnp.zeros_like(kmask))


_modulate.defvjp(_modulate_fwd, _modulate_bwd)


def fused_modulated_attention(
    scores,
    node_mask,
    pe: Optional[jnp.ndarray] = None,
    degree: Optional[jnp.ndarray] = None,
):
    """attn [B,H,N,N] from scaled scores, fused in one Pallas kernel.

    Differentiable w.r.t. scores (pe/degree/masks are treated as data,
    matching the training semantics: both are dataset constants).
    """
    b, h, n, _ = scores.shape
    dtype = scores.dtype
    pe_arr = pe.astype(dtype) if pe is not None \
        else jnp.ones((b, n, n), dtype)
    deg_arr = (degree.astype(dtype) if degree is not None
               else jnp.ones((b, n), dtype)).reshape(b, 1, n)
    qmask = node_mask.astype(dtype).reshape(b, n, 1)
    kmask = node_mask.astype(dtype).reshape(b, 1, n)
    return _modulate(scores, pe_arr, deg_arr, qmask, kmask)
