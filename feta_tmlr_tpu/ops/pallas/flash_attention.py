"""Pallas TPU kernel: query-blocked (online-softmax) fused GraphiT attention.

Same math as `fused_attention.fused_graphit_attention` (the GraphiT
modulated-attention chain of the reconstructed DiffTransformerEncoderLayer,
reference call-site contract transformer/models.py:92-93,166-167):

  scores_h = (xa_h x^T + cq + ck + c0) / sqrt(dh)
  a        = softmax_masked(scores_h)
  u        = a * (pe * degree)
  attn     = u / sum_k(u)  [eps-guarded] * qmask * kmask
  out      = sum_h attn_h @ vw_h

but tiled flash-attention style over (query block, key block) so that no
[N, N] tile ever resides whole in VMEM and no [B, H, N, N] tensor ever
reaches HBM. This removes the N>=1024 VMEM wall of the single-block
kernel (recorded in BASELINE.md) — the per-program working set is
O(Bq*Bk + Bq*D + Bk*D) regardless of N.

Grid layout (round-4 tuning): heads are the INNERMOST grid axis with
per-head scratch accumulators. The pe/degree/mask operands' index maps
do not depend on the head, so consecutive head iterations keep the pe
tile resident in VMEM and the [N, N] modulation kernel streams from HBM
ONCE per (q, k) tile instead of once per head — with H=8 that removes
~7/8 of what the old (b, h, nq, nk) order made the dominant stream at
large N (the root cause of the shrinking large-N win recorded in
BASELINE.md: 1.42x at N=1024 but 1.08x at N=2048). The pe/degree blocks
may also arrive in bf16 (mod_dtype) to halve that stream again — the
same policy as the XLA chain's FETA_BF16_MODULATION; scores and all
accumulation stay f32.

Online accumulation: GraphiT's renormalization makes the row statistics a
triple (m = running max, S_e = sum_k e, S_u = sum_k e*pd) instead of
softmax's usual pair; with e_ij = exp(s_ij - m_i) the output closed form is

  out_i = qmask_i * (sum_k e*pd*kmask @ vw) / (|S_u/S_e| > eps ? S_u : S_e)

(the eps branch reproduces the twin's `where(|denom|>eps, denom, 1)` with
denom = S_u/S_e and u = e*pd/S_e). The forward emits per-head outputs plus
(m, S_e, S_u) so the backward is single-pass: the two full-row reductions
the gradient needs collapse to closed forms of saved statistics —
  r_i = safe_i * sum_d(g * out_head)      (the renorm-denominator term)
  sum_j(da*a)_i = (1 - guard_i) * r_i     (the softmax-jacobian term)
— derived in tests/test_flash_attention.py's twin-equality suite. The
backward recomputes score blocks twice (one kernel over query blocks for
dxa/dcq, one over key blocks for dvw/dck/dx) — the standard dq/dkv split
(FlashAttention-2 does the same; a single-pass variant would have to
round-trip k-indexed accumulators through HBM every q step).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-9


def _pick_block(n: int, prefer: int = 512) -> int:
    """Largest power-of-two block <= prefer that divides n (falls back to
    n itself for odd sizes — then the kernel degenerates to single-block,
    still correct). `prefer` defaults from the on-chip block sweep
    (examples/flash_block_sweep.py, FETA_FLASH_BLOCK overrides)."""
    prefer = int(os.environ.get("FETA_FLASH_BLOCK", prefer))
    bs = prefer
    while bs >= 128:
        if n % bs == 0 and n >= bs:
            return bs
        bs //= 2
    return n


def _score_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, inv_sqrt_ref,
                 kmask_ref):
    """One (query block, key block) tile of masked scaled scores [Bq, Bk]."""
    s = (jnp.dot(xa_ref[0, 0], x_ref[0].T,
                 preferred_element_type=jnp.float32)
         + cq_ref[0, 0] + ck_ref[0, 0] + c0_ref[0, 0]) * inv_sqrt_ref[0, 0]
    return jnp.where(kmask_ref[0] > 0, s, _NEG_INF)


def _pd_block(pe_ref, deg_ref):
    """Modulation tile in f32 regardless of the io dtype (bf16 streams
    are converted before the multiply)."""
    return pe_ref[0].astype(jnp.float32) * deg_ref[0].astype(jnp.float32)


# ---------------------------------------------------------------- forward

def _fwd_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref,
                outh_ref, m_ref, se_ref, su_ref,
                m_s, se_s, su_s, acc_s):
    # grid (b, nq, nk, h): heads innermost so the pe/deg/mask tiles stay
    # resident across the head loop; per-head running stats in scratch
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    hi = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_s[hi] = jnp.full_like(m_s[hi], -jnp.inf)
        se_s[hi] = jnp.zeros_like(se_s[hi])
        su_s[hi] = jnp.zeros_like(su_s[hi])
        acc_s[hi] = jnp.zeros_like(acc_s[hi])

    s = _score_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, inv_sqrt_ref,
                     kmask_ref)
    km = kmask_ref[0].astype(jnp.float32)            # [1, Bk]
    m_prev = m_s[hi]                                 # [Bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    scale = jnp.exp(m_prev - m_new)                  # 0 at first block
    e = jnp.exp(s - m_new)                           # [Bq, Bk]
    pd = _pd_block(pe_ref, deg_ref)                  # [Bq, Bk]
    w = e * pd
    se_s[hi] = se_s[hi] * scale + e.sum(-1, keepdims=True)
    su_s[hi] = su_s[hi] * scale + w.sum(-1, keepdims=True)
    acc_s[hi] = acc_s[hi] * scale + jnp.dot(
        (w * km).astype(vw_ref.dtype), vw_ref[0, 0],
        preferred_element_type=jnp.float32)
    m_s[hi] = m_new

    @pl.when(ki == nk - 1)
    def _emit():
        se = se_s[hi]
        su = su_s[hi]
        guard = jnp.abs(su / se) > _EPS
        div = jnp.where(guard, su, se)
        outh_ref[0, 0] = (acc_s[hi] / div
                          * qmask_ref[0].astype(jnp.float32)).astype(
            outh_ref.dtype)
        m_ref[0, 0] = m_s[hi]
        se_ref[0, 0] = se
        su_ref[0, 0] = su


# ------------------------------------------------- head-folded variants
#
# At small grids (B=1-2, N>=1024 -> 16-128 programs of modest work) the
# per-program overhead dominates and the (b, nq, nk, h) grid wins nothing
# (N=2048/B=1: 1.02x, BASELINE.md round-4 sweep). These variants drop the
# head grid axis and loop the (static) head count INSIDE the kernel: 8x
# fewer grid steps, pe/x tiles read once per (q, k) tile, identical math.
# All-heads blocks fit VMEM comfortably at d_model=64 (xa/vw blocks are
# H x Bq x d ~ 0.5 MB bf16 at Bq=512).



def _hf_params():
    """Folded kernels: the unrolled head loop's temporaries exceed the
    default 16 MB scoped-VMEM stack by a hair at 256-blocks (16.19 MB
    measured); raise the per-kernel limit (v5e VMEM is far larger than
    the 16 MB default scope)."""
    return pltpu.CompilerParams(vmem_limit_bytes=int(os.environ.get(
        "FETA_FLASH_VMEM_LIMIT", str(100 * 1024 * 1024))))


def _fwd_kernel_hf(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                   deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref,
                   outh_ref, m_ref, se_ref, su_ref,
                   m_s, se_s, su_s, acc_s):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    nh = xa_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        se_s[...] = jnp.zeros_like(se_s)
        su_s[...] = jnp.zeros_like(su_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    pd = _pd_block(pe_ref, deg_ref)                  # shared across heads
    km = kmask_ref[0].astype(jnp.float32)
    qm = qmask_ref[0].astype(jnp.float32)

    # fori_loop (not an unrolled python loop): Mosaic reuses one
    # iteration's stack across heads — the unrolled form keeps every
    # head's [Bq, Bk] f32 temporaries live at once and overflows scoped
    # VMEM at Bq=512/H=8 (31.5 MB vs the 16 MB stack, bisected
    # 2026-08-19 on the N=1024 SBM step)
    def _head(hh, _):
        s = (jnp.dot(xa_ref[0, hh], x_ref[0].T,
                     preferred_element_type=jnp.float32)
             + cq_ref[0, hh] + ck_ref[0, hh]
             + c0_ref[hh]) * inv_sqrt_ref[0, 0]
        s = jnp.where(kmask_ref[0] > 0, s, _NEG_INF)
        m_prev = m_s[hh]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        scale = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new)
        w = e * pd
        se_s[hh] = se_s[hh] * scale + e.sum(-1, keepdims=True)
        su_s[hh] = su_s[hh] * scale + w.sum(-1, keepdims=True)
        acc_s[hh] = acc_s[hh] * scale + jnp.dot(
            (w * km).astype(vw_ref.dtype), vw_ref[0, hh],
            preferred_element_type=jnp.float32)
        m_s[hh] = m_new

        @pl.when(ki == nk - 1)
        def _emit():
            se = se_s[hh]
            su = su_s[hh]
            guard = jnp.abs(su / se) > _EPS
            div = jnp.where(guard, su, se)
            outh_ref[0, hh] = (acc_s[hh] / div * qm).astype(outh_ref.dtype)
            m_ref[0, hh] = m_s[hh]
            se_ref[0, hh] = se
            su_ref[0, hh] = su
        return 0

    jax.lax.fori_loop(0, nh, _head, 0)


def _fwd_specs_hf(n, d, h, bq, bk, dv=None):
    """BlockSpecs over the head-folded forward grid (b, nq, nk)."""
    dv = dv or d
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    return [
        vm((1, h, bq, d), lambda bi, qi, ki: (bi, 0, qi, 0)),   # xa
        vm((1, bk, d), lambda bi, qi, ki: (bi, ki, 0)),         # x
        vm((1, h, bq, 1), lambda bi, qi, ki: (bi, 0, qi, 0)),   # cq
        vm((1, h, 1, bk), lambda bi, qi, ki: (bi, 0, 0, ki)),   # ck
        vm((h, 1, 1), lambda bi, qi, ki: (0, 0, 0)),            # c0
        vm((1, h, bk, dv), lambda bi, qi, ki: (bi, 0, ki, 0)),  # vw
        vm((1, bq, bk), lambda bi, qi, ki: (bi, qi, ki)),       # pe
        vm((1, 1, bk), lambda bi, qi, ki: (bi, 0, ki)),         # deg
        vm((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0)),         # qmask
        vm((1, 1, bk), lambda bi, qi, ki: (bi, 0, ki)),         # kmask
        vm((1, 1), lambda bi, qi, ki: (0, 0)),                  # inv_sqrt
    ]


def _call_fwd_hf(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
                 bq, bk):
    b, h, n, d = xa.shape
    dv = vw.shape[-1]
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    stat = lambda: vm((1, h, bq, 1), lambda bi, qi, ki: (bi, 0, qi, 0))
    return pl.pallas_call(
        _fwd_kernel_hf,
        grid=(b, n // bq, n // bk),
        in_specs=_fwd_specs_hf(n, d, h, bq, bk, dv),
        out_specs=(
            vm((1, h, bq, dv), lambda bi, qi, ki: (bi, 0, qi, 0)),
            stat(), stat(), stat()),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dv), vw.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, dv), jnp.float32)],
        compiler_params=_hf_params(),
    )(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)


def _bwd_q_kernel_hf(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref,
                     pe_ref, deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref,
                     g_ref, m_ref, ise_ref, qa_ref, beta_ref, c_ref,
                     dxa_ref, dcq_ref, dxa_s, dcq_s):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    nh = xa_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dxa_s[...] = jnp.zeros_like(dxa_s)
        dcq_s[...] = jnp.zeros_like(dcq_s)

    pd = _pd_block(pe_ref, deg_ref)
    km = kmask_ref[0].astype(jnp.float32)

    def _head(hh, _):
        x_blk = x_ref[0]
        s = (jnp.dot(xa_ref[0, hh], x_blk.T,
                     preferred_element_type=jnp.float32)
             + cq_ref[0, hh] + ck_ref[0, hh]
             + c0_ref[hh]) * inv_sqrt_ref[0, 0]
        s = jnp.where(kmask_ref[0] > 0, s, _NEG_INF)
        e = jnp.exp(s - m_ref[0, hh])
        a = e * ise_ref[0, hh]
        g_attn = jnp.dot(g_ref[0, hh], vw_ref[0, hh].T,
                         preferred_element_type=jnp.float32)
        du = g_attn * km * qa_ref[0, hh] - beta_ref[0, hh]
        ds = a * (du * pd - c_ref[0, hh]) * inv_sqrt_ref[0, 0]
        dxa_s[hh] += jnp.dot(ds.astype(x_blk.dtype), x_blk,
                             preferred_element_type=jnp.float32)
        dcq_s[hh] += ds.sum(-1, keepdims=True)

        @pl.when(ki == nk - 1)
        def _emit():
            dxa_ref[0, hh] = dxa_s[hh].astype(dxa_ref.dtype)
            dcq_ref[0, hh] = dcq_s[hh]
        return 0

    jax.lax.fori_loop(0, xa_ref.shape[1], _head, 0)


def _bwd_k_kernel_hf(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref,
                     pe_ref, deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref,
                     g_ref, m_ref, ise_ref, qa_ref, beta_ref, c_ref,
                     dvw_ref, dck_ref, dx_ref, dvw_s, dck_s, dx_s):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    nh = xa_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dvw_s[...] = jnp.zeros_like(dvw_s)
        dck_s[...] = jnp.zeros_like(dck_s)
        dx_s[...] = jnp.zeros_like(dx_s)

    pd = _pd_block(pe_ref, deg_ref)
    km = kmask_ref[0].astype(jnp.float32)

    def _head(hh, _):
        x_blk = x_ref[0]
        s = (jnp.dot(xa_ref[0, hh], x_blk.T,
                     preferred_element_type=jnp.float32)
             + cq_ref[0, hh] + ck_ref[0, hh]
             + c0_ref[hh]) * inv_sqrt_ref[0, 0]
        s = jnp.where(kmask_ref[0] > 0, s, _NEG_INF)
        e = jnp.exp(s - m_ref[0, hh])
        a = e * ise_ref[0, hh]
        attn = a * pd * qa_ref[0, hh] * km
        g = g_ref[0, hh]
        g_attn = jnp.dot(g, vw_ref[0, hh].T,
                         preferred_element_type=jnp.float32)
        du = g_attn * km * qa_ref[0, hh] - beta_ref[0, hh]
        ds = a * (du * pd - c_ref[0, hh]) * inv_sqrt_ref[0, 0]
        dvw_s[hh] += jnp.dot(attn.astype(g.dtype).T, g,
                             preferred_element_type=jnp.float32)
        dck_s[hh] += ds.sum(0, keepdims=True)
        dx_s[...] += jnp.dot(ds.astype(xa_ref.dtype).T, xa_ref[0, hh],
                             preferred_element_type=jnp.float32)

        @pl.when(qi == nq - 1)
        def _emit():
            dvw_ref[0, hh] = dvw_s[hh].astype(dvw_ref.dtype)
            dck_ref[0, hh] = dck_s[hh]
        return 0

    jax.lax.fori_loop(0, xa_ref.shape[1], _head, 0)

    @pl.when(qi == nq - 1)
    def _emit_dx():
        dx_ref[0] = dx_s[...].astype(dx_ref.dtype)


def _bwd_specs_hf(n, d, h, bq, bk, dv, for_k):
    """Inputs over grid (b, nq, nk) [q pass] or (b, nk, nq) [k pass]."""
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    if for_k:
        qix = lambda bi, ki, qi: (bi, 0, qi, 0)
        kix3 = lambda bi, ki, qi: (bi, ki, 0)
        pix = lambda bi, ki, qi: (bi, qi, ki)
        ck_ix = lambda bi, ki, qi: (bi, 0, 0, ki)
        deg_ix = lambda bi, ki, qi: (bi, 0, ki)
        qm_ix = lambda bi, ki, qi: (bi, qi, 0)
    else:
        qix = lambda bi, qi, ki: (bi, 0, qi, 0)
        kix3 = lambda bi, qi, ki: (bi, ki, 0)
        pix = lambda bi, qi, ki: (bi, qi, ki)
        ck_ix = lambda bi, qi, ki: (bi, 0, 0, ki)
        deg_ix = lambda bi, qi, ki: (bi, 0, ki)
        qm_ix = lambda bi, qi, ki: (bi, qi, 0)
    zero3 = lambda *_: (0, 0, 0)
    zero2 = lambda *_: (0, 0)
    specs = [
        vm((1, h, bq, d), qix),                                 # xa
        vm((1, bk, d), kix3),                                   # x
        vm((1, h, bq, 1), qix),                                 # cq
        vm((1, h, 1, bk), ck_ix),                               # ck
        vm((h, 1, 1), zero3),                                   # c0
        vm((1, h, bk, dv), lambda *ids: (ids[0], 0, ids[1 if for_k
                                                        else 2], 0)),  # vw
        vm((1, bq, bk), pix),                                   # pe
        vm((1, 1, bk), deg_ix),                                 # deg
        vm((1, bq, 1), qm_ix),                                  # qmask
        vm((1, 1, bk), deg_ix),                                 # kmask
        vm((1, 1), zero2),                                      # inv_sqrt
        vm((1, h, bq, dv), qix),                                # g
    ]
    specs.extend([vm((1, h, bq, 1), qix)] * 5)   # m, ise, qa, beta, c
    return specs


def _call_bwd_hf(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
                 g, m, ise, qa, beta, c, bq, bk):
    b, h, n, d = xa.shape
    dv = vw.shape[-1]
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    args = (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
            g, m, ise, qa, beta, c)
    dxa, dcq = pl.pallas_call(
        _bwd_q_kernel_hf,
        grid=(b, n // bq, n // bk),
        in_specs=_bwd_specs_hf(n, d, h, bq, bk, dv, for_k=False),
        out_specs=(
            vm((1, h, bq, d), lambda bi, qi, ki: (bi, 0, qi, 0)),
            vm((1, h, bq, 1), lambda bi, qi, ki: (bi, 0, qi, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), xa.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((h, bq, d), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32)],
        compiler_params=_hf_params(),
    )(*args)
    dvw, dck, dx = pl.pallas_call(
        _bwd_k_kernel_hf,
        grid=(b, n // bk, n // bq),
        in_specs=_bwd_specs_hf(n, d, h, bq, bk, dv, for_k=True),
        out_specs=(
            vm((1, h, bk, dv), lambda bi, ki, qi: (bi, 0, ki, 0)),
            vm((1, h, 1, bk), lambda bi, ki, qi: (bi, 0, 0, ki)),
            vm((1, bk, d), lambda bi, ki, qi: (bi, ki, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dv), vw.dtype),
            jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), x.dtype)),
        scratch_shapes=[pltpu.VMEM((h, bk, dv), jnp.float32),
                        pltpu.VMEM((h, 1, bk), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=_hf_params(),
    )(*args)
    return dxa, dcq, dvw, dck, dx


def _fwd_specs(n, d, bq, bk, dv=None):
    """BlockSpecs over the forward grid (b, nq, nk, h). `dv` is the value
    feature width (== d for the fused V@Wout path, head_dim for the
    per-head-outputs path)."""
    dv = dv or d
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    return [
        vm((1, 1, bq, d), lambda bi, qi, ki, hi: (bi, hi, qi, 0)),  # xa
        vm((1, bk, d), lambda bi, qi, ki, hi: (bi, ki, 0)),         # x
        vm((1, 1, bq, 1), lambda bi, qi, ki, hi: (bi, hi, qi, 0)),  # cq
        vm((1, 1, 1, bk), lambda bi, qi, ki, hi: (bi, hi, 0, ki)),  # ck
        vm((1, 1, 1), lambda bi, qi, ki, hi: (hi, 0, 0)),           # c0
        vm((1, 1, bk, dv), lambda bi, qi, ki, hi: (bi, hi, ki, 0)),  # vw
        vm((1, bq, bk), lambda bi, qi, ki, hi: (bi, qi, ki)),       # pe
        vm((1, 1, bk), lambda bi, qi, ki, hi: (bi, 0, ki)),         # deg
        vm((1, bq, 1), lambda bi, qi, ki, hi: (bi, qi, 0)),         # qmask
        vm((1, 1, bk), lambda bi, qi, ki, hi: (bi, 0, ki)),         # kmask
        vm((1, 1), lambda bi, qi, ki, hi: (0, 0)),                  # inv_sqrt
    ]


def _call_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
              bq, bk):
    b, h, n, d = xa.shape
    dv = vw.shape[-1]
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    stat = lambda: vm((1, 1, bq, 1), lambda bi, qi, ki, hi: (bi, hi, qi, 0))
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b, n // bq, n // bk, h),
        in_specs=_fwd_specs(n, d, bq, bk, dv),
        out_specs=(
            vm((1, 1, bq, dv), lambda bi, qi, ki, hi: (bi, hi, qi, 0)),
            stat(), stat(), stat()),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dv), vw.dtype),     # outh
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),   # m
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),   # S_e
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),   # S_u
        ),
        scratch_shapes=[pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32),
                        pltpu.VMEM((h, bq, dv), jnp.float32)],
    )(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt)


# --------------------------------------------------------------- backward

def _attn_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, inv_sqrt_ref,
                kmask_ref, pe_ref, deg_ref, m_ref, ise_ref, qa_ref):
    """Recompute one attention tile [Bq, Bk] from the saved statistics
    (identical to the forward's normalized, masked attention)."""
    s = _score_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, inv_sqrt_ref,
                     kmask_ref)
    e = jnp.exp(s - m_ref[0, 0])
    a = e * ise_ref[0, 0]                            # [Bq, Bk]
    pd = _pd_block(pe_ref, deg_ref)
    km = kmask_ref[0].astype(jnp.float32)
    attn = a * pd * qa_ref[0, 0] * km
    return a, pd, km, attn


def _recompute_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, inv_sqrt_ref,
                     kmask_ref, pe_ref, deg_ref, vw_ref, g_ref,
                     m_ref, ise_ref, qa_ref, beta_ref, c_ref):
    """Shared bwd tile math: recompute a, then ds [Bq, Bk] and attn.

    Row constants (precomputed outside from the saved statistics):
      ise = 1/S_e;  qa = qmask/safe;  beta = guard*r/safe^2;  c = (1-guard)*r
    with r = safe * sum_d(g * out_head).
    g_ref is the PER-HEAD cotangent block [1, 1, Bq, dv] (the head-summed
    path broadcasts its g over heads before the call).
    """
    a, pd, km, attn = _attn_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref,
                                  inv_sqrt_ref, kmask_ref, pe_ref, deg_ref,
                                  m_ref, ise_ref, qa_ref)
    g_attn = jnp.dot(g_ref[0, 0], vw_ref[0, 0].T,
                     preferred_element_type=jnp.float32)
    du = g_attn * km * qa_ref[0, 0] - beta_ref[0, 0]
    ds = a * (du * pd - c_ref[0, 0]) * inv_sqrt_ref[0, 0]
    return ds, attn


def _bwd_q_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                  deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref, g_ref,
                  m_ref, ise_ref, qa_ref, beta_ref, c_ref,
                  dxa_ref, dcq_ref, dxa_s, dcq_s):
    """Query-block pass: dxa = ds @ x, dcq = row-sums; grid (b,nq,nk,h)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    hi = pl.program_id(3)
    ds, _ = _recompute_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref,
                             inv_sqrt_ref, kmask_ref, pe_ref, deg_ref,
                             vw_ref, g_ref, m_ref, ise_ref, qa_ref,
                             beta_ref, c_ref)

    @pl.when(ki == 0)
    def _init():
        dxa_s[hi] = jnp.zeros_like(dxa_s[hi])
        dcq_s[hi] = jnp.zeros_like(dcq_s[hi])

    dxa_s[hi] += jnp.dot(ds.astype(x_ref.dtype), x_ref[0],
                         preferred_element_type=jnp.float32)
    dcq_s[hi] += ds.sum(-1, keepdims=True)

    @pl.when(ki == nk - 1)
    def _emit():
        dxa_ref[0, 0] = dxa_s[hi].astype(dxa_ref.dtype)
        dcq_ref[0, 0] = dcq_s[hi]


def _bwd_k_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, vw_ref, pe_ref,
                  deg_ref, qmask_ref, kmask_ref, inv_sqrt_ref, g_ref,
                  m_ref, ise_ref, qa_ref, beta_ref, c_ref,
                  dvw_ref, dck_ref, dx_ref, dvw_s, dck_s, dx_s):
    """Key-block pass: dvw = attn^T g, dck = col-sums, dx = sum_h ds^T xa;
    grid (b, nk, nq, h) — h innermost (pe tile resident across heads),
    q second-inner so dx accumulates over both."""
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    hi = pl.program_id(3)
    nh = pl.num_programs(3)
    ds, attn = _recompute_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref,
                                inv_sqrt_ref, kmask_ref, pe_ref, deg_ref,
                                vw_ref, g_ref, m_ref, ise_ref, qa_ref,
                                beta_ref, c_ref)

    @pl.when(qi == 0)
    def _init_head():
        dvw_s[hi] = jnp.zeros_like(dvw_s[hi])
        dck_s[hi] = jnp.zeros_like(dck_s[hi])

    @pl.when(jnp.logical_and(hi == 0, qi == 0))
    def _init_row():
        dx_s[...] = jnp.zeros_like(dx_s)

    g = g_ref[0, 0]
    dvw_s[hi] += jnp.dot(attn.astype(g.dtype).T, g,
                         preferred_element_type=jnp.float32)
    dck_s[hi] += ds.sum(0, keepdims=True)
    dx_s[...] += jnp.dot(ds.astype(xa_ref.dtype).T, xa_ref[0, 0],
                         preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _emit_head():
        dvw_ref[0, 0] = dvw_s[hi].astype(dvw_ref.dtype)
        dck_ref[0, 0] = dck_s[hi]

    @pl.when(jnp.logical_and(hi == nh - 1, qi == nq - 1))
    def _emit_row():
        dx_ref[0] = dx_s[...].astype(dx_ref.dtype)


def _bwd_specs_q(n, d, bq, bk, dv=None):
    """Inputs over grid (b, nq, nk, h): forward specs + g + row constants.
    g is the PER-HEAD cotangent [B, H, N, dv]."""
    dv = dv or d
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    specs = _fwd_specs(n, d, bq, bk, dv)
    specs.append(vm((1, 1, bq, dv),
                    lambda bi, qi, ki, hi: (bi, hi, qi, 0)))  # g
    stat = vm((1, 1, bq, 1), lambda bi, qi, ki, hi: (bi, hi, qi, 0))
    specs.extend([stat] * 5)                  # m, ise, qa, beta, c
    return specs


def _bwd_specs_k(n, d, bq, bk, dv=None):
    """Same operands over grid (b, nk, nq, h)."""
    dv = dv or d
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    specs = [
        vm((1, 1, bq, d), lambda bi, ki, qi, hi: (bi, hi, qi, 0)),  # xa
        vm((1, bk, d), lambda bi, ki, qi, hi: (bi, ki, 0)),         # x
        vm((1, 1, bq, 1), lambda bi, ki, qi, hi: (bi, hi, qi, 0)),  # cq
        vm((1, 1, 1, bk), lambda bi, ki, qi, hi: (bi, hi, 0, ki)),  # ck
        vm((1, 1, 1), lambda bi, ki, qi, hi: (hi, 0, 0)),           # c0
        vm((1, 1, bk, dv), lambda bi, ki, qi, hi: (bi, hi, ki, 0)),  # vw
        vm((1, bq, bk), lambda bi, ki, qi, hi: (bi, qi, ki)),       # pe
        vm((1, 1, bk), lambda bi, ki, qi, hi: (bi, 0, ki)),         # deg
        vm((1, bq, 1), lambda bi, ki, qi, hi: (bi, qi, 0)),         # qmask
        vm((1, 1, bk), lambda bi, ki, qi, hi: (bi, 0, ki)),         # kmask
        vm((1, 1), lambda bi, ki, qi, hi: (0, 0)),                  # inv_sqrt
        vm((1, 1, bq, dv), lambda bi, ki, qi, hi: (bi, hi, qi, 0)),  # g
    ]
    stat = vm((1, 1, bq, 1), lambda bi, ki, qi, hi: (bi, hi, qi, 0))
    specs.extend([stat] * 5)
    return specs


def _call_bwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
              g, m, ise, qa, beta, c, bq, bk):
    b, h, n, d = xa.shape
    dv = vw.shape[-1]
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    args = (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
            g, m, ise, qa, beta, c)
    dxa, dcq = pl.pallas_call(
        _bwd_q_kernel,
        grid=(b, n // bq, n // bk, h),
        in_specs=_bwd_specs_q(n, d, bq, bk, dv),
        out_specs=(
            vm((1, 1, bq, d), lambda bi, qi, ki, hi: (bi, hi, qi, 0)),
            vm((1, 1, bq, 1), lambda bi, qi, ki, hi: (bi, hi, qi, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), xa.dtype),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((h, bq, d), jnp.float32),
                        pltpu.VMEM((h, bq, 1), jnp.float32)],
    )(*args)
    dvw, dck, dx = pl.pallas_call(
        _bwd_k_kernel,
        grid=(b, n // bk, n // bq, h),
        in_specs=_bwd_specs_k(n, d, bq, bk, dv),
        out_specs=(
            vm((1, 1, bk, dv), lambda bi, ki, qi, hi: (bi, hi, ki, 0)),
            vm((1, 1, 1, bk), lambda bi, ki, qi, hi: (bi, hi, 0, ki)),
            vm((1, bk, d), lambda bi, ki, qi, hi: (bi, ki, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, dv), vw.dtype),
            jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), x.dtype)),
        scratch_shapes=[pltpu.VMEM((h, bk, dv), jnp.float32),
                        pltpu.VMEM((h, 1, bk), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
    )(*args)
    return dxa, dcq, dvw, dck, dx


# ------------------------------------------------------------ custom vjp

def _dispatch_fwd(hf):
    return _call_fwd_hf if hf else _call_fwd


def _dispatch_bwd(hf):
    return _call_bwd_hf if hf else _call_bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _flash(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt, bq, bk,
           hf=False):
    outh, _, _, _ = _dispatch_fwd(hf)(xa, x, cq, ck, c0, vw, pe, deg,
                                      qmask, kmask, inv_sqrt, bq, bk)
    return _head_sum(outh)                           # [B, N, D]


def _head_sum(outh):
    """Cross-head sum in f32 (matches the single-block kernel's f32 VMEM
    accumulator), cast back to the io dtype."""
    return outh.astype(jnp.float32).sum(axis=1).astype(outh.dtype)


def _flash_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
               bq, bk, hf=False):
    outh, m, se, su = _dispatch_fwd(hf)(xa, x, cq, ck, c0, vw, pe, deg,
                                        qmask, kmask, inv_sqrt, bq, bk)
    out = _head_sum(outh)
    res = (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
           outh, m, se, su)
    return out, res


def _bwd_common(res, gh, bq, bk, hf=False):
    """Shared backward given PER-HEAD cotangents gh [B, H, N, dv]."""
    (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
     outh, m, se, su) = res
    # row constants from the saved statistics (see module docstring)
    delta = jnp.einsum("bhnd,bhnd->bhn", gh.astype(jnp.float32),
                       outh.astype(jnp.float32))[..., None]  # [B,H,N,1]
    denom = su / se
    guard = (jnp.abs(denom) > _EPS).astype(jnp.float32)
    safe = jnp.where(guard > 0, denom, 1.0)
    r = safe * delta
    ise = 1.0 / se
    qa = qmask.astype(jnp.float32)[:, None] / safe   # [B,H,N,1]
    beta = (r / (safe * safe)) * guard
    cterm = (1.0 - guard) * r
    dxa, dcq, dvw, dck, dx = _dispatch_bwd(hf)(
        xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
        gh.astype(vw.dtype), m, ise, qa, beta, cterm, bq, bk)
    dc0 = dcq.sum(axis=(0, 2)).reshape(c0.shape)     # [H,1,1]
    zeros = lambda t: jnp.zeros_like(t)
    return (dxa, dx, dcq, dck, dc0, dvw, zeros(pe), zeros(deg),
            zeros(qmask), zeros(kmask), zeros(inv_sqrt))


def _flash_bwd(bq, bk, hf, res, g):
    b, h = res[0].shape[:2]
    n, d = g.shape[-2:]
    gh = jnp.broadcast_to(g[:, None], (b, h, n, d))  # head-summed output:
    return _bwd_common(res, gh, bq, bk, hf)          # same g to every head


_flash.defvjp(_flash_fwd, _flash_bwd)


# ------------------------------------------- per-head-outputs entry point

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _flash_heads(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
                 bq, bk, hf=False):
    """Per-head outputs [B, H, N, dv] PLUS the row statistics (m, S_e,
    S_u). The statistics are consumed only under stop_gradient (the
    coefficient head detaches attention, reference models.py:282), so the
    backward ignores their cotangents — exact for that usage."""
    return _dispatch_fwd(hf)(xa, x, cq, ck, c0, vw, pe, deg, qmask,
                             kmask, inv_sqrt, bq, bk)


def _flash_heads_fwd(xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask,
                     inv_sqrt, bq, bk, hf=False):
    outh, m, se, su = _dispatch_fwd(hf)(xa, x, cq, ck, c0, vw, pe, deg,
                                        qmask, kmask, inv_sqrt, bq, bk)
    res = (xa, x, cq, ck, c0, vw, pe, deg, qmask, kmask, inv_sqrt,
           outh, m, se, su)
    return (outh, m, se, su), res


def _flash_heads_bwd(bq, bk, hf, res, cts):
    gh, _gm, _gse, _gsu = cts      # stats feed stop_gradient consumers only
    return _bwd_common(res, gh, bq, bk, hf)


_flash_heads.defvjp(_flash_heads_fwd, _flash_heads_bwd)


# -------------------------- detached attention column statistics kernel

def _colstat_kernel(xa_ref, x_ref, cq_ref, ck_ref, c0_ref, pe_ref, deg_ref,
                    qmask_ref, kmask_ref, inv_sqrt_ref, m_ref, ise_ref,
                    qa_ref, wq_ref, colsum_ref, diag_ref, cs_s, dg_s):
    """Grid (b, nk, nq, h): recompute attention tiles from the saved
    forward statistics and accumulate per-key-column sums weighted by the
    per-query weight wq (ones -> plain column sums, dis -> the
    gcn_norm_directed numerator), plus the attention diagonal (needed for
    PyG's add_remaining_self_loops semantics). Forward-only: consumed via
    stop_gradient (the reference detaches attention before the
    coefficient GCN, models.py:282)."""
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    hi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        cs_s[hi] = jnp.zeros_like(cs_s[hi])
        dg_s[hi] = jnp.zeros_like(dg_s[hi])

    _, _, _, attn = _attn_block(xa_ref, x_ref, cq_ref, ck_ref, c0_ref,
                                inv_sqrt_ref, kmask_ref, pe_ref, deg_ref,
                                m_ref, ise_ref, qa_ref)
    cs_s[hi] += (attn * wq_ref[0, 0]).sum(0, keepdims=True)   # [1, Bk]

    @pl.when(qi == ki)                      # bq == bk: diagonal tile
    def _diag():
        bq, bk = attn.shape
        eye = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
        dg_s[hi] += (attn * eye.astype(attn.dtype)).sum(0, keepdims=True)

    @pl.when(qi == nq - 1)
    def _emit():
        colsum_ref[0, 0] = cs_s[hi]
        diag_ref[0, 0] = dg_s[hi]


def _call_colstat(xa, x, cq, ck, c0, pe, deg, qmask, kmask, inv_sqrt,
                  m, ise, qa, wq, bq, bk):
    b, h, n, d = xa.shape
    assert bq == bk, "colstat diagonal extraction assumes square tiles"
    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    stat = vm((1, 1, bq, 1), lambda bi, ki, qi, hi: (bi, hi, qi, 0))
    specs = [
        vm((1, 1, bq, d), lambda bi, ki, qi, hi: (bi, hi, qi, 0)),  # xa
        vm((1, bk, d), lambda bi, ki, qi, hi: (bi, ki, 0)),         # x
        vm((1, 1, bq, 1), lambda bi, ki, qi, hi: (bi, hi, qi, 0)),  # cq
        vm((1, 1, 1, bk), lambda bi, ki, qi, hi: (bi, hi, 0, ki)),  # ck
        vm((1, 1, 1), lambda bi, ki, qi, hi: (hi, 0, 0)),           # c0
        vm((1, bq, bk), lambda bi, ki, qi, hi: (bi, qi, ki)),       # pe
        vm((1, 1, bk), lambda bi, ki, qi, hi: (bi, 0, ki)),         # deg
        vm((1, bq, 1), lambda bi, ki, qi, hi: (bi, qi, 0)),         # qmask
        vm((1, 1, bk), lambda bi, ki, qi, hi: (bi, 0, ki)),         # kmask
        vm((1, 1), lambda bi, ki, qi, hi: (0, 0)),                  # inv_sqrt
        stat, stat, stat,                                           # m/ise/qa
        stat,                                                       # wq
    ]
    out = vm((1, 1, 1, bk), lambda bi, ki, qi, hi: (bi, hi, 0, ki))
    return pl.pallas_call(
        _colstat_kernel,
        grid=(b, n // bk, n // bq, h),
        in_specs=specs,
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, 1, n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((h, 1, bk), jnp.float32),
                        pltpu.VMEM((h, 1, bk), jnp.float32)],
    )(xa, x, cq, ck, c0, pe, deg, qmask, kmask, inv_sqrt, m, ise, qa, wq)


# ---------------------------------------------------------- public API

def _auto_head_fold(b, n, bq, bk) -> bool:
    """Head folding (loop heads inside the program) — measured a LOSS and
    kept opt-in only (FETA_FLASH_HEAD_FOLD=1). The hypothesis was that
    the small grids at B<=2/N>=1024 are per-program-overhead-bound;
    the interleaved 4-combo A/B (examples/largen_combo_ab.py, N=2048/B=1,
    2026-08-19) measured fold 18.6 ms vs unfolded-flash 9.2 ms vs XLA
    12.9 ms: the in-kernel sequential head loop (forced to 256-tiles by
    its own VMEM stack) serializes work the (.., h) grid pipelines, and
    the per-program overhead it saves was never the bottleneck."""
    return os.environ.get("FETA_FLASH_HEAD_FOLD", "0") == "1"


def _fold_blocks(n, bq, bk):
    """Folded kernels hold all H heads' temporaries on the Mosaic stack
    (the static-trip head loop is unrolled) — at Bq=512/H=8 that is
    ~31.5 MB vs the 16 MB scoped-VMEM stack (measured 2026-08-19).
    Quarter the tile: 256x256 keeps the folded stack ~8 MB and still
    cuts the program count vs the unfolded (.., h) grid."""
    b256 = _pick_block(n, 256)
    return min(bq, b256), min(bk, b256)


def _prepare(xa, x, cq, ck, c0, node_mask, pe, degree, mod_dtype):
    b, h, n, d = xa.shape
    f32 = jnp.float32
    mdt = mod_dtype or f32
    pe_arr = (pe.astype(mdt) if pe is not None
              else jnp.ones((b, n, n), mdt))
    deg_arr = (degree.astype(mdt) if degree is not None
               else jnp.ones((b, n), mdt)).reshape(b, 1, n)
    qmask = node_mask.astype(f32).reshape(b, n, 1)
    kmask = node_mask.astype(f32).reshape(b, 1, n)
    inv_sqrt = jnp.full((1, 1), 1.0 / ((d // h) ** 0.5), f32)
    cq_k = cq.astype(f32).transpose(0, 2, 1)[:, :, :, None]
    ck_k = ck.astype(f32).transpose(0, 2, 1)[:, :, None, :]
    c0_k = c0.reshape(h, 1, 1).astype(f32)
    return pe_arr, deg_arr, qmask, kmask, inv_sqrt, cq_k, ck_k, c0_k


def flash_graphit_attention_heads(xa, x, cq, ck, c0, v_heads, node_mask,
                                  pe=None, degree=None, block_q=None,
                                  block_k=None, mod_dtype=None,
                                  coeff_fill: float = 1.0):
    """need_heads=True flash path: per-head attention outputs WITH
    gradients plus the DETACHED coefficient-head statistics, with no
    [B, H, N, N] tensor ever reaching HBM.

    The FILTERED FeTA layer needs two things from its attention matrix
    (reference models.py:166-287): the per-head outputs attn_h @ V_h (for
    the Chebyshev filter) and the coefficient GCN's aggregated signal
    s[dst] = sum_src gcn_norm(attn)[src, dst] over the DETACHED attention.
    XLA must materialize attention (fwd + bwd + the gcn_norm chain) —
    50-62 ms/step at N=4096 (BASELINE.md round 4). Here the forward flash
    kernel emits outh + row statistics; two forward-only column-stat
    passes then recompute attention tiles from those statistics (no
    gradient — the reference detaches, models.py:282) to produce exactly
    gcn_norm_directed(attn).sum(src axis):
      pass 1: colsum[j] = sum_i attn[i, j], diag[j] = attn[j, j]
      deg_in  = colsum + fill * (diag == 0 on real nodes)
      pass 2: wcolsum[j] = sum_i attn[i, j] * deg_in[i]^-1/2
      s[j]    = deg_in[j]^-1/2 * (wcolsum[j] + fill * missing[j] *
                deg_in[j]^-1/2)
    (single-chip analogue of parallel/feta_partitioned.py's ring-streamed
    coefficient head.)

    Args: v_heads [B, H, N, dh] per-head values (NOT folded with W_out).
    Returns (out_each_head [B, N, H, dh], s [B, H, N] stop-gradient).
    """
    b, h, n, d = xa.shape
    bq = block_q or _pick_block(n)
    bk = block_k or _pick_block(n)
    bq = bk = min(bq, bk)        # colstat diagonal needs square tiles
    pe_arr, deg_arr, qmask, kmask, inv_sqrt, cq_k, ck_k, c0_k = _prepare(
        xa, x, cq, ck, c0, node_mask, pe, degree, mod_dtype)
    hf = _auto_head_fold(b, n, bq, bk)
    if hf:
        bq, bk = _fold_blocks(n, bq, bk)
    outh, m, se, su = _flash_heads(
        xa, x.astype(xa.dtype), cq_k, ck_k, c0_k, v_heads, pe_arr,
        deg_arr, qmask, kmask, inv_sqrt, bq, bk, hf)

    # ---- detached column statistics (two forward-only passes) ----
    sg = jax.lax.stop_gradient
    denom = su / se
    guard = jnp.abs(denom) > _EPS
    safe = jnp.where(guard, denom, 1.0)
    ise = 1.0 / se
    qa = qmask.astype(jnp.float32)[:, None] / safe       # [B,H,N,1]
    args = tuple(sg(t) for t in (xa, x.astype(xa.dtype), cq_k, ck_k, c0_k,
                                 pe_arr, deg_arr, qmask, kmask, inv_sqrt,
                                 m, ise, qa))
    ones_w = jnp.ones((b, h, n, 1), jnp.float32)
    colsum, diag = _call_colstat(*args, ones_w, bq, bk)
    colsum = colsum.reshape(b, h, n)
    diag = diag.reshape(b, h, n)
    mask_h = node_mask[:, None, :].astype(jnp.float32)
    missing = (diag == 0).astype(jnp.float32) * mask_h
    deg_in = colsum + coeff_fill * missing
    dis = jnp.where(deg_in > 0,
                    jnp.where(deg_in > 0, deg_in, 1.0) ** -0.5, 0.0)
    wcolsum, _ = _call_colstat(*args, dis.reshape(b, h, n, 1), bq, bk)
    s = dis * (wcolsum.reshape(b, h, n) + coeff_fill * missing * dis)
    return outh.transpose(0, 2, 1, 3), sg(s)


def flash_graphit_attention(xa, x, cq, ck, c0, vw, node_mask, pe=None,
                            degree=None, block_q=None, block_k=None,
                            mod_dtype=None):
    """out[b, n, d] = sum_h modulated_attn_h @ vw_h — query/key-blocked.

    Drop-in replacement for `fused_attention.fused_graphit_attention`
    (same args: xa [B,H,N,D] = x @ Wq_h Wk_h^T, x [B,N,D], cq/ck [B,N,H]
    rank-1 bias corrections, c0 [H], vw [B,H,N,D] = v_h @ Wout_h,
    node_mask [B,N], optional pe [B,N,N] / degree [B,N] modulation data)
    that scales to N >= 1024 by never holding an [N, N] tile in VMEM.

    mod_dtype: io dtype of the pe/degree streams (default f32;
    jnp.bfloat16 halves the kernel's dominant HBM stream — the
    FETA_BF16_MODULATION policy; the in-kernel chain stays f32). The
    [N]-sized mask vectors stay f32: a bf16 kmask block fails Mosaic
    lowering (bisected 2026-08-19) and their traffic is negligible.
    """
    b, h, n, d = xa.shape
    bq = block_q or _pick_block(n)
    bk = block_k or _pick_block(n)
    pe_arr, deg_arr, qmask, kmask, inv_sqrt, cq_k, ck_k, c0_k = _prepare(
        xa, x, cq, ck, c0, node_mask, pe, degree, mod_dtype)
    hf = _auto_head_fold(b, n, bq, bk)
    if hf:
        bq, bk = _fold_blocks(n, bq, bk)
    return _flash(xa, x.astype(xa.dtype), cq_k, ck_k, c0_k, vw, pe_arr,
                  deg_arr, qmask, kmask, inv_sqrt, bq, bk, hf)
