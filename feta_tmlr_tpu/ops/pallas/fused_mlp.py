"""Pallas TPU kernel: row-blocked fused 2-layer MLP (Dense-relu-dropout-
Dense) that never materializes the hidden field in HBM.

Target: the SAN/LPE learned eigen-PE head (`nn/san.py::FreqTransformer`),
whose FFN keeps torch's nn.TransformerEncoderLayer DEFAULT
dim_feedforward=2048 over B*N*m token rows (reference
LPE/nets/ZINC_graph_regression/SAN_NodeSpectra.py:51). At the canonical
ZINC tier shape that hidden field is [40960, 2048] — with d_in=d_out=8 it
is ~256x the bytes of the input/output and the head is 68% of the model's
FLOPs (round-4 XLA ablation, BASELINE.md). XLA materializes the hidden
activation between the two matmuls (forward) and again for the backward;
this kernel streams x once, keeps h = dropout(relu(x @ W1 + b1)) in VMEM
per row block, and writes only y = h @ W2 + b2. The backward recomputes h
from x (d_in is tiny, the recompute is ~1/128 of the saved-activation
traffic) and accumulates dW/db in VMEM scratch across the row grid.

Dropout inside the kernel uses the TPU PRNG (`pltpu.prng_seed` /
`prng_random_bits`), seeded per row-block from a scalar seed operand; the
backward re-seeds identically, so the regenerated mask is bit-equal to the
forward's — pinned by the finite-difference test in
tests/test_fused_mlp.py.

Numerics: matmuls run on the MXU in the io dtype (bf16 under the compute
policy) with f32 accumulation; relu/dropout/bias in f32; dW/db accumulate
f32 across blocks. Zero-padded rows (R padded up to the block multiple)
contribute exact zeros to every gradient (their upstream cotangent is
zero-padded too).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows(default: int = 256) -> int:
    return int(os.environ.get("FETA_FUSED_MLP_BLOCK", default))


def _keep_threshold(rate: float) -> int:
    # bits < threshold  <=>  keep, so P(keep) = (1 - rate)
    return min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1)


def _dropout_mask(shape, seed_ref, rate: float):
    """Regenerable in-kernel dropout keep-mask, scaled by 1/(1-rate)."""
    pltpu.prng_seed(seed_ref[0, 0].astype(jnp.int32) + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    keep = bits < jnp.uint32(_keep_threshold(rate))
    return keep.astype(jnp.float32) / (1.0 - rate)


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                *, rate: float):
    pre = jnp.dot(x_ref[:], w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if rate > 0.0:
        h = h * _dropout_mask(h.shape, seed_ref, rate)
    y = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[:]
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dw1_s, db1_s, dw2_s, db2_s, *, rate: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_s[...] = jnp.zeros_like(dw1_s)
        db1_s[...] = jnp.zeros_like(db1_s)
        dw2_s[...] = jnp.zeros_like(dw2_s)
        db2_s[...] = jnp.zeros_like(db2_s)

    x = x_ref[:]
    pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    scale = 1.0
    if rate > 0.0:
        scale = _dropout_mask(h.shape, seed_ref, rate)  # bit-equal to fwd
    hd = h * scale                                       # dropped hidden
    g = g_ref[:].astype(jnp.float32)
    dhd = jnp.dot(g.astype(w2_ref.dtype), w2_ref[:].T,
                  preferred_element_type=jnp.float32)
    dh = dhd * scale * (pre > 0.0).astype(jnp.float32)
    dh_c = dh.astype(x.dtype)
    dx_ref[:] = jnp.dot(dh_c, w1_ref[:].T,
                        preferred_element_type=jnp.float32).astype(
        dx_ref.dtype)
    dw1_s[...] += jnp.dot(x.T, dh_c, preferred_element_type=jnp.float32)
    db1_s[...] += dh.sum(0, keepdims=True)
    dw2_s[...] += jnp.dot(hd.astype(g_ref.dtype).T, g_ref[:],
                          preferred_element_type=jnp.float32)
    db2_s[...] += g.sum(0, keepdims=True)

    @pl.when(i == n - 1)
    def _emit():
        dw1_ref[:] = dw1_s[...].astype(dw1_ref.dtype)
        db1_ref[:] = db1_s[...].astype(db1_ref.dtype)
        dw2_ref[:] = dw2_s[...].astype(dw2_ref.dtype)
        db2_ref[:] = db2_s[...].astype(db2_ref.dtype)


def _pad_rows(t, br):
    r = t.shape[0]
    pad = (-r) % br
    return (jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1)), r)


def _smem_scalar():
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _vm(shape, idx):
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


def _call_fwd(seed, x, w1, b1, w2, b2, rate, br):
    rp, dint = x.shape
    f, dout = w2.shape
    grid = (rp // br,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid=grid,
        in_specs=[
            _smem_scalar(),
            _vm((br, dint), lambda i: (i, 0)),
            _vm((dint, f), lambda i: (0, 0)),
            _vm((1, f), lambda i: (0, 0)),
            _vm((f, dout), lambda i: (0, 0)),
            _vm((1, dout), lambda i: (0, 0)),
        ],
        out_specs=_vm((br, dout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, dout), x.dtype),
    )(seed, x, w1, b1, w2, b2)


def _call_bwd(seed, x, w1, b1, w2, g, rate, br):
    rp, dint = x.shape
    f, dout = w2.shape
    grid = (rp // br,)
    const = lambda shape: _vm(shape, lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=grid,
        in_specs=[
            _smem_scalar(),
            _vm((br, dint), lambda i: (i, 0)),
            const((dint, f)),
            const((1, f)),
            const((f, dout)),
            _vm((br, dout), lambda i: (i, 0)),
        ],
        out_specs=(
            _vm((br, dint), lambda i: (i, 0)),
            const((dint, f)), const((1, f)),
            const((f, dout)), const((1, dout)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, dint), x.dtype),
            jax.ShapeDtypeStruct((dint, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((dint, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((f, dout), jnp.float32),
            pltpu.VMEM((1, dout), jnp.float32),
        ],
    )(seed, x, w1, b1, w2, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(seed, x, w1, b1, w2, b2, rate, br):
    return _call_fwd(seed, x, w1, b1, w2, b2, rate, br)


def _fused_fwd(seed, x, w1, b1, w2, b2, rate, br):
    return _call_fwd(seed, x, w1, b1, w2, b2, rate, br), \
        (seed, x, w1, b1, w2, b2)


def _fused_bwd(rate, br, res, g):
    seed, x, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2 = _call_bwd(seed, x, w1, b1, w2,
                                       g.astype(x.dtype), rate, br)
    return (jnp.zeros_like(seed), dx, dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp(x, w1, b1, w2, b2, dropout_rate: float = 0.0, seed=None,
              block_rows: int = None):
    """y = dropout(relu(x @ w1 + b1)) @ w2 + b2, hidden field VMEM-only.

    x: [R, d_in] (any leading shape is flattened by the caller); w1:
    [d_in, F]; b1: [F]; w2: [F, d_out]; b2: [d_out]. `seed` (int32/f32
    scalar array) drives the in-kernel dropout PRNG; required when
    dropout_rate > 0. Rows are zero-padded to the block multiple
    internally. Differentiable via a recomputing custom VJP.
    """
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("fused_mlp: dropout_rate > 0 requires a seed")
    br = block_rows or _block_rows()
    xp, r = _pad_rows(x, br)
    seed_arr = jnp.asarray(seed if seed is not None else 0,
                           jnp.float32).reshape(1, 1)
    y = _fused(seed_arr, xp, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
               float(dropout_rate), br)
    return y[:r]


def fused_mlp_ref(x, w1, b1, w2, b2, dropout_rate: float = 0.0,
                  seed=None, block_rows: int = None):
    """jnp golden twin (no dropout path — rate 0 only), for tests."""
    assert dropout_rate == 0.0, "ref twin covers the deterministic path"
    h = jnp.maximum(
        jnp.dot(x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32), 0.0)
    y = jnp.dot(h.astype(w2.dtype), w2,
                preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)
    return y.astype(x.dtype)
