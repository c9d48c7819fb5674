"""Streamed need_heads flash path vs the materialized XLA chain.

The FILTERED FeTA layer's two attention consumers (per-head outputs for
the Chebyshev filter; detached gcn-normalized column sums for the
coefficient head — reference models.py:166-287) must match the dense
[B, H, N, N] reference exactly: forward, gradients, and the
stop-gradient property of the statistics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from feta_tmlr_tpu.ops.attention import modulated_attention_from_scores
from feta_tmlr_tpu.ops.laplacian import gcn_norm_directed
from feta_tmlr_tpu.ops.pallas import flash_attention as fl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        fl.pl, "pallas_call",
        lambda *a, **k: orig(*a, interpret=True, **k))


def _inputs(seed=0, b=2, h=2, n=32, d=8, dh=4, pad=5):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    xa, x = f(b, h, n, d), f(b, n, d)
    v_heads = f(b, h, n, dh)
    cq, ck, c0 = f(b, n, h), f(b, n, h), f(h)
    mask = np.ones((b, n), bool)
    if pad:
        mask[0, n - pad:] = False
    pe = jnp.asarray((rng.random((b, n, n)) * mask[:, :, None]
                      * mask[:, None, :]).astype(np.float32))
    deg = jnp.asarray((rng.random((b, n)) * mask).astype(np.float32))
    return xa, x, cq, ck, c0, v_heads, jnp.asarray(mask), pe, deg


def _ref(xa, x, cq, ck, c0, v_heads, mask, pe, deg):
    """Materialized XLA-chain reference for (out_each_head, s)."""
    b, h, n, d = xa.shape
    scores = jnp.einsum("bhng,bmg->bhnm", xa, x)
    scores = (scores + cq.transpose(0, 2, 1)[:, :, :, None]
              + ck.transpose(0, 2, 1)[:, :, None, :]
              + c0[None, :, None, None]) / jnp.sqrt(
        jnp.asarray(d // h, jnp.float32))
    _, attn = modulated_attention_from_scores(
        scores, None, mask, pe=pe, degree=deg, values_needed=False)
    heads = jnp.einsum("bhqk,bhkd->bhqd", attn, v_heads)
    a = jax.lax.stop_gradient(attn)
    s = gcn_norm_directed(a, mask[:, None, :]).sum(axis=2)
    return heads.transpose(0, 2, 1, 3), s


@pytest.mark.parametrize("with_mod", [True, False])
@pytest.mark.parametrize("block", [8, 32])
@pytest.mark.parametrize("fold", ["0", "1"])
def test_need_heads_forward_matches_chain(with_mod, block, fold,
                                          monkeypatch):
    monkeypatch.setenv("FETA_FLASH_HEAD_FOLD", fold)
    xa, x, cq, ck, c0, v, mask, pe, deg = _inputs()
    kw = dict(pe=pe, degree=deg) if with_mod else {}
    got_h, got_s = fl.flash_graphit_attention_heads(
        xa, x, cq, ck, c0, v, mask, block_q=block, block_k=block, **kw)
    ref_h, ref_s = _ref(xa, x, cq, ck, c0, v, mask,
                        kw.get("pe"), kw.get("degree"))
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fold", ["0", "1"])
def test_need_heads_backward_matches_chain(fold, monkeypatch):
    monkeypatch.setenv("FETA_FLASH_HEAD_FOLD", fold)
    xa, x, cq, ck, c0, v, mask, pe, deg = _inputs(seed=3)

    def loss_k(args):
        heads, s = fl.flash_graphit_attention_heads(
            *args, mask, pe=pe, degree=deg, block_q=8, block_k=8)
        return (heads ** 2).sum() + (jnp.tanh(s) * 0.1).sum()

    def loss_r(args):
        heads, s = _ref(*args, mask, pe, deg)
        return (heads ** 2).sum() + (jnp.tanh(s) * 0.1).sum()

    args = (xa, x, cq, ck, c0, v)
    gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_r)(args)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_stats_are_stop_gradient():
    xa, x, cq, ck, c0, v, mask, pe, deg = _inputs(seed=4)

    def loss(args):
        _, s = fl.flash_graphit_attention_heads(
            *args, mask, pe=pe, degree=deg, block_q=8, block_k=8)
        return (s ** 2).sum()

    g = jax.grad(loss)((xa, x, cq, ck, c0, v))
    for t in g:
        np.testing.assert_array_equal(np.asarray(t), 0.0)


def test_layer_streamed_path_matches_dense(monkeypatch):
    """GraphiTEncoderLayer need_heads=True: streamed flash vs XLA chain,
    identical params -> same (out, out_each_head) and a coefficient-head
    s equal to what FilterCoefficientHead derives from dense attention."""
    from feta_tmlr_tpu.nn.layers import AttnColStats, GraphiTEncoderLayer
    rng = np.random.default_rng(7)
    b, n, d = 2, 32, 16
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[0, -5:] = False
    mask = jnp.asarray(mask)
    pe = jnp.asarray(rng.random((b, n, n)), jnp.float32) \
        * mask[:, :, None] * mask[:, None, :]
    deg = jnp.asarray(rng.random((b, n)), jnp.float32) * mask
    layer = GraphiTEncoderLayer(d, 2, 32, 0.0, False)
    params = layer.init(jax.random.key(0), x, pe, mask, deg)

    monkeypatch.setenv("FETA_PALLAS", "0")
    out_r, attn_r, heads_r = layer.apply(params, x, pe, mask, deg)
    monkeypatch.setenv("FETA_PALLAS", "1")
    # the accelerator gate is False on CPU; bypass it for the twin check
    import feta_tmlr_tpu.config as cfg
    monkeypatch.setattr(cfg, "_on_accelerator", lambda: True)
    monkeypatch.setattr(cfg, "PALLAS_AUTO_N", 0)
    out_k, attn_k, heads_k = layer.apply(params, x, pe, mask, deg)
    assert isinstance(attn_k, AttnColStats)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(heads_k), np.asarray(heads_r),
                               rtol=2e-4, atol=2e-5)
    s_ref = gcn_norm_directed(jax.lax.stop_gradient(attn_r),
                              mask[:, None, :]).sum(axis=2)
    np.testing.assert_allclose(np.asarray(attn_k.s), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)
