"""Fused GraphiT attention Pallas kernel vs jnp twin (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from feta_tmlr_tpu.ops.pallas import fused_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        fa.pl, "pallas_call",
        lambda *a, **k: orig(*a, interpret=True, **k))


def _inputs(seed=0, b=2, h=2, n=16, d=8):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    xa, x, vw = f(b, h, n, d), f(b, n, d), f(b, h, n, d)
    cq, ck, c0 = f(b, n, h), f(b, n, h), f(h)
    mask = np.ones((b, n), bool)
    mask[0, n - 5:] = False
    pe = jnp.asarray((rng.random((b, n, n)) * mask[:, :, None]
                      * mask[:, None, :]).astype(np.float32))
    deg = jnp.asarray((rng.random((b, n)) * mask).astype(np.float32))
    return xa, x, cq, ck, c0, vw, jnp.asarray(mask), pe, deg


@pytest.mark.parametrize("with_mod", [True, False])
def test_fused_forward_matches_twin(with_mod):
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs()
    kw = dict(pe=pe, degree=deg) if with_mod else {}
    got = fa.fused_graphit_attention(xa, x, cq, ck, c0, vw, mask, **kw)
    ref = fa.fused_graphit_attention_ref(xa, x, cq, ck, c0, vw, mask, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_backward_matches_twin():
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=3)

    def loss_k(args):
        return (fa.fused_graphit_attention(
            *args, mask, pe=pe, degree=deg) ** 2).sum()

    def loss_r(args):
        return (fa.fused_graphit_attention_ref(
            *args, mask, pe=pe, degree=deg) ** 2).sum()

    args = (xa, x, cq, ck, c0, vw)
    gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_r)(args)
    for a, b_, name in zip(gk, gr, ["xa", "x", "cq", "ck", "c0", "vw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=1e-4, err_msg=name)


def test_fused_forward_bf16_io():
    """bf16 activations (the FETA_COMPUTE_DTYPE=bfloat16 policy feeds xa/vw
    in bf16): kernels must accumulate f32 and cast on store — this exact
    case crashed on TPU with 'Invalid dtype for swap' before the fix."""
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=5)
    xa16, vw16 = xa.astype(jnp.bfloat16), vw.astype(jnp.bfloat16)
    got = fa.fused_graphit_attention(xa16, x, cq, ck, c0, vw16, mask,
                                     pe=pe, degree=deg)
    assert got.dtype == jnp.bfloat16
    ref = fa.fused_graphit_attention_ref(
        xa16.astype(jnp.float32), x, cq, ck, c0,
        vw16.astype(jnp.float32), mask, pe=pe, degree=deg)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)

    def loss_k(args):
        return (fa.fused_graphit_attention(
            *args, mask, pe=pe, degree=deg).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss_k)((xa16, x, cq, ck, c0, vw16))
    assert g[0].dtype == jnp.bfloat16 and g[5].dtype == jnp.bfloat16
    for a in g:
        assert np.isfinite(np.asarray(a, np.float32)).all()
