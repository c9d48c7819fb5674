"""Query-blocked flash GraphiT attention vs jnp twin (interpret mode).

Exercises the online-softmax tiling with multiple query AND key blocks
(block 8 over n=32 => 4x4 tiles), padded rows, pe/degree modulation on and
off, and bf16 io; gradients of every differentiable input are compared
against autodiff through the materialized jnp twin
(`fused_attention.fused_graphit_attention_ref`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from feta_tmlr_tpu.ops.pallas import flash_attention as fl
from feta_tmlr_tpu.ops.pallas.fused_attention import \
    fused_graphit_attention_ref as twin


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        fl.pl, "pallas_call",
        lambda *a, **k: orig(*a, interpret=True, **k))


def _inputs(seed=0, b=2, h=2, n=32, d=8, pad=5):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    xa, x, vw = f(b, h, n, d), f(b, n, d), f(b, h, n, d)
    cq, ck, c0 = f(b, n, h), f(b, n, h), f(h)
    mask = np.ones((b, n), bool)
    if pad:
        mask[0, n - pad:] = False
    pe = jnp.asarray((rng.random((b, n, n)) * mask[:, :, None]
                      * mask[:, None, :]).astype(np.float32))
    deg = jnp.asarray((rng.random((b, n)) * mask).astype(np.float32))
    return xa, x, cq, ck, c0, vw, jnp.asarray(mask), pe, deg


@pytest.mark.parametrize("with_mod", [True, False])
@pytest.mark.parametrize("block", [8, 16, 32])
@pytest.mark.parametrize("fold", ["0", "1"])
def test_flash_forward_matches_twin(with_mod, block, fold, monkeypatch):
    monkeypatch.setenv("FETA_FLASH_HEAD_FOLD", fold)
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs()
    kw = dict(pe=pe, degree=deg) if with_mod else {}
    got = fl.flash_graphit_attention(xa, x, cq, ck, c0, vw, mask,
                                     block_q=block, block_k=block, **kw)
    ref = twin(xa, x, cq, ck, c0, vw, mask, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_rectangular_blocks():
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=5)
    got = fl.flash_graphit_attention(xa, x, cq, ck, c0, vw, mask,
                                     block_q=16, block_k=8, pe=pe,
                                     degree=deg)
    ref = twin(xa, x, cq, ck, c0, vw, mask, pe=pe, degree=deg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("with_mod", [True, False])
@pytest.mark.parametrize("fold", ["0", "1"])
def test_flash_backward_matches_twin(with_mod, fold, monkeypatch):
    monkeypatch.setenv("FETA_FLASH_HEAD_FOLD", fold)
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=3)
    kw = dict(pe=pe, degree=deg) if with_mod else {}

    def loss_k(args):
        return (fl.flash_graphit_attention(
            *args, mask, block_q=8, block_k=8, **kw) ** 2).sum()

    def loss_r(args):
        return (twin(*args, mask, **kw) ** 2).sum()

    args = (xa, x, cq, ck, c0, vw)
    gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_r)(args)
    for a, b_, name in zip(gk, gr, ["xa", "x", "cq", "ck", "c0", "vw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=1e-4, err_msg=name)


def test_flash_bf16_io():
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=7)
    bf = jnp.bfloat16
    got = fl.flash_graphit_attention(
        xa.astype(bf), x.astype(bf), cq, ck, c0, vw.astype(bf), mask,
        block_q=8, block_k=8, pe=pe, degree=deg)
    assert got.dtype == bf
    ref = twin(xa, x, cq, ck, c0, vw, mask, pe=pe, degree=deg)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=3e-2, atol=3e-2)

    def loss_k(a):
        return (fl.flash_graphit_attention(
            a.astype(bf), x.astype(bf), cq, ck, c0, vw.astype(bf), mask,
            block_q=8, block_k=8, pe=pe, degree=deg)
            .astype(jnp.float32) ** 2).sum()

    def loss_r(a):
        return (twin(a, x, cq, ck, c0, vw, mask, pe=pe, degree=deg)
                ** 2).sum()

    gk = jax.grad(loss_k)(xa)
    gr = jax.grad(loss_r)(xa)
    np.testing.assert_allclose(np.asarray(gk, np.float32), np.asarray(gr),
                               rtol=6e-2, atol=6e-2)


def test_flash_near_zero_denominator_guard():
    """pe rows that sum to ~0 must hit the twin's eps branch identically."""
    xa, x, cq, ck, c0, vw, mask, pe, deg = _inputs(seed=9, pad=0)
    pe = pe.at[0, :8, :].set(0.0)                   # denom == 0 rows
    got = fl.flash_graphit_attention(xa, x, cq, ck, c0, vw, mask,
                                     block_q=8, block_k=8, pe=pe)
    ref = twin(xa, x, cq, ck, c0, vw, mask, pe=pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    gk = jax.grad(lambda a: (fl.flash_graphit_attention(
        a, x, cq, ck, c0, vw, mask, block_q=8, block_k=8,
        pe=pe) ** 2).sum())(xa)
    gr = jax.grad(lambda a: (twin(
        a, x, cq, ck, c0, vw, mask, pe=pe) ** 2).sum())(xa)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=2e-3, atol=1e-4)


def test_pick_block():
    assert fl._pick_block(1024) == 512
    assert fl._pick_block(256) == 256
    assert fl._pick_block(384) == 128
    assert fl._pick_block(48) == 48
