"""Pallas fused modulation kernel vs jnp twin (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from unittest import mock

import jax.experimental.pallas as pl

from feta_tmlr_tpu.ops.attention import modulated_attention_from_scores
from feta_tmlr_tpu.ops.pallas import modulation as pm


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pm.pl, "pallas_call",
        lambda *a, **k: orig(*a, interpret=True, **k))


def _inputs(seed=0, b=3, h=2, n=16, with_pe=True, with_deg=True):
    rng = np.random.default_rng(seed)
    scores = rng.standard_normal((b, h, n, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[0, n - 5:] = False
    mask[2, n - 9:] = False
    pe = (rng.random((b, n, n)).astype(np.float32)
          * mask[:, :, None] * mask[:, None, :]) if with_pe else None
    deg = (rng.random((b, n)).astype(np.float32) * mask) if with_deg \
        else None
    return jnp.asarray(scores), jnp.asarray(mask), \
        (jnp.asarray(pe) if pe is not None else None), \
        (jnp.asarray(deg) if deg is not None else None)


@pytest.mark.parametrize("with_pe,with_deg",
                         [(True, True), (True, False),
                          (False, True), (False, False)])
def test_forward_matches_twin(with_pe, with_deg):
    scores, mask, pe, deg = _inputs(with_pe=with_pe, with_deg=with_deg)
    _, ref = modulated_attention_from_scores(
        scores, None, mask, pe=pe, degree=deg, values_needed=False)
    got = pm.fused_modulated_attention(scores, mask, pe=pe, degree=deg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_backward_matches_twin():
    scores, mask, pe, deg = _inputs(seed=3)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 2, 16, 4)).astype(np.float32))

    def loss_twin(s):
        out, attn = modulated_attention_from_scores(
            s, v, mask, pe=pe, degree=deg)
        return (out ** 2).sum() + (attn * 0.3).sum()

    def loss_pallas(s):
        attn = pm.fused_modulated_attention(s, mask, pe=pe, degree=deg)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return (out ** 2).sum() + (attn * 0.3).sum()

    g_twin = jax.grad(loss_twin)(scores)
    g_pallas = jax.grad(loss_pallas)(scores)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_twin),
                               rtol=1e-4, atol=1e-5)
