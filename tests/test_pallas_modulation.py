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


def test_tiled_grid_matches_twin(monkeypatch):
    """Force hb<h AND bq<n so the (head-block x query-row-block) grid —
    the BlockSpec index maps, not just the in-kernel math — is what the
    parity assertion exercises (advisor round-3 finding: the production
    tiling only had an on-chip timing A/B)."""
    monkeypatch.setattr(pm, "_tile", lambda h, n, itemsize: (1, 4))
    scores, mask, pe, deg = _inputs(seed=7, b=3, h=2, n=16)
    v = jnp.asarray(np.random.default_rng(5).standard_normal(
        (3, 2, 16, 4)).astype(np.float32))
    _, ref = modulated_attention_from_scores(
        scores, None, mask, pe=pe, degree=deg, values_needed=False)
    got = pm.fused_modulated_attention(scores, mask, pe=pe, degree=deg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss_twin(s):
        out, attn = modulated_attention_from_scores(
            s, v, mask, pe=pe, degree=deg)
        return (out ** 2).sum() + (attn * 0.3).sum()

    def loss_pallas(s):
        attn = pm.fused_modulated_attention(s, mask, pe=pe, degree=deg)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return (out ** 2).sum() + (attn * 0.3).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(scores)),
        np.asarray(jax.grad(loss_twin)(scores)), rtol=1e-4, atol=1e-5)


def test_tile_shrinks_below_128_rows_and_feasible():
    """Large-N f32 shapes must produce an in-budget tile (the pre-fix
    floor of bq=128 overflowed the 6MB budget at N>=4096 f32) and the
    feasibility probe must agree."""
    for n in (4096, 8192):
        hb, bq = pm._tile(8, n, 4)
        assert hb * bq * n * 4 * 6 <= 6 * 1024 * 1024
        assert n % bq == 0
        assert pm.modulation_tile_feasible(8, n, 4)


def test_layer_parity_at_auto_gated_shape(monkeypatch):
    """Pin pallas-vs-twin agreement ACROSS the auto-gate boundary
    (config.PALLAS_AUTO_N): the same layer + params, once with the gate
    on (flash kernel for need_heads=False, tiled modulation kernel for
    need_heads=True) and once forced to the XLA chain, must agree — the
    numeric switch at the boundary (kernels run the chain in f32) is a
    documented no-op at f32 compute. Gate internals are monkeypatched so
    the CPU interpret path exercises the exact production dispatch."""
    from feta_tmlr_tpu import config as cfg
    from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer

    # the autouse fixture already switched the (shared) pl.pallas_call
    # to interpret mode for every kernel module
    monkeypatch.setattr(cfg, "_on_accelerator", lambda: True)
    monkeypatch.setattr(cfg, "PALLAS_AUTO_N", 16)

    rng = np.random.default_rng(12)
    b, n, d, h = 2, 24, 16, 2
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[1, n - 7:] = False
    mask_j = jnp.asarray(mask)
    pe = jnp.asarray((rng.random((b, n, n)) * mask[:, :, None]
                      * mask[:, None, :]).astype(np.float32))
    deg = jnp.asarray((rng.random((b, n)) * mask).astype(np.float32))

    layer = GraphiTEncoderLayer(d_model=d, n_heads=h, dim_feedforward=32)
    params = layer.init(jax.random.key(0), x, pe, mask_j, degree=deg)
    from feta_tmlr_tpu.nn.layers import AttnColStats
    from feta_tmlr_tpu.ops.laplacian import gcn_norm_directed
    for need_heads in (True, False):
        monkeypatch.setenv("FETA_PALLAS", "0")
        ref = layer.apply(params, x, pe, mask_j, degree=deg,
                          need_heads=need_heads)
        monkeypatch.delenv("FETA_PALLAS")
        assert cfg.use_pallas_modulation(n)   # gate really on
        got = layer.apply(params, x, pe, mask_j, degree=deg,
                          need_heads=need_heads)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"need_heads={need_heads}")
        if need_heads:
            # default dispatch is the round-5 streamed flash path: it
            # emits AttnColStats (+ per-head outputs) instead of dense
            # [B, H, N, N] attention
            assert isinstance(got[1], AttnColStats)
            s_ref = gcn_norm_directed(jax.lax.stop_gradient(ref[1]),
                                      mask_j[:, None, :]).sum(axis=2)
            np.testing.assert_allclose(np.asarray(got[1].s),
                                       np.asarray(s_ref),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(got[2]),
                                       np.asarray(ref[2]),
                                       rtol=1e-4, atol=1e-5)
            # the pre-round-5 dispatch (row-tiled modulation kernel,
            # dense attention out) stays reachable and in parity
            monkeypatch.setenv("FETA_FLASH_NEED_HEADS", "0")
            got_mod = layer.apply(params, x, pe, mask_j, degree=deg,
                                  need_heads=True)
            monkeypatch.delenv("FETA_FLASH_NEED_HEADS")
            np.testing.assert_allclose(np.asarray(got_mod[1]),
                                       np.asarray(ref[1]),
                                       rtol=1e-4, atol=1e-5)


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
