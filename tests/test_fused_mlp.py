"""Fused 2-layer-MLP Pallas kernel vs jnp twin (interpret mode).

Golden-twin idiom of the reference's own kernel harnesses
(gckn/gckn_fast/gckn_fast.py:55-130): forward + grads against a pure-jnp
implementation, plus the dropout path's regenerable-mask invariants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from feta_tmlr_tpu.ops.pallas import fused_mlp as fm


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(fm.pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    # the TPU PRNG primitives have no CPU-interpret lowering; emulate
    # them (stateful seed -> uint32 bits) so the dropout code path runs
    # unchanged. The emulation is deterministic per seed, which is the
    # property the dropout tests pin (mask bits differ from real TPU).
    state = {}

    def fake_seed(s):
        state["key"] = jax.random.key(jnp.asarray(s, jnp.int32))

    def fake_bits(shape):
        return jax.random.bits(state["key"], shape, jnp.uint32)

    monkeypatch.setattr(fm.pltpu, "prng_seed", fake_seed)
    monkeypatch.setattr(fm.pltpu, "prng_random_bits", fake_bits)
    monkeypatch.setattr(fm.pltpu, "bitcast", lambda x, dt: x.astype(dt))


def _inputs(seed=0, r=70, din=8, f=256, dout=8, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return t(r, din), t(din, f), t(f), t(f, dout), t(dout)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_twin(dtype):
    x, w1, b1, w2, b2 = _inputs(dtype=dtype)
    got = fm.fused_mlp(x, w1, b1, w2, b2, block_rows=32)
    ref = fm.fused_mlp_ref(x, w1, b1, w2, b2)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_grads_match_twin():
    x, w1, b1, w2, b2 = _inputs()
    co = jnp.asarray(np.random.default_rng(1).standard_normal(
        (x.shape[0], w2.shape[1])), jnp.float32)

    def loss(fn):
        return lambda *args: (fn(*args) * co).sum()

    got = jax.grad(loss(lambda *a: fm.fused_mlp(*a, block_rows=32)),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    ref = jax.grad(loss(fm.fused_mlp_ref),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_dropout_deterministic_per_seed():
    x, w1, b1, w2, b2 = _inputs()
    y1 = fm.fused_mlp(x, w1, b1, w2, b2, dropout_rate=0.4, seed=7,
                      block_rows=32)
    y2 = fm.fused_mlp(x, w1, b1, w2, b2, dropout_rate=0.4, seed=7,
                      block_rows=32)
    y3 = fm.fused_mlp(x, w1, b1, w2, b2, dropout_rate=0.4, seed=8,
                      block_rows=32)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_dropout_bwd_mask_bitequal_to_fwd():
    """Directional finite difference == VJP along the same seed: holds
    only if the backward regenerates the forward's exact dropout mask."""
    x, w1, b1, w2, b2 = _inputs(r=40, f=128)

    def f(xx):
        return (fm.fused_mlp(xx, w1, b1, w2, b2, dropout_rate=0.3,
                             seed=3, block_rows=32) ** 2).sum()

    v = jnp.asarray(np.random.default_rng(2).standard_normal(x.shape),
                    jnp.float32)
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    vjp = (jax.grad(f)(x) * v).sum()
    np.testing.assert_allclose(float(fd), float(vjp), rtol=5e-3)


def test_freq_transformer_fused_path_matches_dense(monkeypatch):
    """SAN eigen-PE head: FETA_FUSED_MLP=1 (interpret) vs =0, identical
    params, deterministic — same outputs."""
    from feta_tmlr_tpu.nn.san import FreqTransformer
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.standard_normal((12, 10, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((12, 10)) > 0.2)
    model = FreqTransformer(lpe_dim=8, lpe_heads=4, lpe_layers=2,
                            ff_dim=128)
    monkeypatch.setenv("FETA_FUSED_MLP", "0")
    params = model.init(jax.random.key(0), tokens, mask)
    ref = model.apply(params, tokens, mask)
    monkeypatch.setenv("FETA_FUSED_MLP", "1")
    params_f = model.init(jax.random.key(0), tokens, mask)
    # identical param trees (names, shapes, values) across the two paths
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params_f)
    got = model.apply(params, tokens, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
