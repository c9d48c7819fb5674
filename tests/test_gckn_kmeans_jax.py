"""Jitted spherical k-means (single-dispatch while_loop) vs the numpy
reference implementation."""

import numpy as np

from feta_tmlr_tpu.gckn.kmeans import (
    kmeans_plus_plus,
    spherical_kmeans,
    spherical_kmeans_jax,
)


def _paths(n=400, s=3, f=8, seed=0):
    rng = np.random.default_rng(seed)
    # well-separated clusters so assignments are stable across f32/f64
    centers = rng.standard_normal((8, s, f)) * 4.0
    x = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal(
        (n, s, f))
    return x.astype(np.float32)


def test_jax_kmeans_matches_numpy_same_init():
    x = _paths()
    rng = np.random.default_rng(1)
    xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-6)
    init = kmeans_plus_plus(xn.astype(np.float64), 6, rng)
    c_np = spherical_kmeans(x, 6, n_iters=25, seed=0, init_centers=init)
    c_jx = spherical_kmeans_jax(x, 6, n_iters=25, seed=0,
                                init_centers=init)
    assert c_jx.shape == c_np.shape
    # f32 while_loop vs f64 numpy: same fixed point to loose tolerance
    np.testing.assert_allclose(c_jx, c_np, rtol=2e-3, atol=2e-3)


def test_jax_kmeans_survives_empty_clusters():
    # more clusters than distinct points forces the steal branch
    x = np.repeat(_paths(n=4, seed=2), 3, axis=0)
    c = spherical_kmeans_jax(x, 8, n_iters=10, seed=0)
    assert np.isfinite(c).all()
    norms = np.linalg.norm(c, axis=-1)
    assert (norms < 1.0 + 1e-3).all()


def test_unsup_train_layer_jax_flag():
    import jax
    from feta_tmlr_tpu.gckn.layer import init_path_layer, unsup_train_layer

    x = _paths(n=100, s=2, f=6, seed=3)
    params = init_path_layer(jax.random.key(0), input_size=6,
                             hidden_size=5, path_size=2)
    out_np = unsup_train_layer(params, x, seed=0, use_jax=False)
    out_jx = unsup_train_layer(params, x, seed=0, use_jax=True)
    assert out_jx.weight.shape == out_np.weight.shape
    np.testing.assert_allclose(np.asarray(out_jx.weight),
                               np.asarray(out_np.weight),
                               rtol=5e-3, atol=5e-3)
