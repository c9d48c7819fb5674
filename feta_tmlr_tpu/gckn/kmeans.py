"""Spherical k-means for GCKN anchor (filter) initialization.

Rebuild of gckn/utils.py:77-130 (`spherical_kmeans` with kmeans++ init
`init_kmeans`): unit-norm samples, cosine-similarity assignment, centroid
re-normalization. Runs in numpy on host (it's a one-shot unsupervised
pretraining step whose output becomes device constants).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6


def _normalize(x):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, EPS)


def kmeans_plus_plus(x, n_clusters, rng):
    """kmeans++ seeding on cosine distance.

    Samples are unit-normalized PER PATH POSITION, so the flattened dot
    product of two identical samples is path_size, not 1 — the distance is
    path_size - sim (cf. the reference's norm=kmer_size, gckn/utils.py)."""
    n = x.shape[0]
    path_size = int(np.prod(x.shape[1:-1])) or 1
    centers = np.empty((n_clusters,) + x.shape[1:], dtype=x.dtype)
    idx = rng.integers(n)
    centers[0] = x[idx]
    closest = path_size - x.reshape(n, -1) @ centers[0].reshape(-1)
    closest = np.maximum(closest, 0)
    for c in range(1, n_clusters):
        total = closest.sum()
        if total <= EPS:
            # all remaining points coincide with chosen centers (common for
            # discrete features): fall back to uniform seeding
            idx = rng.integers(n)
        else:
            probs = np.asarray(closest, np.float64) / total
            probs = probs / probs.sum()
            idx = rng.choice(n, p=probs)
        centers[c] = x[idx]
        d = path_size - x.reshape(n, -1) @ centers[c].reshape(-1)
        closest = np.minimum(closest, np.maximum(d, 0))
    return centers


def spherical_kmeans(x, n_clusters, n_iters: int = 100, seed: int = 0,
                     tol: float = 1e-4, verbose: bool = False,
                     init_centers=None):
    """x: [n, path_size, input] unit-normalized samples.

    Returns centroids [n_clusters, path_size, input], unit-normalized rows.
    ``init_centers`` overrides the kmeans++ seeding (the reference's
    random-permutation init path, gckn/utils.py:96-100 — also how the
    reference-golden tests pin both sides to the same start).
    """
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(x, dtype=np.float64))
    n = x.shape[0]
    flat = x.reshape(n, -1)
    if init_centers is not None:
        centers = np.array(init_centers, dtype=np.float64)
    else:
        centers = kmeans_plus_plus(x, n_clusters, rng)
    prev_sim = -np.inf
    for it in range(n_iters):
        cflat = centers.reshape(n_clusters, -1)
        sim = flat @ cflat.T                       # cosine similarity
        assign = sim.argmax(1)
        best = sim[np.arange(n), assign]
        mean_sim = best.mean()
        for c in range(n_clusters):
            members = flat[assign == c]
            if len(members) == 0:
                # reference policy (gckn/utils.py:115-119): steal the
                # least-well-represented point, mark it taken
                idx = int(best.argmin())
                centers[c] = x[idx]
                best[idx] = 1.0
            else:
                centers[c] = _normalize(
                    members.mean(0).reshape(centers.shape[1:]))
        if verbose:
            print(f"kmeans iter {it}: sim={mean_sim:.5f}")
        if abs(mean_sim - prev_sim) < tol:
            break
        prev_sim = mean_sim
    return centers.astype(np.float32)
