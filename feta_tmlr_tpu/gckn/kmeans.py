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


# -------------------------------------------------------- jitted variant

def spherical_kmeans_jax(x, n_clusters, n_iters: int = 100, seed: int = 0,
                         tol: float = 1e-4, init_centers=None):
    """Single-dispatch spherical k-means: the whole Lloyd loop runs as ONE
    jitted `lax.while_loop` on whatever device `x` lives on.

    The numpy implementation above dispatches hundreds of small ops per
    call; on a remote accelerator each pays the relay RTT, which is why
    the round-3 crossover study never saw the unsup tier win on the chip
    (BASELINE.md GCKN table). This variant gives the accelerator a fair
    shot (VERDICT r3 item 7): assignment + centroid update are two
    matmuls (one-hot trick, no scatter), convergence is checked in-loop.

    Semantics match `spherical_kmeans` except empty-cluster handling:
    the numpy path steals the least-represented points SEQUENTIALLY
    (mutating `best` between steals); here all empty clusters steal in
    one vectorized step from the ranked-worst points (identical when at
    most one cluster empties per iteration — the common case; pinned
    approximately by tests/test_gckn_kmeans_jax.py).

    kmeans++ seeding stays on host (inherently sequential, k tiny passes)
    unless `init_centers` is given.
    """
    import jax
    import jax.numpy as jnp

    x64 = _normalize(np.asarray(x, dtype=np.float64)).astype(np.float32)
    if init_centers is not None:
        centers0 = np.asarray(init_centers, dtype=np.float32)
    else:
        rng = np.random.default_rng(seed)
        centers0 = kmeans_plus_plus(x64.astype(np.float64),
                                    n_clusters, rng).astype(np.float32)
    n = x64.shape[0]
    inner = int(np.prod(x64.shape[1:]))
    flat = jnp.asarray(x64.reshape(n, inner))

    @jax.jit
    def run(flat, c0):
        def cond(state):
            _, prev, cur, it = state
            return jnp.logical_and(it < n_iters,
                                   jnp.abs(cur - prev) >= tol)

        def body(state):
            centers, _, prev_sim, it = state
            sim = flat @ centers.T                       # [n, k]
            assign = sim.argmax(1)
            best = jnp.take_along_axis(sim, assign[:, None], 1)[:, 0]
            oh = jax.nn.one_hot(assign, n_clusters, dtype=flat.dtype)
            sums = oh.T @ flat                           # [k, inner]
            cnt = oh.sum(0)                              # [k]
            means = sums / jnp.maximum(cnt, 1.0)[:, None]
            # per-position renormalization of the centroid rows
            means = means.reshape((n_clusters,) + x64.shape[1:])
            norm = jnp.linalg.norm(means, axis=-1, keepdims=True)
            means = (means / jnp.maximum(norm, EPS)).reshape(
                n_clusters, inner)
            empty = cnt == 0
            # vectorized steal: the j-th empty cluster takes the point
            # with the j-th lowest best-similarity
            order = jnp.argsort(best)[:n_clusters]       # worst points
            rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
            stolen = flat[order][jnp.clip(rank, 0, n_clusters - 1)]
            centers = jnp.where(empty[:, None], stolen, means)
            return centers, prev_sim, best.mean(), it + 1

        c, _, sim, _ = jax.lax.while_loop(
            cond, body, (c0, jnp.float32(-jnp.inf),
                         jnp.float32(jnp.inf), jnp.int32(0)))
        return c

    centers = run(flat, jnp.asarray(centers0.reshape(n_clusters, inner)))
    return np.asarray(centers, np.float32).reshape(
        (n_clusters,) + x64.shape[1:])
