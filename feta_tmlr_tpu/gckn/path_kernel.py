"""Exact path-kernel Gram matrices, MXU-shaped.

TPU-native rebuild of the reference's exhaustive path kernel
(/root/reference/gckn/path_kernel.py). The reference walks recursive
Python DFS closures per graph (and, in `pathkernel_compare`, per graph
PAIR) and indexes a dense node-similarity matrix row by row. Here the
whole per-length pair block collapses to ONE matmul:

  for paths with s nodes, P1: [m1, s], P2: [m2, s],
    out_s[p, q] = (1/s) * sum_i <x1[P1[p, i]], x2[P2[q, i]]>
                = (1/s) * <F1[p], F2[q]>,
  where F[p] = concat_i x[P[p, i]]  ("path features", [m, s*d]).

so per length the pair block is `F1 @ F2.T` — and pairs whose padded
path counts share a bucket shape are stacked into one batched matmul
(`einsum('pmd,pnd->pmn')`) that lands on the MXU. Path enumeration
reuses the native C++ DFS (`gckn/pathenum.py`); the exp kernel and the
length/`coef`/`normalize`/`cum` semantics match the reference's
`pathkernel` (path_kernel.py:275-311) exactly, including the quirk that
a length with no paths on either side contributes exp((0-1)/sigma^2)
(`kernel_value`'s `continue` leaves out[j] = 0 before the exp).

`path_filter_response` is the reference's `dfs` scorer
(path_kernel.py:10-71): every full-length-k simple path is scored
against position-specific filters, prefix-cumulatively — expressed here
as a gather + cumsum + exp over the enumerated path table. The
reference's backtracking restore zeroes prefix slots between siblings
(`previous_out[:k - depth] = 0`, path_kernel.py:46-47, restored at :54
AFTER the first child returns), so slot j keeps its prefix sum only for
paths whose steps j..k-2 all took the FIRST unvisited neighbor; every
other path contributes exp((0 - 1)/sigma^2) at that slot. That
traversal-order artifact is reproduced exactly (the indicator is
computed host-side from the path table, like enumeration itself);
`reference_semantics=False` gives the clean all-prefixes scoring.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .pathenum import enumerate_paths

# Elements per stacked [P, Ma, Mb] similarity block; groups are chunked
# so one jitted call never materializes more than this many floats.
_BLOCK_BUDGET = 1 << 26


def exp_kernel(x, sigma: float = 0.6):
    """The reference's `exp` map (path_kernel.py:5-7)."""
    return jnp.exp((x - 1.0) / sigma**2)


def _graph_fields(g) -> Tuple[np.ndarray, np.ndarray, int]:
    if isinstance(g, tuple):
        x, edge_index = g
    else:
        x, edge_index = g.x, g.edge_index
    x = np.asarray(x, dtype=np.float32)
    return x, np.asarray(edge_index), x.shape[0]


def _path_feature_table(graphs: Sequence, k: int
                        ) -> List[List[np.ndarray]]:
    """feats[g][s-1]: [m_gs, s*d] concatenated node features per path."""
    feats: List[List[np.ndarray]] = []
    for g in graphs:
        x, edge_index, n = _graph_fields(g)
        paths, _ = enumerate_paths(edge_index, n, k)
        feats.append([x[p].reshape(p.shape[0], p.shape[1] * x.shape[1])
                      for p in paths])
    return feats


def _bucket(m: int) -> int:
    """Pad path counts to powers of two: few compiled shapes, no
    per-pair recompilation."""
    b = 8
    while b < m:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("normalize", "inv_s"))
def _pair_block(fa, ma, fb, mb, inv_s, sigma, normalize):
    """Stacked per-pair kernel values for one bucket shape.

    fa: [P, Ma, s*d], ma: [P, Ma] validity, likewise fb/mb.
    Returns [P] — masked mean (normalize) or sum of
    exp((sim/s - 1)/sigma^2) over valid path pairs.
    """
    sim = jnp.einsum("pmd,pnd->pmn", fa, fb) * inv_s
    vals = jnp.exp((sim - 1.0) / sigma**2)
    pair_mask = ma[:, :, None] * mb[:, None, :]
    total = jnp.sum(vals * pair_mask, axis=(1, 2))
    if normalize:
        return total / jnp.sum(pair_mask, axis=(1, 2))
    return total


def _per_length_values(feats: List[List[np.ndarray]], s: int,
                       pairs: List[Tuple[int, int]], sigma: float,
                       normalize: bool) -> np.ndarray:
    """val[p] for every graph pair at path length s (s nodes)."""
    vals = np.empty(len(pairs), dtype=np.float64)
    # the reference skips empty path sets: out[j] stays 0, and
    # exp((0-1)/sigma^2) still enters the kernel value
    empty_val = float(np.exp(-1.0 / sigma**2))

    groups = defaultdict(list)   # (Ma, Mb) -> [(pair_idx, ia, ib)]
    for idx, (ia, ib) in enumerate(pairs):
        m1 = feats[ia][s - 1].shape[0]
        m2 = feats[ib][s - 1].shape[0]
        if m1 == 0 or m2 == 0:
            vals[idx] = empty_val
            continue
        groups[(_bucket(m1), _bucket(m2))].append((idx, ia, ib))

    d = None
    for fl in feats:
        if fl[s - 1].shape[0]:
            d = fl[s - 1].shape[1]
            break
    for (Ma, Mb), entries in groups.items():
        chunk = max(1, _BLOCK_BUDGET // (Ma * Mb))
        for lo in range(0, len(entries), chunk):
            part = entries[lo:lo + chunk]
            fa = np.zeros((len(part), Ma, d), dtype=np.float32)
            fb = np.zeros((len(part), Mb, d), dtype=np.float32)
            ma = np.zeros((len(part), Ma), dtype=np.float32)
            mb = np.zeros((len(part), Mb), dtype=np.float32)
            for row, (_, ia, ib) in enumerate(part):
                f1, f2 = feats[ia][s - 1], feats[ib][s - 1]
                fa[row, :f1.shape[0]] = f1
                fb[row, :f2.shape[0]] = f2
                ma[row, :f1.shape[0]] = 1.0
                mb[row, :f2.shape[0]] = 1.0
            out = np.asarray(_pair_block(
                fa, ma, fb, mb, 1.0 / s, sigma, normalize))
            for row, (idx, _, _) in enumerate(part):
                vals[idx] = out[row]
    return vals


def path_kernel_gram(graphs: Sequence, k: int, *, coef: float = 2.0,
                     normalize: bool = False, cum: bool = False,
                     sigma: float = 0.6) -> np.ndarray:
    """Gram matrix of the exhaustive path kernel over `graphs`.

    Matches the reference `pathkernel(graphs, k, coef, normalize, cum,
    sigma)` (path_kernel.py:275-311): per path length s = 1..k the
    kernel value is the exp-map of the mean positional node similarity
    along every pair of simple paths, summed (or averaged, `normalize`)
    over pairs; `cum` combines lengths with weights coef**(s-1),
    otherwise the length-k value is returned. Graphs are `(x,
    edge_index)` tuples or `data.batch.Graph`-likes.
    """
    feats = _path_feature_table(graphs, k)
    n = len(feats)
    pairs = [(i, j) for i in range(n) for j in range(i, n)]
    per_len = np.stack([
        _per_length_values(feats, s, pairs, sigma, normalize)
        for s in range(1, k + 1)])                    # [k, n_pairs]
    if cum:
        weights = coef ** np.arange(k)
        flat = (per_len * weights[:, None]).sum(0)
    else:
        flat = per_len[-1]
    gram = np.zeros((n, n), dtype=np.float64)
    for idx, (i, j) in enumerate(pairs):
        gram[i, j] = gram[j, i] = flat[idx]
    return gram


def path_kernel_pair(g1, g2, k: int, *, sigma: float = 0.6) -> np.ndarray:
    """Per-length kernel values for one pair — the reference's
    `pathkernel_compare2` (path_kernel.py:238-271): the exp-map mean
    over path pairs, one value per path length."""
    feats = _path_feature_table([g1, g2], k)
    return np.stack([
        _per_length_values(feats, s, [(0, 1)], sigma, True)[0]
        for s in range(1, k + 1)])


def _first_child_steps(paths_k: np.ndarray, edge_index: np.ndarray,
                       n_nodes: int) -> np.ndarray:
    """ind[m, t] = path step t -> t+1 chose the first (lowest-index)
    neighbor of node t not already on the path — the child the
    reference's DFS recursion visits before its sibling-restore zeroes
    the prefix slots."""
    m, k = paths_k.shape
    adj = [[] for _ in range(n_nodes)]
    for s, d in zip(*np.asarray(edge_index)):
        adj[int(s)].append(int(d))
    adj = [sorted(a) for a in adj]
    ind = np.zeros((m, k - 1), dtype=bool)
    for row in range(m):
        path = paths_k[row]
        on_path = set()
        for t in range(k - 1):
            on_path.add(int(path[t]))
            first = next((v for v in adj[int(path[t])]
                          if v not in on_path), -1)
            ind[row, t] = first == int(path[t + 1])
    return ind


def path_filter_response(g, filters: np.ndarray, sigma: float = 0.6,
                         reference_semantics: bool = True) -> jnp.ndarray:
    """Score full-length-k simple paths against position filters.

    The reference's `dfs` (path_kernel.py:10-71): filters is [k, p, d];
    for every simple path with k nodes, position i contributes
    <x[path[i]], filters[i]>; output[j] sums exp(prefix_mean_j) over
    all such paths, giving [k, p]. Dead ends shorter than k never emit
    (the reference's recursion only fires at depth 0) — enumeration of
    exactly-k-node paths gives the same set. With `reference_semantics`
    the sibling-restore zeroing quirk (module docstring) is replicated:
    slot j < k-1 keeps its prefix only along all-first-child suffixes.
    """
    filters = np.asarray(filters, dtype=np.float32)
    k, p, _ = filters.shape
    x, edge_index, n = _graph_fields(g)
    paths, _ = enumerate_paths(edge_index, n, k)
    pk = paths[k - 1]
    if pk.shape[0] == 0:
        return jnp.zeros((k, p), dtype=jnp.float32)
    base = jnp.einsum("mkd,kpd->mkp", jnp.asarray(x)[pk],
                      jnp.asarray(filters))
    divider = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :, None]
    prefixed = jnp.cumsum(base, axis=1) / divider
    if reference_semantics and k > 1:
        ind = _first_child_steps(pk, edge_index, n)
        # slot j survives iff steps j..k-2 all took the first child:
        # a reversed cumulative AND over the step indicators
        survive = np.concatenate(
            [np.cumprod(ind[:, ::-1], axis=1)[:, ::-1].astype(bool),
             np.ones((pk.shape[0], 1), dtype=bool)], axis=1)
        prefixed = prefixed * jnp.asarray(survive)[:, :, None]
    return exp_kernel(prefixed, sigma).sum(axis=0)
