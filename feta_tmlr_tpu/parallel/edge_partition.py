"""Edge-partitioned multi-chip graph aggregation (SpMM) over a device mesh.

The BASELINE north-star path: for SBM-scale graphs, partition nodes
contiguously across chips and edges by destination shard; aggregate
neighborhoods with XLA collectives over ICI instead of replicating the
graph. Two schedules:

  - `allgather_spmm`: all_gather the node block (one fused ICI collective),
    then one local gather + segment-sum. Simplest, best for small V.
  - `ring_spmm`: the node block circulates the ring via ppermute; at step t
    each device processes the edge bucket whose sources live in the block it
    currently holds, overlapping the permute with local segment-sums.
    O(V/D) memory per step, bandwidth-optimal on a ring.

Host-side `partition_edges` builds the static bucketed layout. The
reference has no distributed path at all (nn.DataParallel only, SURVEY.md
§2.8) — this is new capability required by BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


@dataclasses.dataclass
class PartitionedGraph:
    """Host-built static edge partition for an n_shards mesh axis.

    Node u lives on shard u // nodes_per_shard. Edge (s, d) lives on
    shard_of(d), in the bucket indexed by shard_of(s). All buckets padded
    to one static size.
    """

    n_nodes: int
    n_shards: int
    nodes_per_shard: int
    # [n_shards(dst), n_shards(src bucket), E_bucket]
    src_local: np.ndarray          # src index local to its (src) shard
    dst_local: np.ndarray          # dst index local to the owning shard
    weight: np.ndarray
    mask: np.ndarray


def partition_edges(edge_index: np.ndarray, n_nodes: int, n_shards: int,
                    edge_weight=None) -> PartitionedGraph:
    # native fast path (native/edgepart.cpp via ctypes): two sequential
    # passes with no per-edge Python — the list-append builder below is
    # the golden twin (bit-identical, tests/test_edgepart_native.py)
    from feta_tmlr_tpu.parallel.edgepart_native import (
        native_available,
        partition_edges_native,
    )
    if native_available():
        vs, src_local, dst_local, weight, mask = partition_edges_native(
            edge_index, n_nodes, n_shards, edge_weight)
        return PartitionedGraph(n_nodes=n_nodes, n_shards=n_shards,
                                nodes_per_shard=vs, src_local=src_local,
                                dst_local=dst_local, weight=weight,
                                mask=mask)
    vs = -(-n_nodes // n_shards)          # nodes per shard (ceil)
    src, dst = edge_index[0], edge_index[1]
    if edge_weight is None:
        edge_weight = np.ones(len(src), dtype=np.float32)
    dst_shard = dst // vs
    src_shard = src // vs
    buckets = [[[] for _ in range(n_shards)] for _ in range(n_shards)]
    for e in range(len(src)):
        buckets[dst_shard[e]][src_shard[e]].append(e)
    e_max = max((len(b) for row in buckets for b in row), default=1)
    e_max = max(e_max, 1)
    shape = (n_shards, n_shards, e_max)
    src_local = np.zeros(shape, np.int32)
    dst_local = np.zeros(shape, np.int32)
    weight = np.zeros(shape, np.float32)
    mask = np.zeros(shape, bool)
    for d in range(n_shards):
        for s in range(n_shards):
            idx = buckets[d][s]
            k = len(idx)
            if k:
                src_local[d, s, :k] = src[idx] - s * vs
                dst_local[d, s, :k] = dst[idx] - d * vs
                weight[d, s, :k] = edge_weight[idx]
                mask[d, s, :k] = True
    return PartitionedGraph(n_nodes=n_nodes, n_shards=n_shards,
                            nodes_per_shard=vs, src_local=src_local,
                            dst_local=dst_local, weight=weight, mask=mask)


def pad_node_features(x: np.ndarray, pg: PartitionedGraph) -> np.ndarray:
    """Pad [V, F] to [n_shards * nodes_per_shard, F]."""
    total = pg.n_shards * pg.nodes_per_shard
    out = np.zeros((total,) + x.shape[1:], x.dtype)
    out[: x.shape[0]] = x
    return out


def _local_agg(block, src, dst, w, m, n_local):
    msg = block[src] * (w * m)[:, None]
    return jax.ops.segment_sum(msg, dst, n_local)


def make_allgather_spmm(mesh: Mesh, axis: str = "data"):
    """y_local = sum over all-gathered blocks; one collective per call."""

    def local_fn(x_local, src, dst, w, m):
        # x_local: [Vs, F]; buckets for MY dst shard: [S, E], leading dst
        # axis is sharded away by shard_map.
        x_all = jax.lax.all_gather(x_local, axis)      # [S, Vs, F]
        n_local = x_local.shape[0]
        s_count = x_all.shape[0]

        def body(s, acc):
            return acc + _local_agg(x_all[s], src[0, s], dst[0, s],
                                    w[0, s], m[0, s], n_local)
        # accumulate in the promoted dtype (bf16 blocks x f32 edge
        # weights aggregate in f32), so the loop carry type is stable
        acc_dtype = jnp.promote_types(x_local.dtype, w.dtype)
        acc = jax.lax.fori_loop(
            0, s_count, body, jnp.zeros_like(x_local, dtype=acc_dtype))
        return acc

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None))


def ring_spmm_local(axis: str, n_shards: int):
    """Per-shard body of the ring schedule, reusable inside larger
    shard_mapped computations (see parallel/partitioned_model.py):
    the node block rotates via ppermute, bucket (my - t) % S is processed
    at step t, and the permute overlaps with the local segment-sum."""

    def apply(block0, src, dst, w, m, n_local):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def body(t, carry):
            block, acc = carry
            s = (my - t) % n_shards
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, s, keepdims=False)
            acc = acc + _local_agg(block, take(src), take(dst), take(w),
                                   take(m), n_local)
            block = jax.lax.ppermute(block, axis, perm)
            return block, acc

        acc_dtype = jnp.promote_types(block0.dtype, w.dtype)
        _, acc = jax.lax.fori_loop(
            0, n_shards, body,
            (block0, jnp.zeros_like(block0, dtype=acc_dtype)))
        return acc

    return apply


def make_ring_spmm(mesh: Mesh, axis: str = "data"):
    """shard_mapped ring SpMM (see ring_spmm_local)."""
    n_shards = mesh.shape[axis]
    local = ring_spmm_local(axis, n_shards)

    def local_fn(x_local, src, dst, w, m):
        return local(x_local, src[0], dst[0], w[0], m[0],
                     x_local.shape[0])

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None))


def place_partitioned(pg: PartitionedGraph, x: np.ndarray, mesh: Mesh,
                      axis: str = "data"):
    """Device-put the partitioned graph + padded features with shardings."""
    xp = pad_node_features(x, pg)
    sh2 = NamedSharding(mesh, P(axis, None))
    sh3 = NamedSharding(mesh, P(axis, None, None))
    return (jax.device_put(xp, sh2),
            jax.device_put(pg.src_local, sh3),
            jax.device_put(pg.dst_local, sh3),
            jax.device_put(pg.weight, sh3),
            jax.device_put(pg.mask, sh3))
