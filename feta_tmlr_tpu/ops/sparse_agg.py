"""Scatter-free AND gather-free sparse-edge aggregation over padded COO.

The GatedGCN/PNA families aggregate messages over REAL in-edges only
(DGL `update_all` in the reference, gatedgcn_lspe_layer.py:55-131 and
pna_lspe_layer.py) — at molecular densities (~2N directed edges vs N^2
dense pairs) the dense [B, N, N, D] mailbox the first rebuild used is
~15x wasted HBM traffic. These helpers re-express the same math over
`GraphBatch.edge_index [B, 2, E]` / `edge_mask [B, E]` in the
TPU-idiomatic form: EVERY gather and segment reduction is a one-hot MXU
matmul.

Round-4 on-chip finding (BASELINE.md): the first sparse path used
`jnp.take_along_axis` for the node->edge gathers and was 4x SLOWER than
the dense mailbox in the forward — XLA lowers small-slice gathers on TPU
serially, and their backward is a scatter-add (worse). With N <= a few
hundred, a [E, N] one-hot matmul does the same gather at trivial MXU
cost, and its transpose (the backward) is another matmul — no gather or
scatter anywhere in the hot path.

Results equal the dense masked formulations exactly on real entries
(one-hot rows select single values; padded edges have zero rows and are
masked by every consumer) — pinned by tests/test_gatedgcn_sparse.py and
tests/test_pna_sparse.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SparseEdges:
    """Per-step COO context shared by every sparse layer: one-hot source /
    destination matrices (gathers + segment sums as matmuls) and the
    in-edge incidence one-hot for segment max/min. Built once per step
    (`make_sparse_edges`); all one-hots live at the compute dtype."""

    def __init__(self, src, dst, edge_mask, oh_src, oh_dst, inc_oh=None,
                 in_edge_mask=None):
        self.src = src
        self.dst = dst
        self.edge_mask = edge_mask
        self.oh_src = oh_src              # [B, E, N], masked rows
        self.oh_dst = oh_dst              # [B, E, N], masked rows
        self.inc_oh = inc_oh              # [B, N, K, E] or None
        self.in_edge_mask = in_edge_mask  # [B, N, K] or None
        self.deg = oh_dst.astype(jnp.float32).sum(1)       # [B, N] in-deg

    def gather_src(self, x):
        """x [B, N, D] -> per-edge x[src] [B, E, D] (zero on pad edges)."""
        return jnp.einsum("ben,bnd->bed", self.oh_src, x.astype(
            self.oh_src.dtype))

    def gather_dst(self, x):
        return jnp.einsum("ben,bnd->bed", self.oh_dst, x.astype(
            self.oh_dst.dtype))

    def segment_sum(self, msg):
        """Per-destination sum of edge messages [B, E, F] -> [B, N, F]
        (f32 accumulation); pad edges contribute zero rows."""
        return jnp.einsum("bef,ben->bnf", msg, self.oh_dst,
                          preferred_element_type=jnp.float32)


def make_sparse_edges(batch, dtype=jnp.float32, with_incidence=False):
    """SparseEdges from a GraphBatch collated with with_coo=True."""
    src, dst = batch.edge_index[:, 0], batch.edge_index[:, 1]
    n = batch.max_nodes
    emf = batch.edge_mask.astype(dtype)[..., None]
    oh_src = jax.nn.one_hot(src, n, dtype=dtype) * emf
    oh_dst = jax.nn.one_hot(dst, n, dtype=dtype) * emf
    inc_oh = in_mask = None
    if with_incidence:
        if batch.in_edges is None:
            raise ValueError("batch lacks in_edges (collate with_coo=True "
                             "builds them)")
        e = src.shape[-1]
        inc_oh = jax.nn.one_hot(batch.in_edges, e, dtype=dtype) \
            * batch.in_edge_mask.astype(dtype)[..., None]
        in_mask = batch.in_edge_mask
    return SparseEdges(src, dst, batch.edge_mask, oh_src, oh_dst,
                       inc_oh, in_mask)


def incidence_values(msg, edges: SparseEdges):
    """msg [B, E, F] -> per-node in-edge values [B, N, K, F] via the
    incidence one-hot (a matmul; masked slots are zero)."""
    return jnp.einsum("bnke,bef->bnkf", edges.inc_oh,
                      msg.astype(edges.inc_oh.dtype))


def incidence_max(msg, edges: SparseEdges):
    """Per-destination max over real in-edges; 0 for degree-0 nodes
    (DGL update_all zero-fills empty mailboxes)."""
    g = incidence_values(msg, edges)
    g = jnp.where(edges.in_edge_mask[..., None], g, -jnp.inf)
    out = g.max(axis=2)
    return jnp.where(edges.deg[..., None] > 0, out, 0.0)


def incidence_min(msg, edges: SparseEdges):
    g = incidence_values(msg, edges)
    g = jnp.where(edges.in_edge_mask[..., None], g, jnp.inf)
    out = g.min(axis=2)
    return jnp.where(edges.deg[..., None] > 0, out, 0.0)


def edge_ids_from_dense(dense_field, src, dst):
    """Per-edge values from a dense [B, N, N] field at (src, dst) pairs
    (host-rate op, once per step — a plain gather is fine here)."""
    b, n, _ = dense_field.shape
    flat = dense_field.reshape(b, n * n)
    return jnp.take_along_axis(flat, src * n + dst, axis=1)


# --------------------------------------------------------------- legacy
# take_along_axis forms, kept for A/Bs and CPU paths (on TPU the one-hot
# matmuls above are the fast path — see module docstring)

def edge_gather(x, idx):
    """x: [B, N, D]; idx: [B, E] int -> [B, E, D] (x[b, idx[b, e]])."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def dst_onehot(dst, edge_mask, n: int, dtype=jnp.float32):
    """[B, E, N] one-hot of each edge's destination, zeroed on pad edges."""
    oh = jax.nn.one_hot(dst, n, dtype=dtype)
    return oh * edge_mask.astype(dtype)[..., None]


def edge_segment_sum(msg, oh):
    """Per-destination sum of edge messages as an MXU matmul."""
    return jnp.einsum("bef,ben->bnf", msg, oh,
                      preferred_element_type=jnp.float32)
