"""Graph containers and padded-dense batch collation.

TPU-first design: a batch of graphs is a *static-shaped* pytree of dense
arrays — node features padded to a bucketed max length, the graph itself held
as a dense [B, N, N] adjacency (graphs in every FeTA workload are small:
molecules ~40 nodes, SBM ~200), so that every downstream op (attention,
Laplacian builds, Chebyshev recurrences) is a batched matmul on the MXU
instead of a gather/scatter SpMM.

This replaces the reference's `GraphDataset_v2.collate_fn`
(/root/reference/transformer/data.py:113-225) which emits padded tensors plus
flat COO `edge_indices` / `batch_indices` / `feature_indices_to_gather`
side-tables; with a dense adjacency none of those sparse side-tables are
needed — the dense↔sparse bridge disappears. A COO view (`edge_index`,
`edge_mask`) is still carried, padded to an edge bucket, for the sparse /
edge-partitioned multi-host tier.

The reference hardcodes the device inside collate and uses `mask==True` for
*padding* (transformer/data.py:102); here collation is pure numpy (host) and
`node_mask==True` means *valid*, which composes better with `jnp.where`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np

import flax.struct


@dataclasses.dataclass
class Graph:
    """A single host-side graph (numpy).

    Attributes:
      x: [n, f] node features.
      edge_index: [2, e] int array of (row, col) = (source, target) pairs.
        Undirected graphs store both directions, as in the reference.
      y: label — scalar, vector, or per-node [n, ...].
      edge_attr: optional [e, fe] edge features.
      pe: optional [n, n] relative positional-encoding kernel.
      lap_pe: optional [n, p] absolute (Laplacian/GCKN) PE.
      degree: optional [n] degree feature (reference: 1/sqrt(1+deg),
        transformer/data.py:38-42).
    """

    x: np.ndarray
    edge_index: np.ndarray
    y: Any = None
    edge_attr: Optional[np.ndarray] = None
    pe: Optional[np.ndarray] = None
    lap_pe: Optional[np.ndarray] = None
    degree: Optional[np.ndarray] = None
    edge_type: Optional[np.ndarray] = None   # [e] int edge/bond types
    eigvecs: Optional[np.ndarray] = None     # [n, M] NaN-padded
    eigvals: Optional[np.ndarray] = None     # [M] NaN-padded

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    def compute_degree_feature(self) -> None:
        """deg feature 1/sqrt(1+deg) as in reference transformer/data.py:41."""
        deg = np.zeros(self.num_nodes, dtype=np.float32)
        np.add.at(deg, self.edge_index[0], 1.0)
        self.degree = (1.0 / np.sqrt(1.0 + deg)).astype(np.float32)


class GraphBatch(flax.struct.PyTreeNode):
    """Static-shaped dense batch of graphs (the device-side pytree).

    All fields are jnp/np arrays; optional fields are None (pruned from the
    pytree). Shapes: B graphs, N padded nodes, E padded edges.
    """

    x: Any                      # [B, N, F] float (or [B, N] int ids)
    node_mask: Any              # [B, N] bool, True = real node
    adj: Any                    # [B, N, N] float dense adjacency
    y: Any = None               # [B, ...] or [B, N] labels
    pe: Any = None              # [B, N, N] PE kernel
    lap_pe: Any = None          # [B, N, P]
    degree: Any = None          # [B, N]
    edge_index: Any = None      # [B, 2, E] int32 COO (padded, self-loop pad)
    edge_mask: Any = None       # [B, E] bool
    edge_attr: Any = None       # [B, E, Fe]
    in_edges: Any = None        # [B, N, K] int32 in-edge ids per dst node
    in_edge_mask: Any = None    # [B, N, K] bool (K = max in-degree bucket)
    edge_type: Any = None       # [B, N, N] int32 dense edge types (SAN tier)
    eigvecs: Any = None         # [B, N, M] Laplacian eigvecs, NaN-padded
    eigvals: Any = None         # [B, M] eigenvalues, NaN-padded
    graph_id: Any = None        # [B, N] int32 slot per node (packed batches)
    graph_mask: Any = None      # [B, G] bool valid graph slots (packed)

    @property
    def num_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]

    def n_nodes(self):
        return self.node_mask.sum(-1)


_DEFAULT_NODE_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def pad_bucket(n: int, buckets: Sequence[int] = _DEFAULT_NODE_BUCKETS) -> int:
    """Round n up to a bucket size to bound the number of XLA recompiles."""
    for b in buckets:
        if n <= b:
            return b
    # beyond the table: round up to a multiple of 128 (lane width)
    return ((n + 127) // 128) * 128


def collate_graphs(
    graphs: Sequence[Graph],
    node_buckets: Sequence[int] = _DEFAULT_NODE_BUCKETS,
    edge_buckets: Optional[Sequence[int]] = None,
    with_coo: bool = False,
    max_nodes: Optional[int] = None,
    dtype=np.float32,
    node_labels: Optional[bool] = None,
) -> GraphBatch:
    """Pure-numpy host collation into a GraphBatch.

    Mirrors the information content of the reference collates
    (transformer/data.py:161-225) without device placement or sparse
    side-tables.
    """
    bsz = len(graphs)
    n_raw = max(g.num_nodes for g in graphs)
    n = max_nodes if max_nodes is not None else pad_bucket(n_raw, node_buckets)
    if n < n_raw:
        raise ValueError(f"max_nodes={n} < largest graph ({n_raw})")
    int_x = np.issubdtype(graphs[0].x.dtype, np.integer)
    squeeze_x = int_x and graphs[0].x.shape[-1] == 1
    use_pe = graphs[0].pe is not None
    use_lap = graphs[0].lap_pe is not None
    use_deg = graphs[0].degree is not None
    use_etype = graphs[0].edge_type is not None
    use_eig = graphs[0].eigvecs is not None
    eigvecs = eigvals = None
    if use_eig:
        m_freqs = graphs[0].eigvecs.shape[-1]
        eigvecs = np.full((bsz, n, m_freqs), np.nan, dtype=dtype)
        eigvals = np.full((bsz, m_freqs), np.nan, dtype=dtype)

    for name, used in (("pe", use_pe), ("lap_pe", use_lap),
                       ("degree", use_deg)):
        if used:
            missing = [i for i, g in enumerate(graphs)
                       if getattr(g, name) is None]
            if missing:
                raise ValueError(
                    f"graph(s) {missing} lack `{name}` but graph 0 has it; "
                    "optional attributes must be consistent across a batch")

    # native fast path (native/collate.cpp via ctypes): one C call fills
    # every dense tensor, OpenMP over graphs; numpy below is the golden
    # fallback (bit-identical, tests/test_collate_native.py)
    native = None
    if not int_x and dtype == np.float32 and not use_eig:
        from feta_tmlr_tpu.data.collate_native import (
            collate_dense_native,
            native_available,
        )
        if native_available():
            native = collate_dense_native(graphs, n)
    if native is not None:
        x, node_mask, adj, pe, lap_pe, degree, edge_type = native
        ys = [np.asarray(g.y) for g in graphs if g.y is not None]
        edge_index = edge_mask = edge_attr = None
        in_edges = in_edge_mask = None
        if with_coo:
            edge_index, edge_mask, edge_attr = _collate_coo(
                graphs, edge_buckets or _DEFAULT_NODE_BUCKETS, dtype)
            in_edges, in_edge_mask = _collate_incidence(
                graphs, edge_index, edge_mask, n)
        y = _pack_labels(ys, graphs, node_labels, bsz, n)
        return GraphBatch(
            x=x, node_mask=node_mask, adj=adj, y=y, pe=pe, lap_pe=lap_pe,
            degree=degree, edge_index=edge_index, edge_mask=edge_mask,
            edge_attr=edge_attr, edge_type=edge_type, eigvecs=eigvecs,
            eigvals=eigvals, in_edges=in_edges, in_edge_mask=in_edge_mask,
        )

    if squeeze_x:
        # single categorical id (SAN tier): [B, N] int32 for embeddings
        x = np.zeros((bsz, n), dtype=np.int32)
    elif int_x:
        # multi-column categorical features (OGB tier): [B, N, F] int32
        x = np.zeros((bsz, n, graphs[0].x.shape[-1]), dtype=np.int32)
    else:
        x = np.zeros((bsz, n, graphs[0].x.shape[-1]), dtype=dtype)
    node_mask = np.zeros((bsz, n), dtype=bool)
    adj = np.zeros((bsz, n, n), dtype=dtype)
    pe = np.zeros((bsz, n, n), dtype=dtype) if use_pe else None
    lap_pe = (
        np.zeros((bsz, n, graphs[0].lap_pe.shape[-1]), dtype=dtype)
        if use_lap else None
    )
    degree = np.zeros((bsz, n), dtype=dtype) if use_deg else None
    edge_type = np.zeros((bsz, n, n), dtype=np.int32) if use_etype else None

    ys = []
    for i, g in enumerate(graphs):
        m = g.num_nodes
        x[i, :m] = g.x.reshape(m) if squeeze_x else g.x
        node_mask[i, :m] = True
        if g.num_edges:
            adj[i, g.edge_index[0], g.edge_index[1]] = 1.0
        if use_pe:
            pe[i, :m, :m] = g.pe
        if use_lap:
            lap_pe[i, :m, : g.lap_pe.shape[-1]] = g.lap_pe
        if use_deg:
            degree[i, :m] = g.degree
        if use_etype and g.num_edges:
            edge_type[i, g.edge_index[0], g.edge_index[1]] = \
                np.asarray(g.edge_type).ravel()
        if use_eig:
            eigvecs[i, :m] = g.eigvecs
            eigvals[i] = g.eigvals
        if g.y is not None:
            ys.append(np.asarray(g.y))

    y = _pack_labels(ys, graphs, node_labels, bsz, n)

    edge_index = edge_mask = edge_attr = None
    in_edges = in_edge_mask = None
    if with_coo:
        edge_index, edge_mask, edge_attr = _collate_coo(
            graphs, edge_buckets or _DEFAULT_NODE_BUCKETS, dtype)
        in_edges, in_edge_mask = _collate_incidence(
            graphs, edge_index, edge_mask, n)

    return GraphBatch(
        x=x, node_mask=node_mask, adj=adj, y=y, pe=pe, lap_pe=lap_pe,
        degree=degree, edge_index=edge_index, edge_mask=edge_mask,
        edge_attr=edge_attr, edge_type=edge_type, eigvecs=eigvecs,
        eigvals=eigvals, in_edges=in_edges, in_edge_mask=in_edge_mask,
    )


def _pack_labels(ys, graphs, node_labels, bsz, n):
    if not ys:
        return None
    if node_labels is None:
        # infer per-node labels ONLY when every graph's label length
        # equals its own node count; a fixed-size batch where a
        # graph-level task vector could coincide (e.g. 128 tasks on a
        # 128-node graph) is ambiguous and must be made explicit
        all_match = all(
            yy.ndim >= 1 and yy.shape[0] == g.num_nodes
            for yy, g in zip(ys, graphs))
        sizes_vary = len({g.num_nodes for g in graphs}) > 1
        if all_match and not sizes_vary and graphs[0].num_nodes > 1:
            raise ValueError(
                "ambiguous labels: every y length equals the (uniform) "
                "node count; pass node_labels=True/False explicitly")
        node_labels = all_match and sizes_vary
    if node_labels:
        # per-node labels (SBM tier): pad to [B, N] with -1
        yb = np.full((bsz, n) + ys[0].shape[1:], -1, dtype=ys[0].dtype)
        for i, yy in enumerate(ys):
            yb[i, : yy.shape[0]] = yy
        return yb
    return np.stack(ys)


def _collate_coo(graphs, edge_buckets, dtype):
    bsz = len(graphs)
    e_raw = max(max(g.num_edges for g in graphs), 1)
    e = pad_bucket(e_raw, edge_buckets)
    edge_index = np.zeros((bsz, 2, e), dtype=np.int32)
    edge_mask = np.zeros((bsz, e), dtype=bool)
    edge_attr = None
    use_eattr = graphs[0].edge_attr is not None
    if use_eattr:
        edge_attr = np.zeros(
            (bsz, e, graphs[0].edge_attr.shape[-1]), dtype=dtype)
    for i, g in enumerate(graphs):
        ne = g.num_edges
        edge_index[i, :, :ne] = g.edge_index
        edge_mask[i, :ne] = True
        if use_eattr and ne:
            edge_attr[i, :ne] = g.edge_attr
    return edge_index, edge_mask, edge_attr


_INCIDENCE_BUCKETS = (2, 4, 8, 16, 32, 64, 128)


def _collate_incidence(graphs, edge_index, edge_mask, n):
    """Host-built per-destination in-edge table: in_edges[b, i, k] is the
    k-th edge id (into the padded E axis) whose dst == i. Enables
    scatter-free segment max/min on device (ops/sparse_agg.py); K is the
    batch's max in-degree rounded to a bucket to bound recompiles."""
    bsz, _, e = edge_index.shape
    deg = np.zeros((bsz, n), dtype=np.int64)
    for i in range(bsz):
        dst = edge_index[i, 1][edge_mask[i]]
        np.add.at(deg[i], dst, 1)
    k = pad_bucket(max(int(deg.max()), 1), _INCIDENCE_BUCKETS)
    in_edges = np.zeros((bsz, n, k), dtype=np.int32)
    in_mask = np.zeros((bsz, n, k), dtype=bool)
    fill = np.zeros((bsz, n), dtype=np.int64)
    for i in range(bsz):
        for eid in np.nonzero(edge_mask[i])[0]:
            d = edge_index[i, 1, eid]
            in_edges[i, d, fill[i, d]] = eid
            in_mask[i, d, fill[i, d]] = True
            fill[i, d] += 1
    return in_edges, in_mask


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack same-shaped GraphBatches along a new leading axis (for
    `Trainer.make_multi_step`'s scan). All batches must share shapes
    (use a fixed `max_nodes`/bucket) and optional-field presence."""
    import jax
    first = batches[0]
    for b in batches[1:]:
        fl, bl = jax.tree_util.tree_leaves(first), \
            jax.tree_util.tree_leaves(b)
        if len(fl) != len(bl) or any(
                np.shape(x) != np.shape(y) for x, y in zip(fl, bl)):
            raise ValueError(
                "stack_batches needs identically-shaped batches "
                "(same bucket and same optional fields)")
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *batches)
