"""Graph packing: many small graphs per lane-aligned node row.

TPU-first batching beyond the reference's one-graph-per-row padding
(transformer/data.py pads each batch row to the longest graph): molecules
average ~23 nodes, so at the MXU's 128-lane granularity a 48-padded row
wastes ~62% of every matmul tile. Packing first-fit-decreasing ~5 graphs
into each 128-node row makes every feature matmul full-width and cuts the
number of rows ~5x; graph identity is carried per node and all pairwise ops
(attention, Laplacians, PE kernels) become block-diagonal via the
`graph_id` pair mask.

Produces the same GraphBatch pytree plus:
  graph_id  [B, N]     int32 graph slot within the row (-1 on padding)
  graph_mask[B, G]     bool, valid graph slots
  y         [B, G, ...] per-graph labels in slot order
node_mask/pe/adj/degree/lap_pe behave as before (block-diagonal).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from feta_tmlr_tpu.data.batch import Graph, GraphBatch


def pack_graphs(
    graphs: Sequence[Graph],
    row_len: int = 128,
    dtype=np.float32,
) -> GraphBatch:
    order = sorted(range(len(graphs)),
                   key=lambda i: -graphs[i].num_nodes)
    rows: List[List[int]] = []
    row_space: List[int] = []
    for gi in order:
        n = graphs[gi].num_nodes
        if n > row_len:
            raise ValueError(f"graph with {n} nodes exceeds row_len {row_len}")
        placed = False
        for r, space in enumerate(row_space):
            if space >= n:
                rows[r].append(gi)
                row_space[r] -= n
                placed = True
                break
        if not placed:
            rows.append([gi])
            row_space.append(row_len - n)

    bsz = len(rows)
    g_max = max(len(r) for r in rows)
    g0 = graphs[0]
    int_x = np.issubdtype(g0.x.dtype, np.integer)
    squeeze_x = int_x and g0.x.shape[-1] == 1
    if squeeze_x:
        x = np.zeros((bsz, row_len), np.int32)
    else:
        x = np.zeros((bsz, row_len, g0.x.shape[-1]),
                     np.int32 if int_x else dtype)
    node_mask = np.zeros((bsz, row_len), bool)
    graph_id = np.full((bsz, row_len), -1, np.int32)
    graph_mask = np.zeros((bsz, g_max), bool)
    adj = np.zeros((bsz, row_len, row_len), dtype)
    use_pe = g0.pe is not None
    use_lap = g0.lap_pe is not None
    use_deg = g0.degree is not None
    pe = np.zeros((bsz, row_len, row_len), dtype) if use_pe else None
    lap_pe = (np.zeros((bsz, row_len, g0.lap_pe.shape[-1]), dtype)
              if use_lap else None)
    degree = np.zeros((bsz, row_len), dtype) if use_deg else None

    if g0.y is None:
        y = None
    else:
        y0 = np.asarray(g0.y)
        if y0.ndim >= 1 and y0.shape[0] == g0.num_nodes and y0.shape[0] > 1:
            raise NotImplementedError(
                "pack_graphs supports graph-level labels only; per-node "
                "labels (SBM tier) need slot-offset packing — use "
                "collate_graphs for node-level tasks")
        y = np.zeros((bsz, g_max) + y0.shape, y0.dtype)

    for r, members in enumerate(rows):
        off = 0
        for slot, gi in enumerate(members):
            g = graphs[gi]
            n = g.num_nodes
            sl = slice(off, off + n)
            x[r, sl] = g.x.reshape(n) if squeeze_x else g.x
            node_mask[r, sl] = True
            graph_id[r, sl] = slot
            graph_mask[r, slot] = True
            if g.num_edges:
                adj[r, g.edge_index[0] + off, g.edge_index[1] + off] = 1.0
            if use_pe:
                pe[r, sl, sl] = g.pe
            if use_lap:
                lap_pe[r, sl, : g.lap_pe.shape[-1]] = g.lap_pe
            if use_deg:
                degree[r, sl] = g.degree
            if y is not None:
                y[r, slot] = np.asarray(g.y)
            off += n

    return GraphBatch(
        x=x, node_mask=node_mask, adj=adj, y=y, pe=pe, lap_pe=lap_pe,
        degree=degree, graph_id=graph_id, graph_mask=graph_mask,
    )
