"""Eigenvector-layout graph plots + parameter counting.

Counterparts of the reference's small observability utilities:
  - `plot_graph_eigvec` (LSPE/utils/plot_util.py:9-45): draw a graph with
    node positions given by the first two dims of its positional encoding
    (actual Laplacian eigvecs, or the learned `p` channel of an LSPE net);
  - `count_parameters` (transformer/utils.py:8-9, LPE/utils.py:8-9).

Dependency-light: matplotlib only (no networkx/DGL — positions come
straight from the PE array; edges are drawn as line segments).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax


def count_parameters(params) -> int:
    """Total trainable parameter count of a flax param tree (reference:
    sum of p.numel() over requires_grad params)."""
    return int(sum(np.size(x) for x in jax.tree_util.tree_leaves(params)))


def plot_graph_eigvec(ax, g_id, graph, pe: np.ndarray,
                      actual_eigvecs: bool = True,
                      node_labels: bool = True):
    """Draw `graph` with node i at (pe[i, 0], pe[i, 1]).

    Args:
      ax: a matplotlib Axes.
      g_id: graph id for the title.
      graph: a data.batch.Graph (edge_index [2, E]).
      pe: [n_nodes, >=2] positional encoding; first two dims are x/y.
      actual_eigvecs: titles the plot as eigvecs vs predicted PEs
        (LSPE/utils/plot_util.py:11-16 semantics).
    """
    pos = np.asarray(pe)[:, :2]
    src, dst = np.asarray(graph.edge_index)
    for a, b in zip(src, dst):
        ax.plot([pos[a, 0], pos[b, 0]], [pos[a, 1], pos[b, 1]],
                color="0.6", alpha=0.3, zorder=1)
    ax.scatter(pos[:, 0], pos[:, 1], c="r", s=180, zorder=2)
    if node_labels:
        for i, (x, y) in enumerate(pos):
            ax.annotate(str(i), (x, y), fontsize=16, ha="center",
                        va="center", zorder=3)
    ax.tick_params(left=True, bottom=True, labelleft=True,
                   labelbottom=True)
    kind = "Actual eigvecs" if actual_eigvecs else "Predicted PEs"
    ax.set_xlabel("first eigenvec" if actual_eigvecs
                  else "first predicted pe")
    ax.set_ylabel("second eigenvec" if actual_eigvecs
                  else "second predicted pe")
    ax.set_title(f"Graph ID: {g_id} | {kind}")
    return ax
