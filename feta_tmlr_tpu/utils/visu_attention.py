"""Attention heatmap visualization (observability tool).

Equivalent of /root/reference/experiments/visu_attention.py:88-148: extract
per-layer attention matrices for a batch and save per-graph heatmap PDFs
(matplotlib when available, .npz always — this image ships without a
display backend guarantee).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import flax.linen as nn

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer


def collect_attention(model, variables, batch: GraphBatch) -> List[np.ndarray]:
    """All-layer attention tensors [L][B, H, N, N] via method interception."""
    attns: List[np.ndarray] = []

    def capture(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if (isinstance(context.module, GraphiTEncoderLayer)
                and context.method_name == "__call__"):
            attns.append(np.asarray(out[1]))
        return out

    with nn.intercept_methods(capture):
        model.apply(variables, batch)
    return attns


def save_attention_maps(attns: Sequence[np.ndarray], batch: GraphBatch,
                        outdir: str, graph_idx: int = 0,
                        pdf: bool = True) -> str:
    os.makedirs(outdir, exist_ok=True)
    n = int(np.asarray(batch.node_mask[graph_idx]).sum())
    stack = np.stack([a[graph_idx, :, :n, :n] for a in attns])  # [L,H,n,n]
    npz_path = os.path.join(outdir, f"attn_graph{graph_idx}.npz")
    np.savez_compressed(npz_path, attention=stack)
    if pdf:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            n_layers, n_heads = stack.shape[:2]
            fig, axes = plt.subplots(
                n_layers, n_heads,
                figsize=(2.2 * n_heads, 2.2 * n_layers), squeeze=False)
            for li in range(n_layers):
                for hi in range(n_heads):
                    axes[li][hi].imshow(stack[li, hi], cmap="viridis")
                    axes[li][hi].set_xticks([])
                    axes[li][hi].set_yticks([])
                    if hi == 0:
                        axes[li][hi].set_ylabel(f"L{li}")
            fig.tight_layout()
            pdf_path = os.path.join(outdir, f"attn_graph{graph_idx}.pdf")
            fig.savefig(pdf_path)
            plt.close(fig)
        except Exception:
            pass
    return npz_path
