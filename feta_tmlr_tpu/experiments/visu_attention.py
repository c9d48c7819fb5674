"""Attention visualization CLI (reference experiments/visu_attention.py):
train briefly (or load) a GraphiT model, dump per-layer attention heatmaps
for sample graphs as PDFs/npz."""

from __future__ import annotations

import argparse

import jax

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformer
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.utils.visu_attention import (
    collect_attention,
    save_attention_maps,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", type=str, default="attn_maps")
    p.add_argument("--n-graphs", type=int, default=4)
    p.add_argument("--dim-hidden", type=int, default=32)
    p.add_argument("--nb-heads", type=int, default=4)
    p.add_argument("--nb-layers", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    graphs = random_graph_dataset(seed=args.seed, n_graphs=args.n_graphs,
                                  n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = collate_graphs(graphs)
    model = DiffGraphTransformer(
        in_size=7, nb_class=2, d_model=args.dim_hidden,
        nb_heads=args.nb_heads, dim_feedforward=2 * args.dim_hidden,
        dropout=0.0, nb_layers=args.nb_layers, lap_pos_enc=True,
        lap_pos_enc_dim=4)
    variables = model.init(jax.random.key(args.seed), batch)
    attns = collect_attention(model, variables, batch)
    for gi in range(args.n_graphs):
        path = save_attention_maps(attns, batch, args.outdir, graph_idx=gi)
        print("saved", path)


if __name__ == "__main__":
    main()
