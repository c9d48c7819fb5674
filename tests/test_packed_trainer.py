"""Trainer drives packed batches end to end via the task adapters."""

import numpy as np
import jax

from feta_tmlr_tpu.data import random_graph_dataset
from feta_tmlr_tpu.data.pack import pack_graphs
from feta_tmlr_tpu.nn.packed import PackedDiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.train import Trainer, TrainConfig


def test_trainer_fits_packed_batches():
    graphs = random_graph_dataset(seed=31, n_graphs=20, min_nodes=5,
                                  max_nodes=12, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    train = pack_graphs(graphs[:16], row_len=32)
    val = pack_graphs(graphs[16:], row_len=32)
    model = PackedDiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=3e-3,
                                         epochs=15, sign_flip=False))
    res = trainer.fit([train], val_batches=[val])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
    assert 0.0 <= res["best_val"] <= 1.0
