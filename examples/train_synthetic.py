"""Minimal end-to-end training drive on synthetic graphs (CPU, ~1 min).

This is the canonical verification script: dataset -> positional encodings
-> dense collation -> DiffGraphTransformerGenGCN -> Trainer. Asserts the
model actually learns (val accuracy >= 0.9).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python examples/train_synthetic.py
"""

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon first

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset  # noqa: E402
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN  # noqa: E402
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding  # noqa: E402
from feta_tmlr_tpu.train import Trainer, TrainConfig  # noqa: E402


def main():
    graphs = random_graph_dataset(seed=0, n_graphs=32, n_features=7,
                                  n_classes=2)
    DiffusionEncoding(beta=1.0, normalization="sym").apply_to(graphs)
    LapEncoding(2, normalization="sym").apply_to(graphs)
    batches = [collate_graphs(graphs[i: i + 16]) for i in (0, 16)]

    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=2,
        filter_order=2)
    trainer = Trainer(
        model,
        TrainConfig(task="graph_clf", lr=3e-3, epochs=40, sign_flip=True,
                    seed=0),
        steps_per_epoch=len(batches))
    res = trainer.fit(batches, val_batches=batches, epochs=40,
                      log_fn=lambda r: None)
    print("best_val accuracy:", res["best_val"])
    assert res["best_val"] >= 0.9, res
    print("E2E TRAIN OK")


if __name__ == "__main__":
    main()
