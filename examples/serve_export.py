"""Deployment walkthrough: train briefly, checkpoint, serve, export.

Covers the production-inference surface the reference never had:
  1. Trainer.fit with per-epoch (async) checkpoints;
  2. Predictor restored FROM the checkpoint (bucketed jitted serving,
     compact wire format);
  3. jax.export StableHLO artifact: serialize the compiled forward,
     reload it, and match the live model's logits.

Runs on CPU in ~1 min: `python examples/serve_export.py`.
"""

import os
import tempfile

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")       # force CPU (axon override)

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.export import export_predict, load_exported, \
    save_exported
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.serve import Predictor
from feta_tmlr_tpu.train import Trainer, TrainConfig


def main():
    graphs = random_graph_dataset(seed=0, n_graphs=32, min_nodes=6,
                                  max_nodes=14, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=16)

    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=3e-3,
                                         epochs=8, sign_flip=False))

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        res = trainer.fit([batch], val_batches=[batch], ckpt_dir=ckpt,
                          ckpt_async=True)
        print(f"trained: best val acc {res['best_val']:.3f}")

        # --- serve from the checkpoint ---------------------------------
        pred = Predictor(model, ckpt_dir=ckpt, state_like=res["state"],
                         max_batch=16, collate_kwargs={"max_nodes": 16},
                         wire=True)
        logits = pred.predict(graphs)
        acc = (np.argmax(logits, -1) ==
               np.asarray([g.y for g in graphs])).mean()
        print(f"served {len(graphs)} graphs, accuracy {acc:.3f}")

        # --- export a deployment artifact ------------------------------
        state = res["state"]
        variables = dict(state.params)
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        art = export_predict(model, variables, batch)
        path = os.path.join(tmp, "model.stablehlo")
        save_exported(art, path)
        fn = load_exported(path)
        out = np.asarray(fn(batch))
        ref = np.asarray(trainer._jit_eval(state.params, state.batch_stats,
                                           batch))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        print(f"exported artifact: {os.path.getsize(path)/1e6:.2f} MB, "
              "reloaded logits match the live model")
    print("SERVE/EXPORT OK")


if __name__ == "__main__":
    main()
