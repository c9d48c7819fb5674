"""Isolate the round-5 large-N regression: which new path hurts?

Four interleaved configurations of the SBM train step at one shape:
  xla     : FETA_PALLAS=0 (the XLA chain)
  r4      : flash, no head fold, no streamed need_heads (the round-4 path)
  stream  : flash + streamed need_heads coeff head, no fold
  fold    : flash + streamed need_heads + head-folded kernels (round-5
            default)
Each trainer is traced once with its env frozen; measurements interleave.
Usage: python examples/largen_combo_ab.py [n_nodes] [n_graphs]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("FETA_COMPUTE_DTYPE", "bfloat16")

import jax  # noqa: E402

from feta_tmlr_tpu.utils.profiling import (  # noqa: E402
    enable_persistent_compile_cache,
    timed_steps,
)

enable_persistent_compile_cache()

COMBOS = {
    "xla": {"FETA_PALLAS": "0"},
    "r4": {"FETA_PALLAS": "1", "FETA_FLASH_HEAD_FOLD": "0",
           "FETA_FLASH_NEED_HEADS": "0"},
    "stream": {"FETA_PALLAS": "1", "FETA_FLASH_HEAD_FOLD": "0",
               "FETA_FLASH_NEED_HEADS": "1"},
    "fold": {"FETA_PALLAS": "1", "FETA_FLASH_HEAD_FOLD": "1",
             "FETA_FLASH_NEED_HEADS": "1"},
}
_KEYS = ("FETA_PALLAS", "FETA_FLASH_HEAD_FOLD", "FETA_FLASH_NEED_HEADS")


def _set(env):
    for k in _KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_graphs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.data.synthetic import sbm_like_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCNSBM
    from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
    from feta_tmlr_tpu.train import Trainer, TrainConfig

    graphs = sbm_like_dataset(seed=2, n_graphs=n_graphs, n_nodes=n_nodes)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    batch = jax.device_put(collate_graphs(graphs, max_nodes=n_nodes,
                                          node_labels=True))
    jax.block_until_ready(batch.x)
    model = DiffGraphTransformerGenGCNSBM(
        in_size=3, nb_class=2, d_model=64, nb_heads=8,
        dim_feedforward=128, dropout=0.0, nb_layers=10, batch_norm=True,
        lap_pos_enc=True, lap_pos_enc_dim=8, filter_order=4)
    rng_fn = lambda i: jax.random.fold_in(jax.random.key(1), i)
    trainers = {}
    out = {"n_nodes": n_nodes, "n_graphs": n_graphs}
    for key, env in COMBOS.items():
        _set(env)
        try:
            trainers[key] = Trainer(model, TrainConfig(
                task="node_clf", lr=1e-3, sign_flip=True))
            st = trainers[key].init(jax.random.key(0), batch)
            st, _ = trainers[key]._jit_step_donated(st, batch, rng_fn(0))
            del st
        except Exception as e:
            out[f"{key}_error"] = f"{type(e).__name__}: {e}"[:150]
            trainers.pop(key, None)
    res = {k: [] for k in trainers}
    for rep in range(2):
        for key in trainers:
            _set(COMBOS[key])
            state = trainers[key].init(jax.random.key(0), batch)
            sec = timed_steps(trainers[key]._jit_step_donated, state,
                              batch, rng_fn, n1=5, n2=20)
            res[key].append(round(sec * 1e3, 2))
    for k, v in res.items():
        out[f"{k}_ms"] = v
    if "xla" in res:
        for k in res:
            if k != "xla":
                out[f"{k}_speedup"] = round(min(res["xla"]) / min(res[k]),
                                            3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
