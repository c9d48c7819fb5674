"""Interleaved on-chip A/B: SAN_NodeSpectra tier with the fused-MLP
Pallas kernel on the eigen-PE head (FETA_FUSED_MLP=1) vs the XLA chain
(=0). Round-5 VERDICT item 3: the ff_dim=2048 head is 68% of SAN's FLOPs
(reference SAN_NodeSpectra.py:51 keeps torch's dim_feedforward default);
target <= ~14 ms/step from the round-4 20.6.

Both trainers are built ONCE (the env knob is read at trace time) and
only the measurements interleave — the compile-frugal protocol of
bench.bench_pallas_xla_pair. Prints one JSON line.
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


def main():
    import jax.numpy as jnp
    from bench_tiers import _zinc_graphs, MAX_NODES
    from feta_tmlr_tpu.data import collate_graphs
    from feta_tmlr_tpu.nn.san import SANNodeSpectra
    from feta_tmlr_tpu.train import Trainer, TrainConfig

    graphs = _zinc_graphs(seed=0, eig_freqs=10)
    batch = jax.device_put(collate_graphs(graphs, max_nodes=MAX_NODES))
    jax.block_until_ready(batch.x)
    model = SANNodeSpectra(num_atom_type=28, num_bond_type=4,
                           hidden_dim=56, out_dim=56, n_heads=8,
                           n_layers=10, lpe_dim=8, lpe_heads=4,
                           lpe_layers=2, gamma=1e-5, dropout=0.0,
                           in_feat_dropout=0.0, filter_order=4, n_out=1,
                           layer_norm=False, batch_norm=True,
                           compute_dtype=jnp.bfloat16)
    rng_fn = lambda i: jax.random.fold_in(jax.random.key(1), i)
    trainers = {}
    for key, flag in (("xla", "0"), ("fused", "1")):
        os.environ["FETA_FUSED_MLP"] = flag
        trainers[key] = Trainer(model, TrainConfig(task="graph_reg",
                                                   lr=1e-3,
                                                   sign_flip=True))
        st = trainers[key].init(jax.random.key(0), batch)
        st, _ = trainers[key]._jit_step_donated(st, batch, rng_fn(0))
        del st
    out = {}
    for rep in range(2):
        for key, flag in (("xla", "0"), ("fused", "1")):
            os.environ["FETA_FUSED_MLP"] = flag
            state = trainers[key].init(jax.random.key(0), batch)
            sec = timed_steps(trainers[key]._jit_step_donated, state,
                              batch, rng_fn, n1=5, n2=20)
            out.setdefault(key, []).append(round(sec, 5))
    out["speedup"] = round(min(out["xla"]) / min(out["fused"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
