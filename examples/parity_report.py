"""End-metric parity report: JAX vs pure-torch twins, all three tiers.

Trains each tier's JAX model and its independently-written torch twin
from IDENTICAL initial weights on identical data with lockstep AdamW,
then compares held-out metrics — the strongest parity statement possible
without the real datasets (zero network egress here; see PARITY.md §6
for the real-data recipe).

  python examples/parity_report.py          # ~3-5 min on CPU

Tiers:
  1. FeTA core   (DiffGraphTransformerGenGCN vs reference_twin.torch_model)
  2. SAN/LPE     (SANNodeSpectra            vs reference_twin.torch_san)
  3. LSPE        (GraphiTSpectraNet         vs reference_twin.torch_lspe)
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import optax
import torch


def _mae(pred, y):
    return float(np.abs(np.asarray(pred).reshape(-1) - y).mean())


def _lockstep(jm, params, tm, gb_train, gb_test, y_train, y_test,
              torch_inputs, steps=150, lr=1e-3):
    """Train both stacks `steps` AdamW steps; return (jax_mae, torch_mae)
    on the held-out batch."""
    opt = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    ostate = opt.init(params)

    @jax.jit
    def step(params, ostate):
        def loss_fn(p):
            out = jm.apply(p, gb_train)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.abs(out.reshape(-1) - y_train).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, ostate = opt.update(grads, ostate, params)
        return optax.apply_updates(params, updates), ostate, loss

    topt = torch.optim.AdamW(tm.parameters(), lr=lr, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=0.0)
    t_train, t_test = torch_inputs
    ty = torch.from_numpy(y_train)
    tm.train()
    for _ in range(steps):
        params, ostate, _ = step(params, ostate)
        topt.zero_grad()
        tout = tm(*t_train)
        tloss = torch.abs(tout.reshape(-1) - ty).mean()
        tloss.backward()
        topt.step()

    jout = jm.apply(params, gb_test)
    jout = jout[0] if isinstance(jout, tuple) else jout
    tm.eval()
    with torch.no_grad():
        tout = tm(*t_test).numpy()
    return _mae(jout, y_test), _mae(tout, y_test)


def tier1_feta():
    from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
    from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
    from feta_tmlr_tpu.reference_twin.torch_model import TorchFeTA
    from tests.test_parity import _params_to_torch

    def prep(seed, n):
        gs = random_graph_dataset(seed=seed, n_graphs=n, min_nodes=6,
                                  max_nodes=13, n_features=7,
                                  task="regression")
        DiffusionEncoding(beta=1.0).apply_to(gs)
        LapEncoding(dim=4).apply_to(gs)
        return collate_graphs(gs, max_nodes=16)

    tr, te = prep(0, 48), prep(9, 48)
    jm = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, batch_norm=False, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=3)
    params = jm.init(jax.random.key(0), tr)
    tm = TorchFeTA(in_size=7, nb_class=1, d_model=32, nb_heads=4,
                   dim_feedforward=64, nb_layers=2, filter_order=3,
                   batch_norm=False, lap_pos_enc=True, lap_pos_enc_dim=4)
    _params_to_torch(params, tm)

    def t_in(gb):
        t = lambda k: torch.from_numpy(np.asarray(getattr(gb, k)))
        return (t("x"), t("adj"),
                torch.from_numpy(gb.node_mask.astype(np.float32)),
                t("pe"), t("lap_pe"), t("degree"))
    return (jm, params, tm, tr, te,
            np.asarray(tr.y, np.float32).reshape(-1),
            np.asarray(te.y, np.float32).reshape(-1),
            (t_in(tr), t_in(te)))


def tier2_san():
    from tests.test_parity_san import _data, _models, _transfer, \
        _torch_inputs
    tr, te = _data(n_graphs=16, seed=0), _data(n_graphs=16, seed=9)
    jm, tm = _models()
    params = jm.init(jax.random.key(0), tr)
    _transfer(params, tm)
    return (jm, params, tm, tr, te,
            np.asarray(tr.y, np.float32).reshape(-1),
            np.asarray(te.y, np.float32).reshape(-1),
            (_torch_inputs(tr), _torch_inputs(te)))


def tier3_lspe():
    from tests.test_parity_lspe import _data, _models, _transfer, \
        _torch_inputs
    tr, te = _data(n_graphs=16, seed=0), _data(n_graphs=16, seed=9)
    jm, tm = _models()
    params = jm.init(jax.random.key(0), tr)
    _transfer(params, tm)
    return (jm, params, tm, tr, te,
            np.asarray(tr.y, np.float32).reshape(-1),
            np.asarray(te.y, np.float32).reshape(-1),
            (_torch_inputs(tr), _torch_inputs(te)))


def main():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    rows = []
    for name, build, steps in (("FeTA core (GenGCN)", tier1_feta, 120),
                               ("SAN/LPE (NodeSpectra)", tier2_san, 120),
                               ("LSPE (GraphiTSpectra)", tier3_lspe, 120)):
        jm, params, tm, tr, te, ytr, yte, tins = build()
        jmae, tmae = _lockstep(jm, params, tm, tr, te, ytr, yte, tins,
                               steps=steps)
        rel = abs(jmae - tmae) / max(tmae, 1e-9)
        rows.append((name, steps, jmae, tmae, rel))
        print(f"{name:24s} steps={steps:4d} held-out MAE: "
              f"jax={jmae:.4f} torch={tmae:.4f} rel-diff={rel:.2%}")
    worst = max(r[-1] for r in rows)
    print(f"worst relative end-metric difference: {worst:.2%}")
    # identical semantics, different fp orderings: trajectories agree
    # step-for-step early (tests/test_parity*.py) and then separate
    # chaotically like any two fp implementations; the end metrics must
    # land in the same band, not bit-equal
    assert worst < 0.08, "end-metric divergence exceeds 8%"
    print("PARITY REPORT OK")


if __name__ == "__main__":
    main()
