"""LSPE tier tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.nn.lspe import GraphiTSpectraNet
from feta_tmlr_tpu.pe import PStepRWEncoding
from feta_tmlr_tpu.pe.rwpe import rwpe


def _batch(n_graphs=4, adaptive=False):
    graphs = zinc_categorical_dataset(seed=2, n_graphs=n_graphs)
    for g in graphs:
        g.lap_pe = rwpe(g, 8)                        # RWPE init for p
    if adaptive:
        PStepRWEncoding(p=2, beta=0.25, normalization="sym").apply_to(graphs)
    return collate_graphs(graphs, max_nodes=32)


def test_rwpe_as_p_init():
    gb = _batch()
    assert gb.lap_pe.shape[-1] == 8
    assert np.all(np.isfinite(gb.lap_pe))


@pytest.mark.parametrize("adaptive", [False, True])
def test_lspe_net_forward_and_grads(adaptive):
    gb = _batch(adaptive=adaptive)
    model = GraphiTSpectraNet(
        num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
        n_heads=2, n_layers=2, pos_enc_dim=8, filter_order=3,
        adaptive_edge_pe=adaptive, batch_norm=True)
    variables = model.init(jax.random.key(0), gb)
    out = model.apply(variables, gb)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    grads = jax.grad(lambda v: jnp.abs(
        model.apply(v, gb).squeeze(-1) - gb.y).mean())(variables)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_lspe_lapeig_loss_raises_like_reference():
    gb = _batch()
    model = GraphiTSpectraNet(
        num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
        n_heads=2, n_layers=1, pos_enc_dim=8, use_lapeig_loss=True)
    with pytest.raises(NotImplementedError):
        model.init(jax.random.key(0), gb)


def test_lspe_trains():
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    gb = _batch(n_graphs=8)
    model = GraphiTSpectraNet(
        num_atom_type=28, num_bond_type=4, hidden_dim=16, out_dim=16,
        n_heads=2, n_layers=2, pos_enc_dim=8, filter_order=2,
        batch_norm=True)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3, epochs=10,
                                    sign_flip=False))
    res = tr.fit([gb], val_batches=[gb])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]


def test_san_lspe_net():
    from feta_tmlr_tpu.nn.san_lspe import SANLSPENet
    gb = _batch(n_graphs=4)
    model = SANLSPENet(num_atom_type=28, num_bond_type=4, hidden_dim=16,
                       out_dim=16, n_heads=2, n_layers=2, pos_enc_dim=8,
                       batch_norm=True)
    variables = model.init(jax.random.key(0), gb)
    out = model.apply(variables, gb)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    grads = jax.grad(lambda v: jnp.abs(
        model.apply(v, gb).squeeze(-1) - gb.y).mean())(variables)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
