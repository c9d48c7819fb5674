"""SANNet variant tests (none/node/edge LPE) and non-FeTA zoo models."""

import numpy as np
import jax
import pytest

from feta_tmlr_tpu.data import collate_graphs
from feta_tmlr_tpu.data.synthetic import (
    sbm_like_dataset,
    zinc_categorical_dataset,
)
from feta_tmlr_tpu.nn.san import SANNet
from feta_tmlr_tpu.pe.laplace import apply_laplace_decomp


@pytest.mark.parametrize("lpe", ["none", "node", "edge"])
def test_san_net_variants(lpe):
    graphs = zinc_categorical_dataset(seed=4, n_graphs=4)
    apply_laplace_decomp(graphs, 6)
    gb = collate_graphs(graphs, max_nodes=32)
    model = SANNet(num_atom_type=28, num_bond_type=4, lpe=lpe,
                   hidden_dim=16, out_dim=16, n_heads=2, n_layers=2,
                   lpe_dim=4, lpe_heads=2, lpe_layers=1, batch_norm=True)
    variables = model.init(jax.random.key(0), gb)
    out = model.apply(variables, gb)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_plain_sbm_and_molhiv_models():
    from feta_tmlr_tpu.nn.models import (
        DiffGraphTransformerMolHiv,
        DiffGraphTransformerSBM,
    )
    from tests.test_ogb import ogb_like_dataset

    graphs = sbm_like_dataset(seed=1, n_graphs=3, n_nodes=20)
    gb = collate_graphs(graphs, max_nodes=24)
    m = DiffGraphTransformerSBM(in_size=3, nb_class=2, d_model=32,
                                nb_heads=4, dim_feedforward=64, dropout=0.0,
                                nb_layers=2)
    v = m.init(jax.random.key(0), gb)
    out = m.apply(v, gb)
    assert out.shape == (3, 24, 2)

    og = ogb_like_dataset(seed=5)
    gb2 = collate_graphs(og, max_nodes=24)
    m2 = DiffGraphTransformerMolHiv(d_model=32, nb_heads=4,
                                    dim_feedforward=64, dropout=0.0,
                                    nb_layers=2)
    v2 = m2.init(jax.random.key(0), gb2)
    logits, _reg, sig = m2.apply(v2, gb2)
    assert logits.shape == (8,)
    np.testing.assert_allclose(np.asarray(sig),
                               1 / (1 + np.exp(-np.asarray(logits))),
                               atol=1e-6)
