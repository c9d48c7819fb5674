"""jax.export deployment artifacts (feta_tmlr_tpu/export.py): serialize
the compiled forward, reload, and match the live model's logits."""

import numpy as np
import jax

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.export import export_predict, load_exported, \
    save_exported
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding


def _setup():
    graphs = random_graph_dataset(seed=0, n_graphs=6, min_nodes=6,
                                  max_nodes=12, n_features=7,
                                  task="regression")
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    batch = collate_graphs(graphs, max_nodes=16)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=2, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    variables = model.init(jax.random.key(0), batch)
    return model, variables, batch


def test_export_roundtrip_baked(tmp_path):
    model, variables, batch = _setup()
    ref = model.apply(variables, batch, deterministic=True)
    ref = np.asarray(ref[0] if isinstance(ref, tuple) else ref)

    exp = export_predict(model, variables, batch)
    direct = np.asarray(exp.call(batch))
    np.testing.assert_allclose(direct, ref, rtol=1e-5, atol=1e-6)

    p = str(tmp_path / "model.stablehlo")
    save_exported(exp, p)
    fn = load_exported(p)
    out = np.asarray(fn(batch))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_export_unbaked_variables(tmp_path):
    model, variables, batch = _setup()
    ref = model.apply(variables, batch, deterministic=True)
    ref = np.asarray(ref[0] if isinstance(ref, tuple) else ref)
    exp = export_predict(model, variables, batch, bake_variables=False)
    p = str(tmp_path / "model_nv.stablehlo")
    save_exported(exp, p)
    fn = load_exported(p)
    out = np.asarray(fn(variables, batch))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_export_wrong_shape_rejected():
    model, variables, batch = _setup()
    exp = export_predict(model, variables, batch)
    import pytest
    bad = jax.tree.map(lambda x: x, batch).replace(
        x=np.zeros((3, 16, 7), np.float32))
    with pytest.raises(Exception):
        exp.call(bad)
