"""Wire-format (data/wire.py) tests: exactness, size, and end-to-end
equivalence through the Trainer and Predictor."""

import numpy as np
import jax
import jax.numpy as jnp

from feta_tmlr_tpu.data.batch import collate_graphs
from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
from feta_tmlr_tpu.data.wire import from_wire, nbytes, to_wire
from feta_tmlr_tpu.pe.encodings import DiffusionEncoding, LapEncoding


def _batch(n_graphs=8, max_nodes=32):
    graphs = zinc_categorical_dataset(seed=0, n_graphs=n_graphs)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=8).apply_to(graphs)
    for g in graphs:
        g.compute_degree_feature()
    return collate_graphs(graphs, max_nodes=max_nodes)


def test_roundtrip_exact_fields():
    b = _batch()
    w = to_wire(b)
    # compaction happened
    assert np.asarray(w.adj).dtype == np.bool_
    assert np.asarray(w.x).dtype == np.int16
    assert np.asarray(w.pe).dtype.itemsize == 2
    r = jax.jit(from_wire)(jax.device_put(w))
    np.testing.assert_array_equal(np.asarray(r.adj), np.asarray(b.adj))
    np.testing.assert_array_equal(np.asarray(r.x), np.asarray(b.x))
    assert np.asarray(r.x).dtype == np.int32
    # bf16 kernels: exact to 1 part in 2^8
    np.testing.assert_allclose(np.asarray(r.pe), np.asarray(b.pe),
                               rtol=1 / 128, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r.lap_pe), np.asarray(b.lap_pe),
                               rtol=1 / 128, atol=1e-3)
    # untouched fields
    np.testing.assert_array_equal(np.asarray(w.node_mask),
                                  np.asarray(b.node_mask))
    np.testing.assert_array_equal(np.asarray(w.degree),
                                  np.asarray(b.degree))


def test_from_wire_noop_on_full_precision():
    b = jax.device_put(_batch())
    r = jax.jit(from_wire)(b)
    np.testing.assert_array_equal(np.asarray(r.pe), np.asarray(b.pe))
    np.testing.assert_array_equal(np.asarray(r.adj), np.asarray(b.adj))
    assert np.asarray(r.adj).dtype == np.float32


def test_weighted_adjacency_left_alone():
    b = _batch()
    b = b.replace(adj=np.asarray(b.adj) * 0.5)
    w = to_wire(b)
    assert np.asarray(w.adj).dtype == np.float32


def test_wire_shrinks_payload():
    b = _batch(n_graphs=16, max_nodes=48)
    ratio = nbytes(b) / nbytes(to_wire(b))
    assert ratio > 2.0, ratio


def _float_batch(seed=0, n_graphs=12, max_nodes=16):
    from feta_tmlr_tpu.data.synthetic import random_graph_dataset
    graphs = random_graph_dataset(seed=seed, n_graphs=n_graphs,
                                  min_nodes=6, max_nodes=12, n_features=7,
                                  task="regression")
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    return graphs, collate_graphs(graphs, max_nodes=max_nodes)


def test_trainer_step_on_wire_batch():
    """A wire batch through the jitted step must train and land within
    bf16-rounding distance of the full-precision step."""
    from feta_tmlr_tpu.nn.models import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.train.trainer import Trainer, TrainConfig

    _, b = _float_batch()
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4,
        dim_feedforward=64, dropout=0.0, nb_layers=2, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=2)
    tr = Trainer(model, TrainConfig(task="graph_reg", epochs=1,
                                    sign_flip=False))
    state = tr.init(jax.random.key(0), jax.device_put(b))
    w = jax.device_put(to_wire(b))
    s1, loss_w = tr._jit_step(state, w, jax.random.key(1))
    s2, loss_f = tr._jit_step(state, jax.device_put(b), jax.random.key(1))
    assert np.isfinite(float(loss_w))
    np.testing.assert_allclose(float(loss_w), float(loss_f),
                               rtol=2e-2, atol=2e-2)
    # fit() end-to-end with cfg.wire
    tr2 = Trainer(model, TrainConfig(task="graph_reg", epochs=2,
                                     sign_flip=False, wire=True))
    res = tr2.fit([b], val_batches=[b])
    assert np.isfinite(res["history"][-1]["loss"])


def test_predictor_wire_matches():
    from feta_tmlr_tpu.nn.models import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.serve import Predictor

    graphs, b = _float_batch(seed=3)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4,
        dim_feedforward=64, dropout=0.0, nb_layers=2, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=2)
    variables = model.init(jax.random.key(0), jax.device_put(b))
    kw = dict(collate_kwargs={"max_nodes": 16}, max_batch=5)
    p_plain = Predictor(model, variables=variables, **kw)
    p_wire = Predictor(model, variables=variables, wire=True, **kw)
    a = p_plain.predict(graphs)
    c = p_wire.predict(graphs)
    assert a.shape == c.shape
    np.testing.assert_allclose(a, c, rtol=2e-2, atol=2e-2)


def test_fit_streamed_wire():
    """cfg.stream: host-resident train batches through the prefetcher
    (+wire encode on the prefetch thread) — must learn like the
    device-resident path."""
    from feta_tmlr_tpu.nn.models import DiffGraphTransformerGenGCN
    from feta_tmlr_tpu.train.trainer import Trainer, TrainConfig

    graphs, b = _float_batch(seed=7, n_graphs=16)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=1, d_model=32, nb_heads=4,
        dim_feedforward=64, dropout=0.0, nb_layers=2, lap_pos_enc=True,
        lap_pos_enc_dim=4, filter_order=2)
    tr = Trainer(model, TrainConfig(task="graph_reg", lr=3e-3, epochs=10,
                                    sign_flip=False, stream=True,
                                    wire=True))
    res = tr.fit([b], val_batches=[b])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
