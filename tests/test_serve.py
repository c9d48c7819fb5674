"""Serving predictor: bucketed jitted inference, checkpoint restore path,
micro-batching, node-level stripping."""

import numpy as np
import jax
import pytest

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.serve import Predictor, bucketize


def _graphs(n=12, seed=0):
    graphs = random_graph_dataset(seed=seed, n_graphs=n, min_nodes=6,
                                  max_nodes=14, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(4).apply_to(graphs)
    return graphs


def _model():
    return DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=16, nb_heads=2, dim_feedforward=32,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)


def test_predict_matches_direct_apply_and_microbatches():
    graphs = _graphs()
    model = _model()
    batch = collate_graphs(graphs, max_nodes=16)
    variables = model.init(jax.random.key(0), batch)
    want, _ = model.apply(variables, batch)

    pred = Predictor(model, variables=variables, max_batch=5,
                     collate_kwargs={"max_nodes": 16})
    got = pred.predict(graphs)                  # 3 micro-batches of <=5
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)
    assert pred.predict([]).size == 0


def test_predict_from_checkpoint(tmp_path):
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    from feta_tmlr_tpu.train.checkpoint import CheckpointManager

    graphs = _graphs(8, seed=1)
    batch = collate_graphs(graphs, max_nodes=16)
    model = _model()
    trainer = Trainer(model, TrainConfig(task="graph_clf", lr=1e-3,
                                         sign_flip=False))
    state = trainer.init(jax.random.key(0), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    mgr.close()

    pred = Predictor(model, ckpt_dir=str(tmp_path / "ckpt"),
                     state_like=state,
                     collate_kwargs={"max_nodes": 16})
    got = pred.predict(graphs)
    variables = dict(state.params)          # already {"params": ...}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    want, _ = model.apply(variables, batch)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_bucketize_groups_static_shapes():
    graphs = _graphs(20, seed=2)
    groups = bucketize(graphs)
    assert sum(len(v) for v in groups.values()) == 20
    for bucket, gs in groups.items():
        assert all(g.num_nodes <= bucket for g in gs)


def test_predict_data_parallel_mesh():
    """Data-parallel serving: batch axis sharded over an 8-device mesh,
    params replicated — logits identical to single-device serving,
    including a non-divisible tail chunk (internally padded)."""
    from jax.sharding import Mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    graphs = _graphs(n=20, seed=3)          # 20 = 16 + tail of 4
    model = _model()
    batch = collate_graphs(graphs[:8], max_nodes=16)
    variables = model.init(jax.random.key(0), batch)

    single = Predictor(model, variables=variables, max_batch=16,
                       collate_kwargs={"max_nodes": 16})
    mesh = Mesh(np.array(devs[:8]), ("data",))
    sharded = Predictor(model, variables=variables, max_batch=16,
                        collate_kwargs={"max_nodes": 16}, mesh=mesh)
    np.testing.assert_allclose(sharded.predict(graphs),
                               single.predict(graphs),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        Predictor(model, variables=variables, max_batch=12, mesh=mesh)


def test_predictor_warmup_precompiles_buckets():
    """warmup(sample) compiles one program per bucket >= the sample's
    size; subsequent predicts of those shapes hit the jit cache."""
    graphs = _graphs(3, seed=11)
    model = _model()
    batch = collate_graphs(graphs, max_nodes=16)
    variables = model.init(jax.random.key(0), batch)
    pred = Predictor(model, variables=variables, max_batch=4,
                     node_buckets=(16, 32))
    n = pred.warmup(graphs[0])
    assert n == 2
    out = pred.predict(graphs)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


def test_dynamic_batcher_concurrent_requests():
    """Concurrent single-graph requests coalesce into shared batches and
    every caller gets exactly its own logits back (order-preserving
    scatter), matching the direct Predictor output."""
    import threading
    from feta_tmlr_tpu.serve_batcher import DynamicBatcher

    graphs = _graphs(16, seed=3)
    model = _model()
    batch = collate_graphs(graphs, max_nodes=16)
    variables = model.init(jax.random.key(0), batch)
    pred = Predictor(model, variables=variables, max_batch=8,
                     collate_kwargs={"max_nodes": 16})
    want = pred.predict(graphs)

    batcher = DynamicBatcher(pred, max_wait_ms=20.0)
    results = [None] * len(graphs)

    def worker(i):
        results[i] = batcher.predict([graphs[i]])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(graphs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()
    for i, r in enumerate(results):
        assert r is not None and r.shape[0] == 1
        np.testing.assert_allclose(r[0], want[i], rtol=1e-5, atol=1e-6)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        batcher.predict([graphs[0]])
