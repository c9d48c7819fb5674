"""HTTP serving endpoint (serve_http.py): JSON predict round trip."""

import json
import urllib.error
import urllib.request

import numpy as np
import jax

from feta_tmlr_tpu.data import collate_graphs, random_graph_dataset
from feta_tmlr_tpu.nn import DiffGraphTransformerGenGCN
from feta_tmlr_tpu.pe import DiffusionEncoding, LapEncoding
from feta_tmlr_tpu.serve import Predictor
from feta_tmlr_tpu.serve_http import start_background


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_predict_roundtrip():
    graphs = random_graph_dataset(seed=0, n_graphs=4, min_nodes=6,
                                  max_nodes=10, n_features=7)
    DiffusionEncoding(beta=1.0).apply_to(graphs)
    LapEncoding(dim=4).apply_to(graphs)
    model = DiffGraphTransformerGenGCN(
        in_size=7, nb_class=2, d_model=32, nb_heads=4, dim_feedforward=64,
        dropout=0.0, nb_layers=1, lap_pos_enc=True, lap_pos_enc_dim=4,
        filter_order=2)
    batch = collate_graphs(graphs, max_nodes=16)
    variables = model.init(jax.random.key(0), batch)
    pred = Predictor(model, variables=variables, max_batch=4,
                     collate_kwargs={"max_nodes": 16})
    srv, port = start_background(pred)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        payload = {"graphs": [
            {"x": g.x.tolist(), "edge_index": g.edge_index.tolist(),
             "pe": g.pe.tolist(), "lap_pe": g.lap_pe.tolist(),
             "degree": g.degree.tolist()}
            for g in graphs]}
        out = _post(port, "/predict", payload)
        logits = np.asarray(out["logits"])
        ref = pred.predict(graphs)
        np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-6)

        # malformed request -> 400, server keeps serving
        try:
            _post(port, "/predict", {"graphs": [{"bogus": 1}]})
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        out2 = _post(port, "/predict", payload)
        assert np.asarray(out2["logits"]).shape == logits.shape
    finally:
        srv.shutdown()


def test_serve_main_end_to_end(tmp_path):
    """The serving CLI path: build a config-driven model, checkpoint it,
    restore + serve raw-graph JSON with SERVER-side PE precompute."""
    from feta_tmlr_tpu.data import collate_graphs as _collate
    from feta_tmlr_tpu.data.synthetic import zinc_categorical_dataset
    from feta_tmlr_tpu.experiments.serve_main import build_from_config
    from feta_tmlr_tpu.serve import Predictor
    from feta_tmlr_tpu.serve_http import start_background
    from feta_tmlr_tpu.train import Trainer, TrainConfig
    from feta_tmlr_tpu.train.checkpoint import CheckpointManager

    model, preprocess, sample = build_from_config(
        "configs/LPE/ZINC_SAN_NodeLPE_optimized.json", max_freqs=5)
    sample_batch = _collate(sample, max_nodes=32)
    # checkpoint with the TRAINING main's optimizer (plateau/injectable
    # lr — main_ZINC hardcodes schedule='plateau') so the restore
    # template in serve_main must match that tree, as in real use
    trainer = Trainer(model, TrainConfig(task="graph_reg",
                                         schedule="plateau"))
    state = trainer.init(jax.random.key(0), sample_batch)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state)
    mgr.close()

    # restore through serve_main's own template-construction path (a
    # fresh plateau trainer), NOT the saved state object
    tmpl_trainer = Trainer(model, TrainConfig(task="graph_reg",
                                              schedule="plateau"))
    state_like = tmpl_trainer.init(jax.random.key(7), sample_batch)
    pred = Predictor(model, ckpt_dir=str(tmp_path / "ck"),
                     state_like=state_like, max_batch=4,
                     collate_kwargs={"max_nodes": 32})
    srv, port = start_background(pred, preprocess=preprocess)
    try:
        raw = zinc_categorical_dataset(seed=3, n_graphs=3)
        payload = {"graphs": [
            {"x_int": g.x.reshape(-1).tolist(),
             "edge_index": g.edge_index.tolist()}
            for g in raw]}
        # note: edge_type omitted -> net runs without edge features;
        # PE (laplace_decomp for SAN_NodeLPE) computed server-side
        out = _post(port, "/predict", payload)
        logits = np.asarray(out["logits"])
        assert logits.shape[0] == 3 and np.all(np.isfinite(logits))
    finally:
        srv.shutdown()
