"""Experiment-CLI smoke tests (tiny configs, synthetic fallbacks)."""

import numpy as np
import pytest


def test_canonical_gengcn_cv():
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_cv as m
    res = m.main(["--dataset", "MUTAG", "--epochs", "2",
                  "--synthetic-graphs", "24", "--dim-hidden", "32",
                  "--nb-layers", "2", "--batch-size", "12"])
    assert res["best_val"] is not None


def test_zinc_packed_cli():
    from feta_tmlr_tpu.experiments import run_transformer_gengcn as m
    res = m.main(["--epochs", "2", "--synthetic-graphs", "24",
                  "--dim-hidden", "32", "--nb-layers", "2", "--packed",
                  "--batch-size", "12"])
    assert "test" in res


def test_plain_transformer_cli():
    from feta_tmlr_tpu.experiments import run_transformer as m
    res = m.main(["--epochs", "2", "--synthetic-graphs", "24",
                  "--dim-hidden", "32", "--nb-layers", "2",
                  "--batch-size", "12"])
    assert "test" in res


def test_vanilla_and_gcn_transformer_cli():
    from feta_tmlr_tpu.experiments import run_transformer as m1
    from feta_tmlr_tpu.experiments import run_transformer_gcn as m2
    res = m1.main(["--epochs", "1", "--synthetic-graphs", "16",
                   "--dim-hidden", "16", "--nb-layers", "1", "--vanilla",
                   "--batch-size", "8"])
    assert "test" in res
    res = m2.main(["--epochs", "1", "--synthetic-graphs", "16",
                   "--dim-hidden", "16", "--nb-layers", "1",
                   "--batch-size", "8"])
    assert "test" in res


def test_config_driven_zinc_main(tmp_path):
    import json
    from feta_tmlr_tpu.experiments import main_ZINC_graph_regression as m
    cfg = {"model": "SAN", "params": {"epochs": 2, "batch_size": 12},
           "net_params": {"hidden_dim": 16, "out_dim": 16, "n_heads": 2,
                          "L": 2, "batch_norm": True}}
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    res = m.main(["--config", str(path), "--synthetic-graphs", "20"])
    assert res["best_val"] is not None


def test_gckn_sup_zinc_cli():
    from feta_tmlr_tpu.experiments import gckn_sup as m
    test_mae = m.main(["--epochs", "8", "--synthetic-graphs", "20",
                       "--hidden-size", "8", "--path-size", "3",
                       "--n-sampling-paths", "500"])
    assert np.isfinite(test_mae)


def test_gckn_cv_cli():
    from feta_tmlr_tpu.experiments import run_transformer_gckn_cv as m
    res = m.main(["--dataset", "MUTAG", "--epochs", "2",
                  "--synthetic-graphs", "20", "--dim-hidden", "16",
                  "--nb-layers", "1", "--batch-size", "10",
                  "--gckn-dim", "8", "--n-sampling-paths", "500"])
    assert res["best_val"] is not None


def test_gckn_molhiv_cli():
    from feta_tmlr_tpu.experiments import run_transformer_gckn_molhiv as m
    res = m.main(["--epochs", "2", "--synthetic-graphs", "24",
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--batch-size", "12", "--gckn-dim", "8",
                  "--n-sampling-paths", "500"])
    assert res["best_val"] is not None


def test_gckn_gengcn_zinc_cli():
    # headline FeTA+GCKN ZINC configuration
    # (reference run_transformer_gckn_gengcn.py)
    from feta_tmlr_tpu.experiments import run_transformer_gckn_gengcn as m
    res = m.main(["--epochs", "2", "--synthetic-graphs", "20",
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--batch-size", "8", "--gckn-dim", "8",
                  "--gckn-path", "3", "--filter_order", "2",
                  "--n-sampling-paths", "400"])
    assert res["best_val"] is not None


def test_plain_molhiv_cli():
    # plain GraphiT molhiv (reference run_transformer_molhiv.py:390-404)
    from feta_tmlr_tpu.experiments import run_transformer_molhiv as m
    res = m.main(["--epochs", "2", "--synthetic-graphs", "40",
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--batch-size", "8"])
    assert np.isfinite(res["best_val"])


def test_gckn_sbm_and_molpcba_cli():
    from feta_tmlr_tpu.experiments import run_transformer_gckn_SBM_cv as m1
    from feta_tmlr_tpu.experiments import (
        run_transformer_gckn_gengcn_molpcba as m2)
    res = m1.main(["--epochs", "2", "--synthetic-graphs", "12",
                   "--n-nodes", "20", "--dim-hidden", "16",
                   "--nb-layers", "1", "--batch-size", "6",
                   "--gckn-dim", "8", "--n-sampling-paths", "500"])
    assert res["best_val"] is not None
    res = m2.main(["--epochs", "2", "--synthetic-graphs", "16",
                   "--dim-hidden", "16", "--nb-layers", "1",
                   "--batch-size", "8", "--gckn-dim", "8",
                   "--filter_order", "2", "--n-sampling-paths", "500"])
    assert res["best_val"] is not None


def test_sweep_runner(tmp_path):
    """Sweep driver: two ablation grid points through the ZINC main,
    summary CSV written with best_val per config."""
    import csv
    from feta_tmlr_tpu.experiments.sweep import main as sweep_main
    out = str(tmp_path / "sweep.csv")
    rows = sweep_main([
        "--main", "main_ZINC_graph_regression",
        "--configs", "configs/LPE/ZINC/ablation/full/1e-[23]/node.json",
        "--out", out,
        "--", "--epochs", "1", "--synthetic-graphs", "12",
    ])
    assert len(rows) == 2
    assert all(r["status"] == "ok" for r in rows), rows
    with open(out) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 2 and got[0]["best_val"] != ""
