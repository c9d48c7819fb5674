"""End-to-end entry-point runs on REAL-format fixture datasets.

Each test drives a CLI main with --datadir/--data-dir pointing at
tests/fixtures, proving the real-data code path (not the synthetic
fallback) trains end to end: loader -> PE -> collate -> model -> metrics.
"""

import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_run_transformer_real_zinc(capsys):
    from feta_tmlr_tpu.experiments import run_transformer as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "[data] loaded ZINC" in out
    assert "test" in res


def test_run_transformer_gengcn_real_zinc(capsys):
    from feta_tmlr_tpu.experiments import run_transformer_gengcn as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--filter_order", "2", "--batch-size", "8"])
    assert "[data] loaded ZINC" in capsys.readouterr().out
    assert "test" in res


def test_run_transformer_sbm_real(capsys):
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_SBM_cv as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dataset", "SBM_FIXTURE", "--dim-hidden", "16",
                  "--nb-layers", "1", "--filter_order", "2",
                  "--batch-size", "4"])
    assert "[data] loaded SBM_FIXTURE" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_run_transformer_molhiv_real(capsys):
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_molhiv as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--filter_order", "2", "--batch-size", "4"])
    assert "[data] loaded ogbg-molhiv" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_run_transformer_molpcba_real(capsys):
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_molpcba as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--filter_order", "2", "--batch-size", "4"])
    # fixture molpcba has 8 tasks; the runner's N_TASKS=128 head simply
    # trains on the first 8 columns via the masked BCE, so just smoke it
    assert "[data] loaded ogbg-molpcba" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_main_zinc_real(capsys):
    from feta_tmlr_tpu.experiments import main_ZINC_graph_regression as m
    res = m.main(["--model", "SAN", "--epochs", "2",
                  "--data-dir", FIXTURES, "--batch_size", "8"])
    assert "[data] loaded ZINC" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_main_sbm_real(capsys):
    from feta_tmlr_tpu.experiments import main_SBMs_node_classification as m
    res = m.main(["--model", "SAN", "--epochs", "2",
                  "--data-dir", FIXTURES, "--dataset", "SBM_FIXTURE"])
    assert "[data] loaded SBM_FIXTURE" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_main_molhiv_real(capsys):
    from feta_tmlr_tpu.experiments import main_molhiv_graph_classification \
        as m
    res = m.main(["--model", "SAN", "--epochs", "2",
                  "--data-dir", FIXTURES])
    assert "[data] loaded ogbg-molhiv" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_run_transformer_pcqm4m_real_lsc(capsys):
    """PCQM4M runner on the REAL LSC layout (smiles csv + split_dict.pt),
    featurized by the built-in SMILES parser (data/smiles.py)."""
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_pcqm4m \
        as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dim-hidden", "16", "--nb-layers", "1",
                  "--filter_order", "2", "--batch-size", "4"])
    assert "loaded pcqm4m_kddcup2021 LSC smiles" in capsys.readouterr().out
    assert res["best_val"] is not None


def test_run_transformer_gengcn_cv_real_tu(capsys):
    """Canonical TU CV runner (the paper's flagship protocol) on a
    real-format TU text fixture: parser -> one-hot tags -> PE -> CV fold."""
    from feta_tmlr_tpu.experiments import run_transformer_gengcn_cv as m
    res = m.main(["--epochs", "2", "--datadir", FIXTURES,
                  "--dataset", "TUFIX", "--dim-hidden", "16",
                  "--nb-layers", "1", "--filter_order", "2",
                  "--batch-size", "8", "--fold-idx", "1"])
    out = capsys.readouterr().out
    assert "[warn]" not in out          # real data, not the fallback
    assert res["best_val"] is not None


def test_main_tu_real_san(capsys):
    """LPE-tier TU main (SAN + Laplace decomposition) on the TU fixture."""
    from feta_tmlr_tpu.experiments import main_TU_graph_classification as m
    res = m.main(["--model", "SAN", "--epochs", "2",
                  "--datadir", FIXTURES, "--dataset", "TUFIX"])
    out = capsys.readouterr().out
    assert "[warn]" not in out
    assert res["best_val"] is not None


def test_main_tu_real_gatedgcn(capsys):
    """LSPE-tier TU main (GatedGCN + RWPE) on the TU fixture."""
    from feta_tmlr_tpu.experiments import main_TU_graph_classification as m
    res = m.main(["--model", "GatedGCN", "--epochs", "2",
                  "--datadir", FIXTURES, "--dataset", "TUFIX"])
    out = capsys.readouterr().out
    assert "[warn]" not in out
    assert res["best_val"] is not None


def test_main_ogbmol_real(capsys):
    """LSPE OGBMOL multitask main on the raw-CSV molpcba fixture (8-task
    label table narrower than the published 128; masked BCE handles NaNs)."""
    from feta_tmlr_tpu.experiments import main_OGBMOL_graph_classification \
        as m
    res = m.main(["--model", "GatedGCN", "--dataset", "MOLPCBA",
                  "--epochs", "2", "--data-dir", FIXTURES])
    assert "[data] loaded ogbg-molpcba" in capsys.readouterr().out
    assert res["best_val"] is not None
