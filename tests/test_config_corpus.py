"""Every shipped config must load, resolve to a registered model, and
construct that model with its net_params.

The corpus under configs/ is the full reference set (LPE's extension-less
tree incl. the gamma-ablation grid, LSPE's *.json) ported verbatim; this
test guards that each file's model name resolves through the same
registry+resolution logic the config-driven mains use.
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.json"), recursive=True))


def _main_module_for(dataset: str):
    from feta_tmlr_tpu.experiments import (
        main_OGBMOL_graph_classification,
        main_SBMs_node_classification,
        main_TU_graph_classification,
        main_ZINC_graph_regression,
        main_molhiv_graph_classification,
    )
    d = (dataset or "ZINC").upper()
    if "ZINC" in d:
        return main_ZINC_graph_regression
    if "PATTERN" in d or "CLUSTER" in d or d.startswith("SBM"):
        return main_SBMs_node_classification
    if "HIV" in d:
        return main_molhiv_graph_classification
    if "MOL" in d or "OGB" in d or "TOX" in d or "PCBA" in d:
        return main_OGBMOL_graph_classification
    return main_TU_graph_classification


def test_corpus_is_complete():
    # the full reference corpus: 26 LSPE + 32 LPE files (+ the 4 original
    # representative LPE ports)
    assert len(CONFIGS) >= 58, len(CONFIGS)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_resolves_and_builds(path):
    from feta_tmlr_tpu.utils.config import load_config, model_kwargs_for

    cfg = load_config(path)
    mod = _main_module_for(str(cfg.get("dataset")))
    registry = getattr(mod, "MODEL_REGISTRY", None) or mod.MODELS
    if hasattr(mod, "resolve_model_name"):
        name = mod.resolve_model_name(cfg)
    else:
        name = cfg.get("model")
    assert name in registry, \
        f"{os.path.relpath(path, REPO)}: model {name!r} not in " \
        f"{mod.__name__} registry"

    cls, extra = registry[name]
    kwargs = model_kwargs_for(cls, cfg["net_params"])
    kwargs.update(extra)
    import dataclasses
    fields = {f.name for f in dataclasses.fields(cls)}
    ctor = {}
    for k, v in (("num_atom_type", 28), ("num_bond_type", 4),
                 ("n_out", 1)):
        if k in fields and k not in kwargs:
            ctor[k] = v
    model = cls(**ctor, **kwargs)   # flax dataclass construction validates
    assert model is not None
