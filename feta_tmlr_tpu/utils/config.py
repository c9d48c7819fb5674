"""JSON config system for the LPE/LSPE experiment tier.

The reference drives those trainers with JSON files (often without a .json
extension) holding {gpu, model, dataset, out_dir, params, net_params}
(e.g. /root/reference/LPE/configs/ZINC/optimized_gat_feta_1,
LSPE/configs/GatedGCN_ZINC_LSPE.json) plus argparse overrides
(LPE/main_ZINC_graph_regression.py:246-414). This loader accepts the same
files and maps net_params onto the TPU-native model constructors.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None
                ) -> Dict[str, Any]:
    with open(path) as f:
        cfg = json.load(f)
    cfg.setdefault("params", {})
    cfg.setdefault("net_params", {})
    if overrides:
        for k, v in overrides.items():
            if v is None:
                continue
            if k in cfg.get("params", {}):
                cfg["params"][k] = v
            else:
                cfg["net_params"][k] = v
    return cfg


_NET_PARAM_MAP = {
    # reference net_params key -> model kwarg
    "GT_hidden_dim": "hidden_dim",
    "GT_out_dim": "out_dim",
    "GT_n_heads": "n_heads",
    "GT_layers": "n_layers",
    "L": "n_layers",
    "hidden_dim": "hidden_dim",
    "out_dim": "out_dim",
    "n_heads": "n_heads",
    "LPE_dim": "lpe_dim",
    "LPE_n_heads": "lpe_heads",
    "LPE_layers": "lpe_layers",
    "gamma": "gamma",
    "full_graph": "full_graph",
    "dropout": "dropout",
    "in_feat_dropout": "in_feat_dropout",
    "layer_norm": "layer_norm",
    "batch_norm": "batch_norm",
    "residual": "residual",
    "readout": "readout",
    "filter_order": "filter_order",
    "pos_enc_dim": "pos_enc_dim",
    "pe_init": "pe_init",
    "adaptive_edge_PE": "adaptive_edge_pe",
    "use_lapeig_loss": "use_lapeig_loss",
    "lambda_loss": "lambda_loss",
    "alpha_loss": "alpha_loss",
    "init_gamma": "gamma",        # SAN-LSPE learned-gamma init value
    "last_layer_filter": "last_layer_filter",
}


def net_params_to_kwargs(net_params: Dict[str, Any],
                         accepted: Optional[set] = None) -> Dict[str, Any]:
    """Translate a reference net_params dict into model kwargs."""
    out = {}
    for key, val in net_params.items():
        mapped = _NET_PARAM_MAP.get(key)
        if mapped is None:
            continue
        if accepted is not None and mapped not in accepted:
            continue
        out[mapped] = val
    return out


def model_kwargs_for(model_cls, net_params: Dict[str, Any]
                     ) -> Dict[str, Any]:
    import dataclasses
    accepted = {f.name for f in dataclasses.fields(model_cls)}
    out = net_params_to_kwargs(net_params, accepted)
    # field-name aliases across model families (GAT nets use num_heads)
    if "num_heads" in accepted and "n_heads" not in accepted \
            and "n_heads" in net_params:
        out["num_heads"] = net_params["n_heads"]
    return out


LPE_VARIANTS = {
    # LPE load_net convention (LPE/nets/.../load_net.py:28-38): the LPE
    # key selects the net variant; gat/gat_feta exist only where the
    # registry provides them (ZINC tier)
    "node": "SAN_NodeLPE",
    "edge": "SAN_EdgeLPE",
    "none": "SAN",
    "nodespectra": "SAN_NodeSpectra",
    "spectral_node": "SAN_NodeSpectra",
    "gat": "GAT",
    "gat_feta": "GATFeTA",
}


def resolve_reference_model_name(cfg, model_arg=None,
                                 default="SAN_NodeSpectra",
                                 lspe_aliases=None):
    """Single reference model-name resolution shared by every config-driven
    main (previously four near-copies that had already drifted).

    LPE convention: model 'GraphTransformer' (or legacy 'SAN') +
    net_params['LPE'] picks the variant. LSPE convention
    (LSPE/nets/.../load_net.py:27-35): net_params['pe_init'] marks the
    tier; `lspe_aliases` maps its model names onto the local registry
    (e.g. {'SAN': 'SAN_LSPE', 'Spectra': 'GraphiTSpectra'}).
    """
    model_name = model_arg or cfg.get("model") or default
    lpe_kind = cfg.get("net_params", {}).get("LPE")
    if model_name in ("SAN", "GraphTransformer") and lpe_kind:
        return LPE_VARIANTS.get(lpe_kind, model_name)
    if model_name == "GraphTransformer":
        return "SAN"
    if lspe_aliases and cfg.get("net_params", {}).get("pe_init"):
        return lspe_aliases.get(model_name, model_name)
    return model_name
