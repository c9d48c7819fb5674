from feta_tmlr_tpu.gckn.pathenum import enumerate_paths, enumerate_paths_py
from feta_tmlr_tpu.gckn.paths import PathBatch, build_path_batch
from feta_tmlr_tpu.gckn.layer import PathLayerParams, path_layer_forward
from feta_tmlr_tpu.gckn.linear import LinearClassifier
from feta_tmlr_tpu.gckn.models import GCKNFeature

__all__ = [
    "enumerate_paths",
    "enumerate_paths_py",
    "PathBatch",
    "build_path_batch",
    "PathLayerParams",
    "path_layer_forward",
    "GCKNFeature",
    "LinearClassifier",
]
