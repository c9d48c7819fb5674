from feta_tmlr_tpu.gckn.pathenum import enumerate_paths, enumerate_paths_py
from feta_tmlr_tpu.gckn.paths import PathBatch, build_path_batch
from feta_tmlr_tpu.gckn.layer import PathLayerParams, path_layer_forward
from feta_tmlr_tpu.gckn.linear import LinearClassifier
from feta_tmlr_tpu.gckn.models import GCKNFeature
from feta_tmlr_tpu.gckn.path_kernel import (
    path_filter_response, path_kernel_gram, path_kernel_pair)

__all__ = [
    "path_kernel_gram",
    "path_kernel_pair",
    "path_filter_response",
    "enumerate_paths",
    "enumerate_paths_py",
    "PathBatch",
    "build_path_batch",
    "PathLayerParams",
    "path_layer_forward",
    "GCKNFeature",
    "LinearClassifier",
]
