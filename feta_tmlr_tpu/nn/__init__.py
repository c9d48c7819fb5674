from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer, MaskedBatchNorm
from feta_tmlr_tpu.nn.feta import FeTAEncoder, FilterCoefficientHead
from feta_tmlr_tpu.nn.models import (
    GraphTransformer,
    DiffGraphTransformer,
    DiffGraphTransformerGenGCN,
    DiffGraphTransformerGenGCNSBM,
)

__all__ = [
    "GraphiTEncoderLayer",
    "MaskedBatchNorm",
    "FeTAEncoder",
    "FilterCoefficientHead",
    "GraphTransformer",
    "DiffGraphTransformer",
    "DiffGraphTransformerGenGCN",
    "DiffGraphTransformerGenGCNSBM",
]
