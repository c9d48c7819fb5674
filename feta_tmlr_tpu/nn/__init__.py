from feta_tmlr_tpu.nn.layers import GraphiTEncoderLayer, MaskedBatchNorm
from feta_tmlr_tpu.nn.feta import FeTAEncoder, FilterCoefficientHead
from feta_tmlr_tpu.nn.models import (
    GraphTransformer,
    DiffGraphTransformer,
    DiffGraphTransformerGCN,
    DiffGraphTransformerGenGCN,
    DiffGraphTransformerGenGCNSBM,
    DiffGraphTransformerMolHiv,
    DiffGraphTransformerSBM,
)
from feta_tmlr_tpu.nn.gnn import DenseGCNConv, DenseGENGCN

__all__ = [
    "GraphiTEncoderLayer",
    "MaskedBatchNorm",
    "FeTAEncoder",
    "FilterCoefficientHead",
    "GraphTransformer",
    "DiffGraphTransformer",
    "DiffGraphTransformerGCN",
    "DiffGraphTransformerGenGCN",
    "DiffGraphTransformerGenGCNSBM",
    "DiffGraphTransformerMolHiv",
    "DiffGraphTransformerSBM",
    "DenseGCNConv",
    "DenseGENGCN",
]
