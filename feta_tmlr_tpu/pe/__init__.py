from feta_tmlr_tpu.pe.encodings import (
    POSENCODINGS,
    AdjEncoding,
    DiffusionEncoding,
    FullEncoding,
    LapEncoding,
    PStepRWEncoding,
    graph_laplacian,
)
from feta_tmlr_tpu.pe.rwpe import rwpe

__all__ = [
    "POSENCODINGS",
    "AdjEncoding",
    "DiffusionEncoding",
    "FullEncoding",
    "LapEncoding",
    "PStepRWEncoding",
    "graph_laplacian",
    "rwpe",
]
