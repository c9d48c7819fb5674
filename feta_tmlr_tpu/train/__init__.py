from feta_tmlr_tpu.train.metrics import (
    accuracy_graph,
    accuracy_sbm,
    average_precision,
    binary_f1,
    mae,
    roc_auc,
)
from feta_tmlr_tpu.train.trainer import Trainer, TrainConfig

__all__ = [
    "Trainer",
    "TrainConfig",
    "accuracy_graph",
    "accuracy_sbm",
    "average_precision",
    "binary_f1",
    "mae",
    "roc_auc",
]
