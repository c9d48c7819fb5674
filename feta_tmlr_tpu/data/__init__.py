from feta_tmlr_tpu.data.batch import GraphBatch, collate_graphs, pad_bucket
from feta_tmlr_tpu.data.prefetch import PrefetchIterator, prefetch_to_device
from feta_tmlr_tpu.data.synthetic import random_graph_dataset

__all__ = [
    "GraphBatch",
    "collate_graphs",
    "pad_bucket",
    "PrefetchIterator",
    "prefetch_to_device",
    "random_graph_dataset",
]
