from kgc_gcn_tpu.data.dataset import KGDataset, build_dataset, load_dataset
from kgc_gcn_tpu.data.graph import Graph, GraphHalf, build_graph
from kgc_gcn_tpu.data.batching import (
    QueryBank,
    build_labels,
    epoch_batches,
    make_banks,
    make_query_bank,
)

__all__ = [
    "KGDataset", "build_dataset", "load_dataset",
    "Graph", "GraphHalf", "build_graph",
    "QueryBank", "build_labels", "epoch_batches", "make_banks", "make_query_bank",
]
