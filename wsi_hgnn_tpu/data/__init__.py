"""Data layer: slide-graph datasets, npz storage, host batching pipeline."""
from .datasets import (
    C16EvalDataset,
    WSIData,
    GraphDataset,
    TCGACancerStageDataset,
    TCGACancerTypingDataset,
    load_graph_npz,
    save_graph_npz,
)
from .loader import GraphLoader, dataset_capacities

__all__ = [
    "C16EvalDataset",
    "WSIData",
    "GraphDataset",
    "TCGACancerStageDataset",
    "TCGACancerTypingDataset",
    "load_graph_npz",
    "save_graph_npz",
    "GraphLoader",
    "dataset_capacities",
]
