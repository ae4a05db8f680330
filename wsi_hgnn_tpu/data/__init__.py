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
from .lattice_loader import LatticeLoader, probe_lattice

__all__ = [
    "LatticeLoader",
    "probe_lattice",
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
