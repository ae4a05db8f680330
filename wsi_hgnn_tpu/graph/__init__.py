"""Graph core: the TPU-native replacement for DGL's graph layer."""
from .typed_graph import TypedGraph, from_arrays, to_homogeneous, bucket_size
from .batch import batch_graphs, sort_graph_edges
from .build import build_graph, build_edges_device
from . import ops, transforms

__all__ = [
    "TypedGraph",
    "from_arrays",
    "to_homogeneous",
    "bucket_size",
    "batch_graphs",
    "sort_graph_edges",
    "build_graph",
    "build_edges_device",
    "ops",
    "transforms",
]
