"""GNN model zoo (flax.linen modules over TypedGraph)."""
from .homogeneous import GCN, GAT, GIN, NTPoolGCN, GraphConvLayer, GATConvLayer, GINConvLayer
from .heterogeneous import HetRGCN, HGT, HEATNet2, HEATNet4, HGTLayer, HEATLayer
from .mlp import MLP2Layers, MLP4Layers
from .layers import Pool, TypedDense, TypedHeads, MaskedBatchNorm
from .asap import ASAPGCN, ASAPPooling, LEConv

__all__ = [
    "ASAPGCN",
    "ASAPPooling",
    "LEConv",
    "GCN", "GAT", "GIN", "NTPoolGCN",
    "HetRGCN", "HGT", "HEATNet2", "HEATNet4",
    "GraphConvLayer", "GATConvLayer", "GINConvLayer", "HGTLayer", "HEATLayer",
    "MLP2Layers", "MLP4Layers",
    "Pool", "TypedDense", "TypedHeads", "MaskedBatchNorm",
]
