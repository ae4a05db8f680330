"""MIL model tier — the reference's vendored baselines re-designed for
padded bags / fixed-shape graphs (SURVEY.md §2.5):
ABMIL, DSMIL, ReMix reduction+augmentation, GTNMIL GraphTransformer, H2MIL.
"""
from .abmil import ABMIL, GatedABMIL
from .bags import pad_bag
from .dsmil import DSMIL, BClassifier, IClassifier
from .graph_transformer import GCNBlock, GraphTransformer, dense_mincut_pool, graphcam
from .h2mil import H2MIL, IHPool, RAConvLayer, TreeGraph
from .remix import kmeans, mix_aug, mix_the_bag_aug, reduce_bag
from .simclr import (augment_pair, coords_from_patch_names, make_simclr_train_step,
                     nt_xent_loss, spatial_adjacency)

__all__ = [
    "ABMIL", "GatedABMIL", "pad_bag",
    "DSMIL", "BClassifier", "IClassifier",
    "GCNBlock", "GraphTransformer", "dense_mincut_pool", "graphcam",
    "H2MIL", "IHPool", "RAConvLayer", "TreeGraph",
    "kmeans", "mix_aug", "mix_the_bag_aug", "reduce_bag",
    "augment_pair", "coords_from_patch_names", "make_simclr_train_step",
    "nt_xent_loss", "spatial_adjacency",
]
