"""wsi_hgnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
histopathology whole-slide-image heterogeneous-graph analysis.

Re-designed from scratch with the capability set of HKU-MedAI/WSI-HGNN
(CVPR 2023; reference mounted at /root/reference). Unlike the PyTorch+DGL
reference, every irregular slide graph is represented as a fixed-shape
padded pytree (`wsi_hgnn_tpu.graph.TypedGraph`) so message passing,
pooling, batching and training-time graph augmentation all compile to a
handful of static XLA programs.

Subpackages
-----------
graph     : the DGL replacement — typed-graph pytree, segment ops, batching,
            transforms, homo/hetero semantics.
models    : GNN zoo (GCN/GAT/GIN/NTPoolGCN, HetRGCN/HGT/HEATNet2/HEATNet4),
            pooling readouts, MIL baselines, CNN featurizers.
ops       : compute kernels — exact KNN, Pearson edge typing, Pallas kernels.
parallel  : mesh/sharding layer (pjit/shard_map over a device Mesh).
train     : trainer, evaluator, checkpoint manager, metrics.
data      : datasets, label tables, host input pipeline.
pipeline  : WSI tiling and slide→graph construction.
explain   : GNNExplainer / GEM post-hoc explanation.
"""

__version__ = "0.1.0"
