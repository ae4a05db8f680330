"""Mesh / sharding layer: data-parallel training, collective plumbing."""
from .mesh import (
    DATA_AXIS,
    data_sharded,
    make_dp_featurizer,
    make_mesh,
    make_sharded_batch_apply,
    replicated,
    shard_stacked,
    stack_graphs,
)
from .dp import make_dp_lattice_train_step, make_dp_train_step, place_state
from .big_graph import make_big_graph_train_step, shard_edges, sharded_apply

__all__ = [
    "DATA_AXIS",
    "data_sharded",
    "make_dp_featurizer",
    "make_mesh",
    "make_sharded_batch_apply",
    "replicated",
    "shard_stacked",
    "stack_graphs",
    "make_dp_lattice_train_step",
    "make_dp_train_step",
    "place_state",
    "make_big_graph_train_step",
    "shard_edges",
    "sharded_apply",
]
