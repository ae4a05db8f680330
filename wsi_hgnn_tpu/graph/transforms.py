"""Training-time graph augmentation as pure mask ops, run inside jit.

The reference applies DGL transforms on the host per __getitem__
(/root/reference/data.py:16-23, applied :116-117):

    DropNode(p=0.5) -> DropEdge(p=0.5) -> NodeShuffle() -> FeatMask(p=0.5)

Here the same pipeline is a pure function of (graph, PRNG key) executed on
device as part of the compiled train step: dropping is mask clearing (shapes
never change), so augmentation costs a few elementwise ops instead of a host
round-trip and a recompile.

Notes on fidelity:
  * DropNode removes a node and its incident edges; DropEdge then drops
    surviving edges independently.
  * The reference adds self-loops AFTER augmentation (data.py:120-121), so
    self-loops are never dropped. Packed homogeneous graphs carry their
    self-loops as explicit src==dst edges; DropEdge therefore exempts them,
    and DropNode removes them only with their node.
  * NodeShuffle permutes node ids — a graph isomorphism that is a no-op for
    every permutation-equivariant model in the zoo; we implement it as the
    identity (documented deviation, zero observable effect).
  * FeatMask(p=0.5, ['feat']) zeroes each feature COLUMN independently with
    probability p (DGL masks feature dimensions, not entries).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .typed_graph import TypedGraph


def drop_node(g: TypedGraph, key: jax.Array, p: float = 0.5) -> TypedGraph:
    keep = jax.random.bernoulli(key, 1.0 - p, (g.num_nodes,))
    node_mask = g.node_mask & keep
    edge_mask = g.edge_mask & keep[g.src] & keep[g.dst]
    return g.replace(node_mask=node_mask, edge_mask=edge_mask)


def drop_edge(
    g: TypedGraph, key: jax.Array, p: float = 0.5, protect_self_loops: bool = True
) -> TypedGraph:
    keep = jax.random.bernoulli(key, 1.0 - p, (g.num_edges,))
    if protect_self_loops:
        keep = keep | (g.src == g.dst)
    return g.replace(edge_mask=g.edge_mask & keep)


def feat_mask(g: TypedGraph, key: jax.Array, p: float = 0.5) -> TypedGraph:
    keep_col = jax.random.bernoulli(key, 1.0 - p, (g.feat_dim,))
    return g.replace(feat=g.feat * keep_col[None, :].astype(g.feat.dtype))


def train_transform(g: TypedGraph, key: jax.Array, p: float = 0.5) -> TypedGraph:
    """The reference's full augmentation pipeline (data.py:16-23)."""
    k1, k2, k3 = jax.random.split(key, 3)
    g = drop_node(g, k1, p)
    g = drop_edge(g, k2, p)
    # NodeShuffle: identity (graph isomorphism; see module docstring)
    g = feat_mask(g, k3, p)
    return g
