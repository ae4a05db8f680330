"""Slide graph construction from patch features — the device-side half of
the reference's GraphConstructor.construct_graph
(/root/reference/construct_graph/graph_constructor.py:256-303).

Per slide: KNN over FEATURE space (radius-1 neighbours each, L2) defines the
edges; Pearson correlation of endpoint features defines the edge sign
('pos'/'neg') and weight `sim`; HoVer-Net node types (0..5, PanNuke) define
node heterogeneity. The reference runs HNSW + a per-edge scipy loop on the
host CPU; here the whole thing is one jitted program (see ops.knn /
ops.pearson), and `build_graph_device` is vmappable across a cohort of
equal-capacity slides.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_l2, knn_lookup
from ..ops.pearson import center_normalize
from .typed_graph import TypedGraph, bucket_size, from_arrays


@partial(jax.jit, static_argnames=("radius", "knn_impl"))
def build_edges_device(features: jax.Array, radius: int,
                       mask: Optional[jax.Array] = None,
                       knn_impl: str = "exact"):
    """(src, dst, esign, sim, edge_mask) for one padded feature buffer.

    radius follows the reference convention: each node gets radius-1
    neighbours (graph_constructor.py:267-273). Edges whose source row is
    padding are masked out. Pearson edge weights come from one Gram matmul
    of the centred-normalised features (fn @ fn.T) gathered along the
    regular [N, k] neighbour lattice — no irregular row gathers. Past
    ops.knn.STREAM_THRESHOLD nodes both the KNN (via knn_lookup) and the
    Pearson step stream in tiles instead of materialising [N, N].
    """
    from ..ops.knn import STREAM_THRESHOLD
    from ..ops.pearson import pearson_sim_at

    k = radius - 1
    n = features.shape[0]
    idx, _ = knn_lookup(features, k, mask, impl=knn_impl)
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    dst = idx.reshape(-1).astype(jnp.int32)

    if n >= STREAM_THRESHOLD:
        sim = pearson_sim_at(features, idx).reshape(-1)  # [N*k], no [N, N]
    else:
        fn = center_normalize(features)
        gram = fn @ fn.T  # [N, N] pearson r of every pair
        sim = jnp.take_along_axis(gram, idx, axis=1).reshape(-1)  # [N*k]
    esign = (sim > 0).astype(jnp.int32)

    # a slide with fewer real nodes than k makes top_k fall back to
    # big-distance candidates that can include the query itself — the
    # reference's HNSW query drops self (graph_constructor.py:273), so
    # mask self-edges out of the KNN edge set (the homo path adds its
    # explicit self loops separately)
    emask = src != dst
    if mask is not None:
        emask = emask & mask[src] & mask[dst]
    src = jnp.where(emask, src, 0)
    dst = jnp.where(emask, dst, 0)
    sim = jnp.where(emask, sim, 0.0)
    esign = jnp.where(emask, esign, 0)
    return src, dst, esign, sim, emask


@partial(jax.jit, static_argnames=("radius", "n_node_types", "knn_impl",
                                   "add_self_loops"))
def build_batch_device(
    features: jax.Array,      # [B, N, D] padded per-slide feature buffers
    node_types: jax.Array,    # [B, N] int32
    mask: jax.Array,          # [B, N] bool
    radius: int,
    n_node_types: int = 6,
    knn_impl: str = "exact",
    add_self_loops: bool = False,
) -> TypedGraph:
    """Cohort-batched slide-graph construction entirely on device.

    This is the production streaming path (BASELINE.json north star): the
    featurizer's output never leaves HBM — KNN, Pearson typing and batched
    TypedGraph assembly are one compiled program. Every slide shares the
    per-slide capacity N, so the batched graph has fixed shapes [B*N] nodes
    and [B*N*(radius-1)] edges.

    `add_self_loops=True` appends one self-edge per real node (esign=1,
    sim=1), matching what the data layer does to homogeneous graphs at load
    (typed_graph.from_arrays / reference data.py:120-121) — REQUIRED when a
    homogeneous model trained on loaded graphs consumes this graph, or its
    degrees/aggregates miss the self contribution.
    """
    b, n, d = features.shape
    k = radius - 1

    def per_slide(f, m):
        return build_edges_device(f, radius, m, knn_impl=knn_impl)

    src, dst, esign, sim, emask = jax.vmap(per_slide)(features, mask)
    offsets = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    src = (src + offsets).reshape(-1)
    dst = (dst + offsets).reshape(-1)
    esign = esign.reshape(-1)
    sim = sim.reshape(-1)
    emask = emask.reshape(-1)

    if add_self_loops:
        loop = jnp.arange(b * n, dtype=jnp.int32)
        src = jnp.concatenate([src, loop])
        dst = jnp.concatenate([dst, loop])
        esign = jnp.concatenate([esign, jnp.ones(b * n, esign.dtype)])
        sim = jnp.concatenate([sim, jnp.ones(b * n, sim.dtype)])
        emask = jnp.concatenate([emask, mask.reshape(-1)])

    return TypedGraph(
        feat=features.reshape(b * n, d),
        node_type=node_types.reshape(-1).astype(jnp.int32),
        node_graph=jnp.repeat(jnp.arange(b, dtype=jnp.int32), n),
        node_mask=mask.reshape(-1),
        src=src,
        dst=dst,
        esign=esign,
        sim=sim,
        edge_mask=emask,
        n_graphs=b,
        n_node_types=n_node_types,
        n_edge_types=2,
    )


def build_graph(
    features: np.ndarray,
    node_types: Optional[np.ndarray],
    radius: int,
    n_node_types: int = 6,
    node_capacity: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    knn_impl: str = "exact",
) -> Tuple[TypedGraph, TypedGraph]:
    """Host wrapper: features [N, D] (+ HoVer-Net node types) -> padded
    (hetero_graph, homo_graph) pair, the construct_graph() return contract
    (graph_constructor.py:303). The homogeneous twin shares edges/features
    but forgets typing (and carries sim/esign for completeness)."""
    n = features.shape[0]
    cap_n = node_capacity or bucket_size(n)
    feats_p = np.zeros((cap_n, features.shape[1]), dtype=np.float32)
    feats_p[:n] = features
    mask = np.arange(cap_n) < n

    src, dst, esign, sim, emask = jax.device_get(
        build_edges_device(jnp.asarray(feats_p), radius, jnp.asarray(mask),
                           knn_impl=knn_impl)
    )
    keep = np.asarray(emask)
    src, dst, esign, sim = src[keep], dst[keep], esign[keep], sim[keep]

    if node_types is None:
        node_types = np.zeros(n, np.int32)
    het = from_arrays(
        features, src, dst,
        node_type=np.asarray(node_types, np.int32), esign=esign, sim=sim,
        n_node_types=n_node_types,
        node_capacity=cap_n, edge_capacity=edge_capacity,
    )
    homo = from_arrays(
        features, src, dst,
        esign=esign, sim=sim, n_node_types=1,
        node_capacity=cap_n, edge_capacity=edge_capacity,
    )
    return het, homo
