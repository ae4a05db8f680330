"""Graph-context parallelism — edge/node sharding for graphs that exceed
one core's HBM (SURVEY.md §2.4 'SP analog', BASELINE.json north star).

The reference's scale ceiling is host RAM on a single device
(/root/reference/construct_graph/extractor.py:71-77, batch sizes 1-2 in
every config). Here a padded graph's EDGE store — the dominant memory and
compute (per-edge attention scores, messages) — shards across the mesh via
`shard_map`; node features are all-gathered per layer and aggregated
contributions are `psum`-reduced over ICI. Segment statistics (per-(dst,
relation) softmax max/sum, relation presence) are computed locally and
combined with `psum`/`pmax`, so the sharded computation is bit-comparable
to the single-device one.

Usage: `shard_edges(g, n_dev)` reshapes the edge arrays to a leading device
axis; `heat_layer_sharded` is the flagship HEATLayer forward over the mesh
(parameters replicated), verified equal to models.HEATLayer on a virtual
CPU mesh in tests/test_big_graph.py.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import TypedGraph
from .mesh import DATA_AXIS

_NEG_INF = -1e30


def shard_edges(g: TypedGraph, n_dev: int) -> TypedGraph:
    """Reshape edge arrays to [n_dev, E/n_dev] (edge capacity must divide).

    Node arrays stay whole (replicated/all-gathered); edge arrays get a
    leading mesh axis for shard_map.
    """
    e = g.num_edges
    if e % n_dev != 0:
        raise ValueError(f"edge capacity {e} not divisible by {n_dev} devices")

    def shard(x):
        return x.reshape(n_dev, e // n_dev, *x.shape[1:])

    return g.replace(
        src=shard(g.src), dst=shard(g.dst), esign=shard(g.esign),
        sim=shard(g.sim), edge_mask=shard(g.edge_mask),
        edge_weight=None if g.edge_weight is None else shard(g.edge_weight),
    )


def heat_layer_sharded(
    params: Dict,
    g: TypedGraph,          # edge arrays [n_dev, E_loc], node arrays whole
    h: jax.Array,           # [N, hidden] node features (replicated)
    mesh: Mesh,
    n_heads: int,
) -> jax.Array:
    """models.HEATLayer forward with edges sharded over the mesh.

    `params` is the flax param tree of one HEATLayer ('k_linears',
    'q_linears', 'v_linears', 'a_linears', 'e_linear', 'skip'). Replicated
    node projections, per-shard edge attention, psum-combined segment
    statistics and aggregation.
    """
    t = g.n_node_types
    out_dim = params["a_linears"]["bias"].shape[-1]
    d_k = out_dim // n_heads
    sqrt_dk = math.sqrt(d_k)
    n = h.shape[0]
    n_combo = g.n_edge_types * t

    def typed(name, x):
        w, b = params[name]["kernel"], params[name]["bias"]
        all_out = jnp.einsum("nd,tdh->tnh", x, w)
        return all_out[g.node_type, jnp.arange(n)] + b[g.node_type]

    node_type = jnp.asarray(g.node_type)  # host graphs carry numpy leaves
    node_mask = jnp.asarray(g.node_mask)
    k = typed("k_linears", h).reshape(n, n_heads, d_k)
    q = typed("q_linears", h).reshape(n, n_heads, d_k)
    v = typed("v_linears", h).reshape(n, n_heads, d_k)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    def edge_pass(k, q, v, src, dst, esign, emask, sim_w):
        src, dst = src[0], dst[0]
        esign, emask = esign[0], emask[0]
        sim = sim_w[0]

        ea = sim[:, None] * params["e_linear"]["kernel"][0, 0] + params["e_linear"]["bias"][0]
        score = (q[dst] * k[src]).sum(-1) * ea / sqrt_dk  # [E_loc, H]

        combo = esign * t + node_type[src]
        seg = dst * n_combo + combo
        score = jnp.where(emask[:, None], score, _NEG_INF)

        # cross-shard segment max
        loc_max = jax.ops.segment_max(score, seg, num_segments=n * n_combo)
        seg_max = jax.lax.pmax(loc_max, DATA_AXIS)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.exp(score - seg_max[seg])
        ex = jnp.where(emask[:, None], ex, 0.0)
        loc_den = jax.ops.segment_sum(ex, seg, num_segments=n * n_combo)
        den = jax.lax.psum(loc_den, DATA_AXIS)
        attn = ex / jnp.maximum(den, 1e-30)[seg]

        msgs = v[src] * attn[:, :, None]
        msgs = jnp.where(emask[:, None, None], msgs, 0.0)
        loc_agg = jax.ops.segment_sum(msgs, dst, num_segments=n)
        agg = jax.lax.psum(loc_agg, DATA_AXIS)  # [N, H, dk]

        # relation presence for the cross_reducer='mean' denominator
        rel = esign * (t * t) + node_type[src] * t + node_type[dst]
        loc_counts = jax.ops.segment_sum(
            emask.astype(jnp.int32), rel, num_segments=g.n_relations
        )
        rel_counts = jax.lax.psum(loc_counts, DATA_AXIS)
        return agg, rel_counts

    agg, rel_counts = edge_pass(
        k, q, v,
        jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.esign),
        jnp.asarray(g.edge_mask), jnp.asarray(g.sim),
    )
    agg = agg.reshape(n, out_dim)

    present = rel_counts > 0
    rel_ids = jnp.arange(g.n_relations)
    dst_denom = jax.ops.segment_sum(
        present.astype(jnp.float32), rel_ids % t, num_segments=t
    )
    denom = jnp.maximum(dst_denom, 1.0)[node_type][:, None]
    t_agg = agg / denom

    trans = (
        jnp.einsum("nd,tdh->tnh", t_agg, params["a_linears"]["kernel"])[
            node_type, jnp.arange(n)
        ]
        + params["a_linears"]["bias"][node_type]
    )
    alpha = jax.nn.sigmoid(params["skip"])[node_type][:, None]
    mixed = trans * alpha + h * (1.0 - alpha)
    keep = ((dst_denom > 0)[node_type] & node_mask)[:, None]
    return jnp.where(keep, mixed, h)
