"""Vectorised Pearson-correlation edge typing.

The reference computes `scipy.stats.pearsonr(f_a, f_b)` in a Python loop
over every edge (/root/reference/construct_graph/graph_constructor.py:277-282)
— the hottest CPU loop of graph construction (SURVEY.md §3.2). Pearson
correlation between two vectors is the cosine similarity of their
row-centred versions, so the whole edge set reduces to one normalisation
pass plus a gathered row-dot.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def center_normalize(features: jax.Array) -> jax.Array:
    """Rows centred to zero mean and scaled to unit norm."""
    f = features.astype(jnp.float32)
    c = f - f.mean(axis=1, keepdims=True)
    norm = jnp.linalg.norm(c, axis=1, keepdims=True)
    return c / jnp.maximum(norm, 1e-12)


@partial(jax.jit, static_argnames=("tile",))
def pearson_sim_at(features: jax.Array, idx: jax.Array, tile: int = 512):
    """sim[i, j] = pearson r(features[i], features[idx[i, j]]) WITHOUT the
    [N, N] gram matrix: row tiles stream through `lax.map`, each gathering
    only its [tile, k, D] neighbour block — the graph-build route for
    buckets past ops.knn.STREAM_THRESHOLD (a 16k bucket's gram would be a
    ~1 GB f32 buffer). Matches the gram + take_along_axis form up to f32
    reassociation."""
    fn = center_normalize(features)
    n = fn.shape[0]
    k = idx.shape[1]
    n_pad = -(-n // tile) * tile
    f_pad = jnp.pad(fn, ((0, n_pad - n), (0, 0)))
    i_pad = jnp.pad(idx, ((0, n_pad - n), (0, 0)))

    def one_tile(t):
        f_t = jax.lax.dynamic_slice_in_dim(f_pad, t * tile, tile)
        i_t = jax.lax.dynamic_slice_in_dim(i_pad, t * tile, tile)
        return jnp.einsum("qd,qkd->qk", f_t, fn[i_t])

    sim = jax.lax.map(one_tile, jnp.arange(n_pad // tile, dtype=jnp.int32))
    return sim.reshape(n_pad, k)[:n]


@jax.jit
def pearson_edges(features: jax.Array, src: jax.Array, dst: jax.Array):
    """(esign [E] int32, sim [E] f32) for each edge: sim = pearson r of the
    endpoint feature vectors, esign = 1 if r > 0 else 0 — the edge-type rule
    of graph_constructor.py:281."""
    fn = center_normalize(features)
    sim = jnp.sum(fn[src] * fn[dst], axis=1)
    esign = (sim > 0).astype(jnp.int32)
    return esign, sim
