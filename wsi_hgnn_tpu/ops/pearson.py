"""Vectorised Pearson-correlation edge typing.

The reference computes `scipy.stats.pearsonr(f_a, f_b)` in a Python loop
over every edge (/root/reference/construct_graph/graph_constructor.py:277-282)
— the hottest CPU loop of graph construction (SURVEY.md §3.2). Pearson
correlation between two vectors is the cosine similarity of their
row-centred versions, so the whole edge set reduces to one normalisation
pass plus a gathered row-dot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def center_normalize(features: jax.Array) -> jax.Array:
    """Rows centred to zero mean and scaled to unit norm."""
    f = features.astype(jnp.float32)
    c = f - f.mean(axis=1, keepdims=True)
    norm = jnp.linalg.norm(c, axis=1, keepdims=True)
    return c / jnp.maximum(norm, 1e-12)


@jax.jit
def pearson_edges(features: jax.Array, src: jax.Array, dst: jax.Array):
    """(esign [E] int32, sim [E] f32) for each edge: sim = pearson r of the
    endpoint feature vectors, esign = 1 if r > 0 else 0 — the edge-type rule
    of graph_constructor.py:281."""
    fn = center_normalize(features)
    sim = jnp.sum(fn[src] * fn[dst], axis=1)
    esign = (sim > 0).astype(jnp.int32)
    return esign, sim
