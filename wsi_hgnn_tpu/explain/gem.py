"""GEM causal explainers — node importance by leave-one-node-out loss delta.

Re-design of /root/reference/explainers/GEM.py:14-54 and gem_het.py:12-41.
The reference materialises node-deleted graph copies and dgl.batch-es them
(10 at a time); here deletion is clearing one node's mask bit (plus its
incident edges), so a whole chunk of leave-one-out forwards is a single
`vmap` over deletion indices — no graph rebuilds. The jitted chunk
programs are cached PER MODEL FUNCTION with the graph passed as an
argument, so a whole cohort of slides sharing a size bucket reuses one
compiled program (closing over the graph would bake it in as constants
and recompile every slide).

Semantics notes (kept faithful):
  * GemExplainer scores delta_i = CE(pred - pred_without_i, label) with the
    original prediction temperature-scaled loss computed but unused
    (GEM.py:25-27), then min-max normalises;
  * HetGemExplainer first collapses all edges to 'pos' (gem_het.py:15-18)
    and scores delta_i = loss - loss_without_i, unnormalised, returned per
    node type;
  * mask-deletion equals dgl.remove_nodes for every model in the zoo:
    pooling denominators, degrees and relation presence all derive from the
    masks.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import TypedGraph


def _delete_node(g: TypedGraph, nid: jax.Array) -> TypedGraph:
    node_mask = g.node_mask & (jnp.arange(g.num_nodes) != nid)
    edge_mask = g.edge_mask & (g.src != nid) & (g.dst != nid)
    return g.replace(node_mask=node_mask, edge_mask=edge_mask)


def _ce(logits: jax.Array, label) -> jax.Array:
    return -jax.nn.log_softmax(logits.reshape(-1))[label]


@lru_cache(maxsize=8)
def _gem_chunk_fn(model_fn):
    """GemExplainer's score: CE of the prediction DELTA (GEM.py:31-50)."""

    @jax.jit
    def run(g, pred, label, nids):
        def one(nid):
            alt = model_fn(_delete_node(g, nid)).reshape(-1)
            return _ce(pred - alt, label)

        return jax.vmap(one)(nids)

    return run


@lru_cache(maxsize=8)
def _delta_chunk_fn(model_fn):
    """HetGemExplainer's score: loss - loss_without_i (gem_het.py:30-39)."""

    @jax.jit
    def run(g, loss, label, nids):
        def one(nid):
            alt = model_fn(_delete_node(g, nid)).reshape(-1)
            return loss - _ce(alt, label)

        return jax.vmap(one)(nids)

    return run


def _loo_scores(run, g: TypedGraph, baseline, label: int,
                batch_size: int) -> np.ndarray:
    """Drive a chunk fn over every real node (tail chunks padded with a
    repeated id so one program shape serves the whole slide)."""
    n_real = int(np.asarray(g.node_mask).sum())
    scores = np.zeros(n_real, np.float32)
    ids = np.arange(n_real)
    for s in range(0, n_real, batch_size):
        chunk = ids[s : s + batch_size]
        padded = np.pad(chunk, (0, batch_size - len(chunk)),
                        constant_values=chunk[-1])
        out = np.asarray(
            run(g, baseline, jnp.asarray(label), jnp.asarray(padded))
        )
        scores[s : s + len(chunk)] = out[: len(chunk)]
    return scores


class GemExplainer:
    """Homogeneous GEM (GEM.py:14-54)."""

    def __init__(self, graph: TypedGraph, model_fn: Callable, label: int,
                 batch_size: int = 32):
        self.graph = graph
        self.model_fn = model_fn  # (TypedGraph) -> logits [1, C]
        self.label = int(label)
        self.batch_size = batch_size

    def explain_node(self) -> np.ndarray:
        g = self.graph
        pred = self.model_fn(g).reshape(-1)
        scores = _loo_scores(
            _gem_chunk_fn(self.model_fn), g, pred, self.label,
            self.batch_size,
        )
        lo, hi = scores.min(), scores.max()
        return (scores - lo) / max(hi - lo, 1e-12)


class HetGemExplainer:
    """Heterogeneous GEM (gem_het.py:12-41): edges collapsed to 'pos',
    per-(ntype, node) loss deltas."""

    def __init__(self, graph: TypedGraph, model_fn: Callable, label: int,
                 batch_size: int = 32):
        self.graph = graph.replace(esign=jnp.ones_like(graph.esign))
        self.model_fn = model_fn
        self.label = int(label)
        self.batch_size = batch_size

    def flat_scores(self) -> np.ndarray:
        """Per-node scores in original node order (used by the pixel-level
        evaluator, which needs patch alignment)."""
        g = self.graph
        loss = _ce(self.model_fn(g).reshape(-1), self.label)
        return _loo_scores(
            _delta_chunk_fn(self.model_fn), g, loss, self.label,
            self.batch_size,
        )

    def explain_node(self) -> Dict[str, np.ndarray]:
        g = self.graph
        scores = self.flat_scores()
        n_real = len(scores)
        ntypes = np.asarray(g.node_type)[:n_real]
        return {str(t): scores[ntypes == t] for t in range(g.n_node_types)}
