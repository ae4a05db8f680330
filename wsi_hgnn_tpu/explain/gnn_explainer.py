"""GNNExplainer over TypedGraph — post-hoc node-feature + edge masks.

Re-design of /root/reference/explainers/gnn_explainer.py:36-276. The
reference injects its edge mask by swapping the DGL graph's __class__ to
override `update_all` (:21-33,:156-157); here messages are explicit arrays,
so the mask is just the TypedGraph.edge_weight field. The optimisation — a
100-epoch Adam loop over sigmoid node/edge mask logits against the
prediction loss plus size/entropy regularisers (:84-103,:172-181) — runs as
a python loop over ONE jitted step, cached per (model, hyperparams) with
the graph as an argument so a cohort of same-bucket slides compiles once.

Fidelity notes:
  * the prediction term is -model_output[pred_label] on the RAW logits —
    the reference's models end in a plain Linear and its loss indexes the
    raw output directly (gnn_explainer.py:84-87, GCN.py:68-78);
  * size/entropy regularisers average over REAL nodes/edges only, and the
    edge-mask init std uses the real node count (gnn_explainer.py:76,
    :90-103) — padded capacities would otherwise make the effective
    regularisation strength depend on the slide's size bucket.
"""
from __future__ import annotations

from functools import lru_cache
from math import sqrt
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import TypedGraph

PARAMS = {
    "edge_size": 0.005,
    "feat_size": 0.5,
    "edge_ent": 1.0,
    "feat_ent": 0.1,
    "eps": 1e-15,
}


@lru_cache(maxsize=8)
def _step_fn(model_fn, edge_size, feat_size, edge_ent, feat_ent, eps, lr):
    tx = optax.adam(lr)

    def loss_fn(masks, graph: TypedGraph, pred_label):
        node_logits, edge_logits = masks["node"], masks["edge"]
        h = graph.feat * jax.nn.sigmoid(node_logits)[:, None]
        g = graph.replace(edge_weight=jax.nn.sigmoid(edge_logits))
        logits = model_fn(g, h)
        # RAW logit, as the reference optimizes (gnn_explainer.py:84-87)
        loss = -logits.reshape(-1)[pred_label]

        em = graph.edge_mask.astype(jnp.float32)
        nm = graph.node_mask.astype(jnp.float32)
        n_e = jnp.maximum(em.sum(), 1.0)
        n_n = jnp.maximum(nm.sum(), 1.0)

        me = jax.nn.sigmoid(edge_logits)
        loss = loss + (me * em).sum() * edge_size
        ent_e = -me * jnp.log(me + eps) - (1 - me) * jnp.log(1 - me + eps)
        loss = loss + edge_ent * (ent_e * em).sum() / n_e

        mn = jax.nn.sigmoid(node_logits)
        loss = loss + (mn * nm).sum() / n_n * feat_size
        ent_n = -mn * jnp.log(mn + eps) - (1 - mn) * jnp.log(1 - mn + eps)
        loss = loss + feat_ent * (ent_n * nm).sum() / n_n
        return loss

    @jax.jit
    def step(masks, opt_state, g, pred_label):
        loss, grads = jax.value_and_grad(loss_fn)(masks, g, pred_label)
        updates, opt_state = tx.update(grads, opt_state, masks)
        masks = optax.apply_updates(masks, updates)
        return masks, opt_state, loss

    return tx, step


class GNNExplainer:
    def __init__(self, graph: TypedGraph, model_fn, num_hops: int,
                 epochs: int = 100, lr: float = 0.01,
                 mask_threshold: float = 0.5,
                 edge_size: float = 0.005, feat_size: float = 0.1,
                 seed: int = 0):
        """model_fn(graph, feat_override=None) -> logits [B, C] — a closure
        over trained params (the `self.gnn` of the reference)."""
        self.g = graph
        self.model_fn = model_fn
        self.epochs = epochs
        self.lr = lr
        self.threshold = mask_threshold
        self.num_hops = num_hops
        self.params = dict(PARAMS, edge_size=edge_size, feat_size=feat_size)
        self.rng = jax.random.PRNGKey(seed)

    def explain_node(self, node_idx: Optional[int] = None) -> Tuple[TypedGraph, np.ndarray]:
        """node_idx=None: graph classification (the pipeline's only use,
        explain_graphs.py:162). Returns (graph with learned edge_weight,
        node mask [N] in [0,1])."""
        if node_idx is not None:
            raise NotImplementedError(
                "node-level explanation subgraphs are not wired; the "
                "reference pipeline only calls explain_node(None)"
            )
        g = self.g
        logits = self.model_fn(g, None)
        pred_label = int(np.asarray(logits.argmax(-1)).reshape(-1)[0])

        k1, k2 = jax.random.split(self.rng)
        n, e = g.num_nodes, g.num_edges
        n_real = int(np.asarray(g.node_mask).sum())
        # relu gain * sqrt(2/fan) over REAL nodes (gnn_explainer.py:76)
        std = sqrt(2.0) * sqrt(2.0 / (2 * max(n_real, 1)))
        masks = {
            "node": jax.random.normal(k1, (n,)) * 0.1,
            "edge": jax.random.normal(k2, (e,)) * std,
        }
        p = self.params
        tx, step = _step_fn(
            self.model_fn, p["edge_size"], p["feat_size"], p["edge_ent"],
            p["feat_ent"], p["eps"], self.lr,
        )
        opt_state = tx.init(masks)

        for _ in range(self.epochs):
            masks, opt_state, loss = step(masks, opt_state, g, pred_label)

        node_mask = np.asarray(jax.nn.sigmoid(masks["node"]))
        out_g = g.replace(edge_weight=jax.nn.sigmoid(masks["edge"]))
        real = int(np.asarray(g.node_mask).sum())
        return out_g, node_mask[:real]
