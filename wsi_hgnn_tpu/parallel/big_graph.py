"""Graph-context parallelism — edge sharding for graphs that exceed one
core's HBM (SURVEY.md §2.4 'SP analog', BASELINE.json north star).

The reference's scale ceiling is host RAM on a single device
(/root/reference/construct_graph/extractor.py:71-77, batch sizes 1-2 in
every config). Here a padded graph's EDGE store — the dominant memory and
compute (per-edge attention scores, messages) — shards across the mesh,
while node features and parameters stay replicated.

Design: the segment primitives themselves are collective-aware. A
TypedGraph whose static `edge_axis` names a mesh axis makes every
edge-keyed reduction (`ops.segment_softmax`, `ops.copy_e_sum`,
`ops.copy_u_max`, `TypedGraph.rel_edge_counts`, `TypedGraph.degrees`)
combine its per-shard partial result with `psum`/`pmax` over ICI. The
UNMODIFIED flax models — the full HEAT2/HEAT4/HGT/GCN/GAT/GIN zoo, all
layers and pooling — then compute exactly the single-device answer when
run under `shard_map` with sharded edge arrays, forward AND backward
(shard_map transposes psum/pmax). No per-model sharded re-implementation
exists to drift out of sync.

API:
  * `shard_edges(g, n_dev)`  — reshape edge arrays to [n_dev, E/n_dev].
  * `sharded_apply(model, mesh, is_hetero)` — jitted full-model forward.
  * `make_big_graph_train_step(model, tx, loss_fcn, is_hetero, mesh)` —
    the FULL training step (augmentation, forward, loss, backward, update)
    with the graph's edges sharded over the mesh; gradients equal the
    single-device step (tests/test_big_graph.py).

The trainer picks this path automatically when a batch's edge store
exceeds `train.big_graph_edge_threshold` and the mesh has >1 device.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import TypedGraph, to_homogeneous, transforms
from .mesh import DATA_AXIS


def shard_edges(g: TypedGraph, n_dev: int) -> TypedGraph:
    """Reshape edge arrays to [n_dev, E/n_dev] (edge capacity must divide).

    Node arrays stay whole (replicated); edge arrays get a leading mesh
    axis for shard_map. `edge_axis` is NOT set here — it is set inside the
    shard_map body where each device sees its local slice.
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


def _graph_specs(g: TypedGraph, axis: str) -> TypedGraph:
    """A TypedGraph-shaped pytree of PartitionSpecs: edge leaves sharded on
    `axis`, node leaves replicated."""
    return g.replace(
        feat=P(), node_type=P(), node_graph=P(), node_mask=P(),
        src=P(axis), dst=P(axis), esign=P(axis), sim=P(axis),
        edge_mask=P(axis),
        edge_weight=None if g.edge_weight is None else P(axis),
    )


def _local_graph(g: TypedGraph, axis: str) -> TypedGraph:
    """Inside shard_map: strip the [1, E_loc] leading axis and mark the
    graph edge-sharded so segment ops psum/pmax over `axis`."""
    return g.replace(
        src=g.src[0], dst=g.dst[0], esign=g.esign[0], sim=g.sim[0],
        edge_mask=g.edge_mask[0],
        edge_weight=None if g.edge_weight is None else g.edge_weight[0],
        edge_axis=axis,
    )


def sharded_apply(
    model,
    mesh: Mesh,
    is_hetero: bool = True,
    axis: str = DATA_AXIS,
) -> Callable:
    """Jitted `(variables, g_sharded) -> logits` full-model forward with the
    edge store sharded over the mesh."""

    def fwd(variables, g):
        specs = _graph_specs(g, axis)

        @partial(jax.shard_map, mesh=mesh, in_specs=(P(), specs),
                 out_specs=P())
        def run(variables, g):
            g_loc = _local_graph(g, axis)
            if not is_hetero:
                g_loc = to_homogeneous(g_loc)
            return model.apply(variables, g_loc, train=False)

        return run(variables, g)

    return jax.jit(fwd)


def make_big_graph_train_step(
    model,
    tx,
    loss_fcn,
    is_hetero: bool,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    augment: bool = True,
) -> Callable:
    """The full edge-sharded training step:
    `(state, g_sharded, labels, weights) -> (state, loss, probs)` — same
    contract as the trainer's single-device `_train_step` (train/trainer.py).

    Augmentation: node-level transforms (DropNode, FeatMask) see replicated
    node arrays and are bit-identical to single-device; DropEdge draws its
    randomness per local edge slice (a different but equally-distributed
    edge subset). `augment=False` gives the exact single-device gradients
    (verified in tests/test_big_graph.py).
    """

    def step(state, g, labels, weights):
        specs = _graph_specs(g, axis)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), specs, P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
        )
        def run(params, batch_stats, g, labels, weights, rng):
            aug_key, drop_key = jax.random.split(jax.random.fold_in(rng, 1))
            g_loc = _local_graph(g, axis)
            if not is_hetero:
                g_loc = to_homogeneous(g_loc)
            if augment:
                g_loc = transforms.train_transform(g_loc, aug_key)

            def loss_fn(p):
                variables = {"params": p}
                mutable = False
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(
                    variables, g_loc, train=True,
                    rngs={"dropout": drop_key}, mutable=mutable,
                )
                logits, new_vars = out if mutable else (out, {})
                loss = loss_fcn(logits, labels, weights)
                return loss, (logits, new_vars.get("batch_stats", batch_stats))

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # grads of replicated params are already identical across the
            # axis (every edge shard's contribution entered through a psum)
            return grads, new_bs, loss, jax.nn.softmax(logits)

        grads, new_bs, loss, probs = run(
            state.params, state.batch_stats, g, labels, weights, state.rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=jax.random.split(state.rng)[0],
            step=state.step + 1,
        )
        return new_state, loss, probs

    # donate the TrainState on device backends (same rationale as the
    # single-device trainer: the old state is replaced, never re-read)
    donate = () if jax.default_backend() == "cpu" else (0,)
    return jax.jit(step, donate_argnums=donate)
