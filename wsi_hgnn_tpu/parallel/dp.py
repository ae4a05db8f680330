"""Data-parallel training step over a device mesh.

The per-device unit is one bucketed batch of slide graphs (the same
TypedGraph the single-chip trainer consumes — or its [B, N, k] lattice
form); a step takes the stacked [n_dev, ...] pytree, runs the full train
step per shard via vmap, and lets XLA insert the gradient all-reduce over
ICI (params/opt state replicated).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..graph import TypedGraph, to_homogeneous, transforms
from ..train.trainer import TrainState
from .mesh import data_sharded, replicated


def _make_dp_step(model, tx, loss_fcn: Callable, prepare_one: Callable):
    """Shared DP step skeleton: `prepare_one(graph, key)` is the only part
    that differs between the TypedGraph and lattice paths."""

    def step(state: TrainState, graphs, labels, weights):
        rng, aug_key, drop_key = jax.random.split(state.rng, 3)
        n_dev = labels.shape[0]
        aug_keys = jax.random.split(aug_key, n_dev)
        # per-device dropout keys: a single shared key would apply
        # bit-identical masks on every device, unlike the equivalent
        # single-chip batch
        drop_keys = jax.random.split(drop_key, n_dev)
        # BatchNorm-carrying models (GIN, the GTN MIL block) must run with
        # a mutable batch_stats collection, like the single-device step
        has_bs = bool(jax.tree.leaves(state.batch_stats))

        def forward_one(params, bstats, g, k_aug, k_drop):
            g = prepare_one(g, k_aug)
            if has_bs:
                logits, upd = model.apply(
                    {"params": params, "batch_stats": bstats}, g,
                    train=True, rngs={"dropout": k_drop},
                    mutable=["batch_stats"],
                )
                return logits, upd["batch_stats"]
            return (
                model.apply(
                    {"params": params}, g, train=True,
                    rngs={"dropout": k_drop},
                ),
                bstats,
            )

        def loss_fn(params):
            logits, new_bs = jax.vmap(
                forward_one, in_axes=(None, None, 0, 0, 0)
            )(params, state.batch_stats, graphs, aug_keys, drop_keys)
            flat_logits = logits.reshape(-1, logits.shape[-1])
            loss = loss_fcn(flat_logits, labels.reshape(-1), weights.reshape(-1))
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        if has_bs:
            # cross-replica sync: average the per-device running stats
            new_bs = jax.tree.map(lambda x: x.mean(0), new_bs)
        else:
            new_bs = state.batch_stats
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            rng=rng, step=state.step + 1
        )
        return new_state, loss, jax.nn.softmax(logits)

    # Sharding is carried by input placement: the caller device_puts the
    # TrainState with `replicated(mesh)` and the stacked batch with
    # `data_sharded(mesh)` (see mesh.shard_stacked); jit propagates the
    # shardings and inserts the gradient all-reduce over the mesh.
    # The TrainState is donated on device backends so params/opt-state
    # updates alias their input buffers (CPU XLA can't donate — gate it).
    donate = () if jax.default_backend() == "cpu" else (0,)
    return jax.jit(step, donate_argnums=donate)


def make_dp_train_step(
    model,
    tx,
    loss_fcn: Callable,
    is_hetero: bool,
    mesh: Mesh,
    augment: bool = True,
) -> Callable:
    """Compiled DP train step: (TrainState, stacked TypedGraph [n_dev, ...],
    labels [n_dev, B], weights [n_dev, B]) -> (TrainState, loss, probs)."""
    del mesh  # placement carries the sharding; kept for API compatibility

    def prepare_one(g: TypedGraph, key):
        g = g if is_hetero else to_homogeneous(g)
        if augment:
            g = transforms.train_transform(g, key)
        return g

    return _make_dp_step(model, tx, loss_fcn, prepare_one)


def make_dp_lattice_train_step(
    model,
    tx,
    loss_fcn: Callable,
    mesh: Mesh,
    augment: bool = True,
) -> Callable:
    """DP train step on the lattice fast path: (TrainState, stacked
    LatticeGraph [n_dev, B, N, k], labels [n_dev, B], weights [n_dev, B])
    -> (TrainState, loss, probs). Same placement contract as
    make_dp_train_step; `model` is a lattice twin (config.parse_lattice_twin)."""
    from ..models.lattice import lattice_train_transform

    del mesh

    def prepare_one(g, key):
        return lattice_train_transform(g, key) if augment else g

    return _make_dp_step(model, tx, loss_fcn, prepare_one)


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate training state across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
