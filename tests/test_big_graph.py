"""Graph-context parallelism tests: the FULL models (all layers + pooling)
with edges sharded over the 8-device mesh must equal single-device, forward
and backward (SURVEY.md §2.4 SP analog; VERDICT.md round-1 item 4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from wsi_hgnn_tpu.config import parse_loss
from wsi_hgnn_tpu.graph import batch_graphs, from_arrays, to_homogeneous
from wsi_hgnn_tpu.models import GAT, GCN, HEATNet2, HEATNet4, HGT
from wsi_hgnn_tpu.parallel import (
    make_big_graph_train_step,
    make_mesh,
    shard_edges,
    sharded_apply,
)
from wsi_hgnn_tpu.train.trainer import TrainState

N_DEV = 8


def make_batched_graph(seed=0, n_graphs=2, n=40, d=16, t=6):
    rng = np.random.RandomState(seed)
    gs = []
    for _ in range(n_graphs):
        nn_ = rng.randint(n - 8, n + 8)
        e = rng.randint(3 * nn_, 5 * nn_)
        gs.append(from_arrays(
            rng.randn(nn_, d).astype(np.float32),
            rng.randint(0, nn_, e), rng.randint(0, nn_, e),
            node_type=rng.randint(0, t, nn_), esign=rng.randint(0, 2, e),
            sim=rng.randn(e), n_node_types=t,
        ))
    # edge capacity 512 = 8 devices x 64 local edges; every device holds a
    # real slice (the edge store is deliberately larger than one shard)
    return batch_graphs(gs, node_capacity=128, edge_capacity=512)


MODELS = {
    "HEAT4": (lambda: HEATNet4(in_dim=16, hidden_dim=32, out_dim=2, n_layers=2,
                               n_heads=4, n_node_types=6, dropout=0.0), True),
    "HEAT2": (lambda: HEATNet2(in_dim=16, hidden_dim=32, out_dim=2, n_layers=2,
                               n_heads=4, n_node_types=6, dropout=0.0), True),
    "HGT": (lambda: HGT(in_dim=16, hidden_dim=32, out_dim=2, n_layers=2,
                        n_heads=4, n_node_types=6), True),
    "GCN": (lambda: GCN(in_dim=16, hidden_dim=32, out_dim=2, n_layers=2,
                        dropout=0.0, graph_pooling_type="mean"), False),
    "GAT": (lambda: GAT(n_layers=2, in_dim=16, hidden_dim=8, out_dim=2,
                        heads=(2, 2, 1), feat_drop=0.0, attn_drop=0.0,
                        negative_slope=0.2, residual=False,
                        graph_pooling_type="mean"), False),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_full_model_forward_matches_single_device(name):
    ctor, is_hetero = MODELS[name]
    model = ctor()
    g = make_batched_graph()
    gm = g if is_hetero else to_homogeneous(g)
    variables = model.init(jax.random.PRNGKey(0), gm)

    ref = np.asarray(model.apply(variables, gm, train=False))

    mesh = make_mesh(N_DEV)
    fwd = sharded_apply(model, mesh, is_hetero=is_hetero)
    out = np.asarray(fwd(variables, shard_edges(g, N_DEV)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["HEAT4", "GCN"])
def test_train_step_grads_match_single_device(name):
    """One full training step (loss, backward, optimizer update) on the
    edge-sharded graph must reproduce the single-device parameters."""
    ctor, is_hetero = MODELS[name]
    model = ctor()
    tx = optax.adam(1e-3)
    loss_fcn = parse_loss({"loss": "CE"})
    g = make_batched_graph(seed=3)
    gm = g if is_hetero else to_homogeneous(g)
    variables = model.init(jax.random.PRNGKey(1), gm)
    labels = jnp.asarray([0, 1], jnp.int32)
    weights = jnp.asarray([1.0, 1.0], jnp.float32)

    def mkstate():
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(2),
            step=jnp.zeros((), jnp.int32),
        )

    # single-device reference step (no augmentation, train=True, fixed key)
    def ref_step(state):
        drop_key = jax.random.fold_in(state.rng, 0)

        def loss_fn(p):
            logits = model.apply({"params": p}, gm, train=True,
                                 rngs={"dropout": drop_key})
            return loss_fcn(logits, labels, weights), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return new_params, loss

    ref_params, ref_loss = jax.jit(ref_step)(mkstate())

    mesh = make_mesh(N_DEV)
    step = make_big_graph_train_step(
        model, tx, loss_fcn, is_hetero, mesh, augment=False
    )
    new_state, loss, probs = step(
        mkstate(), shard_edges(g, N_DEV), labels, weights
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    assert int(new_state.step) == 1
    assert np.all(np.isfinite(np.asarray(probs)))


def test_train_step_with_augmentation_trains():
    """With augmentation on, losses stay finite and params move."""
    ctor, is_hetero = MODELS["HEAT2"]
    model = ctor()
    tx = optax.adam(1e-3)
    loss_fcn = parse_loss({"loss": "CE"})
    g = make_batched_graph(seed=7)
    variables = model.init(jax.random.PRNGKey(1), g)
    mesh = make_mesh(N_DEV)
    step = make_big_graph_train_step(model, tx, loss_fcn, True, mesh)
    state = TrainState(
        params=variables["params"], batch_stats={},
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(5), step=jnp.zeros((), jnp.int32),
    )
    gs = shard_edges(g, N_DEV)
    labels = jnp.asarray([0, 1], jnp.int32)
    weights = jnp.asarray([1.0, 1.0], jnp.float32)
    losses = []
    for _ in range(5):
        state, loss, _ = step(state, gs, labels, weights)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5


def test_shard_edges_requires_divisibility():
    g = make_batched_graph()
    with pytest.raises(ValueError):
        shard_edges(g, 7)


def test_trainer_picks_big_graph_mode(tmp_path):
    """End-to-end: a GNNTrainer with a tiny big_graph_edge_threshold trains
    via the edge-sharded step and still overfits the synthetic cohort."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_e2e import make_synthetic_cohort, CFG_TMPL

    from wsi_hgnn_tpu.config import loads_config
    from wsi_hgnn_tpu.train import GNNTrainer

    train_list, normal_list = make_synthetic_cohort(tmp_path)
    cfg = loads_config(CFG_TMPL.format(
        train=train_list, normal=normal_list,
        ckpt=str(tmp_path / "ckpt_big"), gnn="HEAT2", epochs=10,
    ))
    cfg["train"]["big_graph_edge_threshold"] = 1  # force the sharded path
    trainer = GNNTrainer(cfg, seed=0)
    assert trainer._big_graph
    stats = trainer.train(log_every=0)
    assert stats["Training AUC"] > 0.9
    assert np.isfinite(stats["Train Loss: "])


def test_gin_max_pooling_under_edge_sharding():
    """GIN with neighbor_pooling_type='max' exercises copy_u_max's
    cross-shard reduction — all_gather failed shard_map's replication
    check; the psum-routed max must match the single-device forward and
    carry gradients."""
    from wsi_hgnn_tpu.config import parse_gnn_model

    model, is_hetero = parse_gnn_model({
        "name": "GIN", "in_dim": 16, "hidden_dim": 16, "out_dim": 2,
        "num_layers": 2, "num_mlp_layers": 2, "feat_drop": 0.0,
        "graph_pooling_type": "sum", "neighbor_pooling_type": "max",
        "learn_eps": False,
    })
    assert not is_hetero
    g = make_batched_graph(seed=13)
    gh = to_homogeneous(g)
    gs = shard_edges(g, N_DEV)
    mesh = make_mesh(N_DEV)
    variables = model.init(jax.random.PRNGKey(0), gh)

    want = model.apply(variables, gh, train=False)
    fwd = sharded_apply(model, mesh, is_hetero=is_hetero)
    got = fwd(variables, gs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    def loss(v):
        return sharded_apply(model, mesh, is_hetero=is_hetero)(v, gs).sum()

    grads = jax.grad(lambda v: model.apply(v, gh, train=False).sum())(variables)
    grads_sh = jax.grad(loss)(variables)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5),
        grads, grads_sh,
    )
