"""Multi-device tests on the 8-device virtual CPU mesh (the TPU-world
substitute for multi-node testing, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from wsi_hgnn_tpu.graph.build import build_batch_device
from wsi_hgnn_tpu.parallel import make_mesh, stack_graphs, shard_stacked


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_build_batch_device_matches_host_build():
    from wsi_hgnn_tpu.graph import build_graph

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 40, 16).astype(np.float32)
    ntypes = rng.randint(0, 6, (2, 40)).astype(np.int32)
    mask = np.ones((2, 40), dtype=bool)
    gb = build_batch_device(jnp.asarray(feats), jnp.asarray(ntypes),
                            jnp.asarray(mask), radius=4, n_node_types=6)
    assert gb.n_graphs == 2
    assert int(gb.edge_mask.sum()) == 2 * 40 * 3
    # slide 0's edges equal the host single-slide construction
    het0, _ = build_graph(feats[0], ntypes[0], radius=4, node_capacity=40)
    e0 = 40 * 3
    np.testing.assert_array_equal(np.asarray(gb.src)[:e0], np.asarray(het0.src)[:e0])
    np.testing.assert_allclose(np.asarray(gb.sim)[:e0], np.asarray(het0.sim)[:e0], atol=1e-5)
    # slide 1's node-graph segment ids
    np.testing.assert_array_equal(np.asarray(gb.node_graph), [0] * 40 + [1] * 40)


def test_dp_gradients_match_single_device():
    """DP over the mesh must produce the same update as one big batch."""
    from wsi_hgnn_tpu.config import loads_config, parse_gnn_model, parse_loss, parse_optimizer
    from wsi_hgnn_tpu.parallel import make_dp_train_step, place_state
    from wsi_hgnn_tpu.train.trainer import TrainState

    cfg = loads_config(
        """
GNN:
  name: "HEAT2"
  n_node_types: 6
  num_layers: 1
  in_dim: 8
  hidden_dim: 16
  out_dim: 2
  n_heads: 2
  feat_drop: 0.0
  graph_pooling_type: mean
optimizer: {opt_method: "ADAM", lr: 0.001, weight_decay: 0.0}
train: {loss: "CE"}
"""
    )
    model, is_hetero = parse_gnn_model(cfg["GNN"])
    tx = parse_optimizer(cfg["optimizer"])
    loss_fcn = parse_loss(cfg["train"])

    n_dev, b, n, d = 4, 2, 32, 8
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(n_dev, b, n, d).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, 6, (n_dev, b, n)).astype(np.int32))
    mask = jnp.ones((n_dev, b, n), dtype=bool)
    labels = jnp.asarray(rng.randint(0, 2, (n_dev, b)).astype(np.int32))
    weights = jnp.ones((n_dev, b), dtype=jnp.float32)

    build = jax.vmap(lambda f, t, m: build_batch_device(f, t, m, 4, 6))
    graphs = build(feats, ntypes, mask)
    g0 = jax.tree.map(lambda x: x[0], graphs)
    variables = model.init(jax.random.PRNGKey(0), g0)
    state = TrainState(
        params=variables["params"], batch_stats={},
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(42), step=jnp.zeros((), jnp.int32),
    )

    mesh = make_mesh(4)
    dp_step = make_dp_train_step(model, tx, loss_fcn, is_hetero, mesh, augment=False)
    st_dp = place_state(state, mesh)
    new_dp, loss_dp, _ = dp_step(
        st_dp, shard_stacked(graphs, mesh), shard_stacked(labels, mesh),
        shard_stacked(weights, mesh),
    )

    # single-device run of the identical step (no mesh placement)
    single_step = make_dp_train_step(model, tx, loss_fcn, is_hetero, mesh, augment=False)
    new_1, loss_1, _ = single_step(state, graphs, labels, weights)

    assert float(loss_dp) == np.float32(loss_1) or abs(float(loss_dp) - float(loss_1)) < 1e-5
    leaves_dp = jax.tree.leaves(new_dp.params)
    leaves_1 = jax.tree.leaves(new_1.params)
    for a, b_ in zip(leaves_dp, leaves_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_dp_featurizer_matches_single_device():
    """make_dp_featurizer: batch-sharded forward == unsharded forward."""
    import flax.linen as nn

    from wsi_hgnn_tpu.parallel import make_dp_featurizer, make_mesh

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=2)(x)
            x = nn.relu(x)
            return nn.Dense(16)(x.mean(axis=(1, 2)))

    model = TinyCNN()
    rng = np.random.RandomState(0)
    patches = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), patches[:1])

    ref = np.asarray(model.apply(variables, patches))
    mesh = make_mesh(jax.device_count())
    fn = make_dp_featurizer(lambda v, p: model.apply(v, p), mesh)
    out = fn(variables, patches)
    assert len(set(d.device for d in out.addressable_shards)) == jax.device_count()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_dp_lattice_gradients_match_single_device():
    """DP lattice step over the mesh == the same step on one device."""
    from wsi_hgnn_tpu.config import (
        loads_config,
        parse_lattice_twin,
        parse_loss,
        parse_optimizer,
    )
    from wsi_hgnn_tpu.models.lattice import build_lattice_device
    from wsi_hgnn_tpu.parallel import make_dp_lattice_train_step, place_state
    from wsi_hgnn_tpu.train.trainer import TrainState

    cfg = loads_config(
        """
GNN:
  name: "HEAT4"
  n_node_types: 6
  num_layers: 1
  in_dim: 8
  hidden_dim: 16
  out_dim: 2
  n_heads: 2
  feat_drop: 0.0
  graph_pooling_type: mean
optimizer: {opt_method: "ADAM", lr: 0.001, weight_decay: 0.0}
train: {loss: "CE"}
"""
    )
    model = parse_lattice_twin(cfg["GNN"])
    assert model is not None
    tx = parse_optimizer(cfg["optimizer"])
    loss_fcn = parse_loss(cfg["train"])

    n_dev, b, n, d = 4, 2, 32, 8
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(n_dev, b, n, d).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, 6, (n_dev, b, n)).astype(np.int32))
    mask = jnp.ones((n_dev, b, n), dtype=bool)
    labels = jnp.asarray(rng.randint(0, 2, (n_dev, b)).astype(np.int32))
    weights = jnp.ones((n_dev, b), dtype=jnp.float32)

    build = jax.vmap(lambda f, t, m: build_lattice_device(f, t, m, 4, 6))
    graphs = build(feats, ntypes, mask)
    g0 = jax.tree.map(lambda x: x[0], graphs)
    variables = model.init(jax.random.PRNGKey(0), g0)
    state = TrainState(
        params=variables["params"], batch_stats={},
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(42), step=jnp.zeros((), jnp.int32),
    )

    mesh = make_mesh(4)
    dp_step = make_dp_lattice_train_step(model, tx, loss_fcn, mesh, augment=False)
    new_dp, loss_dp, probs_dp = dp_step(
        place_state(state, mesh), shard_stacked(graphs, mesh),
        shard_stacked(labels, mesh), shard_stacked(weights, mesh),
    )
    new_1, loss_1, _ = dp_step(state, graphs, labels, weights)

    assert abs(float(loss_dp) - float(loss_1)) < 1e-5
    assert np.all(np.isfinite(np.asarray(probs_dp)))
    for a, b_ in zip(jax.tree.leaves(new_dp.params), jax.tree.leaves(new_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_dp_step_with_batch_norm_model():
    """The DP step must thread batch_stats (GIN carries BatchNorm) and
    use per-device dropout keys — previously it crashed with
    ScopeCollectionNotFound for any BN model."""
    from wsi_hgnn_tpu.config import parse_gnn_model, parse_loss, parse_optimizer
    from wsi_hgnn_tpu.parallel import make_dp_train_step, make_mesh, place_state, shard_stacked
    from wsi_hgnn_tpu.train.trainer import TrainState
    from wsi_hgnn_tpu.graph.build import build_batch_device

    model, is_hetero = parse_gnn_model({
        "name": "GIN", "in_dim": 8, "hidden_dim": 16, "out_dim": 2,
        "num_layers": 2, "num_mlp_layers": 2, "feat_drop": 0.1,
        "graph_pooling_type": "sum", "neighbor_pooling_type": "sum",
        "learn_eps": False,
    })
    tx = parse_optimizer({"opt_method": "ADAM", "lr": 1e-3, "weight_decay": 0.0})
    loss_fcn = parse_loss({"loss": "CE"})

    n_dev, b, n, d = 4, 2, 24, 8
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(n_dev, b, n, d).astype(np.float32))
    ntypes = jnp.zeros((n_dev, b, n), jnp.int32)
    mask = jnp.ones((n_dev, b, n), bool)
    labels = jnp.asarray(rng.randint(0, 2, (n_dev, b)).astype(np.int32))
    weights = jnp.ones((n_dev, b), jnp.float32)
    build = jax.vmap(lambda f, t, m: build_batch_device(
        f, t, m, 4, 1, add_self_loops=True))
    graphs = build(feats, ntypes, mask)

    from wsi_hgnn_tpu.graph import to_homogeneous
    g0 = to_homogeneous(jax.tree.map(lambda x: x[0], graphs))
    variables = model.init(jax.random.PRNGKey(0), g0)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(7), step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh(n_dev)
    step = make_dp_train_step(model, tx, loss_fcn, is_hetero, mesh)
    st = place_state(state, mesh)
    new_state, loss, probs = step(
        st, shard_stacked(graphs, mesh), shard_stacked(labels, mesh),
        shard_stacked(weights, mesh),
    )
    assert np.isfinite(float(loss))
    # the running statistics moved away from their init
    moved = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(new_state.batch_stats),
                        jax.tree.leaves(state.batch_stats))
    ]
    assert max(moved) > 0


def test_sharded_encoder_matches_single_device():
    """Constructor two-CNN encoder (KimiaNet features + HoVer-Net typing
    over ONE patch stream) batch-sharded over the 8-device mesh == the
    unsharded encoder: features AND node types, including the pad-and-slice
    path for a batch that does not divide the mesh (VERDICT r3 item 1)."""
    from wsi_hgnn_tpu.models.featurizers import make_cnn_encoder

    cfg = {"feature_dim": 1024, "n_node_type": 6}
    rng = np.random.RandomState(3)
    # 96^2 keeps HoVer-Net's valid-conv decoder arithmetic positive at a
    # CPU-compilable cost; 10 patches exercise the pad-to-8 path
    patches = rng.rand(10, 96, 96, 3).astype(np.float32)

    enc_1 = make_cnn_encoder("kimia", cfg, {}, {}, with_typing=True)
    f1, t1 = enc_1(patches)
    enc_8 = make_cnn_encoder("kimia", cfg, {}, {}, with_typing=True,
                             mesh=make_mesh(8))
    f8, t8 = enc_8(patches)

    assert f1.shape == (10, 1024) and t1.shape == (10,)
    np.testing.assert_allclose(f8, f1, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(t8, t1)


def test_encoder_mesh_config_gate():
    """dp_devices config: 'all' -> the full local mesh, 1/null -> None."""
    from wsi_hgnn_tpu.pipeline.construct import encoder_mesh

    m = encoder_mesh({})
    assert m is not None and m.devices.size == jax.device_count()
    assert encoder_mesh({"dp_devices": 1}) is None
    assert encoder_mesh({"dp_devices": None}) is None
    m3 = encoder_mesh({"dp_devices": 4})
    assert m3 is not None and m3.devices.size == 4
