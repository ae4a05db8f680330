"""Structural scaling certification on the virtual mesh (VERDICT r4 item 2).

One real chip exists in this environment, so v5e-8 scaling cannot be
*measured* — but it can be certified structurally: compile the production
data-parallel programs at mesh sizes 1/2/4/8 and assert, from XLA's own
cost analysis and optimized HLO, that

  1. per-device FLOPs stay CONSTANT as the mesh grows (each device does
     its own shard's work — the program scales), and
  2. the only cross-device collectives are the intended ones (the gradient
     all-reduce for DP training, one scalar psum for the cohort pipeline,
     NONE for the sharded featurizer), and their count does not grow with
     mesh size.

Together these are the strongest multi-chip evidence obtainable without
chips: a program with constant per-device cost and a fixed, O(1) set of
all-reduces has no hidden serialization or resharding — wall-clock on a
real v5e-8 is then per-device work + one ICI all-reduce. Matches
BASELINE.json's north star (v5e-8 slides/sec); cited from README §perf
and bench.py.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MESH_SIZES = (1, 2, 4, 8)
COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _cost_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    assert ca and "flops" in ca, f"no flops in cost_analysis: {ca}"
    return float(ca["flops"])


def _collective_census(compiled) -> dict:
    txt = compiled.as_text()
    return {
        op: len(re.findall(rf"\b{op}(?:-start)?\(", txt))
        for op in COLLECTIVES
    }


def _assert_flops_constant(flops: dict):
    """Per-device FLOPs at mesh n stay within 5% of mesh 1 (the all-reduce
    adds O(params) — measured +0.4% on the HEAT4 step)."""
    base = flops[1]
    for n, f in flops.items():
        assert f <= base * 1.05 and f >= base * 0.95, (
            f"per-device FLOPs not constant: mesh {n} has {f:.3e} "
            f"vs mesh-1 {base:.3e} — the DP program is not scaling"
        )


def test_dp_train_step_scales_structurally():
    """The DP train step (make_dp_train_step, the trainer's multi-chip
    form): constant per-device FLOPs, gradient all-reduce only."""
    from wsi_hgnn_tpu.config import (
        loads_config,
        parse_gnn_model,
        parse_loss,
        parse_optimizer,
    )
    from wsi_hgnn_tpu.graph.build import build_batch_device
    from wsi_hgnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        place_state,
        shard_stacked,
    )
    from wsi_hgnn_tpu.train.trainer import TrainState

    cfg = loads_config(
        """
GNN:
  name: "HEAT4"
  n_node_types: 6
  num_layers: 2
  in_dim: 32
  hidden_dim: 64
  out_dim: 2
  n_heads: 4
  feat_drop: 0.1
  graph_pooling_type: mean
optimizer: {opt_method: "ADAM", lr: 0.0001, weight_decay: 0.005}
train: {loss: "CE"}
"""
    )
    model, is_hetero = parse_gnn_model(cfg["GNN"])
    tx = parse_optimizer(cfg["optimizer"])
    loss_fcn = parse_loss(cfg["train"])

    b, n_nodes, d, t, radius = 2, 48, 32, 6, 4
    rng = np.random.RandomState(0)
    flops, census = {}, {}
    for n_dev in MESH_SIZES:
        feats = rng.randn(n_dev, b, n_nodes, d).astype(np.float32)
        ntypes = rng.randint(0, t, (n_dev, b, n_nodes)).astype(np.int32)
        mask = np.ones((n_dev, b, n_nodes), bool)
        labels = rng.randint(0, 2, (n_dev, b)).astype(np.int32)
        weights = np.ones((n_dev, b), np.float32)
        build = jax.vmap(
            lambda f, ty, m: build_batch_device(f, ty, m, radius, t)
        )
        graphs = build(
            jnp.asarray(feats), jnp.asarray(ntypes), jnp.asarray(mask)
        )
        g0 = jax.tree.map(lambda x: x[0], graphs)
        variables = model.init(jax.random.PRNGKey(0), g0)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(1),
            step=jnp.zeros((), jnp.int32),
        )
        mesh = make_mesh(n_dev)
        step = make_dp_train_step(model, tx, loss_fcn, is_hetero, mesh)
        compiled = step.lower(
            place_state(state, mesh),
            shard_stacked(graphs, mesh),
            shard_stacked(jnp.asarray(labels), mesh),
            shard_stacked(jnp.asarray(weights), mesh),
        ).compile()
        flops[n_dev] = _cost_flops(compiled)
        census[n_dev] = _collective_census(compiled)

    _assert_flops_constant(flops)
    assert all(v == 0 for v in census[1].values()), census[1]
    multi = {n: census[n] for n in MESH_SIZES if n > 1}
    for n, c in multi.items():
        # gradient sync is all-reduce ONLY — an all-gather/reduce-scatter/
        # permute here would mean XLA resharded something per step
        assert c["all-reduce"] > 0, f"mesh {n}: no gradient all-reduce? {c}"
        for op in COLLECTIVES[1:]:
            assert c[op] == 0, f"mesh {n}: unintended collective {op}: {c}"
    counts = {c["all-reduce"] for c in multi.values()}
    assert len(counts) == 1, (
        f"all-reduce count varies with mesh size: "
        f"{ {n: c['all-reduce'] for n, c in multi.items()} }"
    )


def test_dp_cohort_pipeline_scales_structurally():
    """The bench.py cohort program's structure (per-device slide stream
    under shard_map -> lattice graph build -> HEAT4 -> one scalar psum):
    constant per-device FLOPs, exactly one all-reduce."""
    from jax.sharding import PartitionSpec as P

    from wsi_hgnn_tpu.models.lattice import (
        HEATNet4Lattice,
        build_lattice_device,
    )
    from wsi_hgnn_tpu.parallel import make_mesh

    n_nodes, d, t, radius, n_slides = 48, 32, 6, 4, 2
    heat = HEATNet4Lattice(
        in_dim=d, hidden_dim=32, out_dim=2, n_layers=2, n_heads=4,
        n_node_types=t, dropout=0.0,
    )
    rng = np.random.RandomState(1)
    f0 = jnp.asarray(rng.randn(1, n_nodes, d).astype(np.float32))
    nt0 = jnp.asarray(rng.randint(0, t, (1, n_nodes)).astype(np.int32))
    g0 = build_lattice_device(f0, nt0, jnp.ones((1, n_nodes), bool), radius, t)
    params = heat.init(jax.random.PRNGKey(0), g0)

    flops, census = {}, {}
    for n_dev in MESH_SIZES:
        mesh = make_mesh(n_dev)
        feats = jnp.asarray(
            rng.randn(n_dev, n_slides, 1, n_nodes, d).astype(np.float32)
        )

        def body(params, feats_local):
            def slide(carry, f):
                nt = jnp.argmax(f[..., :t], -1).astype(jnp.int32)
                g = build_lattice_device(
                    f, nt, jnp.ones(f.shape[:-1], bool), radius, t
                )
                logits = heat.apply(params, g, train=False)
                return carry + logits.sum(), None

            s, _ = jax.lax.scan(slide, jnp.float32(0), feats_local[0])
            return jax.lax.psum(s, "data")

        cohort = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False,
        ))
        compiled = cohort.lower(params, feats).compile()
        flops[n_dev] = _cost_flops(compiled)
        census[n_dev] = _collective_census(compiled)
        # it must also RUN (the dryrun covers the real two-CNN form)
        out = compiled(params, feats)
        assert np.isfinite(float(np.asarray(out)))

    _assert_flops_constant(flops)
    for n in MESH_SIZES:
        c = census[n]
        for op in COLLECTIVES[1:]:
            assert c[op] == 0, f"mesh {n}: unintended collective {op}: {c}"
        if n > 1:
            assert c["all-reduce"] == 1, (
                f"mesh {n}: cohort psum should be ONE all-reduce: {c}"
            )


def test_sharded_featurizer_has_no_collectives():
    """make_sharded_batch_apply (the constructor's DataParallel axis):
    constant per-device FLOPs and ZERO collectives — features stay
    sharded for downstream construction, nothing gathers."""
    import flax.linen as nn

    from wsi_hgnn_tpu.parallel import make_mesh
    from wsi_hgnn_tpu.parallel.mesh import make_sharded_batch_apply

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=2)(x)
            x = nn.relu(x)
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    model = TinyCNN()
    rng = np.random.RandomState(2)
    per_dev = 4
    p0 = jnp.asarray(rng.rand(per_dev, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), p0)

    flops, census = {}, {}
    for n_dev in MESH_SIZES:
        mesh = make_mesh(n_dev)
        fn = make_sharded_batch_apply(
            lambda p: model.apply(variables, p), mesh
        )
        patches = jnp.asarray(
            rng.rand(per_dev * n_dev, 32, 32, 3).astype(np.float32)
        )
        compiled = fn.lower(patches).compile()
        flops[n_dev] = _cost_flops(compiled)
        census[n_dev] = _collective_census(compiled)
        out = np.asarray(compiled(patches))
        assert out.shape == (per_dev * n_dev, 16) and np.all(np.isfinite(out))

    _assert_flops_constant(flops)
    for n, c in census.items():
        assert all(v == 0 for v in c.values()), (
            f"mesh {n}: featurizer path must have no collectives: {c}"
        )
