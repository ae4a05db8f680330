"""Graph-context (edge-sharded) parallelism: sharded HEAT layer must equal
the single-device layer on the 8-device virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu import models
from wsi_hgnn_tpu.graph import from_arrays
from wsi_hgnn_tpu.parallel import make_mesh
from wsi_hgnn_tpu.parallel.big_graph import heat_layer_sharded, shard_edges


def test_sharded_heat_layer_matches_single_device():
    rng = np.random.RandomState(0)
    n, e, d, t, heads = 48, 128, 16, 4, 2
    feat = rng.randn(n, d).astype(np.float32)
    g = from_arrays(
        feat,
        rng.randint(0, n, e), rng.randint(0, n, e),
        node_type=rng.randint(0, t, n), esign=rng.randint(0, 2, e),
        sim=rng.randn(e), n_node_types=t,
        node_capacity=64, edge_capacity=256,
    )

    layer = models.HEATLayer(n_types=t, out_dim=d, n_heads=heads, dropout=0.0)
    variables = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(g.feat))
    ref = np.asarray(layer.apply(variables, g, jnp.asarray(g.feat)))

    mesh = make_mesh(8)
    g_sharded = shard_edges(g, 8)
    out = heat_layer_sharded(
        jax.tree.map(jnp.asarray, variables["params"]),
        g_sharded, jnp.asarray(g.feat), mesh, n_heads=heads,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_shard_edges_requires_divisibility():
    rng = np.random.RandomState(1)
    g = from_arrays(
        rng.randn(8, 4).astype(np.float32),
        rng.randint(0, 8, 10), rng.randint(0, 8, 10),
        node_capacity=16, edge_capacity=30,
    )
    with pytest.raises(ValueError):
        shard_edges(g, 8)  # 30 not divisible
