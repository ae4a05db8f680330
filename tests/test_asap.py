"""Golden tests for ASAPPooling against an independent dense-NumPy
implementation of the reference math (/root/reference/pooling/ASAP.py:120-202:
GCNConv master query, segment softmax, LEConv fitness, top-k, S^T·A·S)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu.graph import batch_graphs, from_arrays
from wsi_hgnn_tpu.models.asap import ASAPPooling


def dense_reference_asap(x, edges, params, k, neg_slope=0.2):
    """Dense NumPy ASAP on ONE graph. `edges` = list of (src, dst) (center =
    dst). Weights: dict with lin_q/gat_att/(gnn_intra_cluster|gnn_score)
    kernels+biases laid out like the flax module."""
    n, f = x.shape
    # adjacency with self loops, weight 1 (add_remaining_self_loops fill 1)
    A = np.zeros((n, n), np.float64)
    for s, d in edges:
        if s != d:
            A[d, s] = 1.0
    A += np.eye(n)

    # GCNConv: D^-1/2 A D^-1/2 (x W) + b, aggregating INTO the endpoint the
    # score later reads x_pool at (the reference writes edge_index[1] and
    # reads x_pool[edge_index[1]], ASAP.py:157-159) — under this port's
    # center=dst flip that endpoint is src, i.e. the TRANSPOSED adjacency
    B = A.T
    deg = B.sum(1)
    dinv = 1.0 / np.sqrt(deg)
    Bn = dinv[:, None] * B * dinv[None, :]
    x_pool = Bn @ (x @ np.asarray(params["gnn_intra_cluster"]["lin"]["kernel"], np.float64))
    x_pool = x_pool + np.asarray(params["gnn_intra_cluster"]["bias"], np.float64)

    # master query: max over incident neighbors (incl. self)
    X_q = np.full((n, f), -np.inf)
    for d in range(n):
        for s in range(n):
            if A[d, s] > 0:
                X_q[d] = np.maximum(X_q[d], x_pool[s])
    M_q = (
        X_q @ np.asarray(params["lin_q"]["kernel"], np.float64)
        + np.asarray(params["lin_q"]["bias"], np.float64)
    )

    # GAT score + per-center softmax
    score = np.zeros((n, n))  # score[d, s]
    Wg = np.asarray(params["gat_att"]["kernel"], np.float64)[:, 0]
    bg = np.asarray(params["gat_att"]["bias"], np.float64)[0]
    for d in range(n):
        logits = []
        nbrs = [s for s in range(n) if A[d, s] > 0]
        for s in nbrs:
            z = np.concatenate([M_q[d], x_pool[s]]) @ Wg + bg
            z = z if z > 0 else neg_slope * z
            logits.append(z)
        logits = np.asarray(logits)
        e = np.exp(logits - logits.max())
        sm = e / e.sum()
        for s, v in zip(nbrs, sm):
            score[d, s] = v

    out = score @ x  # out[d] = sum_s score[d,s] x[s]

    # LEConv fitness (self loops removed): deg*lin1 + sum w (xW)[j] + lin2
    A_ns = A - np.eye(n)
    deg_ns = A_ns.sum(1)
    h = out @ np.asarray(params["gnn_score"]["weight"]["kernel"], np.float64)
    lin1 = out @ np.asarray(params["gnn_score"]["lin1"]["kernel"], np.float64) \
        + np.asarray(params["gnn_score"]["lin1"]["bias"], np.float64)
    lin2 = out @ np.asarray(params["gnn_score"]["lin2"]["kernel"], np.float64) \
        + np.asarray(params["gnn_score"]["lin2"]["bias"], np.float64)
    le = deg_ns[:, None] * lin1 + A_ns @ h + lin2
    fitness = 1.0 / (1.0 + np.exp(-le[:, 0]))

    perm = np.argsort(-fitness, kind="stable")[:k]
    pooled = out[perm] * fitness[perm][:, None]

    # S [n, k]: S[s, c] = score[perm[c], s]
    S = np.zeros((n, k))
    for c, d in enumerate(perm):
        for s in range(n):
            S[s, c] = score[d, s]
    E = S.T @ A @ S
    E = E * (1 - np.eye(k)) + np.eye(k)
    return pooled, E, fitness, perm


def make_graph(rng, n=7, extra_caps=False):
    f = 5
    x = rng.randn(n, f).astype(np.float32)
    edges = set()
    while len(edges) < 2 * n:
        s, d = rng.randint(0, n, 2)
        if s != d:
            edges.add((int(s), int(d)))
    edges = sorted(edges)
    src = np.asarray([e[0] for e in edges], np.int32)
    dst = np.asarray([e[1] for e in edges], np.int32)
    kw = dict(node_capacity=16, edge_capacity=64) if extra_caps else {}
    g = from_arrays(x, src, dst, n_node_types=1, **kw)
    return g, x, edges


def test_asap_matches_dense_numpy():
    rng = np.random.RandomState(3)
    g, x, edges = make_graph(rng, n=7, extra_caps=True)
    k = 3
    model = ASAPPooling(in_dim=5, k=k)
    params = model.init(jax.random.PRNGKey(0), g)["params"]

    pooled, adj, cmask, perm, fitness = model.apply({"params": params}, g)
    p_np = jax.tree.map(lambda a: np.asarray(a, np.float64), jax.tree.map(np.asarray, params))
    ref_pooled, ref_E, ref_fit, ref_perm = dense_reference_asap(
        np.asarray(x, np.float64), edges, p_np, k
    )

    assert bool(cmask.all())
    np.testing.assert_allclose(
        np.asarray(fitness)[:7], ref_fit, rtol=1e-4, atol=1e-5
    )
    assert sorted(np.asarray(perm)[0].tolist()) == sorted(ref_perm.tolist())
    # align cluster order (ties broken identically: both sort by -fitness)
    order = np.argsort(-ref_fit[ref_perm], kind="stable")
    np.testing.assert_allclose(
        np.asarray(pooled)[0], ref_pooled, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(adj)[0], ref_E, rtol=1e-4, atol=1e-5)


def test_asap_batched_matches_per_graph():
    """Batching two graphs must reproduce each graph's standalone pooling."""
    rng = np.random.RandomState(7)
    g1, x1, e1 = make_graph(rng, n=7)
    g2, x2, e2 = make_graph(rng, n=9)
    k = 4
    model = ASAPPooling(in_dim=5, k=k)
    gb = batch_graphs([g1, g2], node_capacity=32, edge_capacity=128)
    params = model.init(jax.random.PRNGKey(1), gb)["params"]

    pooled_b, adj_b, mask_b, perm_b, _ = jax.jit(
        lambda p, g: model.apply({"params": p}, g)
    )(params, gb)

    for gi, (g, n) in enumerate([(g1, 7), (g2, 9)]):
        gg = batch_graphs([g], node_capacity=32, edge_capacity=128)
        pooled_s, adj_s, mask_s, _, _ = model.apply({"params": params}, gg)
        np.testing.assert_allclose(
            np.asarray(pooled_b)[gi], np.asarray(pooled_s)[0], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(adj_b)[gi], np.asarray(adj_s)[0], rtol=1e-4, atol=1e-5
        )


def test_asap_small_graph_pads_clusters():
    """A graph with fewer real nodes than K marks the excess invalid."""
    rng = np.random.RandomState(11)
    g, _, _ = make_graph(rng, n=3)
    model = ASAPPooling(in_dim=5, k=5)
    params = model.init(jax.random.PRNGKey(2), g)["params"]
    pooled, adj, cmask, perm, _ = model.apply({"params": params}, g)
    assert int(cmask.sum()) == 3
    dead = ~np.asarray(cmask)[0]
    assert np.all(np.asarray(pooled)[0][dead] == 0)
    assert np.all(np.asarray(adj)[0][dead, :] == 0)
    assert np.all(np.asarray(adj)[0][:, dead] == 0)


def test_asap_gradients_flow():
    rng = np.random.RandomState(5)
    g, _, _ = make_graph(rng, n=8)
    model = ASAPPooling(in_dim=5, k=3)
    params = model.init(jax.random.PRNGKey(4), g)["params"]

    def loss(p):
        pooled, adj, *_ = model.apply({"params": p}, g)
        return (pooled ** 2).sum() + (adj ** 2).sum()

    grads = jax.grad(loss)(params)
    total = sum(float(np.abs(np.asarray(v)).sum()) for v in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_asapgcn_forward_and_factory():
    """ASAP is reachable from the public surface: `GNN: name: GCN,
    graph_pooling_type: asap` builds the ASAPGCN classifier."""
    from wsi_hgnn_tpu.config import parse_gnn_model
    from wsi_hgnn_tpu.models import ASAPGCN

    model, hetero = parse_gnn_model({
        "name": "GCN", "num_layers": 2, "in_dim": 5, "hidden_dim": 8,
        "out_dim": 3, "feat_drop": 0.0, "graph_pooling_type": "asap",
        "pool_k": 4,
    })
    assert isinstance(model, ASAPGCN) and not hetero

    rng = np.random.RandomState(7)
    g1, _, _ = make_graph(rng, n=9)
    g2, _, _ = make_graph(rng, n=6)
    g = batch_graphs([g1, g2])
    params = model.init(jax.random.PRNGKey(0), g)
    logits = model.apply(params, g, train=False)
    assert logits.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_asap_small_graph_in_batch_keeps_valid_columns():
    """Invalid top-k slots of a small graph tie-break onto foreign nodes;
    the S-matrix scatter must not let such a junk duplicate drop or
    re-route a VALID centre's column: batched pooling == standalone."""
    rng = np.random.RandomState(13)
    g_big, _, _ = make_graph(rng, n=9)
    g_small, _, _ = make_graph(rng, n=3)  # 3 real nodes, k=5 -> 2 invalid
    k = 5
    model = ASAPPooling(in_dim=5, k=k)
    gb = batch_graphs([g_big, g_small], node_capacity=32, edge_capacity=128)
    params = model.init(jax.random.PRNGKey(3), gb)["params"]

    pooled_b, adj_b, mask_b, perm_b, _ = model.apply({"params": params}, gb)
    assert int(mask_b[0].sum()) == 5 and int(mask_b[1].sum()) == 3
    for gi, g in enumerate([g_big, g_small]):
        gg = batch_graphs([g], node_capacity=32, edge_capacity=128)
        pooled_s, adj_s, mask_s, _, _ = model.apply({"params": params}, gg)
        np.testing.assert_allclose(np.asarray(pooled_b)[gi],
                                   np.asarray(pooled_s)[0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(adj_b)[gi],
                                   np.asarray(adj_s)[0],
                                   rtol=1e-4, atol=1e-5)
    # every valid centre of the BIG graph kept a non-trivial adjacency row
    # (a dropped S column leaves only the reset diagonal 1)
    a0 = np.asarray(adj_b)[0]
    assert np.all((a0.sum(1) - 1.0) > 1e-6)
