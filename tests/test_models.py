"""Model zoo tests.

Layer-level golden tests re-implement the documented DGL semantics with
dense NumPy on tiny graphs (SURVEY.md §4's test strategy); model-level tests
check the strongest structural invariants of the padded representation:
  * batch independence — logits of a 2-graph batch equal per-graph logits;
  * padding independence — growing capacities never changes outputs;
  * node-relabeling invariance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsi_hgnn_tpu.graph import batch_graphs, from_arrays, to_homogeneous
from wsi_hgnn_tpu import models
from wsi_hgnn_tpu.config import parse_gnn_model, loads_config

T = 4  # node types in tests


def het_graph(n=12, e=40, d=8, seed=0, cap_n=32, cap_e=64, self_loops=False):
    rng = np.random.RandomState(seed)
    feat = rng.randn(n, d).astype(np.float32)
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    ntype = rng.randint(0, T, n).astype(np.int32)
    esign = rng.randint(0, 2, e).astype(np.int32)
    sim = rng.randn(e).astype(np.float32)
    g = from_arrays(feat, src, dst, node_type=ntype, esign=esign, sim=sim,
                    n_node_types=T, node_capacity=cap_n, edge_capacity=cap_e,
                    add_self_loops=self_loops)
    return g, (feat, src, dst, ntype, esign, sim)


# ------------------------------------------------------------------ #
# layer golden tests
# ------------------------------------------------------------------ #
def test_graphconv_golden():
    g, (feat, src, dst, *_ ) = het_graph(self_loops=True)
    gh = to_homogeneous(g)
    layer = models.GraphConvLayer(features=6, activation=None)
    params = layer.init(jax.random.PRNGKey(0), gh, gh.feat)
    out = np.asarray(layer.apply(params, gh, gh.feat))

    w = np.asarray(params["params"]["weight"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    n = feat.shape[0]
    src2 = np.concatenate([src, np.arange(n)])
    dst2 = np.concatenate([dst, np.arange(n)])
    a = np.zeros((n, n))
    for s, t in zip(src2, dst2):
        a[t, s] += 1.0
    dout = np.maximum(a.sum(0), 1.0)  # out-degree of src
    din = np.maximum(a.sum(1), 1.0)   # in-degree of dst
    h = feat @ w
    expect = (a * (din[:, None] ** -0.5) * (dout[None, :] ** -0.5)) @ h + b
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)


def test_gatconv_golden():
    g, (feat, src, dst, *_ ) = het_graph(self_loops=True)
    gh = to_homogeneous(g)
    layer = models.GATConvLayer(features=5, num_heads=2)
    params = layer.init(jax.random.PRNGKey(1), gh, gh.feat)
    out = np.asarray(layer.apply(params, gh, gh.feat))

    p = params["params"]
    w = np.asarray(p["fc"]["kernel"])  # [D, H*F]
    al = np.asarray(p["attn_l"])[0]    # [H, F]
    ar = np.asarray(p["attn_r"])[0]
    bias = np.asarray(p["bias"])
    n = feat.shape[0]
    src2 = np.concatenate([src, np.arange(n)])
    dst2 = np.concatenate([dst, np.arange(n)])
    z = (feat @ w).reshape(n, 2, 5)
    el = (z * al).sum(-1)  # [N, H]
    er = (z * ar).sum(-1)
    expect = np.zeros((n, 2, 5))
    for h_i in range(2):
        for v in range(n):
            idx = [i for i in range(len(src2)) if dst2[i] == v]
            if not idx:
                continue
            e = el[src2[idx], h_i] + er[v, h_i]
            e = np.where(e > 0, e, 0.2 * e)  # leaky_relu(0.2)
            a = np.exp(e - e.max()); a /= a.sum()
            expect[v, h_i] = (a[:, None] * z[src2[idx], h_i]).sum(0)
    expect = expect + bias
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)


def _dense_groups(src, dst, key):
    groups = {}
    for i in range(len(src)):
        groups.setdefault(key(i), []).append(i)
    return groups


def test_heatlayer_golden():
    # in_dim == out_dim, as in the reference stack (hidden -> hidden)
    g, (feat, src, dst, ntype, esign, sim) = het_graph(d=6)
    layer = models.HEATLayer(n_types=T, out_dim=6, n_heads=2, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(2), g, g.feat)
    out = np.asarray(layer.apply(params, g, g.feat))

    p = params["params"]
    def typed(name, x):
        w = np.asarray(p[name]["kernel"]); b = np.asarray(p[name]["bias"])
        return np.stack([x[i] @ w[ntype[i]] + b[ntype[i]] for i in range(len(x))])
    n, e = feat.shape[0], src.shape[0]
    k = typed("k_linears", feat).reshape(n, 2, 3)
    q = typed("q_linears", feat).reshape(n, 2, 3)
    v = typed("v_linears", feat).reshape(n, 2, 3)
    ew = np.asarray(p["e_linear"]["kernel"])[0, 0]
    eb = np.asarray(p["e_linear"]["bias"])[0]
    ea = sim * ew + eb
    score = (q[dst] * k[src]).sum(-1) * ea[:, None] / np.sqrt(3)  # [E, H]

    rel = esign * T * T + ntype[src] * T + ntype[dst]
    groups = _dense_groups(src, dst, lambda i: (dst[i], rel[i]))
    attn = np.zeros_like(score)
    for idx in groups.values():
        s = score[idx]
        a = np.exp(s - s.max(0)); a /= a.sum(0)
        attn[idx] = a
    agg = np.zeros((n, 2, 3))
    for i in range(e):
        agg[dst[i]] += v[src[i]] * attn[i][:, None]
    agg = agg.reshape(n, 6)

    present = set(rel.tolist())
    denom = np.array([len([r for r in present if r % T == t_]) for t_ in range(T)], float)
    t_agg = agg / np.maximum(denom[ntype], 1.0)[:, None]
    trans = typed("a_linears", t_agg)
    alpha = 1.0 / (1.0 + np.exp(-np.asarray(p["skip"])))[ntype][:, None]
    expect = trans * alpha + feat * (1 - alpha)  # mix with the ORIGINAL h
    has = denom[ntype] > 0
    expect = np.where(has[:, None], expect, feat)
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)


def test_hgtlayer_golden():
    # in_dim must equal out_dim for the skip mix, as in the reference stack
    g, (feat, src, dst, ntype, esign, sim) = het_graph(d=6)
    layer = models.HGTLayer(n_types=T, out_dim=6, n_heads=2, dropout=0.0, use_norm=True)
    params = layer.init(jax.random.PRNGKey(3), g, g.feat)
    out = np.asarray(layer.apply(params, g, g.feat))

    p = params["params"]
    def typed(name, x):
        w = np.asarray(p[name]["kernel"]); b = np.asarray(p[name]["bias"])
        return np.stack([x[i] @ w[ntype[i]] + b[ntype[i]] for i in range(len(x))])
    n, e = feat.shape[0], src.shape[0]
    h_dim, n_h, dk = 6, 2, 3
    k = typed("k_linears", feat).reshape(n, n_h, dk)
    q = typed("q_linears", feat).reshape(n, n_h, dk)
    v = typed("v_linears", feat).reshape(n, n_h, dk)
    A = np.asarray(p["relation_att"])   # [R, H, dk, dk]
    M = np.asarray(p["relation_msg"])
    pri = np.asarray(p["relation_pri"])  # [R, H]
    skip = np.asarray(p["skip"])

    rel = esign * T * T + ntype[src] * T + ntype[dst]
    k_e = np.stack([np.einsum("hd,hde->he", k[src[i]], A[rel[i]]) for i in range(e)])
    v_e = np.stack([np.einsum("hd,hde->he", v[src[i]], M[rel[i]]) for i in range(e)])
    score = (q[dst] * k_e).sum(-1) * pri[rel] / np.sqrt(dk)

    groups = _dense_groups(src, dst, lambda i: (dst[i], rel[i]))
    attn = np.zeros_like(score)
    for idx in groups.values():
        s = score[idx]
        a = np.exp(s - s.max(0)); a /= a.sum(0)
        attn[idx] = a
    agg = np.zeros((n, n_h, dk))
    for i in range(e):
        agg[dst[i]] += v_e[i] * attn[i][:, None]
    agg = agg.reshape(n, h_dim)

    present = set(rel.tolist())
    denom = np.array([len([r for r in present if r % T == t_]) for t_ in range(T)], float)
    t_agg = agg / np.maximum(denom[ntype], 1.0)[:, None]
    trans = typed("a_linears", t_agg)
    alpha = 1.0 / (1.0 + np.exp(-skip))[ntype][:, None]
    mixed = trans * alpha + feat * (1 - alpha)
    # per-type LayerNorm
    ns = np.asarray(p["norms"]["scale"]); nb = np.asarray(p["norms"]["bias"])
    mu = mixed.mean(-1, keepdims=True)
    var = ((mixed - mu) ** 2).mean(-1, keepdims=True)
    normed = (mixed - mu) / np.sqrt(var + 1e-5) * ns[ntype] + nb[ntype]
    has = denom[ntype] > 0
    expect = np.where(has[:, None], normed, feat)
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-4)


def test_hetrgcn_layer_golden():
    g, (feat, src, dst, ntype, esign, sim) = het_graph(d=6)
    layer = models.heterogeneous.HetRGCNLayer(n_types=T, n_edge_types=2, features=6)
    params = layer.init(jax.random.PRNGKey(4), g, g.feat)
    out = np.asarray(layer.apply(params, g, g.feat))

    w = np.asarray(params["params"]["kernel"])  # [R, D, F]
    b = np.asarray(params["params"]["bias"])
    rel = esign * T * T + ntype[src] * T + ntype[dst]
    present = sorted(set(rel.tolist()))
    n = feat.shape[0]
    expect = feat.copy()
    for i in range(n):
        s = ntype[i]
        rels = [r for r in present if (r // T) % T == s]
        if rels:
            expect[i] = np.mean([feat[i] @ w[r] + b[r] for r in rels], axis=0)
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ #
# model invariants
# ------------------------------------------------------------------ #
def _all_models(d=8, c=3):
    return [
        ("GCN", models.GCN(d, 16, c, 2, graph_pooling_type="att"), False, True),
        ("GAT", models.GAT(2, d, 16, c, heads=(2, 2, 1), graph_pooling_type="mean"), False, True),
        ("GIN", models.GIN(d, 16, c, 3, 2, graph_pooling_type="sum",
                           neighbor_pooling_type="mean"), False, True),
        ("NTPool", models.NTPoolGCN(d, 16, c, T, 2, graph_pooling_type="mean"), True, False),
        ("HetRGCN", models.HetRGCN(d, 16, c, 2, T, graph_pooling_type="sum"), True, False),
        ("HGT", models.HGT(d, 16, c, 2, 2, T), True, False),
        ("HEAT2", models.HEATNet2(d, 16, c, 2, 2, T, dropout=0.0), True, False),
        ("HEAT4", models.HEATNet4(d, 16, c, 2, 2, T, dropout=0.0), True, False),
    ]


def full_rel_graph(n, e, seed, self_loops, d=8):
    """Graph whose node types cover all T and whose edges cover all 2*T*T
    canonical relations, so batch-level relation presence equals per-graph
    presence and batch independence holds exactly for hetero models."""
    rng = np.random.RandomState(seed)
    assert n >= 2 * T
    feat = rng.randn(n, d).astype(np.float32)
    ntype = np.concatenate([np.tile(np.arange(T), 2), rng.randint(0, T, n - 2 * T)]).astype(np.int32)
    by_type = {t_: np.where(ntype == t_)[0] for t_ in range(T)}
    src, dst, esign = [], [], []
    for z in range(2):
        for s in range(T):
            for t_ in range(T):
                src.append(rng.choice(by_type[s]))
                dst.append(rng.choice(by_type[t_]))
                esign.append(z)
    extra = max(e - len(src), 0)
    src += list(rng.randint(0, n, extra))
    dst += list(rng.randint(0, n, extra))
    esign += list(rng.randint(0, 2, extra))
    src = np.array(src, np.int32); dst = np.array(dst, np.int32)
    esign = np.array(esign, np.int32)
    sim = rng.randn(len(src)).astype(np.float32)
    return from_arrays(feat, src, dst, node_type=ntype, esign=esign, sim=sim,
                       n_node_types=T, node_capacity=32, edge_capacity=128,
                       add_self_loops=self_loops)


@pytest.mark.parametrize("name,model,hetero,self_loops", _all_models())
def test_model_shapes_and_batch_independence(name, model, hetero, self_loops):
    g1 = full_rel_graph(n=10, e=40, seed=10, self_loops=self_loops)
    g2 = full_rel_graph(n=14, e=44, seed=11, self_loops=self_loops)
    if not hetero:
        g1, g2 = to_homogeneous(g1), to_homogeneous(g2)
    gb = batch_graphs([g1, g2], node_capacity=64, edge_capacity=128)

    params = model.init(jax.random.PRNGKey(0), gb)
    out_b = np.asarray(model.apply(params, gb, train=False))
    assert out_b.shape == (2, 3)
    assert np.all(np.isfinite(out_b))

    out_1 = np.asarray(model.apply(params, batch_graphs([g1], node_capacity=64, edge_capacity=128), train=False))
    out_2 = np.asarray(model.apply(params, batch_graphs([g2], node_capacity=64, edge_capacity=128), train=False))
    # Both graphs cover the full relation set, so batch-level presence
    # denominators (faithful to dgl.batch + cross_reducer='mean') match the
    # per-graph ones and batch independence holds exactly.
    np.testing.assert_allclose(out_b[0], out_1[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_b[1], out_2[0], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,model,hetero,self_loops", _all_models())
def test_model_padding_independence(name, model, hetero, self_loops):
    g, _ = het_graph(n=10, e=30, seed=12, self_loops=self_loops, cap_n=16, cap_e=64)
    gbig, _ = het_graph(n=10, e=30, seed=12, self_loops=self_loops, cap_n=64, cap_e=256)
    if not hetero:
        g, gbig = to_homogeneous(g), to_homogeneous(gbig)
    params = model.init(jax.random.PRNGKey(0), g)
    o1 = np.asarray(model.apply(params, g, train=False))
    o2 = np.asarray(model.apply(params, gbig, train=False))
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,model,hetero,self_loops", _all_models())
def test_model_relabel_invariance(name, model, hetero, self_loops):
    rng = np.random.RandomState(13)
    n, e, d = 10, 30, 8
    feat = rng.randn(n, d).astype(np.float32)
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    ntype = rng.randint(0, T, n).astype(np.int32)
    esign = rng.randint(0, 2, e).astype(np.int32)
    sim = rng.randn(e).astype(np.float32)

    def build(perm):
        return from_arrays(
            feat[perm], src=np.argsort(perm)[src].astype(np.int32),
            dst=np.argsort(perm)[dst].astype(np.int32),
            node_type=ntype[perm], esign=esign, sim=sim, n_node_types=T,
            node_capacity=32, edge_capacity=64, add_self_loops=self_loops,
        )

    g_a = build(np.arange(n))
    g_b = build(rng.permutation(n))
    if not hetero:
        g_a, g_b = to_homogeneous(g_a), to_homogeneous(g_b)
    params = model.init(jax.random.PRNGKey(0), g_a)
    o_a = np.asarray(model.apply(params, g_a, train=False))
    o_b = np.asarray(model.apply(params, g_b, train=False))
    np.testing.assert_allclose(o_a, o_b, rtol=1e-3, atol=1e-4)


def test_parse_gnn_model_from_reference_yaml():
    cfg = loads_config(
        """
GNN:
  name: "HEAT2"
  n_node_types: 6
  num_layers: 2
  in_dim: 16
  hidden_dim: 32
  out_dim: 2
  n_heads: 4
  feat_drop: 0.2
  graph_pooling_type: mean
"""
    )
    model, hetero = parse_gnn_model(cfg["GNN"])
    assert hetero and isinstance(model, models.HEATNet2)
    g, _ = het_graph(n=8, e=20, d=16, cap_n=16, cap_e=32)
    g = g.replace(n_node_types=6)
    params = model.init(jax.random.PRNGKey(0), g)
    out = model.apply(params, g, train=False)
    assert out.shape == (1, 2)


def test_hetero_heat_ragged_typed_matches_onehot():
    """typed_impl='ragged' == 'onehot' on the TypedGraph HEATNet4/HEATNet2
    forwards and their parameter gradients, same params (the grouped-GEMM
    projection is a pure reformulation — see ops.typed_linear_ragged)."""
    g, _ = het_graph(n=14, e=48, d=8, seed=3)
    for cls in (models.HEATNet4, models.HEATNet2):
        kw = dict(in_dim=8, hidden_dim=16, out_dim=3, n_layers=2, n_heads=2,
                  n_node_types=T, dropout=0.0)
        params = cls(**kw).init(jax.random.PRNGKey(7), g)
        ref = np.asarray(cls(**kw, typed_impl="onehot").apply(
            params, g, train=False))
        out = np.asarray(cls(**kw, typed_impl="ragged").apply(
            params, g, train=False))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

        def loss(p, impl, _cls=cls, _kw=kw):
            return _cls(**_kw, typed_impl=impl).apply(p, g, train=False).sum()

        g_ref = jax.grad(loss)(params, "onehot")
        g_rag = jax.grad(loss)(params, "ragged")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5),
            g_ref, g_rag,
        )
