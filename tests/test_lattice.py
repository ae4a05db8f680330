"""Lattice fast path: outputs must match the TypedGraph HEAT models with
SHARED parameters (the trees are interchangeable by construction)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu import models
from wsi_hgnn_tpu.graph.build import build_batch_device
from wsi_hgnn_tpu.models.lattice import (
    HEATNet2Lattice,
    HEATNet4Lattice,
    build_lattice_device,
)

B, N, D, T, R = 2, 64, 16, 6, 5


def data(seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, T, (B, N)).astype(np.int32))
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([N, N - 10])[:, None])
    return feats, ntypes, mask


def test_lattice_build_matches_typed_graph():
    feats, ntypes, mask = data()
    g_t = build_batch_device(feats, ntypes, mask, R, T)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)
    k = R - 1
    # same neighbour sets and similarities for real nodes
    src = np.asarray(g_t.src).reshape(B, N, k)
    dst = np.asarray(g_t.dst).reshape(B, N, k)
    for b in range(B):
        real = np.asarray(mask[b])
        np.testing.assert_array_equal(
            dst[b][real] - b * N, np.asarray(g_l.idx)[b][real]
        )
    np.testing.assert_allclose(
        np.asarray(g_t.sim).reshape(B, N, k)[np.asarray(mask)],
        np.asarray(g_l.sim)[np.asarray(mask)],
        atol=1e-5,
    )


@pytest.mark.parametrize("which", ["heat2", "heat4"])
@pytest.mark.parametrize("pooling", ["mean", "sum", "max"])
def test_lattice_model_matches_typed_graph_model(which, pooling):
    feats, ntypes, mask = data(1)
    g_t = build_batch_device(feats, ntypes, mask, R, T)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)

    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=2, n_heads=2,
              n_node_types=T, dropout=0.0, graph_pooling_type=pooling)
    if which == "heat2":
        ref_model, lat_model = models.HEATNet2(**kw), HEATNet2Lattice(**kw)
    else:
        ref_model, lat_model = models.HEATNet4(**kw), HEATNet4Lattice(**kw)

    params = ref_model.init(jax.random.PRNGKey(0), g_t)
    ref = np.asarray(ref_model.apply(params, g_t, train=False))

    # the SAME param tree drives the lattice model
    lat = np.asarray(lat_model.apply(params, g_l, train=False))
    assert lat.shape == ref.shape
    np.testing.assert_allclose(lat, ref, rtol=1e-4, atol=1e-4)


def test_lattice_param_tree_is_interchangeable():
    feats, ntypes, mask = data(2)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=2, n_heads=2,
              n_node_types=T, dropout=0.0)
    lat_params = HEATNet4Lattice(**kw).init(jax.random.PRNGKey(1), g_l)
    g_t = build_batch_device(feats, ntypes, mask, R, T)
    out = models.HEATNet4(**kw).apply(lat_params, g_t, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_typed_linear_ragged_matches_onehot():
    """ops.typed_linear_ragged (type-sorted grouped GEMM) == typed_linear
    values AND gradients, including with a precomputed shared TypeSort."""
    from wsi_hgnn_tpu.graph import ops

    rng = np.random.RandomState(3)
    M, Din, H = 97, 24, 16  # deliberately unaligned row count
    x = jnp.asarray(rng.randn(M, Din).astype(np.float32))
    ty = jnp.asarray(rng.randint(0, T, M).astype(np.int32))
    w = jnp.asarray(rng.randn(T, Din, H).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(T, H).astype(np.float32))

    ref = np.asarray(ops.typed_linear(x, ty, w, b))
    out = np.asarray(ops.typed_linear_ragged(x, ty, w, b))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    tsort = ops.make_type_sort(ty, T)
    out2 = np.asarray(ops.typed_linear_ragged(x, ty, w, b, tsort))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)

    # gradient equality wrt every input (the backward runs permutation
    # gathers + ragged transposes, never a scatter)
    cot = jnp.asarray(rng.randn(M, H).astype(np.float32))

    def loss(fn):
        return lambda x, w, b: (fn(x, ty, w, b) * cot).sum()

    gx_r, gw_r, gb_r = jax.grad(loss(ops.typed_linear), argnums=(0, 1, 2))(
        x, w, b)
    gx_o, gw_o, gb_o = jax.grad(loss(ops.typed_linear_ragged),
                                argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_o), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_o), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-5)


def test_typed_linear_ragged_batching_safe():
    """typed_linear_ragged under every batching composition == the one-hot
    form: plain vmap, vmap of a jax.checkpoint'd caller (the batch tracer
    is invisible inside the remat body — the case no caller-side dispatch
    can catch), grad-of-vmap, and per-example vmap-of-grad. The custom_vmap
    rules swap in the one-hot form; unbatched traces keep the ragged GEMM."""
    from wsi_hgnn_tpu.graph import ops

    rng = np.random.RandomState(5)
    B, M, Din, H = 3, 33, 12, 8
    x = jnp.asarray(rng.randn(B, M, Din).astype(np.float32))
    ty = jnp.asarray(rng.randint(0, T, (B, M)).astype(np.int32))
    w = jnp.asarray(rng.randn(T, Din, H).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(T, H).astype(np.float32))

    ref = np.asarray(
        jax.vmap(lambda xx, tt: ops.typed_linear(xx, tt, w, b))(x, ty))

    out = np.asarray(
        jax.vmap(lambda xx, tt: ops.typed_linear_ragged(xx, tt, w, b))(x, ty))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    out = np.asarray(jax.vmap(jax.checkpoint(
        lambda xx, tt: ops.typed_linear_ragged(xx, tt, w, b)))(x, ty))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def batched_loss(fn):
        return lambda w_: (
            jax.vmap(lambda xx, tt: fn(xx, tt, w_, b))(x, ty) ** 2).sum()

    gw_ref = np.asarray(jax.grad(batched_loss(ops.typed_linear))(w))
    gw = np.asarray(jax.grad(batched_loss(ops.typed_linear_ragged))(w))
    np.testing.assert_allclose(gw, gw_ref, rtol=1e-4, atol=1e-4)

    def per_ex(fn):
        return jax.vmap(jax.grad(
            lambda xx, tt: (fn(xx, tt, w, b) ** 2).sum(), argnums=0),
            in_axes=(0, 0))(x, ty)

    np.testing.assert_allclose(
        np.asarray(per_ex(ops.typed_linear_ragged)),
        np.asarray(per_ex(ops.typed_linear)), rtol=1e-4, atol=1e-4)

    # grad of a checkpoint'd + vmapped caller (remat in a DP train step)
    def remat_loss(fn):
        return lambda w_: jax.vmap(jax.checkpoint(
            lambda xx, tt: (fn(xx, tt, w_, b) ** 2).sum()))(x, ty).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(remat_loss(ops.typed_linear_ragged))(w)),
        np.asarray(jax.grad(remat_loss(ops.typed_linear))(w)),
        rtol=1e-4, atol=1e-4)


def test_lattice_ragged_typed_matches_onehot_model():
    """typed_impl='ragged' (the default) == 'onehot' on the full HEATNet4
    lattice forward and its parameter gradients, same params."""
    feats, ntypes, mask = data(8)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=2, n_heads=2,
              n_node_types=T, dropout=0.0)
    params = HEATNet4Lattice(**kw).init(jax.random.PRNGKey(9), g_l)
    ref = np.asarray(HEATNet4Lattice(**kw, typed_impl="onehot").apply(
        params, g_l, train=False))
    out = np.asarray(
        HEATNet4Lattice(**kw, typed_impl="ragged").apply(
            params, g_l, train=False)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def loss(p, impl):
        return HEATNet4Lattice(**kw, typed_impl=impl).apply(
            p, g_l, train=False).sum()

    g_ref = jax.grad(loss)(params, "onehot")
    g_rag = jax.grad(loss)(params, "ragged")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5),
        g_ref, g_rag,
    )


def test_lattice_sorted_agg_matches_onehot_model():
    """agg_impl='sorted' (O(E) dst-sorted gather + sorted segment_sum) ==
    agg_impl='onehot' on the full HEATNet4 lattice forward, same params."""
    feats, ntypes, mask = data(6)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=2, n_heads=2,
              n_node_types=T, dropout=0.0)
    params = HEATNet4Lattice(**kw).init(jax.random.PRNGKey(7), g_l)
    ref = np.asarray(HEATNet4Lattice(**kw).apply(params, g_l, train=False))
    out = np.asarray(
        HEATNet4Lattice(**kw, agg_impl="sorted").apply(params, g_l, train=False)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # and gradients flow through the sorted path
    def loss(p):
        return HEATNet4Lattice(**kw, agg_impl="sorted").apply(
            p, g_l, train=False
        ).sum()

    grads = jax.grad(loss)(params)
    total = sum(float(np.abs(np.asarray(v)).sum())
                for v in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_graph_presence_is_grouping_invariant():
    """presence='graph' (the evaluator/serving mode): a slide's output
    must not depend on which other slides share its batch — the
    reference evaluates one graph at a time (eval_homo_graph.py:75-84),
    so per-slide occupancy is its eval semantics. presence='batch' (the
    reference's batched-training semantics) is legitimately
    batch-dependent for slides missing node types."""
    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(2, N, D).astype(np.float32))
    # slide 0 only has types {0, 1}; slide 1 has all six
    nt = rng.randint(0, T, (2, N)).astype(np.int32)
    nt[0] = nt[0] % 2
    ntypes = jnp.asarray(nt)
    mask = jnp.ones((2, N), bool)

    g_pair = build_lattice_device(feats, ntypes, mask, R, T)
    g_solo = build_lattice_device(feats[:1], ntypes[:1], mask[:1], R, T)

    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=2, n_heads=2,
              n_node_types=T, dropout=0.0)
    params = HEATNet4Lattice(**kw).init(jax.random.PRNGKey(3), g_solo)

    per_graph = HEATNet4Lattice(**kw, presence="graph")
    solo = np.asarray(per_graph.apply(params, g_solo, train=False))[0]
    grouped = np.asarray(per_graph.apply(params, g_pair, train=False))[0]
    np.testing.assert_allclose(grouped, solo, rtol=1e-5, atol=1e-6)

    # batch mode IS grouping-dependent here (that's why eval/serving
    # must not use it) — guard that this test is actually discriminating
    batch = HEATNet4Lattice(**kw)
    solo_b = np.asarray(batch.apply(params, g_solo, train=False))[0]
    grouped_b = np.asarray(batch.apply(params, g_pair, train=False))[0]
    assert np.abs(grouped_b - solo_b).max() > 1e-6


def test_lattice_softmax_exact_at_large_logits():
    """Attention logits past the +-60 clamp must still match the exact
    TypedGraph path: clipping is not shift invariant, so the lattice takes
    a per-dst max-subtraction branch (lax.cond) when any logit approaches
    the clamp. Scaling the q/k kernels drives the logits far past it."""
    feats, ntypes, mask = data(3)
    g_t = build_batch_device(feats, ntypes, mask, R, T)
    g_l = build_lattice_device(feats, ntypes, mask, R, T)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=3, n_layers=1, n_heads=2,
              n_node_types=T, dropout=0.0)
    params = HEATNet4Lattice(**kw).init(jax.random.PRNGKey(2), g_l)

    def scale(tree, factor):
        def f(path, leaf):
            keys = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if "k_linears" in keys or "q_linears" in keys:
                return leaf * factor
            return leaf
        return jax.tree_util.tree_map_with_path(f, tree)

    big = scale(params, 6.0)  # logits scale ~36x -> far past the clamp
    ref = np.asarray(models.HEATNet4(**kw).apply(big, g_t, train=False))
    out = np.asarray(HEATNet4Lattice(**kw).apply(big, g_l, train=False))
    assert np.all(np.isfinite(ref))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
