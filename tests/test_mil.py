"""MIL tier tests: shapes, masking invariance, k-means, ReMix semantics."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu.models.mil import (
    ABMIL,
    DSMIL,
    GatedABMIL,
    GraphTransformer,
    H2MIL,
    TreeGraph,
    dense_mincut_pool,
    graphcam,
    kmeans,
    mix_aug,
    pad_bag,
    reduce_bag,
)


def bag(n=30, d=16, seed=0, cap=64):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, d).astype(np.float32)
    padded, mask = pad_bag(feats, capacity=cap)
    return feats, jnp.asarray(padded), jnp.asarray(mask)


def test_abmil_padding_invariance():
    feats, padded, mask = bag()
    model = ABMIL(num_classes=2)
    params = model.init(jax.random.PRNGKey(0), padded, mask)
    out_padded = model.apply(params, padded, mask)
    out_exact = model.apply(params, jnp.asarray(feats), None)
    np.testing.assert_allclose(np.asarray(out_padded), np.asarray(out_exact),
                               rtol=1e-5, atol=1e-6)
    assert out_padded.shape == (1, 2)


def test_gated_abmil_runs():
    feats, padded, mask = bag()
    model = GatedABMIL()
    params = model.init(jax.random.PRNGKey(0), padded, mask)
    prob, a = model.apply(params, padded, mask)
    assert prob.shape == (1, 1)
    assert 0 <= float(np.asarray(prob).reshape(())) <= 1
    a = np.asarray(a)
    assert a[~np.asarray(mask)].sum() == 0  # no attention on padding


def test_dsmil_padding_invariance():
    feats, padded, mask = bag()
    model = DSMIL(num_classes=2)
    params = model.init(jax.random.PRNGKey(0), padded, mask)
    cls_p, bag_p, a_p, b_p = model.apply(params, padded, mask)
    cls_e, bag_e, a_e, b_e = model.apply(params, jnp.asarray(feats), None)
    np.testing.assert_allclose(np.asarray(bag_p), np.asarray(bag_e), rtol=1e-5, atol=1e-6)
    assert bag_p.shape == (1, 2)
    # instance scores of real rows match
    np.testing.assert_allclose(np.asarray(cls_p)[:30], np.asarray(cls_e), rtol=1e-5, atol=1e-6)


def test_kmeans_converges_on_blobs():
    rng = np.random.RandomState(0)
    blobs = np.concatenate([
        rng.randn(50, 8) + 10, rng.randn(50, 8) - 10, rng.randn(50, 8)
    ]).astype(np.float32)
    cent, assign = kmeans(jnp.asarray(blobs), 3, iters=10)
    assign = np.asarray(assign)
    # each blob is a single cluster
    for s in (slice(0, 50), slice(50, 100), slice(100, 150)):
        assert len(np.unique(assign[s])) == 1
    assert len(np.unique(assign)) == 3


def test_reduce_bag_and_mix_aug():
    rng = np.random.RandomState(1)
    feats = rng.randn(100, 8).astype(np.float32)
    protos, shifts = reduce_bag(feats, num_prototypes=4, num_shift_vectors=16)
    assert protos.shape == (4, 8)
    assert shifts.shape == (4, 16, 8)

    tgt = rng.randn(4, 8).astype(np.float32)
    out = mix_aug(feats, tgt, mode="replace", rate=1.0, rng=np.random.RandomState(0))
    assert out.shape == (100, 8)  # replace keeps the count
    # every row replaced by its closest target
    d2 = ((feats[:, None] - tgt[None]) ** 2).sum(-1)
    np.testing.assert_allclose(out, tgt[d2.argmin(1)])
    out2 = mix_aug(feats, tgt, mode="append", rate=1.0, rng=np.random.RandomState(0))
    assert out2.shape == (200, 8)  # append doubles
    out3 = mix_aug(feats, tgt, mode="cov", rate=1.0, shift=shifts,
                   rng=np.random.RandomState(0))
    assert out3.shape[0] == 200


def test_graph_transformer_shapes_and_losses():
    rng = np.random.RandomState(2)
    b, n, d = 2, 40, 32
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    adj = jnp.asarray((rng.rand(b, n, n) < 0.1).astype(np.float32))
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([30, 40])[:, None])
    model = GraphTransformer(n_class=2, in_dim=d, embed_dim=16, node_cluster_num=8)
    params = model.init(jax.random.PRNGKey(0), x, adj, mask)
    logits, aux_loss = model.apply(params, x, adj, mask)
    assert logits.shape == (2, 2)
    assert np.isfinite(float(aux_loss))
    cam = graphcam(model, params, x[:1], adj[:1], mask[:1], class_idx=0)
    assert cam.shape == (n,)
    assert np.all(np.isfinite(np.asarray(cam)))


def test_dense_mincut_pool_golden():
    # one graph, uniform assignment -> pooled X is mean-like
    x = jnp.ones((1, 4, 3))
    adj = jnp.ones((1, 4, 4)) - jnp.eye(4)
    s = jnp.zeros((1, 4, 2))  # uniform softmax -> 0.5 each
    mask = jnp.ones((1, 4), bool)
    xp, ap, mc, o = dense_mincut_pool(x, adj, s, mask)
    np.testing.assert_allclose(np.asarray(xp), np.full((1, 2, 3), 2.0), rtol=1e-6)
    assert np.isfinite(float(mc)) and np.isfinite(float(o))


def make_tree_graph(seed=0, n1=12, n2=48, d=16, cap=128, e_cap=512):
    """Thumbnail(1) + level-1(n1) + level-2(n2) tree with 4 children each."""
    rng = np.random.RandomState(seed)
    n = 1 + n1 + n2
    feats = rng.randn(n, d).astype(np.float32)
    ntype = np.array([0] + [1] * n1 + [2] * n2, np.int32)
    tree = np.zeros(n, np.int32)
    tree[1 : 1 + n1] = 0
    for i in range(n2):
        tree[1 + n1 + i] = 1 + (i % n1)
    xy = rng.rand(n, 2).astype(np.float32)
    src, dst = [], []
    for i in range(n):  # tree edges both ways + self loops
        src += [i, tree[i], i]
        dst += [tree[i], i, i]
    src, dst = np.array(src, np.int32), np.array(dst, np.int32)
    e = len(src)

    def pad(a, cap, fill=0):
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    return TreeGraph(
        feats=jnp.asarray(pad(feats, cap)),
        src=jnp.asarray(pad(src, e_cap)),
        dst=jnp.asarray(pad(dst, e_cap)),
        node_type=jnp.asarray(pad(ntype, cap)),
        tree=jnp.asarray(pad(tree, cap)),
        xy=jnp.asarray(pad(xy, cap)),
        node_mask=jnp.asarray(np.arange(cap) < n),
        edge_mask=jnp.asarray(np.arange(e_cap) < e),
    )


def test_h2mil_runs_and_is_finite():
    g = make_tree_graph()
    model = H2MIL(hidden_dim=32, n_classes=2, k1=4, k2=16)
    params = model.init(jax.random.PRNGKey(0), g)
    logits = model.apply(params, g, train=False)
    assert logits.shape == (1, 2)
    assert np.all(np.isfinite(np.asarray(logits)))
    # jit-compiles (static shapes end to end)
    jl = jax.jit(lambda p, gg: model.apply(p, gg))(params, g)
    np.testing.assert_allclose(np.asarray(jl), np.asarray(logits), rtol=1e-5)


def test_nt_xent_loss_prefers_aligned_views():
    from wsi_hgnn_tpu.models.mil import nt_xent_loss

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    aligned = float(nt_xent_loss(z, z + 0.01 * rng.randn(16, 8).astype(np.float32)))
    shuffled = float(nt_xent_loss(z, jnp.asarray(rng.permutation(np.asarray(z)))))
    assert aligned < shuffled


def test_simclr_step_decreases_loss():
    import optax
    from flax import linen as nn
    from wsi_hgnn_tpu.models.mil import make_simclr_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x.reshape(x.shape[0], -1)
            h = nn.relu(nn.Dense(32)(h))
            return nn.Dense(16)(h)

    enc = Tiny()
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), imgs)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_simclr_train_step(lambda p, x: enc.apply(p, x), tx)
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(12):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k, imgs)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_spatial_adjacency_golden():
    from wsi_hgnn_tpu.models.mil import coords_from_patch_names, spatial_adjacency

    # 2x2 grid with one missing corner
    coords = coords_from_patch_names(["0_0.jpeg", "1_0.jpeg", "0_1.jpeg"])
    src, dst = spatial_adjacency(coords)
    edges = set(zip(src.tolist(), dst.tolist()))
    # all pairs adjacent (including diagonal 1_0 <-> 0_1)
    assert (0, 1) in edges and (1, 0) in edges
    assert (0, 2) in edges and (2, 0) in edges
    assert (1, 2) in edges and (2, 1) in edges
    assert len(edges) == 6


def test_gcn_block_matches_reference_torch(monkeypatch):
    """GCNBlock at the GTNMIL Classifier's operating point (bn=1, relu=0,
    GraphTransformer.py:30-34) vs the reference torch GCNBlock loaded as
    an oracle (gcn.py is pure torch, but hard-codes .cuda() at parameter
    construction — patched to identity for the CPU oracle), in BOTH BN
    modes."""
    import importlib
    import sys
    import types

    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    ref_models = "/root/reference/baselines/GTNMIL/models"
    if not os.path.isdir(ref_models):
        _pytest.skip("reference GTNMIL not available")
    if "refgtnm" not in sys.modules:
        pkg = types.ModuleType("refgtnm")
        pkg.__path__ = [ref_models]
        sys.modules["refgtnm"] = pkg
    ref_gcn = importlib.import_module("refgtnm.gcn")

    from wsi_hgnn_tpu.models.mil.graph_transformer import GCNBlock

    rng = np.random.RandomState(3)
    b, n, din, dout = 2, 12, 8, 6
    x = rng.randn(b, n, din).astype(np.float32)
    adj = (rng.rand(b, n, n) < 0.3).astype(np.float32)
    lens = np.array([9, 12])
    mask = (np.arange(n)[None, :] < lens[:, None]).astype(np.float32)
    x = x * mask[:, :, None]

    tblock = ref_gcn.GCNBlock(din, dout, 1, 1, 1, 0.0, 0)  # bn=1, relu=0
    block = GCNBlock(dout)
    variables = block.init(jax.random.PRNGKey(0),
                           jnp.asarray(x), jnp.asarray(adj),
                           jnp.asarray(mask.astype(bool)))
    # copy OUR weights into the torch oracle (weight [din, dout] matches)
    with torch.no_grad():
        tblock.weight.copy_(torch.from_numpy(
            np.asarray(variables["params"]["weight"]["kernel"])))
        tblock.bias.copy_(torch.from_numpy(
            np.asarray(variables["params"]["weight"]["bias"])))

    tx = torch.from_numpy(x)
    tadj = torch.from_numpy(adj)
    tmask = torch.from_numpy(mask)

    # training mode: batch statistics
    tblock.train()
    want = tblock(tx, tadj, tmask).detach().numpy()
    got, upd = block.apply(
        variables, jnp.asarray(x), jnp.asarray(adj),
        jnp.asarray(mask.astype(bool)), True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    # eval mode: running averages (after the one training step above)
    tblock.eval()
    want_eval = tblock(tx, tadj, tmask).detach().numpy()
    got_eval = block.apply(
        {"params": variables["params"], "batch_stats": upd["batch_stats"]},
        jnp.asarray(x), jnp.asarray(adj), jnp.asarray(mask.astype(bool)),
        False,
    )
    np.testing.assert_allclose(np.asarray(got_eval), want_eval,
                               rtol=1e-4, atol=1e-5)


def test_dsmil_fcc_matches_reference_conv1d():
    """DSMIL's bag head is Conv1d(C, C, kernel_size=V) — every output
    logit mixes ALL class channels (dsmil.py:39,56-58)."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")

    rng = np.random.RandomState(4)
    C, V = 3, 10
    bmat = rng.randn(C, V).astype(np.float32)
    w = rng.randn(C, C, V).astype(np.float32)
    bias = rng.randn(C).astype(np.float32)

    conv = torch.nn.Conv1d(C, C, kernel_size=V)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(bias))
    want = conv(torch.from_numpy(bmat)[None]).view(-1).detach().numpy()

    got = np.einsum("ocv,cv->o", w, bmat) + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # and the module reproduces it end-to-end through its param tree
    model = DSMIL(num_classes=C)
    feats = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats)
    assert variables["params"]["b_classifier"]["fcc_kernel"].shape[:2] == (C, C)


def test_ihpool_centers_distinct_when_few_valid():
    """n_valid < k must use each valid node once as a centre instead of
    duplicating early ones and starving later ones."""
    from wsi_hgnn_tpu.models.mil.h2mil import H2MIL, build_tree_graph

    rng = np.random.RandomState(5)
    # tiny slide: 6 patches -> few level-1 blocks, k1=8 > n1
    feats = rng.randn(6, 8).astype(np.float32)
    coords = np.stack([np.arange(6) % 3, np.arange(6) // 3], 1)
    tree = build_tree_graph(feats, coords, cell=2)
    model = H2MIL(hidden_dim=8, n_classes=2, k1=8, k2=16)
    variables = model.init(jax.random.PRNGKey(0), tree)
    out = model.apply(variables, tree)
    assert np.all(np.isfinite(np.asarray(out)))
    # coords are normalised to [-1, 1] (reference main_kfold.py:62)
    xy = np.asarray(tree.xy)[np.asarray(tree.node_mask)]
    assert xy.min() >= -1.0 - 1e-6 and xy.max() <= 1.0 + 1e-6


def test_kmeans_assignment_matches_returned_centroids():
    from wsi_hgnn_tpu.models.mil.remix import kmeans

    rng = np.random.RandomState(6)
    feats = jnp.asarray(rng.randn(50, 4).astype(np.float32))
    cent, assign = kmeans(feats, 4, seed=0)
    d2 = ((np.asarray(feats)[:, None] - np.asarray(cent)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(assign), d2.argmin(1))


def test_ihpool_children_stay_in_parent_cluster():
    """The hierarchy invariant the reference guarantees by clustering each
    substructure separately (IHPool.py:162-195): every level-2 node pools
    into a cluster owned by its parent's level-1 cluster. A global-quantile
    centre selection can leave a populated parent centre-less, silently
    shipping its children across the hierarchy via the soft penalty."""
    import jax

    from wsi_hgnn_tpu.models.mil.h2mil import IHPool, build_tree_graph

    rng = np.random.RandomState(7)
    n = 48
    feats = rng.randn(n, 8).astype(np.float32)
    coords = np.stack([np.arange(n) % 8, np.arange(n) // 8], 1)
    g = build_tree_graph(feats, coords, cell=2)
    x = jnp.asarray(np.asarray(g.feats))

    pool = IHPool(k1=4, k2=8)
    variables = pool.init(jax.random.PRNGKey(0), g, x)
    (g1, _), aux = pool.apply(variables, g, x), None

    # recompute the assignment invariant from the pooled graph: every
    # level-2 output cluster's tree parent must be a level-1 cluster slot
    tree = np.asarray(g1.tree)
    ntype = np.asarray(g1.node_type)
    mask = np.asarray(g1.node_mask)
    for i in np.flatnonzero(mask & (ntype == 2)):
        p = tree[i]
        assert 1 <= p <= 4 and mask[p], (i, p)
        assert ntype[p] == 1

    # and the ORIGINAL nodes' cluster ids respect their parents: rebuild
    # via a second apply with the same params on a graph whose level-2
    # nodes all share one spatial corner — even then no child may land in
    # a cluster whose parent differs from its own parent's cluster
    coords2 = coords.copy()
    coords2[np.asarray(g.node_type)[: n] == 2] = 0 if coords2.ndim == 1 else (0, 0)
    g2 = build_tree_graph(feats, coords, cell=3)
    x2 = jnp.asarray(np.asarray(g2.feats))
    v2 = pool.init(jax.random.PRNGKey(1), g2, x2)
    g2p, _ = pool.apply(v2, g2, x2)
    t2, nt2, m2 = (np.asarray(g2p.tree), np.asarray(g2p.node_type),
                   np.asarray(g2p.node_mask))
    for i in np.flatnonzero(m2 & (nt2 == 2)):
        assert m2[t2[i]] and nt2[t2[i]] == 1
