"""Lattice TRAINING path: k-regular stored graphs packed to [B, N, k]
(data/lattice_loader.py), the lattice augmentation transform, trainer
auto-selection, and checkpoint interop with the TypedGraph evaluator.

The constructor's graphs are always k-regular (each node gets radius-1
KNN out-edges, graph_constructor.py:267-273, and hetero graphs carry no
self-loops), so the flagship HEAT training runs entirely on the lattice
fast path; irregular datasets must fall back to the TypedGraph step."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu import models
from wsi_hgnn_tpu.config import loads_config
from wsi_hgnn_tpu.data import save_graph_npz
from wsi_hgnn_tpu.data.datasets import GraphDataset
from wsi_hgnn_tpu.data.lattice_loader import (
    LatticeLoader,
    pack_slide,
    probe_lattice,
    slide_regular_k,
)
from wsi_hgnn_tpu.data.loader import GraphLoader, dataset_capacities
from wsi_hgnn_tpu.graph.build import build_graph
from wsi_hgnn_tpu.models.lattice import (
    HEATNet2Lattice,
    lattice_train_transform,
)
from wsi_hgnn_tpu.train import GNNTrainer, HomoGraphEvaluator

D, RADIUS = 16, 4  # k = 3


def make_regular_cohort(tmpdir, n_slides=12, seed=0):
    """Constructor-shaped cohort: per slide, class-shifted features ->
    on-device KNN/Pearson build -> het npz (k-regular by construction)."""
    rng = np.random.RandomState(seed)
    paths, normals = [], []
    for i in range(n_slides):
        label = i % 2
        n = rng.randint(20, 40)
        feat = rng.randn(n, D).astype(np.float32) + label * 1.5
        ntypes = rng.randint(0, 6, n).astype(np.int32)
        het, _ = build_graph(feat, ntypes, radius=RADIUS, n_node_types=6)
        ne = int(np.asarray(het.node_mask).sum())
        ee = int(np.asarray(het.edge_mask).sum())
        barcode = f"TCGA-{i:02d}-0000-01Z-00-DX1"
        p = os.path.join(str(tmpdir), f"{barcode}.npz")
        save_graph_npz(
            p, np.asarray(het.feat)[:ne],
            np.asarray(het.src)[:ee], np.asarray(het.dst)[:ee],
            node_type=np.asarray(het.node_type)[:ne],
            esign=np.asarray(het.esign)[:ee],
            sim=np.asarray(het.sim)[:ee],
            n_node_types=6, is_hetero=True,
        )
        paths.append(p)
        if label == 0:
            normals.append(barcode[:16])
    train_list = os.path.join(str(tmpdir), "train.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(paths))
    normal_list = os.path.join(str(tmpdir), "normal.txt")
    with open(normal_list, "w") as f:
        f.write("\n".join(normals))
    return train_list, normal_list


def make_irregular_cohort(tmpdir, n_slides=8, seed=3, drop=0.15):
    """HNSW-import-shaped cohort: constructor graphs with a random ~15% of
    edges REMOVED per slide (the shape imported reference graphs take when
    HNSW returns fewer than topn neighbours, graph_constructor.py:267-273).
    Out-degrees vary from 0..k; the masked lattice must still serve it."""
    rng = np.random.RandomState(seed)
    paths, normals = [], []
    for i in range(n_slides):
        label = i % 2
        n = rng.randint(20, 40)
        feat = rng.randn(n, D).astype(np.float32) + label * 1.5
        ntypes = rng.randint(0, 6, n).astype(np.int32)
        het, _ = build_graph(feat, ntypes, radius=RADIUS, n_node_types=6)
        ne = int(np.asarray(het.node_mask).sum())
        ee = int(np.asarray(het.edge_mask).sum())
        keep = rng.rand(ee) > drop
        keep[0] = True  # never empty
        src = np.asarray(het.src)[:ee][keep]
        dst = np.asarray(het.dst)[:ee][keep]
        barcode = f"TCGA-{i:02d}-0000-01Z-00-DX1"
        p = os.path.join(str(tmpdir), f"{barcode}.npz")
        save_graph_npz(
            p, np.asarray(het.feat)[:ne], src, dst,
            node_type=np.asarray(het.node_type)[:ne],
            esign=np.asarray(het.esign)[:ee][keep],
            sim=np.asarray(het.sim)[:ee][keep],
            n_node_types=6, is_hetero=True,
        )
        paths.append(p)
        if label == 0:
            normals.append(barcode[:16])
    train_list = os.path.join(str(tmpdir), "train.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(paths))
    normal_list = os.path.join(str(tmpdir), "normal.txt")
    with open(normal_list, "w") as f:
        f.write("\n".join(normals))
    return train_list, normal_list


def test_probe_and_pack_roundtrip(tmp_path):
    train_list, normal_list = make_regular_cohort(tmp_path)
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    probe = probe_lattice(ds)
    assert probe is not None
    k, cap_n = probe
    assert k == RADIUS - 1

    g, _ = ds[0]
    feats, ntypes, mask, idx, sim, esign, emask = pack_slide(g, k, cap_n)
    n = int(np.asarray(g.node_mask).sum())
    assert mask[:n].all() and not mask[n:].any()
    assert emask[:n].all() and not emask[n:].any()
    # every packed edge exists in the typed edge set with matching sim
    e = n * k
    typed = {(int(s), int(d)): float(v) for s, d, v in
             zip(np.asarray(g.src)[:e], np.asarray(g.dst)[:e],
                 np.asarray(g.sim)[:e])}
    for i in range(n):
        for j in range(k):
            assert (i, int(idx[i, j])) in typed
            assert typed[(i, int(idx[i, j]))] == pytest.approx(sim[i, j])


def _shared_batches(tmp_path, batch=2):
    """The same 2 slides as a sorted TypedGraph batch and a lattice batch."""
    train_list, normal_list = make_regular_cohort(tmp_path)
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    k, cap_n = probe_lattice(ds)
    cap = dataset_capacities(ds, batch)
    tl = GraphLoader(ds, batch, shuffle=False, node_capacity=cap[0],
                     edge_capacity=cap[1], prefetch=0)
    ll = LatticeLoader(ds, batch, k, cap_n, shuffle=False, prefetch=0)
    gt, yt, wt = tl._make_batch(list(range(batch)))
    gl, yl, wl = ll._make_batch(list(range(batch)))
    np.testing.assert_array_equal(yt, yl)
    return gt, gl, yt, wt


def test_packed_forward_matches_typed(tmp_path):
    gt, gl, _, _ = _shared_batches(tmp_path)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=2, n_layers=2, n_heads=2,
              n_node_types=6, dropout=0.0)
    lat = HEATNet2Lattice(**kw)
    typ = models.HEATNet2(**kw)
    variables = lat.init(jax.random.PRNGKey(0), gl)
    out_l = lat.apply(variables, gl, train=False)
    out_t = typ.apply(variables, gt, train=False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_t),
                               atol=2e-4, rtol=1e-4)


def test_packed_gradients_match_typed(tmp_path):
    gt, gl, labels, weights = _shared_batches(tmp_path)
    kw = dict(in_dim=D, hidden_dim=32, out_dim=2, n_layers=2, n_heads=2,
              n_node_types=6, dropout=0.0)
    lat = HEATNet2Lattice(**kw)
    typ = models.HEATNet2(**kw)
    variables = lat.init(jax.random.PRNGKey(1), gl)
    y = jnp.asarray(labels)

    def loss_of(apply_fn, g):
        def f(params):
            logits = apply_fn({"params": params}, g, train=False)
            lp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(lp, y[:, None], 1).mean()
        return f

    l_l, g_l = jax.value_and_grad(loss_of(lat.apply, gl))(variables["params"])
    l_t, g_t = jax.value_and_grad(loss_of(typ.apply, gt))(variables["params"])
    assert float(l_l) == pytest.approx(float(l_t), abs=2e-5)
    flat_l = jax.tree.leaves(g_l)
    flat_t = jax.tree.leaves(g_t)
    for a, b in zip(flat_l, flat_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_lattice_transform_semantics(tmp_path):
    _, gl, _, _ = _shared_batches(tmp_path)
    out = lattice_train_transform(gl, jax.random.PRNGKey(7), p=0.5)
    mask_b, emask_b = np.asarray(gl.mask), np.asarray(gl.emask)
    mask_a, emask_a = np.asarray(out.mask), np.asarray(out.emask)
    # masks only ever clear
    assert not np.any(mask_a & ~mask_b)
    assert not np.any(emask_a & ~emask_b)
    # ~half the real nodes survive
    frac = mask_a.sum() / mask_b.sum()
    assert 0.25 < frac < 0.75
    # no surviving edge touches a dropped endpoint
    assert not np.any(emask_a & ~mask_a[:, :, None])
    dst_mask = np.take_along_axis(
        np.repeat(mask_a[:, None, :], mask_a.shape[1], 1),
        np.asarray(out.idx), axis=2,
    )
    assert not np.any(emask_a & ~dst_mask)
    # feature columns are zeroed wholesale, others preserved
    fb, fa = np.asarray(gl.feats), np.asarray(out.feats)
    col_zero = np.all(fa == 0, axis=(0, 1))
    col_keep = np.all(fa == fb, axis=(0, 1))
    assert np.all(col_zero | col_keep)
    assert 0 < col_zero.sum() < fa.shape[-1]


CFG_TMPL = """
name: LatticeRun
train_type: gnn
eval_type: homo-graph
gpu_ids: '0'
datasets:
  dataset: "BRCA"
  task: "cancer classification"
  train_path: "{train}"
  eval_path: "{train}"
  valid_path: "{train}"
  normal_path: "{normal}"
  num_workers: 0
checkpoint:
  path: "{ckpt}"
  save_checkpoint_freq: 5
optimizer:
  opt_method: "ADAM"
  lr: 0.003
  weight_decay: 0.0005
GNN:
  name: "{gnn}"
  n_node_types: 6
  num_layers: 2
  in_dim: 16
  hidden_dim: 32
  out_dim: 2
  n_heads: 2
  feat_drop: 0.1
  graph_pooling_type: mean
train:
  num_epochs: {epochs}
  batch_size: 4
  loss: "CE"
eval:
  explainer_name: GemExplainer
"""


def test_irregular_probe_and_pack(tmp_path):
    """Variable out-degrees pack into the masked lattice: the probe returns
    the dataset-max k, and pack_slide leaves the short rows' tail slots
    emask=False while every real edge lands at its (src, slot)."""
    train_list, normal_list = make_irregular_cohort(tmp_path)
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    probe = probe_lattice(ds)
    assert probe is not None, "HNSW-shaped irregularity must stay on the fast path"
    k, cap_n = probe
    assert k == RADIUS - 1

    g, _ = ds[0]
    n = int(np.asarray(g.node_mask).sum())
    e = int(np.asarray(g.edge_mask).sum())
    assert e < n * k, "fixture must actually be irregular"
    assert slide_regular_k(g) is None  # irregular, yet lattice-packable
    feats, ntypes, mask, idx, sim, esign, emask = pack_slide(g, k, cap_n)
    deg = np.bincount(np.asarray(g.src)[:e], minlength=cap_n)
    np.testing.assert_array_equal(emask.sum(1), deg)
    assert emask.sum() == e
    typed = {(int(s), int(d)): float(v) for s, d, v in
             zip(np.asarray(g.src)[:e], np.asarray(g.dst)[:e],
                 np.asarray(g.sim)[:e])}
    for i in range(n):
        for j in range(k):
            if emask[i, j]:
                assert (i, int(idx[i, j])) in typed
                assert typed[(i, int(idx[i, j]))] == pytest.approx(sim[i, j])


def test_irregular_packed_forward_and_grads_match_typed(tmp_path):
    """The masked-padding lattice must be numerically indistinguishable
    from the TypedGraph path on an irregular batch — forward AND gradients
    (padding slots must not leak into the softmax, the aggregation, or
    relation presence)."""
    train_list, normal_list = make_irregular_cohort(tmp_path)
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    batch = 2
    k, cap_n = probe_lattice(ds)
    cap = dataset_capacities(ds, batch)
    tl = GraphLoader(ds, batch, shuffle=False, node_capacity=cap[0],
                     edge_capacity=cap[1], prefetch=0)
    ll = LatticeLoader(ds, batch, k, cap_n, shuffle=False, prefetch=0)
    gt, yt, _ = tl._make_batch(list(range(batch)))
    gl, yl, _ = ll._make_batch(list(range(batch)))
    np.testing.assert_array_equal(yt, yl)

    kw = dict(in_dim=D, hidden_dim=32, out_dim=2, n_layers=2, n_heads=2,
              n_node_types=6, dropout=0.0)
    lat = HEATNet2Lattice(**kw)
    typ = models.HEATNet2(**kw)
    variables = lat.init(jax.random.PRNGKey(2), gl)
    out_l = lat.apply(variables, gl, train=False)
    out_t = typ.apply(variables, gt, train=False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_t),
                               atol=2e-4, rtol=1e-4)

    y = jnp.asarray(yt)

    def loss_of(apply_fn, g):
        def f(params):
            logits = apply_fn({"params": params}, g, train=False)
            lp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(lp, y[:, None], 1).mean()
        return f

    l_l, g_l = jax.value_and_grad(loss_of(lat.apply, gl))(variables["params"])
    l_t, g_t = jax.value_and_grad(loss_of(typ.apply, gt))(variables["params"])
    assert float(l_l) == pytest.approx(float(l_t), abs=2e-5)
    for a, b in zip(jax.tree.leaves(g_l), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_trainer_auto_selects_lattice_on_irregular_import(tmp_path):
    """An HNSW-import-shaped irregular cohort trains on the lattice fast
    path end-to-end, and both eval paths agree on the trained checkpoint."""
    train_list, normal_list = make_irregular_cohort(tmp_path)
    ckpt = str(tmp_path / "ckpt_irr_lat")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="HEAT2", epochs=8))
    trainer = GNNTrainer(cfg, seed=0)
    assert trainer._lattice, "irregular import must auto-select the lattice path"
    stats = trainer.train(log_every=0)
    assert np.isfinite(stats["Train Loss: "])
    ev = HomoGraphEvaluator(cfg, verbose=False)
    assert ev._lattice_entry() is not None
    acc, _, _, _, auc = ev.eval()
    import copy

    cfg_t = copy.deepcopy(cfg)
    cfg_t["train"]["lattice"] = "off"
    ev_t = HomoGraphEvaluator(cfg_t, verbose=False)
    assert ev_t._lattice_entry() is None
    acc_t, _, _, _, auc_t = ev_t.eval()
    assert acc_t == pytest.approx(acc, abs=1e-4)
    assert auc_t == pytest.approx(auc, abs=1e-3)


def test_probe_rejects_hub_skewed_padding(tmp_path):
    """One hub node with out-degree >> mean blows the padding ratio: the
    probe must fall back to the TypedGraph path rather than train on
    mostly-padding lattices (train.lattice_pad_ratio, default 1.5)."""
    rng = np.random.RandomState(5)
    paths, normals = [], []
    for i in range(4):
        label = i % 2
        n = 30
        feat = rng.randn(n, D).astype(np.float32)
        # sparse ring (out-degree 1) + one hub with out-degree 15
        src = np.concatenate([np.arange(n), np.zeros(15, int)]).astype(np.int64)
        dst = np.concatenate(
            [(np.arange(n) + 1) % n, np.arange(2, 17)]).astype(np.int64)
        barcode = f"TCGA-{i:02d}-0000-01Z-00-DX1"
        p = os.path.join(str(tmp_path), f"{barcode}.npz")
        save_graph_npz(
            p, feat, src, dst, node_type=rng.randint(0, 6, n),
            esign=rng.randint(0, 2, len(src)),
            sim=rng.randn(len(src)).astype(np.float32),
            n_node_types=6, is_hetero=True,
        )
        paths.append(p)
        if label == 0:
            normals.append(barcode[:16])
    train_list = os.path.join(str(tmp_path), "train.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(paths))
    normal_list = os.path.join(str(tmp_path), "normal.txt")
    with open(normal_list, "w") as f:
        f.write("\n".join(normals))
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    # ratio = 30*16/45 = 10.7 >> 1.5 -> reject; a permissive ratio accepts
    assert probe_lattice(ds) is None
    assert probe_lattice(ds, max_pad_ratio=12.0) is not None


def test_trainer_auto_selects_lattice_and_interops(tmp_path):
    train_list, normal_list = make_regular_cohort(tmp_path)
    ckpt = str(tmp_path / "ckpt_lat")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="HEAT2", epochs=25))
    trainer = GNNTrainer(cfg, seed=0)
    assert trainer._lattice, "k-regular cohort must auto-select the lattice path"
    stats = trainer.train(log_every=0)
    assert stats["Testing Accuracy"] >= 0.9
    # the evaluator restores the lattice-trained checkpoint; its own
    # lattice auto-selection must reproduce the trainer's metrics ...
    ev = HomoGraphEvaluator(cfg, verbose=False)
    assert ev._lattice_entry() is not None
    acc, f1, prec, rec, auc = ev.eval()
    assert acc == pytest.approx(stats["Testing Accuracy"], abs=1e-4)
    assert auc == pytest.approx(stats["Testing AUC"], abs=1e-3)
    # ... and so must the TypedGraph path (identical param tree, exact
    # checkpoint interop; train.lattice: off forces it)
    import copy

    cfg_t = copy.deepcopy(cfg)
    cfg_t["train"]["lattice"] = "off"
    ev_t = HomoGraphEvaluator(cfg_t, verbose=False)
    assert ev_t._lattice_entry() is None
    acc_t, _, _, _, auc_t = ev_t.eval()
    assert acc_t == pytest.approx(acc, abs=1e-4)
    assert auc_t == pytest.approx(auc, abs=1e-3)


def test_trainer_falls_back_on_irregular_dataset(tmp_path):
    from test_train_e2e import make_synthetic_cohort

    train_list, normal_list = make_synthetic_cohort(tmp_path, hetero=True)
    ckpt = str(tmp_path / "ckpt_irreg")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="HEAT2", epochs=1))
    trainer = GNNTrainer(cfg, seed=0)
    assert not trainer._lattice
    stats = trainer.train(log_every=0)
    assert np.isfinite(stats["Train Loss: "])


def test_lattice_off_switch(tmp_path):
    train_list, normal_list = make_regular_cohort(tmp_path)
    ckpt = str(tmp_path / "ckpt_off")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="HEAT2", epochs=1))
    cfg["train"]["lattice"] = "off"
    trainer = GNNTrainer(cfg, seed=0)
    assert not trainer._lattice


def test_irregular_slide_detected():
    rng = np.random.RandomState(0)
    feat = rng.randn(10, D).astype(np.float32)
    from wsi_hgnn_tpu.graph import from_arrays

    g = from_arrays(feat, np.array([0, 0, 1]), np.array([1, 2, 0]),
                    n_node_types=6)
    assert slide_regular_k(g) is None


def test_lattice_trainer_resume(tmp_path):
    """Resume on the lattice path restores params + optimizer + PRNG and
    continues at the checkpointed epoch."""
    train_list, normal_list = make_regular_cohort(tmp_path)
    ckpt = str(tmp_path / "ckpt_lat_resume")
    cfg = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                       ckpt=ckpt, gnn="HEAT2", epochs=3))
    t1 = GNNTrainer(cfg, seed=0)
    assert t1._lattice
    t1.train(log_every=0)
    assert t1.checkpoint_manager.version == 3

    cfg2 = loads_config(CFG_TMPL.format(train=train_list, normal=normal_list,
                                        ckpt=ckpt, gnn="HEAT2", epochs=5))
    t2 = GNNTrainer(cfg2, seed=0)
    assert t2._lattice
    t2.train(log_every=0)
    assert t2.start_epoch == 3
    assert t2.checkpoint_manager.version == 5
    lines = (tmp_path / "ckpt_lat_resume/training_stats.json").read_text().strip().split("\n")
    assert len(lines) == 5


def test_lattice_twin_gating():
    from wsi_hgnn_tpu.config import parse_lattice_twin

    base = {"name": "HEAT2", "n_node_types": 6, "num_layers": 2, "in_dim": 8,
            "hidden_dim": 16, "out_dim": 2, "n_heads": 2, "feat_drop": 0.0,
            "graph_pooling_type": "sum"}
    assert parse_lattice_twin(base) is not None
    # unsupported pooling / models must stay on the TypedGraph path rather
    # than silently changing semantics
    assert parse_lattice_twin({**base, "graph_pooling_type": "att"}) is None
    assert parse_lattice_twin({**base, "name": "HGT"}) is None
    # missing pooling key defaults to 'mean' (the typed HEAT constructors'
    # flax default) instead of raising
    no_pool = {k: v for k, v in base.items() if k != "graph_pooling_type"}
    twin = parse_lattice_twin(no_pool)
    assert twin is not None and twin.graph_pooling_type == "mean"
    # the typed_impl extension key reaches the twin (default 'ragged',
    # the measured TPU winner — PERF_NOTES round-3 cont.)
    assert twin.typed_impl == "ragged"
    oh = parse_lattice_twin({**base, "typed_impl": "onehot"})
    assert oh is not None and oh.typed_impl == "onehot"


def test_lattice_batch_for_budget():
    from wsi_hgnn_tpu.data.lattice_loader import lattice_batch_for_budget

    # per batch element: 256*8 * 256 * 4B = 2 MiB -> 11 MiB budget fits 5
    assert lattice_batch_for_budget(8, 256, budget=11 << 20) == 5
    # plenty of budget clamps at max_batch
    assert lattice_batch_for_budget(8, 256, budget=2 << 30) == 8
    # one slide alone over budget -> None (fall back to the typed path)
    assert lattice_batch_for_budget(8, 8192, budget=100 << 20) is None


def test_loader_propagates_worker_errors():
    """A failure while packing a batch must raise in the consumer — a
    swallowed exception would silently end the epoch early and train on a
    truncated subset."""
    from wsi_hgnn_tpu.data.loader import prefetched_batches

    def boom(idx):
        if idx == 2:
            raise ValueError("corrupt slide")
        return idx * 10

    # prefetch path
    got = []
    with pytest.raises(ValueError, match="corrupt slide"):
        for x in prefetched_batches(range(5), boom, prefetch=2):
            got.append(x)
    assert got == [0, 10]
    # synchronous path raises too
    with pytest.raises(ValueError, match="corrupt slide"):
        list(prefetched_batches(range(5), boom, prefetch=0))


def test_slide_regular_k_rejects_out_of_range_dst():
    """A graph whose dst points outside the real nodes must NOT probe as
    k-regular (on device it would silently clamp in gathers / vanish from
    the one-hot aggregation) — it falls back to the TypedGraph path."""
    from wsi_hgnn_tpu.graph import from_arrays

    n, k = 6, 2
    rng = np.random.RandomState(0)
    feat = rng.randn(n, D).astype(np.float32)
    src = np.repeat(np.arange(n), k).astype(np.int32)
    dst = ((src + 1) % n).astype(np.int32)
    dst[3] = n  # out of range
    g = from_arrays(feat, src, dst, node_type=np.zeros(n, np.int32),
                    n_node_types=6)
    assert slide_regular_k(g) is None
    dst[3] = 1
    g = from_arrays(feat, src, dst, node_type=np.zeros(n, np.int32),
                    n_node_types=6)
    assert slide_regular_k(g) == k


def test_probe_edge_cases_fall_back_not_crash():
    """Negative src must probe None (bincount would crash), and a k=0
    budget query must return None (radius-1 serving), not divide by zero."""
    from wsi_hgnn_tpu.data.lattice_loader import lattice_batch_for_budget
    from wsi_hgnn_tpu.graph import from_arrays

    n, k = 6, 2
    rng = np.random.RandomState(1)
    feat = rng.randn(n, D).astype(np.float32)
    src = np.repeat(np.arange(n), k).astype(np.int32)
    dst = ((src + 1) % n).astype(np.int32)
    src[0] = -1
    g = from_arrays(feat, src, dst, node_type=np.zeros(n, np.int32),
                    n_node_types=6)
    assert slide_regular_k(g) is None

    assert lattice_batch_for_budget(0, 256) is None


def test_stacked_hetero_eval_matches_per_slide_loop(tmp_path):
    """The stacked (vmapped per-slide) TypedGraph eval path must equal a
    manual one-slide-at-a-time loop — the reference's eval semantics
    (eval_homo_graph.py:75-84) — including slides missing node types."""
    from wsi_hgnn_tpu.train.evaluator import (
        make_eval_loader,
        make_stacked_eval_fn,
    )

    train_list, normal_list = make_regular_cohort(tmp_path, n_slides=5)
    ds = GraphDataset(train_list, normal_list, "BRCA", "train")
    model = models.HGT(in_dim=D, hidden_dim=16, out_dim=2, n_layers=2,
                       n_heads=2, n_node_types=6)
    g0, _ = ds[0]
    variables = model.init(jax.random.PRNGKey(0), g0)

    loader = make_eval_loader(ds, batch_size=3, stacked=True)
    fwd = make_stacked_eval_fn(model, is_hetero=True)
    got = []
    for gb, lb, w in loader:
        p = np.asarray(fwd(variables, gb))
        got.append(p[w > 0])
    got = np.concatenate(got)

    want = []
    for i in range(len(ds)):
        g, _ = ds[i]
        logits = model.apply(variables, g, train=False)
        want.append(np.asarray(jax.nn.softmax(logits))[0])
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-4, atol=1e-5)


def test_prefetch_worker_exits_when_consumer_abandons():
    """Breaking out of a loader loop mid-epoch must release the prefetch
    worker (it would otherwise block forever on the full queue, pinning
    packed batches)."""
    import threading
    import time

    from wsi_hgnn_tpu.data.loader import prefetched_batches

    before = threading.active_count()
    it = prefetched_batches(range(50), lambda i: i, prefetch=1)
    assert next(it) == 0
    it.close()  # consumer abandons (break / islice semantics)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
