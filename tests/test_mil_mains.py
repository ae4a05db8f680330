"""RAConv golden test vs dense NumPy + train_mil.py gtn/h2mil k-fold mains
on synthetic bags (VERDICT.md round-1 items 5)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu.models.mil import RAConvLayer, TreeGraph
from wsi_hgnn_tpu.models.mil.h2mil import build_tree_graph


def leaky(x, s=0.2):
    return np.where(x > 0, x, s * x)


def dense_reference_raconv(x, edges, node_type, params, heads, c):
    """Independent dense NumPy RAConv
    (/root/reference/baselines/H2MIL/code/RAConv.py:24-185): node-level
    attention softmaxed per (dst, src-resolution) group times a
    resolution-level attention over per-group mean aggregates."""
    n, d = x.shape
    W = np.asarray(params["lin_l"]["kernel"], np.float64)
    Wt = np.asarray(params["t_lin_l"]["kernel"], np.float64)
    att_l = np.asarray(params["att_l"], np.float64)[0]   # [H, C]
    att_r = np.asarray(params["att_r"], np.float64)[0]
    t_att_l = np.asarray(params["t_att_l"], np.float64)[0]
    t_att_r = np.asarray(params["t_att_r"], np.float64)[0]
    bias = np.asarray(params["bias"], np.float64)

    xl = (x @ W).reshape(n, heads, c)
    alpha_l = (xl * att_l).sum(-1)  # [N, H]
    alpha_r = (xl * att_r).sum(-1)

    groups = {}
    for (s, t) in edges:
        g = t * 3 + int(node_type[s])
        groups.setdefault(g, []).append((s, t))

    # resolution-level attention over present groups, softmaxed per dst
    t_alpha = {}
    by_dst = {}
    for g in groups:
        by_dst.setdefault(g // 3, []).append(g)
    for dstn, gs in by_dst.items():
        logits = []
        for g in gs:
            t_x = np.mean([x[s] for (s, _) in groups[g]], axis=0)
            tl = (t_x @ Wt).reshape(heads, c)
            td = (x[dstn] @ Wt).reshape(heads, c)
            logits.append(leaky((tl * t_att_l).sum(-1) + (td * t_att_r).sum(-1)))
        logits = np.stack(logits)  # [G, H]
        e = np.exp(logits - logits.max(0))
        sm = e / e.sum(0)
        for g, v in zip(gs, sm):
            t_alpha[g] = v

    # node-level attention softmaxed per group
    out = np.zeros((n, heads, c))
    for g, es in groups.items():
        logits = np.stack([leaky(alpha_l[s] + alpha_r[t]) for (s, t) in es])
        e = np.exp(logits - logits.max(0))
        sm = e / e.sum(0)  # [E_g, H]
        for (s, t), a in zip(es, sm):
            out[t] += xl[s] * (a * t_alpha[g])[:, None]
    return out.reshape(n, heads * c) + bias


def test_raconv_matches_dense_numpy():
    rng = np.random.RandomState(0)
    n, d, h, c = 10, 6, 2, 4
    x = rng.randn(n, d).astype(np.float32)
    node_type = rng.randint(0, 3, n).astype(np.int32)
    edges = set()
    while len(edges) < 24:
        s, t = rng.randint(0, n, 2)
        if s != t:
            edges.add((int(s), int(t)))
    edges = sorted(edges)
    src = np.asarray([e[0] for e in edges], np.int32)
    dst = np.asarray([e[1] for e in edges], np.int32)

    cap_n, cap_e = 16, 32
    def pad(a, cap):
        o = np.zeros((cap,) + a.shape[1:], a.dtype)
        o[: len(a)] = a
        return o
    g = TreeGraph(
        feats=pad(x, cap_n), src=pad(src, cap_e), dst=pad(dst, cap_e),
        node_type=pad(node_type, cap_n), tree=np.zeros(cap_n, np.int32),
        xy=np.zeros((cap_n, 2), np.float32),
        node_mask=np.arange(cap_n) < n, edge_mask=np.arange(cap_e) < len(edges),
    )
    layer = RAConvLayer(features=c, heads=h)
    params = layer.init(jax.random.PRNGKey(1), g, jnp.asarray(g.feats))["params"]
    out = layer.apply({"params": params}, g, jnp.asarray(g.feats))

    ref = dense_reference_raconv(
        np.asarray(x, np.float64), edges, node_type,
        jax.tree.map(np.asarray, params), h, c,
    )
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-5)


def test_build_tree_graph_structure():
    rng = np.random.RandomState(1)
    n, d = 20, 8
    feats = rng.randn(n, d).astype(np.float32)
    xy = np.stack([np.arange(n) % 5, np.arange(n) // 5], 1)
    t = build_tree_graph(feats, xy, cell=2)
    n_real = int(t.node_mask.sum())
    types = np.asarray(t.node_type)[:n_real]
    assert types[0] == 0 and (types == 2).sum() == n
    n1 = (types == 1).sum()
    assert n1 >= 1
    # every patch's parent is a level-1 node; every level-1's parent is root
    tree = np.asarray(t.tree)[:n_real]
    patch_ids = np.where(types == 2)[0]
    assert np.all(types[tree[patch_ids]] == 1)
    assert np.all(tree[np.where(types == 1)[0]] == 0)
    # features of root = mean of patches
    np.testing.assert_allclose(np.asarray(t.feats)[0], feats.mean(0), rtol=1e-5)


def _write_synthetic_bags(tmpdir, n_bags=16, d=12, with_xy=True, seed=0):
    """Direction-separable classes (GCNBlock L2-normalises node embeddings,
    so a pure magnitude shift would be erased): class 1 shifts only the
    first half of the feature dims."""
    rng = np.random.RandomState(seed)
    pattern = np.zeros(d, np.float32)
    pattern[: d // 2] = 3.0
    labels_path = os.path.join(str(tmpdir), "labels.csv")
    rows = []
    for i in range(n_bags):
        label = i % 2
        n = rng.randint(12, 25)
        feats = rng.randn(n, d).astype(np.float32) + label * pattern
        xy = np.stack([np.arange(n) % 5, np.arange(n) // 5], 1)
        name = f"slide_{i:02d}"
        if with_xy:
            np.savez(os.path.join(str(tmpdir), name + ".npz"), feat=feats, xy=xy)
        else:
            np.save(os.path.join(str(tmpdir), name + ".npy"), feats)
        rows.append(f"{name},{label}")
    with open(labels_path, "w") as f:
        f.write("\n".join(rows))
    return labels_path


@pytest.mark.parametrize("model", ["gtn", "h2mil"])
def test_train_mil_graph_mains(tmp_path, model, capsys):
    import train_mil

    labels = _write_synthetic_bags(tmp_path)
    out = train_mil.main([
        "--model", model, "--feats-dir", str(tmp_path), "--labels", labels,
        "--folds", "2", "--epochs", "8", "--lr", "1e-3",
        "--hidden", "16", "--clusters", "8", "--k1", "4", "--k2", "8",
    ])
    assert set(out) >= {"acc_mean", "auc_mean", "f1_mean"}
    assert np.isfinite(out["acc_mean"]) and np.isfinite(out["auc_mean"])
    # separable synthetic classes: expect well above chance
    assert out["auc_mean"] > 0.7, out


def test_gtn_save_and_vis_graphcam(tmp_path):
    """--save-dir persists fold params; tools/vis_graphcam.py renders the
    reference's per-class GraphCAM (vis_graphcam.py:71-101 semantics)."""
    import train_mil
    from tools import vis_graphcam

    labels = _write_synthetic_bags(tmp_path)
    save_dir = str(tmp_path / "runs")
    train_mil.main([
        "--model", "gtn", "--feats-dir", str(tmp_path), "--labels", labels,
        "--folds", "2", "--epochs", "2", "--lr", "1e-3",
        "--hidden", "16", "--clusters", "8", "--save-dir", save_dir,
    ])
    ckpt = os.path.join(save_dir, "gtn_fold0.pkl")
    assert os.path.exists(ckpt) and os.path.exists(
        os.path.join(save_dir, "gtn_fold1.pkl"))

    bag = sorted(p for p in os.listdir(str(tmp_path)) if p.endswith(".npz"))[0]
    out = str(tmp_path / "cam")
    vis_graphcam.main([
        "--bag", os.path.join(str(tmp_path), bag), "--params", ckpt,
        "--out", out,
    ])
    with np.load(out + ".npz") as z:
        cams, probs = z["cam"], z["probs"]
    assert cams.shape[0] == 2 and np.all(np.isfinite(cams))
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)


# --------------------------------------------------------------------------
# Loss / schedule fidelity (round-2 verdict weak #3/#4): the exact forms the
# reference mains train with, golden-tested against torch where available
# --------------------------------------------------------------------------

def test_mil_reference_loss_matches_torch_bce():
    """dsmil loss = 0.5*BCEWithLogits(bag) + 0.5*BCEWithLogits(max-instance)
    on one-hot labels (train_remix_k-fold.py:141-145, criterion :300);
    abmil = BCEWithLogits(bag)."""
    torch = pytest.importorskip("torch")
    import train_mil

    rng = np.random.RandomState(0)
    bag = rng.randn(1, 3).astype(np.float32)
    mx = rng.randn(1, 3).astype(np.float32)
    onehot = np.zeros((1, 3), np.float32)
    onehot[0, 1] = 1.0

    crit = torch.nn.BCEWithLogitsLoss()
    expect_dsmil = (
        0.5 * crit(torch.tensor(bag), torch.tensor(onehot))
        + 0.5 * crit(torch.tensor(mx), torch.tensor(onehot))
    ).item()
    expect_abmil = crit(torch.tensor(bag), torch.tensor(onehot)).item()

    got_dsmil = float(train_mil.mil_reference_loss(
        "dsmil", jnp.asarray(bag), jnp.asarray(mx), jnp.asarray(onehot)))
    got_abmil = float(train_mil.mil_reference_loss(
        "abmil", jnp.asarray(bag), jnp.asarray(mx), jnp.asarray(onehot)))
    assert got_dsmil == pytest.approx(expect_dsmil, rel=1e-5)
    assert got_abmil == pytest.approx(expect_abmil, rel=1e-5)


def test_cosine_epoch_schedule_matches_torch():
    """LR must follow torch CosineAnnealingLR(num_epochs, 5e-6) stepped once
    per pass over the fold's train split — constant within an epoch, cosine
    across epochs with denominator = num_epochs."""
    torch = pytest.importorskip("torch")
    import train_mil

    lr0, epochs, steps = 2e-4, 10, 7
    lr_of = train_mil.cosine_epoch_schedule(lr0, epochs, steps)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, 5e-6)
    for epoch in range(epochs):
        expect = opt.param_groups[0]["lr"]
        # constant within the epoch, including mid-epoch update counts
        for count in (epoch * steps, epoch * steps + steps // 2,
                      epoch * steps + steps - 1):
            assert float(lr_of(count)) == pytest.approx(expect, rel=1e-4)
        sched.step()


# --------------------------------------------------------------------- #
# real two-magnification nested bags (github_pretreat.py pyramid contract)
# --------------------------------------------------------------------- #
def _write_nested_bag(bag_dir, low, children, seed=0, thumb=False, px=24):
    """Write a tiler-layout nested bag: low tiles `{x}_{y}.jpeg` at the
    root, each (x, y) in `children` gets a `{x}_{y}/` dir of high tiles
    at the 2x2 child coords. Returns the per-low child coord lists."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    os.makedirs(bag_dir, exist_ok=True)

    def save(path):
        Image.fromarray(
            rng.randint(0, 255, (px, px, 3)).astype(np.uint8)
        ).save(path)

    child_map = {}
    for (x, y) in low:
        save(os.path.join(bag_dir, f"{x}_{y}.jpeg"))
        if (x, y) in children:
            d = os.path.join(bag_dir, f"{x}_{y}")
            os.makedirs(d, exist_ok=True)
            kids = [(2 * x + dx, 2 * y + dy)
                    for dx in (0, 1) for dy in (0, 1)]
            for (hx, hy) in kids:
                save(os.path.join(d, f"{hx}_{hy}.jpeg"))
            child_map[(x, y)] = kids
    if thumb:
        save(os.path.join(bag_dir, "thumbnail.jpeg"))
    return child_map


def test_scan_nested_bag_levels_and_parents(tmp_path):
    from wsi_hgnn_tpu.models.mil.h2mil import scan_nested_bag

    low = [(0, 0), (0, 1), (1, 0)]
    child_map = _write_nested_bag(
        str(tmp_path / "s"), low, children={(0, 0), (1, 0)}, thumb=True)
    low_paths, low_xy, high_paths, high_xy, parent, thumb = scan_nested_bag(
        str(tmp_path / "s"))
    assert thumb is not None and thumb.name == "thumbnail.jpeg"
    assert [tuple(c) for c in low_xy] == sorted(low)
    assert len(high_paths) == 8 and len(parent) == 8
    # every high tile's parent is the low tile whose dir held it
    for hp, hxy, pi in zip(high_paths, high_xy, parent):
        lx, ly = low_xy[pi]
        assert hp.parent.name == f"{lx}_{ly}"
        assert tuple(hxy) in child_map[(lx, ly)]


def test_build_tree_graph_levels_structure():
    from wsi_hgnn_tpu.models.mil.h2mil import build_tree_graph_levels

    rng = np.random.RandomState(3)
    n1, n2, d = 4, 10, 8
    xy1 = np.asarray([(0, 0), (0, 1), (1, 0), (1, 1)])
    # children: 10 high tiles spread over the first three low tiles
    parent = np.asarray([0, 0, 0, 0, 1, 1, 1, 2, 2, 2], np.int32)
    xy2 = np.stack([np.arange(n2) % 4, np.arange(n2) // 4], 1)
    f1 = rng.randn(n1, d).astype(np.float32)
    f2 = rng.randn(n2, d).astype(np.float32)
    tf = rng.randn(d).astype(np.float32)

    t = build_tree_graph_levels(f1, xy1, f2, xy2, parent, thumb_feat=tf)
    n_real = int(t.node_mask.sum())
    assert n_real == 1 + n1 + n2
    types = np.asarray(t.node_type)[:n_real]
    assert types[0] == 0
    assert (types == 1).sum() == n1 and (types == 2).sum() == n2
    # REAL per-level features, not synthesized block means
    np.testing.assert_allclose(np.asarray(t.feats)[0], tf)
    np.testing.assert_allclose(np.asarray(t.feats)[1:1 + n1], f1)
    np.testing.assert_allclose(np.asarray(t.feats)[1 + n1:n_real], f2)
    # node_tree: level-1 -> thumbnail, level-2 -> its real parent
    tree = np.asarray(t.tree)[:n_real]
    assert np.all(tree[1:1 + n1] == 0)
    np.testing.assert_array_equal(tree[1 + n1:n_real], 1 + parent)
    # parent-child edges exist in BOTH directions; so do thumbnail<->level-1
    e_real = int(t.edge_mask.sum())
    edges = set(zip(np.asarray(t.src)[:e_real].tolist(),
                    np.asarray(t.dst)[:e_real].tolist()))
    for c, p in enumerate(parent):
        assert (1 + n1 + c, 1 + p) in edges and (1 + p, 1 + n1 + c) in edges
    for i in range(n1):
        assert (1 + i, 0) in edges and (0, 1 + i) in edges
    # 8-neighbour adjacency within level 1: the 2x2 grid is fully connected
    for i in range(n1):
        for j in range(n1):
            if i != j:
                assert (1 + i, 1 + j) in edges
    # x_y_index contract: per-level /max then *2-1; thumbnail at (-1,-1)
    xy = np.asarray(t.xy)[:n_real]
    np.testing.assert_allclose(xy[0], [-1.0, -1.0])
    np.testing.assert_allclose(xy[1:1 + n1],
                               xy1 / np.maximum(xy1.max(0), 1) * 2 - 1)
    np.testing.assert_allclose(xy[1 + n1:n_real],
                               xy2 / np.maximum(xy2.max(0), 1) * 2 - 1)


def test_train_mil_h2mil_nested_bags_e2e(tmp_path, capsys):
    """train_mil --model h2mil --nested-bags over a synthetic 2-level image
    dataset (tiler out_base layout with class directories)."""
    import train_mil

    rows = []
    for i in range(8):
        label = i % 2
        name = f"s{i:02d}"
        low = [(x, y) for x in range(2) for y in range(2)]
        _write_nested_bag(str(tmp_path / "bags" / f"c{label}" / name),
                          low, children={(0, 0), (1, 1)}, seed=100 + i)
        rows.append(f"{name},{label}")
    labels = str(tmp_path / "labels.csv")
    with open(labels, "w") as f:
        f.write("\n".join(rows))

    out = train_mil.main([
        "--model", "h2mil", "--nested-bags", "--encoder", "random",
        "--feats-dir", str(tmp_path / "bags"), "--labels", labels,
        "--folds", "2", "--epochs", "2", "--lr", "1e-3",
        "--hidden", "16", "--k1", "2", "--k2", "4",
    ])
    assert set(out) >= {"acc_mean", "auc_mean", "f1_mean"}
    assert np.isfinite(out["acc_mean"])


def test_pretrain_simclr_cli_and_gtn_feed(tmp_path):
    """tools/pretrain_simclr.py: tiny-backbone pretraining over a synthetic
    patch corpus (loss finite, best.pkl checkpointed), then --extract writes
    train_mil bags the GTN k-fold main trains on — the reference's
    feature_extractor -> build_graphs -> main_kfold chain."""
    from PIL import Image
    from tools import pretrain_simclr

    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        label = i % 2
        name = f"s{i}"
        d = tmp_path / "patches" / name
        os.makedirs(d)
        base = rng.randint(0, 200, (24, 24, 3)) + label * 55
        for j in range(5):
            img = np.clip(base + rng.randint(-20, 20, (24, 24, 3)), 0, 255)
            Image.fromarray(img.astype(np.uint8)).save(
                d / f"{j}_{0}.jpeg")
        rows.append(f"{name},{label}")
    labels = str(tmp_path / "labels.csv")
    with open(labels, "w") as f:
        f.write("\n".join(rows))

    ckpt = pretrain_simclr.main([
        "--patch-dir", str(tmp_path / "patches"), "--out", str(tmp_path / "run"),
        "--backbone", "tiny", "--train-backbone", "--epochs", "2",
        "--batch", "4", "--image-size", "24", "--lr", "1e-3",
        "--warmup-epochs", "1", "--proj-dim", "16",
    ])
    assert os.path.exists(ckpt)

    pretrain_simclr.main([
        "--extract", "--ckpt", ckpt,
        "--patch-dir", str(tmp_path / "patches"),
        "--out", str(tmp_path / "feats"),
    ])
    bags = sorted(os.listdir(tmp_path / "feats"))
    assert bags == [f"s{i}.npz" for i in range(6)]
    with np.load(tmp_path / "feats" / "s0.npz") as z:
        assert z["feat"].shape == (5, 64) and z["xy"].shape == (5, 2)

    import train_mil

    out = train_mil.main([
        "--model", "gtn", "--feats-dir", str(tmp_path / "feats"),
        "--labels", labels, "--folds", "2", "--epochs", "2",
        "--hidden", "16", "--clusters", "4",
    ])
    assert np.isfinite(out["acc_mean"])


def test_simclr_lr_schedule_matches_torch():
    """Constant lr through the warmup epochs, then torch
    CosineAnnealingLR(T_max=epochs, eta_min=0) stepped at each later
    epoch's end (kimia_simclr.py:185-188)."""
    torch = pytest.importorskip("torch")
    from tools.pretrain_simclr import simclr_lr_schedule

    lr0, epochs, steps, warm = 1e-5, 20, 3, 10
    lr_of = simclr_lr_schedule(lr0, epochs, steps, warm)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, 0.0)
    for epoch in range(epochs):
        expect = opt.param_groups[0]["lr"]
        for count in (epoch * steps, epoch * steps + steps - 1):
            assert float(lr_of(count)) == pytest.approx(expect, rel=1e-4)
        if epoch >= warm:
            sched.step()


def test_process_remix_dataset(tmp_path):
    """tools/process_remix_dataset.py: graph .npz dir + labels CSV ->
    ReMix bag layout (class-token npy dirs, 80/20 lists at the reference's
    int((len+1)*.80) boundary, bag-label npys) + flat bags/ + labels.csv
    that train_mil's dsmil main trains on."""
    from tools import process_remix_dataset
    import train_mil

    rng = np.random.RandomState(0)
    gd = tmp_path / "homogeneous"
    os.makedirs(gd)
    rows = []
    for i in range(10):
        label = i % 2
        name = f"w{i}"
        n = rng.randint(6, 12)
        np.savez(gd / f"{name}.npz", feat=rng.randn(n, 16).astype(np.float32))
        rows.append(f"{name},{label}")
    labels = str(tmp_path / "in_labels.csv")
    with open(labels, "w") as f:
        f.write("\n".join(rows))

    out = str(tmp_path / "ds")
    process_remix_dataset.main([
        "--graph-dir", str(gd), "--labels", labels, "--out", out])

    # reference layout: 5 per class -> int(6*0.8)=4 train + 1 test each
    train = open(os.path.join(out, "remix_processed", "train_list.txt")).read().splitlines()
    test = open(os.path.join(out, "remix_processed", "test_list.txt")).read().splitlines()
    assert len(train) == 8 and len(test) == 2
    for row in train + test:
        path, k = row.rsplit(",", 1)
        assert os.path.exists(path)
        tok = "0-normal" if k == "0" else "1-tumor"
        assert tok + "-npy" in path
    tl = np.load(os.path.join(out, "remix_processed", "train_bag_labels.npy"))
    assert sorted(tl.tolist()) == [0] * 4 + [1] * 4

    res = train_mil.main([
        "--model", "dsmil", "--feats-dir", os.path.join(out, "bags"),
        "--labels", os.path.join(out, "labels.csv"),
        "--folds", "2", "--epochs", "1",
    ])
    assert np.isfinite(res["acc_mean"])


def test_stratified_kfold_protocol():
    """Fold composition matches the reference mains: per-class array_split
    folds, held-out fold halved per class into val (first half) and test
    (second half), train = the other folds (GTNMIL main_kfold.py:57-78)."""
    from train_mil import stratified_kfold_split

    labels = np.asarray([0] * 10 + [1] * 6)
    folds = stratified_kfold_split(labels, 5)
    assert len(folds) == 5
    n = len(labels)
    for tr, va, te in folds:
        all_idx = np.sort(np.concatenate([tr, va, te]))
        np.testing.assert_array_equal(all_idx, np.arange(n))  # disjoint cover
        # both classes appear in train of every fold; class 0 (2 per fold,
        # halved 1/1) appears in every test split. Class 1 has folds of
        # size 1 whose single item goes entirely to val (np.array_split's
        # ceil-first halving — the reference behaves identically).
        assert set(labels[tr]) == {0, 1}
        assert 0 in set(labels[te])
    # the held-out fold of fold 0 (class 0: indices 0,1; class 1: 10,11)
    tr0, va0, te0 = folds[0]
    assert 0 in va0 and 1 in te0
    assert 10 in va0 and 11 in te0
