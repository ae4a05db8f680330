"""MIL baseline training entry point — the capability of the reference's
baselines/ k-fold mains behind one CLI:

  * abmil / dsmil (+ ReMix latent augmentation) —
    /root/reference/baselines/ReMix_DSMIL_ABMIL/train_remix_k-fold*.py
  * gtn — GTNMIL GraphTransformer over the spatial 8-adjacency graph with
    the mincut auxiliary loss — /root/reference/baselines/GTNMIL/main_kfold.py
    (Adam weight_decay 5e-4 :118, CE loss, cosine LR anneal :120)
  * h2mil — multi-resolution tree graph -> RAConv/IHPool GCN head —
    /root/reference/baselines/H2MIL/code/main_baselines_kfold.py
    (Adam lr, weight_decay 5e-4 :346, CE loss :242)

Bags are per-slide feature files (.npy [N, D] or our graph .npz, whose
`feat` array is the bag; an optional `xy` key of [N, 2] int tile coords
feeds the graph models — otherwise a square raster grid is synthesised).
Labels come from a CSV `name,label` table. K-fold cross validation with
mean/std JSON reporting.

  python train_mil.py --model dsmil --feats-dir bags/ --labels labels.csv \
      --folds 5 --epochs 50 [--remix-mode cov --num-prototypes 8]
  python train_mil.py --model gtn   --feats-dir bags/ --labels labels.csv
  python train_mil.py --model h2mil --feats-dir bags/ --labels labels.csv
  python train_mil.py --model h2mil --nested-bags --encoder kimia \
      --feats-dir tiled/ --labels labels.csv   # REAL 2-level pyramid trees
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Optional, Tuple

import numpy as np


def read_labels_csv(labels_csv: str):
    labels_map = {}
    with open(labels_csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.lower().startswith("name"):
                continue
            name, label = line.split(",")[:2]
            labels_map[name] = int(label)
    return labels_map


def load_bags(feats_dir: str, labels_csv: str):
    """Returns (bags, labels, names, coords) — coords[i] is [N,2] int or None."""
    labels_map = read_labels_csv(labels_csv)
    bags, labels, names, coords = [], [], [], []
    for p in sorted(glob.glob(os.path.join(feats_dir, "*.np[yz]"))):
        name = os.path.basename(p).rsplit(".", 1)[0]
        if name not in labels_map:
            continue
        xy = None
        if p.endswith(".npz"):
            with np.load(p) as z:
                feats = z["feat"]
                if "xy" in z:
                    xy = np.asarray(z["xy"], np.int64)
        else:
            feats = np.load(p)
        bags.append(np.asarray(feats, np.float32))
        labels.append(labels_map[name])
        names.append(name)
        coords.append(xy)
    return bags, np.asarray(labels, np.int64), names, coords


def grid_coords(n: int) -> np.ndarray:
    """Square raster-grid fallback when tile coordinates are unknown."""
    w = int(np.ceil(np.sqrt(n)))
    i = np.arange(n)
    return np.stack([i % w, i // w], 1).astype(np.int64)


def stratified_kfold_split(labels, folds: int):
    """The shared k-fold protocol of all three reference mains: per-CLASS
    contiguous `np.array_split` folds, the held-out fold halved per class
    into val (first half) and test (second half), train = every other fold
    (GTNMIL main_kfold.py:57-78, H2MIL main_baselines_kfold.py:273-303,
    ReMix train_remix_k-fold.py:268-347). Stratification matters: an
    unstratified fold can hold one class, making AUC undefined. Like the
    reference — whose best-val model copy is never the one tested — the
    val half is carved out of training but test metrics come from the
    final model. Returns [(train_idx, val_idx, test_idx)] per fold."""
    labels = np.asarray(labels)
    per_class = [np.flatnonzero(labels == c) for c in np.unique(labels)]
    out = []
    for fi in range(folds):
        tr, va, te = [], [], []
        for idx in per_class:
            for j, part in enumerate(np.array_split(idx, folds)):
                if j != fi:
                    tr.append(part)
                else:
                    halves = np.array_split(part, 2)
                    va.append(halves[0])
                    te.append(halves[1])
        out.append(tuple(np.concatenate(x).astype(np.int64) for x in (tr, va, te)))
    return out


def summarize(model_name: str, fold_metrics: List[Tuple[float, float, float]]):
    fm = np.asarray(fold_metrics, float)
    out = {
        "model": model_name,
        "acc_mean": float(np.nanmean(fm[:, 0])), "acc_std": float(np.nanstd(fm[:, 0])),
        "f1_mean": float(np.nanmean(fm[:, 1])), "f1_std": float(np.nanstd(fm[:, 1])),
        "auc_mean": float(np.nanmean(fm[:, 2])), "auc_std": float(np.nanstd(fm[:, 2])),
    }
    print(json.dumps(out))
    return out



def bce_with_logits_loss(logits, onehot):
    """nn.BCEWithLogitsLoss on a one-hot target: mean over classes of
    per-class sigmoid BCE (the ReMix mains' criterion,
    train_remix_k-fold.py:300)."""
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, onehot).mean()


def mil_reference_loss(model_name, bag_logits, max_logits, onehot):
    """dsmil: 0.5*BCE(bag) + 0.5*BCE(max-instance) — the mixture of LOSSES,
    not a loss of mixed logits (train_remix_k-fold.py:141-145); abmil:
    BCE(bag) (:146-148)."""
    bag_loss = bce_with_logits_loss(bag_logits, onehot)
    if model_name == "abmil":
        return bag_loss
    return 0.5 * bag_loss + 0.5 * bce_with_logits_loss(max_logits, onehot)


def cosine_epoch_schedule(lr, epochs, steps_per_epoch, eta_min=5e-6):
    """torch CosineAnnealingLR(optimizer, num_epochs, eta_min) stepped once
    per epoch = once per pass over the FOLD'S TRAIN SPLIT
    (train_remix_k-fold.py:302,:362; GTNMIL main_kfold.py:120,:157 pins the
    LR to the cosine of the current epoch). Returns lr(update_count)."""
    import optax

    sched = optax.cosine_decay_schedule(
        lr, max(epochs, 1), eta_min / max(lr, 1e-12)
    )
    return lambda c: sched(c // max(steps_per_epoch, 1))


def save_fold_params(save_dir, model_name, fold, params, meta):
    """Persist a fold's trained params + rebuild metadata (the reference
    mains torch.save each fold's state_dict; GTNMIL additionally feeds the
    saved model to src/vis_graphcam.py — tools/vis_graphcam.py here)."""
    import pickle

    import jax

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{model_name}_fold{fold}.pkl")
    with open(path, "wb") as f:
        pickle.dump(
            {"params": jax.tree.map(np.asarray, params), "meta": meta}, f
        )
    return path


# ------------------------------------------------------------------------- #
def run_bag_models(args, bags, labels):
    import jax
    import jax.numpy as jnp
    import optax

    from wsi_hgnn_tpu.models.mil import (ABMIL, DSMIL, mix_the_bag_aug,
                                         pad_bag, reduce_bag)
    from wsi_hgnn_tpu.train.metrics import accuracy, metrics

    rng = np.random.RandomState(args.seed)
    folds = stratified_kfold_split(labels, args.folds)

    if args.model == "abmil":
        model = ABMIL(num_classes=args.num_classes)
    else:
        model = DSMIL(num_classes=args.num_classes)

    # capacity must cover BOTH the untouched test bags and the augmented
    # training bags: with remix, train bags are reduced to num_prototypes
    # rows and mix_aug appends up to 1 extra row per instance per append
    # op — 3 ops can fire per instance in 'joint' mode (append +
    # interpolate + cov, train_remix_k-fold.py:92-106) -> 4x worst case
    max_bag = max(len(b) for b in bags)
    if args.remix_mode:
        grow = 4 if args.remix_mode == "joint" else 2
        cap = max(max_bag, grow * args.num_prototypes, 8)
    else:
        cap = max(max_bag, 8)

    def bag_and_max_logits(params, feats, mask):
        """(bag logits [1,C], masked max-instance logits [1,C])."""
        if args.model == "abmil":
            bag = model.apply(params, feats, mask)
            return bag, bag
        classes, bag, _, _ = model.apply(params, feats, mask, train=False)
        masked = jnp.where(mask[:, None], classes, -1e30)
        return bag, masked.max(0, keepdims=True)

    def reference_loss(params, feats, mask, label):
        onehot = jax.nn.one_hot(label, args.num_classes)[None]
        bag, mx = bag_and_max_logits(params, feats, mask)
        return mil_reference_loss(args.model, bag, mx, onehot)

    def make_tx(steps_per_epoch):
        """Adam(lr, betas=(0.5, 0.9), L2 weight_decay) with CosineAnnealingLR
        stepped once per epoch to eta_min 5e-6
        (train_remix_k-fold.py:301-302,:362)."""
        lr_of = cosine_epoch_schedule(args.lr, args.epochs, steps_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(args.weight_decay),
            optax.scale_by_adam(b1=0.5, b2=0.9),
            optax.scale_by_schedule(lambda c: -lr_of(c)),
        )

    def make_train_step(tx):
        @jax.jit
        def train_step(params, opt_state, feats, mask, label):
            loss, grads = jax.value_and_grad(reference_loss)(
                params, feats, mask, label
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return train_step

    @jax.jit
    def eval_step(params, feats, mask):
        # test-time score is sigmoid(bag_prediction) alone
        # (train_remix_k-fold.py:184)
        bag, _ = bag_and_max_logits(params, feats, mask)
        return jax.nn.sigmoid(bag)

    fold_metrics = []
    for fi in range(args.folds):
        train_idx, val_idx, test_idx = folds[fi]
        print(f"fold {fi}: {len(train_idx)} train / {len(val_idx)} val / "
              f"{len(test_idx)} test")
        if len(test_idx) == 0:
            # a tiny cohort can leave the halved held-out fold with no test
            # slides (the reference never runs cohorts this small); record
            # nan so summarize()'s nanmean skips the fold
            print(f"fold {fi}: empty test split, skipping")
            fold_metrics.append((float("nan"), float("nan"), float("nan")))
            continue

        # ReMix "reduce": training bags become K-means prototype bags with
        # per-prototype semantic-shift vectors (reduce.py:10-48)
        shifts = None
        if args.remix_mode:
            reduced = [reduce_bag(bags[i], args.num_prototypes) for i in train_idx]
            train_bags = [r[0] for r in reduced]
            shifts = [r[1] for r in reduced]
        else:
            train_bags = [bags[i] for i in train_idx]

        f0, m0 = pad_bag(bags[train_idx[0]], capacity=cap)
        params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(f0), jnp.asarray(m0))
        tx = make_tx(len(train_idx))
        train_step = make_train_step(tx)
        opt_state = tx.init(params)

        for epoch in range(args.epochs):
            perm = rng.permutation(len(train_idx))
            for j in perm:
                i = train_idx[j]
                feats = train_bags[j]
                if args.remix_mode:
                    feats = mix_the_bag_aug(
                        feats, j, train_bags, labels[train_idx],
                        args.remix_mode, args.remix_rate,
                        semantic_shifts=shifts, rng=rng,
                    )
                f, m = pad_bag(feats, capacity=cap)
                params, opt_state, _ = train_step(
                    params, opt_state, jnp.asarray(f), jnp.asarray(m),
                    int(labels[i]),
                )

        probs, ys = [], []
        for i in test_idx:
            f, m = pad_bag(bags[i], capacity=cap)
            probs.append(np.asarray(eval_step(params, jnp.asarray(f), jnp.asarray(m)))[0])
            ys.append(labels[i])
        probs, ys = np.asarray(probs), np.asarray(ys)
        acc = accuracy(probs, ys)
        _, _, f1, aucv = metrics(probs, ys, "binary" if args.num_classes == 2 else "macro")
        fold_metrics.append((acc, f1, aucv))
        print(f"fold {fi}: acc {acc:.4f} f1 {f1:.4f} auc {aucv:.4f}")
        if args.save_dir:
            save_fold_params(args.save_dir, args.model, fi, params,
                             dict(model=args.model, num_classes=args.num_classes,
                                  in_dim=int(bags[0].shape[1]), cap=int(cap)))
    return summarize(args.model, fold_metrics)


# ------------------------------------------------------------------------- #
def run_gtn(args, bags, labels, coords):
    """GTNMIL: spatial 8-adjacency graph -> GraphTransformer, CE + mincut
    auxiliary loss, Adam wd 5e-4 with cosine LR anneal (main_kfold.py:118-120)."""
    import jax
    import jax.numpy as jnp
    import optax

    from wsi_hgnn_tpu.graph.typed_graph import bucket_size
    from wsi_hgnn_tpu.models.mil import GraphTransformer, pad_bag, spatial_adjacency
    from wsi_hgnn_tpu.train.metrics import accuracy, metrics

    rng = np.random.RandomState(args.seed)
    folds = stratified_kfold_split(labels, args.folds)
    d = bags[0].shape[1]
    cap = bucket_size(max(len(b) for b in bags), base=64)

    # the 8-neighbour edge list is per-slide static — build it once, not on
    # every training step (the dict walk in spatial_adjacency is the
    # host-side cost; the dense [cap, cap] buffer stays per-call because a
    # whole cohort of them would not fit in host RAM)
    edge_lists = [
        spatial_adjacency([tuple(c) for c in (
            xy if xy is not None else grid_coords(len(b)))])
        for b, xy in zip(bags, coords)
    ]

    def make_inputs(i):
        feats, mask = pad_bag(bags[i], capacity=cap)
        src, dst = edge_lists[i]
        adj = np.zeros((cap, cap), np.float32)
        adj[src, dst] = 1.0
        return (jnp.asarray(feats[None]), jnp.asarray(adj[None]),
                jnp.asarray(mask[None]))

    model = GraphTransformer(
        n_class=args.num_classes, in_dim=d,
        embed_dim=args.hidden, node_cluster_num=args.clusters,
    )
    def make_tx(steps_per_epoch):
        """Adam wd 5e-4 + CosineAnnealingLR(num_epochs, eta_min 5e-6); the
        reference calls scheduler.step(epoch) per batch, which pins the LR
        to the cosine of the CURRENT EPOCH (main_kfold.py:118-120,:157) —
        so the anneal denominator is epochs, stepped once per pass over the
        fold's train split."""
        lr_of = cosine_epoch_schedule(args.lr, args.epochs, steps_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda c: -lr_of(c)),
        )

    def make_train_step(tx):
        @jax.jit
        def train_step(params, bstats, opt_state, feats, adj, mask, label):
            # train=True: the GCNBlock's masked BatchNorm uses (and
            # updates) batch statistics, like the reference's model.train()
            def loss_fn(p):
                (logits, aux), upd = model.apply(
                    {"params": p, "batch_stats": bstats}, feats, adj, mask,
                    train=True, mutable=["batch_stats"],
                )
                return (-jax.nn.log_softmax(logits)[0, label] + aux,
                        upd["batch_stats"])
            (loss, new_bstats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bstats,
                    opt_state, loss)
        return train_step

    @jax.jit
    def eval_step(params, bstats, feats, adj, mask):
        logits, _ = model.apply(
            {"params": params, "batch_stats": bstats}, feats, adj, mask,
            train=False,
        )
        return jax.nn.softmax(logits)[0]

    fold_metrics = []
    for fi in range(args.folds):
        train_idx, val_idx, test_idx = folds[fi]
        print(f"fold {fi}: {len(train_idx)} train / {len(val_idx)} val / "
              f"{len(test_idx)} test")
        if len(test_idx) == 0:
            # a tiny cohort can leave the halved held-out fold with no test
            # slides (the reference never runs cohorts this small); record
            # nan so summarize()'s nanmean skips the fold
            print(f"fold {fi}: empty test split, skipping")
            fold_metrics.append((float("nan"), float("nan"), float("nan")))
            continue
        f0, a0, m0 = make_inputs(train_idx[0])
        variables = model.init(jax.random.PRNGKey(args.seed), f0, a0, m0)
        params, bstats = variables["params"], variables["batch_stats"]
        tx = make_tx(len(train_idx))
        train_step = make_train_step(tx)
        opt_state = tx.init(params)
        for epoch in range(args.epochs):
            for j in rng.permutation(len(train_idx)):
                i = train_idx[j]
                f, a, m = make_inputs(i)
                params, bstats, opt_state, _ = train_step(
                    params, bstats, opt_state, f, a, m, int(labels[i]))
        probs = np.asarray([np.asarray(eval_step(params, bstats, *make_inputs(i)))
                            for i in test_idx])
        ys = labels[test_idx]
        acc = accuracy(probs, ys)
        _, _, f1, aucv = metrics(probs, ys, "binary" if args.num_classes == 2 else "macro")
        fold_metrics.append((acc, f1, aucv))
        print(f"fold {fi}: acc {acc:.4f} f1 {f1:.4f} auc {aucv:.4f}")
        if args.save_dir:
            save_fold_params(args.save_dir, "gtn", fi,
                             {"params": params, "batch_stats": bstats},
                             dict(model="gtn", num_classes=args.num_classes,
                                  hidden=args.hidden, clusters=args.clusters,
                                  in_dim=int(d), cap=int(cap)))
    return summarize("gtn", fold_metrics)


# ------------------------------------------------------------------------- #
def load_nested_trees(nested_dir: str, labels_csv: str, encoder_name: str,
                      ext: str = "jpeg", batch_size: int = 32):
    """Real two-magnification H2MIL input: scan each slide's nested 2-level
    bag (the tiler's nested_patches layout), featurize BOTH levels (and the
    thumbnail, when present) with one encoder, and build real-pyramid
    TreeGraphs — the reference's actual data path
    (/root/reference/baselines/H2MIL/code/github_pretreat.py +
    WSI_processing/KimiaNet_PyTorch_Feature_Extraction.py: one KimiaNet
    over the 5x tiles, the 10x tiles, and the -1.jpeg thumbnail).

    Slide directories live either directly under `nested_dir` or one class
    level down (`nested_dir/<class>/<slide>/`, the tiler's out_base layout).
    Returns (trees, labels, names)."""
    from wsi_hgnn_tpu.graph.typed_graph import bucket_size
    from wsi_hgnn_tpu.models.mil.h2mil import (
        build_tree_graph_levels, scan_nested_bag,
    )
    from wsi_hgnn_tpu.pipeline.construct import make_encoder
    from wsi_hgnn_tpu.pipeline.patches import iter_patch_batches

    labels_map = read_labels_csv(labels_csv)
    slide_dirs = []
    for root, dirs, files in os.walk(nested_dir):
        if any(f.endswith("." + ext) for f in files):
            name = os.path.basename(root)
            if name in labels_map:
                slide_dirs.append((name, root))
        # never descend into a slide's own child-tile directories
        if os.path.basename(root) in labels_map:
            dirs.clear()
    slide_dirs.sort()
    if not slide_dirs:
        raise SystemExit(f"no labelled nested bags under {nested_dir}")

    # pad_batch_to: one compiled CNN shape for full chunks, trailing chunks
    # AND the batch-1 thumbnail call (compiles cost minutes on the relay)
    encoder = make_encoder(encoder_name, {"feature_dim": 1024},
                           {}, {}, with_typing=False,
                           pad_batch_to=batch_size)

    def featurize(paths):
        if not paths:
            return np.zeros((0, 1024), np.float32)
        outs = [encoder(pb)[0] for pb in iter_patch_batches(paths, batch_size)]
        return np.concatenate(outs)

    parts, labels, names = [], [], []
    for name, d in slide_dirs:
        low_paths, xy1, high_paths, xy2, parent, thumb = scan_nested_bag(d, ext)
        f1 = featurize(low_paths)
        f2 = featurize(high_paths)
        tf = featurize([thumb])[0] if thumb is not None else None
        parts.append((f1, xy1, f2, xy2, parent, tf))
        labels.append(labels_map[name])
        names.append(name)

    max_n = max_e = 0
    for p in parts:
        t = build_tree_graph_levels(*p)
        max_n = max(max_n, int(t.node_mask.sum()))
        max_e = max(max_e, int(t.edge_mask.sum()))
    cap_n, cap_e = bucket_size(max_n, base=64), bucket_size(max_e, base=64)
    trees = [build_tree_graph_levels(*p, node_capacity=cap_n,
                                     edge_capacity=cap_e) for p in parts]
    return trees, np.asarray(labels, np.int64), names


def run_h2mil(args, bags, labels, coords):
    """H2MIL: multi-resolution tree -> RAConv/IHPool head, CE, Adam wd 5e-4
    (main_baselines_kfold.py:346, :242). With --nested-bags the tree levels
    are REAL magnifications from the tiler's 2-level nested bags
    (load_nested_trees); otherwise the parent level is synthesised from the
    single-magnification bag features (build_tree_graph)."""
    import jax
    import jax.numpy as jnp
    import optax

    from wsi_hgnn_tpu.graph.typed_graph import bucket_size
    from wsi_hgnn_tpu.models.mil import H2MIL
    from wsi_hgnn_tpu.models.mil.h2mil import build_tree_graph
    from wsi_hgnn_tpu.train.metrics import accuracy, metrics

    rng = np.random.RandomState(args.seed)

    if args.nested_bags:
        trees, labels, names = load_nested_trees(
            args.feats_dir, args.labels, args.encoder
        )
        print(f"{len(trees)} nested bags, classes: {np.bincount(labels)}")
        in_dim = int(trees[0].feats.shape[1])
    else:
        trees = []
        max_n = max_e = 0
        for b, xy in zip(bags, coords):
            xy = xy if xy is not None else grid_coords(len(b))
            t = build_tree_graph(b, xy, cell=args.cell)
            max_n = max(max_n, int(t.node_mask.sum()))
            max_e = max(max_e, int(t.edge_mask.sum()))
        cap_n, cap_e = bucket_size(max_n, base=64), bucket_size(max_e, base=64)
        for b, xy in zip(bags, coords):
            xy = xy if xy is not None else grid_coords(len(b))
            trees.append(build_tree_graph(b, xy, cell=args.cell,
                                          node_capacity=cap_n, edge_capacity=cap_e))
        in_dim = int(bags[0].shape[1])
    folds = stratified_kfold_split(labels, args.folds)

    model = H2MIL(hidden_dim=args.hidden, n_classes=args.num_classes,
                  k1=args.k1, k2=args.k2, dropout=args.dropout)
    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.scale_by_adam(), optax.scale(-args.lr))

    def to_dev(t):
        return jax.tree.map(jnp.asarray, t)

    @jax.jit
    def train_step(params, opt_state, tree, label, key):
        def loss_fn(p):
            # train=True: the reference trains under model.train() with
            # nn.Dropout(drop_out_ratio) live (main_baselines_kfold.py:
            # 53,66,77,92). Its GCN.forward then returns softmax(x) INTO
            # nn.CrossEntropyLoss (:94, :364) — CE of a softmax, not of
            # logits — a reference quirk reproduced here.
            logits = model.apply(p, tree, train=True,
                                 rngs={"dropout": key})
            probs = jax.nn.softmax(logits)
            return -jax.nn.log_softmax(probs)[0, label]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, tree):
        return jax.nn.softmax(model.apply(params, tree))[0]

    fold_metrics = []
    for fi in range(args.folds):
        train_idx, val_idx, test_idx = folds[fi]
        print(f"fold {fi}: {len(train_idx)} train / {len(val_idx)} val / "
              f"{len(test_idx)} test")
        if len(test_idx) == 0:
            # a tiny cohort can leave the halved held-out fold with no test
            # slides (the reference never runs cohorts this small); record
            # nan so summarize()'s nanmean skips the fold
            print(f"fold {fi}: empty test split, skipping")
            fold_metrics.append((float("nan"), float("nan"), float("nan")))
            continue
        params = model.init(jax.random.PRNGKey(args.seed), to_dev(trees[train_idx[0]]))
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(args.seed + 1)
        for epoch in range(args.epochs):
            for j in rng.permutation(len(train_idx)):
                i = train_idx[j]
                key, k = jax.random.split(key)
                params, opt_state, _ = train_step(
                    params, opt_state, to_dev(trees[i]), int(labels[i]), k
                )
        probs = np.asarray([np.asarray(eval_step(params, to_dev(trees[i]))) for i in test_idx])
        ys = labels[test_idx]
        acc = accuracy(probs, ys)
        _, _, f1, aucv = metrics(probs, ys, "binary" if args.num_classes == 2 else "macro")
        fold_metrics.append((acc, f1, aucv))
        print(f"fold {fi}: acc {acc:.4f} f1 {f1:.4f} auc {aucv:.4f}")
        if args.save_dir:
            save_fold_params(args.save_dir, "h2mil", fi, params,
                             dict(model="h2mil", num_classes=args.num_classes,
                                  hidden=args.hidden, k1=args.k1, k2=args.k2,
                                  in_dim=in_dim))
    return summarize("h2mil", fold_metrics)


# ------------------------------------------------------------------------- #
def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["abmil", "dsmil", "gtn", "h2mil"], default="dsmil")
    ap.add_argument("--feats-dir", required=True)
    ap.add_argument("--labels", required=True, help="CSV name,label")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--weight-decay", type=float, default=5e-3,
                    help="abmil/dsmil Adam L2 (train_remix_k-fold.py:241)")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    # gtn / h2mil hyper-parameters
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=100,
                    help="gtn mincut cluster count (GraphTransformer.py:31)")
    ap.add_argument("--cell", type=int, default=4,
                    help="h2mil synthetic parent-level block size (tiles)")
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.3,
                    help="h2mil drop_out_ratio (reference CLI default 0.3, "
                         "main_baselines_kfold.py:444)")
    ap.add_argument("--nested-bags", action="store_true",
                    help="h2mil: --feats-dir is a tiler 2-level nested-bag "
                         "IMAGE directory; both magnification levels are "
                         "featurized and fed as REAL tree levels")
    ap.add_argument("--encoder", default="random",
                    choices=["random", "kimia", "efficientnet-b4"],
                    help="nested-bag featurizer (the reference uses "
                         "KimiaNet, H2MIL WSI_processing)")
    # ReMix (abmil/dsmil only)
    ap.add_argument("--remix-mode", default=None,
                    choices=[None, "replace", "append", "interpolate", "cov", "joint"])
    ap.add_argument("--remix-rate", type=float, default=0.3)
    ap.add_argument("--num-prototypes", type=int, default=8)
    ap.add_argument("--save-dir", default=None,
                    help="persist each fold's trained params (pickle)")
    args = ap.parse_args(argv)

    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    if args.nested_bags:
        if args.model != "h2mil":
            raise SystemExit("--nested-bags is an h2mil input mode")
        return run_h2mil(args, None, None, None)

    bags, labels, names, coords = load_bags(args.feats_dir, args.labels)
    if not bags:
        raise SystemExit("no bags found")
    print(f"{len(bags)} bags, classes: {np.bincount(labels)}")

    if args.model in ("abmil", "dsmil"):
        return run_bag_models(args, bags, labels)
    if args.model == "gtn":
        return run_gtn(args, bags, labels, coords)
    return run_h2mil(args, bags, labels, coords)


if __name__ == "__main__":
    main()
