"""MIL baseline training entry point — the capability of the reference's
baselines/ k-fold mains (train_remix_k-fold*.py, GTNMIL main_kfold.py,
H2MIL main_baselines_kfold.py) behind one CLI.

Bags are per-slide feature files (.npy [N, D] or our graph .npz, whose
`feat` array is the bag); labels come from a CSV `name,label` table or the
TCGA normal-list convention. K-fold cross validation with mean/std
reporting, ReMix latent augmentation optional for abmil/dsmil.

  python train_mil.py --model dsmil --feats-dir bags/ --labels labels.csv \
      --folds 5 --epochs 50 [--remix-mode cov --num-prototypes 8]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Tuple

import numpy as np


def load_bags(feats_dir: str, labels_csv: str) -> Tuple[List[np.ndarray], np.ndarray, List[str]]:
    labels_map = {}
    with open(labels_csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.lower().startswith("name"):
                continue
            name, label = line.split(",")[:2]
            labels_map[name] = int(label)
    bags, labels, names = [], [], []
    for p in sorted(glob.glob(os.path.join(feats_dir, "*.np[yz]"))):
        name = os.path.basename(p).rsplit(".", 1)[0]
        if name not in labels_map:
            continue
        if p.endswith(".npz"):
            with np.load(p) as z:
                feats = z["feat"]
        else:
            feats = np.load(p)
        bags.append(np.asarray(feats, np.float32))
        labels.append(labels_map[name])
        names.append(name)
    return bags, np.asarray(labels, np.int64), names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["abmil", "dsmil"], default="dsmil")
    ap.add_argument("--feats-dir", required=True)
    ap.add_argument("--labels", required=True, help="CSV name,label")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--remix-mode", default=None,
                    choices=[None, "replace", "append", "interpolate", "cov", "joint"])
    ap.add_argument("--remix-rate", type=float, default=0.3)
    ap.add_argument("--num-prototypes", type=int, default=8)
    args = ap.parse_args()

    from wsi_hgnn_tpu.utils import ensure_backend

    ensure_backend()

    import jax
    import jax.numpy as jnp
    import optax

    from wsi_hgnn_tpu.models.mil import (ABMIL, DSMIL, mix_the_bag_aug,
                                         pad_bag, reduce_bag)
    from wsi_hgnn_tpu.train.metrics import accuracy, metrics

    bags, labels, names = load_bags(args.feats_dir, args.labels)
    if not bags:
        raise SystemExit("no bags found")
    print(f"{len(bags)} bags, classes: {np.bincount(labels)}")

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(bags))
    folds = np.array_split(order, args.folds)

    if args.model == "abmil":
        model = ABMIL(num_classes=args.num_classes)
    else:
        model = DSMIL(num_classes=args.num_classes)

    cap = max(int(np.ceil(max(len(b) for b in bags) * (2.0 if args.remix_mode else 1.0))), 8)

    def fwd_logits(params, feats, mask, key):
        if args.model == "abmil":
            return model.apply(params, feats, mask)
        classes, bag_logits, _, _ = model.apply(
            params, feats, mask, train=False
        )
        # dsmil loss combines bag and max-instance logits (reference trainer)
        masked = jnp.where(mask[:, None], classes, -1e30)
        return 0.5 * bag_logits + 0.5 * masked.max(0, keepdims=True)

    tx = optax.adam(args.lr)

    @jax.jit
    def train_step(params, opt_state, feats, mask, label):
        def loss_fn(p):
            logits = fwd_logits(p, feats, mask, None)
            return -jax.nn.log_softmax(logits)[0, label]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, feats, mask):
        return jax.nn.softmax(fwd_logits(params, feats, mask, None))

    fold_metrics = []
    for fi in range(args.folds):
        test_idx = folds[fi]
        train_idx = np.concatenate([folds[j] for j in range(args.folds) if j != fi])

        # ReMix "reduce" stage: training bags become their K-means prototype
        # bags, with per-prototype semantic-shift vectors (reduce.py:10-48);
        # evaluation stays on the full bags.
        shifts = None
        if args.remix_mode:
            reduced = [reduce_bag(bags[i], args.num_prototypes) for i in train_idx]
            train_bags = [r[0] for r in reduced]
            shifts = [r[1] for r in reduced]
        else:
            train_bags = [bags[i] for i in train_idx]

        f0, m0 = pad_bag(bags[train_idx[0]], capacity=cap)
        params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(f0), jnp.asarray(m0))
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
                params, opt_state, loss = train_step(
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
        precision, recall, f1, aucv = metrics(probs, ys, "binary" if args.num_classes == 2 else "macro")
        fold_metrics.append((acc, f1, aucv))
        print(f"fold {fi}: acc {acc:.4f} f1 {f1:.4f} auc {aucv:.4f}")

    fm = np.asarray(fold_metrics, float)
    print(json.dumps({
        "model": args.model,
        "acc_mean": float(np.nanmean(fm[:, 0])), "acc_std": float(np.nanstd(fm[:, 0])),
        "f1_mean": float(np.nanmean(fm[:, 1])), "f1_std": float(np.nanstd(fm[:, 1])),
        "auc_mean": float(np.nanmean(fm[:, 2])), "auc_std": float(np.nanstd(fm[:, 2])),
    }))


if __name__ == "__main__":
    main()
