"""ReMix dataset processing — the capability of
/root/reference/baselines/ReMix_DSMIL_ABMIL/tools/process_dataset.py
(:45-222 process_COAD/BRCA/ESCA): convert per-slide graphs into the ReMix
bag layout the k-fold mains consume.

The reference reads DGL graph pickles and keeps only `ndata['feat']`; our
graphs are the .npz files `pipeline.construct` writes (homogeneous/
<slide>.npz with a `feat` array). Per class token `{label}-{name}-npy/`
dirs hold one `<slide>.npy` bag each; an 80/20 per-class split (the
reference's `int((len+1)*.80)` boundary and post-split shuffles,
process_dataset.py:70-80) writes `remix_processed/{train,test}_list.txt`
(path,label rows) and `{train,test}_bag_labels.npy`. A `labels.csv` and a
flat `bags/` directory of the same .npy files are also emitted so
train_mil.py can consume the converted dataset directly:

  python tools/process_remix_dataset.py --graph-dir out/homogeneous \
      --labels labels.csv --out datasets/BRCA
  python train_mil.py --model dsmil --feats-dir datasets/BRCA/bags \
      --labels datasets/BRCA/labels.csv --remix-mode cov

Slide tiling with the saturation filter (slide_to_patch_jpeg,
process_dataset.py:224-253) is already covered by pipeline.tiler +
pipeline.extractor; dataset download/unzip helpers are host-acquisition
glue out of scope in this environment.
"""
from __future__ import annotations

import argparse
import glob
import os
import random
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def class_tokens(labels_map):
    """label id -> directory token ('0-normal', '1-tumor', or '{k}-class'
    beyond the binary reference datasets)."""
    ids = sorted(set(labels_map.values()))
    names = {0: "normal", 1: "tumor"}
    return {k: f"{k}-{names.get(k, 'class')}" for k in ids}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph-dir", required=True,
                    help="per-slide graph .npz dir (construct output) or "
                         "bag .npy dir")
    ap.add_argument("--labels", required=True, help="CSV name,label")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from train_mil import read_labels_csv

    labels_map = read_labels_csv(args.labels)
    tokens = class_tokens(labels_map)
    random.seed(args.seed)

    os.makedirs(os.path.join(args.out, "bags"), exist_ok=True)
    per_class = {k: [] for k in tokens}
    for path in sorted(glob.glob(os.path.join(args.graph_dir, "*.np[yz]"))):
        name = os.path.basename(path).rsplit(".", 1)[0]
        if name not in labels_map:
            continue
        if path.endswith(".npz"):
            with np.load(path) as z:
                feats = np.asarray(z["feat"], np.float32)
        else:
            feats = np.asarray(np.load(path), np.float32)
        label = labels_map[name]
        d = os.path.join(args.out, tokens[label] + "-npy")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, name + ".npy"), feats)
        shutil.copy(os.path.join(d, name + ".npy"),
                    os.path.join(args.out, "bags", name + ".npy"))
        per_class[label].append(name)

    n_bags = sum(len(v) for v in per_class.values())
    if not n_bags:
        raise SystemExit(f"no labelled graphs under {args.graph_dir}")

    # 80/20 per class at the reference's int((len+1)*.80) boundary, then
    # shuffle each combined split (process_dataset.py:70-80)
    train, test = [], []
    for k in sorted(per_class):
        wsis = per_class[k]
        cut = int((len(wsis) + 1) * 0.80)
        train += [(w, k) for w in wsis[:cut]]
        test += [(w, k) for w in wsis[cut:]]
    random.shuffle(train)
    random.shuffle(test)

    proc = os.path.join(args.out, "remix_processed")
    os.makedirs(proc, exist_ok=True)
    for split, rows in (("train", train), ("test", test)):
        with open(os.path.join(proc, f"{split}_list.txt"), "w") as f:
            for name, k in rows:
                f.write(os.path.join(args.out, tokens[k] + "-npy",
                                     name + ".npy") + f",{k}\n")
        np.save(os.path.join(proc, f"{split}_bag_labels.npy"),
                np.asarray([k for _, k in rows]))
    with open(os.path.join(args.out, "labels.csv"), "w") as f:
        for k in sorted(per_class):
            for name in per_class[k]:
                f.write(f"{name},{k}\n")
    print(f"{n_bags} bags -> {args.out} ({len(train)} train / "
          f"{len(test)} test)")
    return args.out


if __name__ == "__main__":
    main()
