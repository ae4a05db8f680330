"""GraphCAM visualization for a trained GTNMIL GraphTransformer — the
capability of /root/reference/baselines/GTNMIL/src/vis_graphcam.py.

Loads a bag (.npz with `feat` [N, D] and optional `xy` [N, 2] tile
coordinates, or a bare .npy), a fold checkpoint written by
`train_mil.py --model gtn --save-dir`, and renders one per-class
per-tile relevance map via the true transformer-LRP GraphCAM
(wsi_hgnn_tpu.models.mil.relprop).

Per-class normalisation reproduces vis_graphcam.py:89-101: min-max
normalise the node cam, scale by the class probability, clip to [0, 1].
Output: `<out>.npz` with `cam` [C, N], `probs` [C], `xy` [N, 2]; plus a
`<out>.png` tile raster per class when matplotlib is importable.

  python tools/vis_graphcam.py --bag bag.npz \
      --params runs/gtn_fold0.pkl --out cam_vis
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True, help=".npz (feat[, xy]) or .npy")
    ap.add_argument("--params", required=True,
                    help="gtn fold pickle from train_mil.py --save-dir")
    ap.add_argument("--out", default="graphcam_vis")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from train_mil import grid_coords
    from wsi_hgnn_tpu.models.mil import (
        GraphTransformer,
        graphcam,
        pad_bag,
        spatial_adjacency,
    )
    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    with open(args.params, "rb") as f:
        ckpt = pickle.load(f)
    meta = ckpt["meta"]
    if meta.get("model") != "gtn":
        raise SystemExit(f"--params is a {meta.get('model')} checkpoint, "
                         "GraphCAM needs a gtn one")

    xy = None
    if args.bag.endswith(".npz"):
        with np.load(args.bag) as z:
            feats = np.asarray(z["feat"], np.float32)
            if "xy" in z:
                xy = np.asarray(z["xy"], np.int64)
    else:
        feats = np.asarray(np.load(args.bag), np.float32)
    n = len(feats)
    if xy is None:
        xy = grid_coords(n)

    cap = int(meta["cap"])
    feats_p, mask = pad_bag(feats, capacity=cap)
    src, dst = spatial_adjacency([tuple(c) for c in xy])
    adj = np.zeros((cap, cap), np.float32)
    adj[src, dst] = 1.0

    model = GraphTransformer(
        n_class=int(meta["num_classes"]), in_dim=int(meta["in_dim"]),
        embed_dim=int(meta["hidden"]), node_cluster_num=int(meta["clusters"]),
    )
    variables = ckpt["params"]
    f, a, m = (jnp.asarray(feats_p[None]), jnp.asarray(adj[None]),
               jnp.asarray(mask[None]))
    logits, _ = model.apply(variables, f, a, m)
    probs = np.asarray(jnp.squeeze(jnp.asarray(
        __import__("jax").nn.softmax(logits, -1)), 0))

    cams = []
    for c in range(int(meta["num_classes"])):
        cam = np.asarray(graphcam(model, variables, f, a, m, class_idx=c))[:n]
        # vis_graphcam.py:89-101: min-max normalise, scale by p_c, clip
        lo, hi = cam.min(), cam.max()
        cam = (cam - lo) / (hi - lo) if hi > lo else np.zeros_like(cam)
        cams.append(np.clip(probs[c] * cam, 0.0, 1.0))
    cams = np.stack(cams)

    np.savez(args.out + ".npz", cam=cams, probs=probs, xy=xy)
    print(f"probs: {np.round(probs, 4).tolist()}; wrote {args.out}.npz")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ncls = len(cams)
        w = int(xy[:, 0].max()) + 1
        h = int(xy[:, 1].max()) + 1
        fig, axes = plt.subplots(1, ncls, figsize=(4 * ncls, 4))
        axes = np.atleast_1d(axes)
        for c, ax in enumerate(axes):
            img = np.zeros((h, w))
            img[xy[:, 1], xy[:, 0]] = cams[c]
            ax.imshow(img, cmap="Wistia", vmin=0, vmax=1)
            ax.set_title(f"class {c} (p={probs[c]:.3f})")
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.out + ".png", dpi=120)
        print(f"wrote {args.out}.png")
    except Exception as e:  # matplotlib optional
        print(f"png rendering skipped ({e})")


if __name__ == "__main__":
    main()
