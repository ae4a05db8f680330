"""SimCLR contrastive pretraining CLI — the GTNMIL feature_extractor
entry point (/root/reference/baselines/GTNMIL/feature_extractor/
{run,kimia_simclr}.py): KimiaNet DenseNet121 backbone with a trainable
512-d projection head `fc_4` (kimia_simclr.py:81-87 freezes the backbone
and trains only the head), NT-Xent temperature 0.5 over two augmented
views, Adam lr 1e-5 / weight_decay 1e-5 (config.yaml + kimia_simclr.py:94),
cosine LR anneal with T_max=epochs stepped only from epoch 10 (the
reference's warmup, kimia_simclr.py:185-188), a 0.1 validation split with
best-validation-loss checkpointing (kimia_simclr.py:140-149).

Two modes:

  pretrain (default):
    python tools/pretrain_simclr.py --patch-dir corpus/ --out runs/simclr
  extract — run the trained encoder's BACKBONE features (out_1, what the
  reference's build_graphs.py consumes) over per-slide bag dirs and write
  the train_mil bag contract (<slide>.npz: feat [N, D] + xy tile coords):
    python tools/pretrain_simclr.py --extract --ckpt runs/simclr/best.pkl \
        --patch-dir bags/ --out feats/
    python train_mil.py --model gtn --feats-dir feats/ --labels labels.csv

Notes vs the reference:
  * the frozen torch backbone still runs BatchNorm in train mode (running
    stats drift); here the backbone runs in inference mode — with frozen
    weights and no pretrained checkpoint in this environment the drift is
    initialisation noise, not signal.
  * --backbone tiny (a 2-conv encoder, trained end-to-end) exists for
    smoke tests and CI; production pretraining uses the default kimia.
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simclr_lr_schedule(lr0: float, epochs: int, steps_per_epoch: int,
                       warmup_epochs: int = 10):
    """torch CosineAnnealingLR(T_max=epochs, eta_min=0) whose .step() runs
    at the END of each epoch >= warmup_epochs (kimia_simclr.py:185-188):
    constant lr0 through the warmup, then cosine over the step count taken
    so far. Returns lr(update_count)."""
    import jax.numpy as jnp

    def lr(count):
        epoch = count // max(steps_per_epoch, 1)
        # .step() runs at the END of each epoch >= warmup, so during epoch
        # e the scheduler has advanced max(e - warmup, 0) times
        t = jnp.minimum(jnp.maximum(epoch - warmup_epochs, 0), epochs)
        return lr0 * 0.5 * (1.0 + jnp.cos(jnp.pi * t / max(epochs, 1)))

    return lr


def build_model(backbone: str, proj_dim: int):
    """(flax module, feature_dim). kimia -> the KimiaNet fully_connected
    twin (backbone out_1 [B,1024] + fc_4 projection, densenet.py:78-90);
    tiny -> a small conv encoder with the same (out_1, out_3) contract."""
    from flax import linen as nn

    if backbone == "kimia":
        from wsi_hgnn_tpu.models.featurizers import KimiaNet

        return KimiaNet(num_classes=proj_dim), 1024

    class TinyEncoder(nn.Module):
        proj_dim: int = 64

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.relu(nn.Conv(16, (3, 3), strides=2, name="conv0")(x))
            x = nn.relu(nn.Conv(32, (3, 3), strides=2, name="conv1")(x))
            pooled = x.mean(axis=(1, 2))
            out_1 = nn.Dense(64, name="feat")(pooled)
            return out_1, nn.Dense(self.proj_dim, name="fc_4")(pooled)

    return TinyEncoder(proj_dim=proj_dim), 64


def list_corpus(patch_dir: str, exts=("jpeg", "jpg", "png")) -> list:
    paths = []
    for e in exts:
        paths += glob.glob(os.path.join(patch_dir, "**", "*." + e),
                           recursive=True)
    return sorted(paths)


def load_batch(paths, size):
    from wsi_hgnn_tpu.pipeline.patches import load_patch

    return np.stack([load_patch(p, size) for p in paths])


def pretrain(args):
    import jax
    import jax.numpy as jnp
    import optax

    from wsi_hgnn_tpu.models.mil.simclr import (
        make_simclr_train_step, nt_xent_loss, augment_pair,
    )

    paths = list_corpus(args.patch_dir)
    if len(paths) < 2 * args.batch:
        raise SystemExit(f"need >= {2 * args.batch} patches, found {len(paths)}")
    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(paths))
    n_val = max(int(len(paths) * args.valid_size), args.batch)
    val_paths = [paths[i] for i in order[:n_val]]
    train_paths = [paths[i] for i in order[n_val:]]
    print(f"{len(train_paths)} train / {len(val_paths)} val patches")

    model, feat_dim = build_model(args.backbone, args.proj_dim)
    init = model.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, args.image_size, args.image_size, 3)),
                      train=False)
    params, bstats = init["params"], init.get("batch_stats", {})

    def encoder_apply(p, imgs):
        out = model.apply(
            {"params": p, **({"batch_stats": bstats} if bstats else {})},
            imgs, train=False,
        )
        return out[1]  # fc_4 projection (kimia_simclr.py _step uses zis)

    steps_per_epoch = max(len(train_paths) // args.batch, 1)
    lr = simclr_lr_schedule(args.lr, args.epochs, steps_per_epoch,
                            args.warmup_epochs)
    adam = optax.chain(optax.add_decayed_weights(args.wd),
                       optax.scale_by_adam(),
                       optax.scale_by_learning_rate(lr))
    if args.train_backbone:
        tx = adam
    else:
        # the reference freezes every backbone param and trains fc_4 only
        # (kimia_simclr.py:82-87)
        def label(p):
            return jax.tree.map_with_path(
                lambda kp, _: "train" if kp[0].key == "fc_4" else "freeze", p
            )

        tx = optax.multi_transform(
            {"train": adam, "freeze": optax.set_to_zero()}, label
        )
    opt_state = tx.init(params)
    step = make_simclr_train_step(encoder_apply, tx)

    @jax.jit
    def val_loss_fn(p, key, imgs):
        v1, v2 = augment_pair(key, imgs)
        return nt_xent_loss(encoder_apply(p, v1), encoder_apply(p, v2))

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(args.seed + 1)
    best_val = np.inf
    for epoch in range(args.epochs):
        rng.shuffle(train_paths)
        for s in range(steps_per_epoch):
            imgs = load_batch(
                train_paths[s * args.batch:(s + 1) * args.batch],
                args.image_size)
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k,
                                           jnp.asarray(imgs))
        vlosses = []
        for s in range(0, len(val_paths) - args.batch + 1, args.batch):
            imgs = load_batch(val_paths[s:s + args.batch], args.image_size)
            vlosses.append(float(val_loss_fn(
                params, jax.random.PRNGKey(args.seed + 2 + s),
                jnp.asarray(imgs))))
        vloss = float(np.mean(vlosses)) if vlosses else float(loss)
        print(f"[{epoch + 1}/{args.epochs}] train_loss {float(loss):.3f} "
              f"val_loss {vloss:.3f}")
        if vloss < best_val:
            best_val = vloss
            with open(os.path.join(args.out, "best.pkl"), "wb") as f:
                pickle.dump({"params": jax.device_get(params),
                             "batch_stats": jax.device_get(bstats),
                             "backbone": args.backbone,
                             "proj_dim": args.proj_dim,
                             "feat_dim": feat_dim,
                             "image_size": args.image_size}, f)
            print("saved", os.path.join(args.out, "best.pkl"))
    return os.path.join(args.out, "best.pkl")


def extract(args):
    """Backbone features (out_1 — what build_graphs.py consumes from its
    pretrained encoder) per slide dir -> train_mil bag .npz files."""
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.models.mil.simclr import coords_from_patch_names

    with open(args.ckpt, "rb") as f:
        ckpt = pickle.load(f)
    model, _ = build_model(ckpt["backbone"], ckpt["proj_dim"])
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    size = ckpt.get("image_size", 256)

    @jax.jit
    def feats_fn(imgs):
        return model.apply(variables, imgs, train=False)[0]

    slide_dirs = sorted(
        d for d in glob.glob(os.path.join(args.patch_dir, "*"))
        if os.path.isdir(d)
    ) or [args.patch_dir]
    os.makedirs(args.out, exist_ok=True)
    for d in slide_dirs:
        paths = sorted(
            p for p in glob.glob(os.path.join(d, "*"))
            if os.path.isfile(p) and p.rsplit(".", 1)[-1] in
            ("jpeg", "jpg", "png")
        )
        if not paths:
            continue
        feats = []
        for s in range(0, len(paths), args.batch):
            imgs = load_batch(paths[s:s + args.batch], size)
            # pad the trailing chunk to the full batch so every call hits
            # ONE compiled program (a compile per trailing size costs
            # minutes on remote-compile platforms); slice the pad back off
            b = imgs.shape[0]
            if b < args.batch:
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], args.batch - b, axis=0)])
            feats.append(
                np.asarray(feats_fn(jnp.asarray(imgs)), np.float32)[:b])
        feats = np.concatenate(feats)
        try:
            xy = np.asarray(coords_from_patch_names(
                [os.path.basename(p) for p in paths]), np.int64)
        except ValueError:
            xy = None
        out = os.path.join(args.out, os.path.basename(d) + ".npz")
        if xy is not None:
            np.savez(out, feat=feats, xy=xy)
        else:
            np.savez(out, feat=feats)
        print(f"{out}: {feats.shape}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch-dir", required=True,
                    help="pretrain: a patch corpus (recursive); extract: "
                         "per-slide bag dirs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--extract", action="store_true")
    ap.add_argument("--ckpt", default=None, help="extract: best.pkl path")
    ap.add_argument("--backbone", default="kimia", choices=["kimia", "tiny"])
    ap.add_argument("--proj-dim", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--wd", type=float, default=1e-5)
    ap.add_argument("--valid-size", type=float, default=0.1)
    ap.add_argument("--warmup-epochs", type=int, default=10)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-backbone", action="store_true",
                    help="train the full encoder (the reference freezes "
                         "the backbone; use for the tiny smoke backbone)")
    args = ap.parse_args(argv)

    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    if args.extract:
        if not args.ckpt:
            raise SystemExit("--extract needs --ckpt")
        return extract(args)
    return pretrain(args)


if __name__ == "__main__":
    main()
