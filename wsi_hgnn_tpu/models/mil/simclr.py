"""SimCLR contrastive featurizer pretraining + spatial-adjacency graphs —
the GTNMIL preprocessing capabilities (SURVEY.md §2.5: baselines/GTNMIL/
feature_extractor/ — SimCLR pretraining :31-160, build_graphs.py spatial
8-adjacency from tile coordinates :78-96).

  * `nt_xent_loss`: normalised-temperature cross entropy over 2N augmented
    views (the SimCLR objective), masked self-similarity.
  * `simclr_train_step`: one contrastive step for any flax encoder
    (e.g. featurizers.EfficientNet as the backbone + projection head).
  * `augment_pair`: the standard crop/flip/color-jitter view pair, as pure
    jnp ops on [B, H, W, 3] batches.
  * `spatial_adjacency`: 8-neighbour adjacency from `{col}_{row}` tile
    coordinates — the GTNMIL graph construction, which connects patches by
    SPATIAL proximity rather than feature-space KNN.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nt_xent_loss(z1: jax.Array, z2: jax.Array, temperature: float = 0.5) -> jax.Array:
    """SimCLR NT-Xent: z1/z2 are [B, D] projections of two views."""
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = z @ z.T / temperature                       # [2B, 2B]
    sim = jnp.where(jnp.eye(2 * b, dtype=bool), -1e9, sim)
    # positives: i <-> i+b
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logprob = jax.nn.log_softmax(sim, axis=1)
    return -jnp.take_along_axis(logprob, pos_idx[:, None], axis=1).mean()


def augment_pair(key: jax.Array, images: jax.Array,
                 crop_frac: float = 0.8) -> Tuple[jax.Array, jax.Array]:
    """Two stochastic views per image: random resized crop (fixed output
    size), horizontal flip, brightness jitter."""
    b, h, w, c = images.shape

    def one_view(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ch = int(h * crop_frac)
        cw = int(w * crop_frac)
        top = jax.random.randint(k1, (b,), 0, h - ch + 1)
        left = jax.random.randint(k2, (b,), 0, w - cw + 1)

        def crop(img, t, l):
            patch = jax.lax.dynamic_slice(img, (t, l, 0), (ch, cw, c))
            return jax.image.resize(patch, (h, w, c), "bilinear")

        out = jax.vmap(crop)(images, top, left)
        flip = jax.random.bernoulli(k3, 0.5, (b,))
        out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
        bright = jax.random.uniform(k4, (b, 1, 1, 1), minval=0.8, maxval=1.2)
        return jnp.clip(out * bright, 0.0, 1.0)

    ka, kb = jax.random.split(key)
    return one_view(ka), one_view(kb)


def make_simclr_train_step(encoder_apply: Callable, tx) -> Callable:
    """Jitted SimCLR step. encoder_apply(params, images) -> [B, D]
    projections (wrap dropout rngs into the closure if the encoder needs
    them — see the rng-threaded variant below); tx is an optax transform.

    Pass a 3-arg encoder_apply(params, images, rng) to receive a fresh
    dropout key per view."""
    import inspect

    n_args = len(inspect.signature(encoder_apply).parameters)

    @jax.jit
    def step(params, opt_state, key, images):
        k_aug, k1, k2 = jax.random.split(key, 3)
        v1, v2 = augment_pair(k_aug, images)

        def loss_fn(p):
            if n_args >= 3:
                z1 = encoder_apply(p, v1, k1)
                z2 = encoder_apply(p, v2, k2)
            else:
                z1 = encoder_apply(p, v1)
                z2 = encoder_apply(p, v2)
            return nt_xent_loss(z1, z2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def spatial_adjacency(coords: Sequence[Tuple[int, int]]) -> Tuple[np.ndarray, np.ndarray]:
    """(src, dst) 8-neighbour spatial edges from `{col}_{row}` tile coords
    (GTNMIL build_graphs.py:78-96): patches adjacent on the tile grid
    (including diagonals) are connected, both directions."""
    index = {tuple(c): i for i, c in enumerate(coords)}
    src, dst = [], []
    for i, (x, y) in enumerate(coords):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                j = index.get((x + dx, y + dy))
                if j is not None:
                    src.append(i)
                    dst.append(j)
    return np.asarray(src, np.int32), np.asarray(dst, np.int32)


def coords_from_patch_names(names: Sequence[str]) -> List[Tuple[int, int]]:
    """`{col}_{row}.jpeg` tile filenames -> (col, row) ints."""
    out = []
    for n in names:
        stem = n.rsplit(".", 1)[0]
        x, y = stem.split("_")[:2]
        out.append((int(x), int(y)))
    return out
