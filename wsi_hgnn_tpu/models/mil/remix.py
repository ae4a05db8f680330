"""ReMix — prototype-based bag reduction + latent augmentation.

Re-design of /root/reference/baselines/ReMix_DSMIL_ABMIL/reduce.py:10-58 and
train_remix_k-fold.py:71-123:
  * `reduce_bag`: per-bag K-means prototypes (JAX k-means: matmul assignment
    + segment-mean update, replacing faiss) plus per-cluster "semantic
    shift" vectors sampled from N(0, cluster covariance);
  * `mix_aug`: latent augmentation between a source bag and a same-class
    target bag — modes replace / append / interpolate / cov / joint, each
    applied per-instance with probability `rate` against the closest target
    prototype (host-side numpy, faithful to the reference's semantics).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(feats: jax.Array, k: int, iters: int = 20, seed: int = 66):
    """Plain Lloyd k-means on device: assignment = argmin pairwise distance
    (one GEMM), update = segment mean. Returns (centroids [k, D],
    assignments [N])."""
    n, d = feats.shape
    key = jax.random.PRNGKey(seed)
    # k-means++ init: first centre uniform, then each next centre sampled
    # proportional to squared distance from the chosen set
    first = jax.random.randint(key, (), 0, n)
    cent0 = feats[first]
    cents = [cent0]
    d2min = jnp.sum((feats - cent0) ** 2, axis=1)
    for i in range(1, k):
        key, sub = jax.random.split(key)
        probs = d2min / jnp.maximum(d2min.sum(), 1e-12)
        nxt = jax.random.choice(sub, n, p=probs)
        c = feats[nxt]
        cents.append(c)
        d2min = jnp.minimum(d2min, jnp.sum((feats - c) ** 2, axis=1))
    cent = jnp.stack(cents)

    def step(cent, _):
        d2 = (
            jnp.sum(feats**2, 1, keepdims=True)
            - 2 * feats @ cent.T
            + jnp.sum(cent**2, 1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(feats, assign, num_segments=k)
        cnts = jax.ops.segment_sum(jnp.ones(n), assign, num_segments=k)
        new_cent = sums / jnp.maximum(cnts, 1.0)[:, None]
        # keep old centroid for empty clusters
        new_cent = jnp.where((cnts > 0)[:, None], new_cent, cent)
        return new_cent, assign

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    # final assignment AGAINST THE RETURNED centroids (the scan's last
    # assignment predates its last update; faiss assigns with the final
    # centroids) — covariance/shift vectors then match the prototypes
    d2 = (
        jnp.sum(feats**2, 1, keepdims=True)
        - 2 * feats @ cent.T
        + jnp.sum(cent**2, 1)[None, :]
    )
    return cent, jnp.argmin(d2, axis=1)


def reduce_bag(feats: np.ndarray, num_prototypes: int,
               num_shift_vectors: int = 200, seed: int = 66):
    """(prototypes [K, D], shift_vectors [K, S, D]) for one bag
    (reduce.py:14-38)."""
    cent, assign = kmeans(jnp.asarray(feats, jnp.float32), num_prototypes, seed=seed)
    cent, assign = np.asarray(cent), np.asarray(assign)
    rng = np.random.RandomState(seed)
    shifts = []
    d = feats.shape[1]
    for i in range(num_prototypes):
        members = feats[assign == i]
        if len(members) >= 2:
            cov = np.cov(members.T)
        else:
            cov = np.eye(d, dtype=np.float64) * 1e-6
        shifts.append(
            rng.multivariate_normal(np.zeros(d), cov, size=num_shift_vectors)
        )
    return cent, np.asarray(shifts, np.float32)


def mix_aug(src_feats: np.ndarray, tgt_feats: np.ndarray, mode: str = "replace",
            rate: float = 0.3, strength: float = 0.5,
            shift: Optional[np.ndarray] = None,
            rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Latent inter-bag augmentation (train_remix_k-fold.py:71-107)."""
    assert mode in ("replace", "append", "interpolate", "cov", "joint")
    rng = rng or np.random.RandomState()
    d = src_feats.shape[-1]
    src = src_feats.reshape(-1, d)
    tgt = tgt_feats.reshape(-1, d)
    auged = [f for f in src]
    # closest target prototype per source instance
    d2 = (
        (src**2).sum(1, keepdims=True) - 2 * src @ tgt.T + (tgt**2).sum(1)[None]
    )
    closest = np.argmin(d2, axis=1)

    def apply(ix, m):
        if m == "replace":
            auged[ix] = tgt[closest[ix]]
        elif m == "append":
            auged.append(tgt[closest[ix]])
        elif m == "interpolate":
            auged.append((1 - strength) * auged[ix] + strength * tgt[closest[ix]])
        elif m == "cov":
            sv = shift[closest[ix]][rng.choice(shift.shape[1], 1)]
            auged.append((auged[ix][None, :] + strength * sv).flatten())

    for ix in range(len(src)):
        if mode != "joint":
            if rng.rand() <= rate:
                apply(ix, mode)
        else:
            for m in ("replace", "append", "interpolate", "cov"):
                if rng.rand() <= rate:
                    apply(ix, m)
    return np.asarray(auged, np.float32)


def mix_the_bag_aug(bag_feats: np.ndarray, idx: int, train_feats, train_labels,
                    mode: Optional[str], rate: float,
                    semantic_shifts=None,
                    rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Pick a same-class bag and augment (train_remix_k-fold.py:111-123)."""
    if mode is None:
        return bag_feats
    rng = rng or np.random.RandomState()
    labels = np.asarray(train_labels)
    positive = np.argwhere(labels == labels[idx]).reshape(-1)
    selected = rng.choice(positive)
    strength = rng.uniform(0, 1)
    return mix_aug(
        bag_feats, np.asarray(train_feats[selected]),
        shift=semantic_shifts[selected] if mode in ("joint", "cov") else None,
        rate=rate, strength=strength, mode=mode, rng=rng,
    )
