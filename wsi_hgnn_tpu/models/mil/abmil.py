"""ABMIL — attention-based multiple-instance learning.

Re-design of /root/reference/baselines/ReMix_DSMIL_ABMIL/model/abmil.py:
`BClassifier` (linear-ReLU-linear attention over instances, softmax across
the bag, attention-weighted mean, linear classifier, :6-30) and the gated
variant (tanh/sigmoid gates, :62-113). Instances are masked padded bags.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...graph.ops import _NEG_INF


def _masked_softmax(scores: jax.Array, mask: Optional[jax.Array], axis: int):
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    return jax.nn.softmax(scores, axis=axis)


class ABMIL(nn.Module):
    """Reference BClassifier (abmil.py:6-30): A = softmax(W2 relu(W1 H));
    bag = A @ H; logits = classifier(bag). Input [N, D] (+ mask)."""

    num_classes: int

    @nn.compact
    def __call__(self, feats: jax.Array, mask: Optional[jax.Array] = None):
        d = feats.shape[-1]
        a = nn.Dense(d, name="attention_0")(feats)
        a = nn.relu(a)
        a = nn.Dense(1, name="attention_1")(a)[:, 0]  # [N]
        a = _masked_softmax(a, mask, axis=0)
        if mask is not None:
            a = jnp.where(mask, a, 0.0)
        bag = a @ feats  # [D]
        return nn.Dense(self.num_classes, name="classifier")(bag)[None, :]


class GatedABMIL(nn.Module):
    """Reference GatedAttention core (abmil.py:62-113) on precomputed
    features: A = w(tanh(V h) * sigmoid(U h)); binary sigmoid output."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, feats: jax.Array, mask: Optional[jax.Array] = None):
        av = jnp.tanh(nn.Dense(self.hidden_dim, name="attention_V")(feats))
        au = jax.nn.sigmoid(nn.Dense(self.hidden_dim, name="attention_U")(feats))
        a = nn.Dense(1, name="attention_weights")(av * au)[:, 0]
        a = _masked_softmax(a, mask, axis=0)
        if mask is not None:
            a = jnp.where(mask, a, 0.0)
        bag = a @ feats
        y_prob = jax.nn.sigmoid(nn.Dense(1, name="classifier")(bag))
        return y_prob[None, :], a
