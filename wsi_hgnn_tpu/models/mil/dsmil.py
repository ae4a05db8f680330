"""DSMIL — dual-stream MIL (instance stream + bag stream).

Re-design of /root/reference/baselines/ReMix_DSMIL_ABMIL/model/dsmil.py:
IClassifier scores every instance (:17-28); BClassifier picks the
highest-scoring ("critical") instance per class, attends every instance's
query against the critical queries, and classifies the attention-pooled bag
through a per-class Conv1d == per-class inner product (:31-58).
Padding handled by masking the instance scores and attention.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...graph.ops import _NEG_INF


class IClassifier(nn.Module):
    """Per-instance scores on precomputed features (dsmil.py:17-28; the
    feature extractor is identity for feature bags, as in the ReMix path)."""

    num_classes: int

    @nn.compact
    def __call__(self, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return feats, nn.Dense(self.num_classes, name="fc")(feats)


class BClassifier(nn.Module):
    """Bag stream (dsmil.py:31-58)."""

    num_classes: int
    q_dim: int = 128
    dropout_v: float = 0.0

    @nn.compact
    def __call__(self, feats: jax.Array, c: jax.Array,
                 mask: Optional[jax.Array] = None, train: bool = False):
        v = nn.Dropout(self.dropout_v, deterministic=not train)(feats)
        v = nn.Dense(feats.shape[-1], name="v")(v)  # [N, V]
        q_layer = nn.Dense(self.q_dim, name="q")    # shared with q_max (dsmil.py:50)
        q = q_layer(feats)                           # [N, Q]

        scores = c if mask is None else jnp.where(mask[:, None], c, _NEG_INF)
        crit = jnp.argmax(scores, axis=0)            # [C] critical instances
        m_feats = feats[crit]                        # [C, D]
        q_max = q_layer(m_feats)                     # [C, Q]

        a = q @ q_max.T / math.sqrt(self.q_dim)      # [N, C]
        if mask is not None:
            a = jnp.where(mask[:, None], a, _NEG_INF)
        a = jax.nn.softmax(a, axis=0)
        if mask is not None:
            a = jnp.where(mask[:, None], a, 0.0)
        b = a.T @ v                                  # [C, V]

        # fcc = Conv1d(C, C, kernel_size=V) on B [1, C, V] (dsmil.py:39):
        # each output logit mixes ALL class channels,
        # logits[o] = sum_c sum_v W[o, c, v] * B[c, v] + bias[o]
        w = self.param(
            "fcc_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal",
                                             in_axis=(-2, -1)),
            (self.num_classes, self.num_classes, b.shape[-1]),
        )
        bias = self.param("fcc_bias", nn.initializers.zeros, (self.num_classes,))
        logits = jnp.einsum("ocv,cv->o", w, b) + bias  # [C]
        return logits[None, :], a, b


class DSMIL(nn.Module):
    """MILNet (dsmil.py:61-70): returns (instance logits, bag logits, A, B).
    The training loss combines bag CE with the max instance score CE, as in
    the reference trainer."""

    num_classes: int
    dropout_v: float = 0.0

    @nn.compact
    def __call__(self, feats: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False):
        feats_o, classes = IClassifier(self.num_classes, name="i_classifier")(feats)
        bag_logits, a, b = BClassifier(
            self.num_classes, dropout_v=self.dropout_v, name="b_classifier"
        )(feats_o, classes, mask, train)
        return classes, bag_logits, a, b
