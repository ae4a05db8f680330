"""Shared model building blocks: pooling readouts, typed linears, masked BN.

These replace the reference's `pooling/` package (avg/sum/max readouts with
the per-node-type extension, /root/reference/pooling/*.py), DGL's
`GlobalAttentionPooling`, and the per-node-type `nn.ModuleList` linear stacks
every hetero model carries (/root/reference/models/HGT.py:44-57).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph import TypedGraph, ops


class Pool(nn.Module):
    """Graph readout: 'sum' | 'mean' | 'max' | 'att'.

    'att' is DGL GlobalAttentionPooling — a learned gate softmaxed within
    each graph (/root/reference/models/GCN.py:55-60). The optional `ntype`
    restricts the readout to one node type (the reference's pooling/
    extension, /root/reference/pooling/avg_pooling.py:11-18).
    """

    kind: str

    @nn.compact
    def __call__(self, g: TypedGraph, feat: jax.Array, ntype: Optional[int] = None):
        if self.kind == "sum":
            return ops.readout_sum(g, feat, ntype)
        if self.kind == "mean":
            return ops.readout_mean(g, feat, ntype)
        if self.kind == "max":
            return ops.readout_max(g, feat, ntype)
        if self.kind == "att":
            gate = nn.Dense(1, name="gate_nn")(feat)
            return ops.readout_attention(g, feat, gate, ntype)
        raise NotImplementedError(f"pooling type {self.kind!r}")


class TypedDense(nn.Module):
    """One Dense per node type, applied by each node's own type.

    Replaces per-ntype `nn.ModuleList` linears (adapt_ws / k,q,v,a_linears,
    /root/reference/models/HGT.py:51-55); runs as a single einsum over all
    T weight matrices plus a per-node select (see ops.typed_linear).
    """

    n_types: int
    features: int
    # 'ragged': type-sorted grouped GEMM (ops.typed_linear_ragged) — no
    # [T, N, H] intermediate, the measured TPU winner (lattice default);
    # pass a shared ops.TypeSort via `tsort`.
    # 'onehot': all-T einsum + one-hot select (hetero-zoo default).
    impl: str = "onehot"

    @nn.compact
    def __call__(self, feat: jax.Array, node_type: jax.Array,
                 tsort=None) -> jax.Array:
        d_in = feat.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.n_types, d_in, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.n_types, self.features))
        if self.impl == "ragged":
            # batching-safe: typed_linear_ragged carries custom_vmap rules
            # that swap in the one-hot form under any vmap (e.g. the DP
            # step's device axis), so no dispatch is needed here
            return ops.typed_linear_ragged(feat, node_type, w, b, tsort)
        return ops.typed_linear(feat, node_type, w, b)


class TypedHeads(nn.Module):
    """Per-node-type Dense applied to per-type pooled readouts.

    Input [B, T, D] -> [B, T, features]; replaces the reference's
    `linears_prediction` ModuleDicts keyed by ntype
    (/root/reference/models/HGT.py:141-156, HEATNet4.py:155-160).
    """

    n_types: int
    features: int

    @nn.compact
    def __call__(self, pooled: jax.Array) -> jax.Array:
        d = pooled.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.n_types, d, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.n_types, self.features))
        return jnp.einsum("btd,tdo->bto", pooled, w) + b[None]


class TypedLayerNorm(nn.Module):
    """One LayerNorm per node type (HGT's per-type norms,
    /root/reference/models/HGT.py:56-57,123-124)."""

    n_types: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, node_type: jax.Array) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.n_types, d))
        bias = self.param("bias", nn.initializers.zeros, (self.n_types, d))
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale[node_type] + bias[node_type]


def pool_all_types(g: TypedGraph, feat: jax.Array, kind: str) -> jax.Array:
    """[B, T, D] per-(graph, node-type) readout, fused over types."""
    if kind == "mean":
        out = ops.readout_mean_all_types(g, feat)
    elif kind == "sum":
        out = ops.readout_sum_all_types(g, feat)
    elif kind == "max":
        out = ops.readout_max_all_types(g, feat)
    else:
        # 'att' with a per-ntype readout is a TypeError in the reference too
        raise NotImplementedError(f"per-ntype pooling {kind!r}")
    return out.reshape(g.n_graphs, g.n_node_types, -1)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over real nodes only (padding excluded from statistics).

    Replaces torch `nn.BatchNorm1d` inside GIN's ApplyNodeFunc/MLP
    (/root/reference/models/GIN.py:16,62): batch statistics must not be
    polluted by padded rows, so mean/var are mask-weighted.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        # x [..., D] with mask over the leading axes ([N] flat graphs, or
        # [B, N] dense-padded batches — the GTN MIL block)
        d = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(d))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(d))
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        if train:
            m = mask.astype(x.dtype)[..., None]
            axes = tuple(range(x.ndim - 1))
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axes) / cnt
            var = ((x - mean) ** 2 * m).sum(axes) / cnt
            if not self.is_initializing():
                # torch stores the UNBIASED estimator in running_var
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class LinearAttentionBlock(nn.Module):
    """HEATNet4's per-type gating block (/root/reference/models/HEATNet4.py:20-42).

    With normalize_attn=True and [B, C] inputs the reference block reduces to
    the identity on `l`: the 1x1 conv produces one logit per row, the softmax
    runs over a singleton spatial axis (always 1.0), and the weighted sum
    collapses back to `l`. We keep the faithful computation (including the
    gate parameter, which receives zero gradient) so checkpoints round-trip.
    """

    normalize_attn: bool = True

    @nn.compact
    def __call__(self, l: jax.Array, g: jax.Array) -> jax.Array:
        c = nn.Dense(1, use_bias=False, name="op")(l + g)  # [B, 1]
        if self.normalize_attn:
            # softmax over a length-1 axis == 1.0
            a = jax.nn.softmax(c[:, :, None], axis=2)[:, :, 0]
        else:
            a = jax.nn.sigmoid(c)
        out = a * l
        return out  # both branches collapse to a*l for [B, C] inputs
