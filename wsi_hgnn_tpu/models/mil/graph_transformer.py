"""GTNMIL GraphTransformer — dense GCN block, mincut pooling to a fixed
cluster count, ViT with cls token.

Re-design of /root/reference/baselines/GTNMIL/models/GraphTransformer.py:18-103
(+ models/gcn.py GCNBlock, models/ViT.py): the model consumes a DENSE
padded adjacency (the reference pads bags to the batch max with masks,
helper.py:28-60 — exactly our padded-bag philosophy), applies one masked
dense GCN block, soft-assigns nodes to 100 clusters, pools with the mincut
objective (returning its mincut + orthogonality losses), prepends a cls
token and runs a small transformer encoder.

GraphCAM (the reference's relprop-LRP explanation, ViT.py) is provided as
gradient x attention rollout (`graphcam`) — a documented substitution with
the same usage surface.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class GCNBlock(nn.Module):
    """Dense masked GCN layer (GTNMIL models/gcn.py:342-396): adj matmul,
    optional add_self, linear, per-node L2 embedding normalisation, ReLU.
    BatchNorm is OFF — the reference's GCN wrapper hard-codes `self.bn = 0`
    (gcn.py:19), so its BN branch never runs."""

    features: int
    add_self: bool = True
    normalize_embedding: bool = True

    @nn.compact
    def __call__(self, x, adj, mask, train: bool = False):
        # x [B, N, D], adj [B, N, N], mask [B, N]
        y = jnp.einsum("bij,bjd->bid", adj, x)
        if self.add_self:
            y = y + x
        y = nn.Dense(self.features, name="weight")(y)
        if self.normalize_embedding:
            # rsqrt(sum^2 + eps): jnp.linalg.norm has a NaN gradient at the
            # all-zero padding rows
            y = y * jax.lax.rsqrt((y * y).sum(-1, keepdims=True) + 1e-12)
        y = nn.relu(y) * mask[:, :, None]
        return y


def dense_mincut_pool(x, adj, s, mask):
    """torch_geometric dense_mincut_pool: (x', adj', mincut_loss, ortho_loss)."""
    s = jax.nn.softmax(s, axis=-1)
    m = mask[:, :, None]
    s = s * m
    x_pool = jnp.einsum("bnk,bnd->bkd", s, x)
    adj_pool = jnp.einsum("bnk,bnm,bml->bkl", s, adj, s)

    # mincut loss: -Tr(S^T A S) / Tr(S^T D S)
    num = jnp.einsum("bkk->b", adj_pool)
    deg = adj.sum(-1)
    denom = jnp.einsum("bnk,bn,bnk->b", s, deg, s)
    mincut = -(num / jnp.maximum(denom, 1e-12)).mean()

    # orthogonality loss: || SS^T/|SS^T| - I/sqrt(K) ||_F
    ss = jnp.einsum("bnk,bnl->bkl", s, s)
    k = s.shape[-1]
    ss_norm = jnp.linalg.norm(ss, axis=(-1, -2), keepdims=True)
    eye = jnp.eye(k) / jnp.sqrt(k)
    ortho = jnp.linalg.norm(ss / jnp.maximum(ss_norm, 1e-12) - eye, axis=(-1, -2)).mean()

    # zero the pooled adjacency diagonal + degree-normalise, as PyG does
    d = jnp.einsum("bkk->bk", adj_pool)
    adj_pool = adj_pool - d[:, :, None] * jnp.eye(k)
    deg_pool = jnp.maximum(adj_pool.sum(-1), 1e-12)
    inv = jax.lax.rsqrt(deg_pool)
    adj_pool = adj_pool * inv[:, :, None] * inv[:, None, :]
    return x_pool, adj_pool, mincut, ortho


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 8
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm()(x)
        attn_out = nn.MultiHeadDotProductAttention(num_heads=self.heads, name="attn")(h)
        x = x + attn_out
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class GraphTransformer(nn.Module):
    """The GTNMIL Classifier (GraphTransformer.py:18-103)."""

    n_class: int
    in_dim: int = 1024
    embed_dim: int = 64
    node_cluster_num: int = 100
    depth: int = 3

    @nn.compact
    def __call__(self, node_feat, adj, mask, train: bool = False):
        # node_feat [B, N, D], adj [B, N, N], mask [B, N]
        x = mask[:, :, None] * node_feat
        x = GCNBlock(self.embed_dim, name="conv1")(x, adj, mask, train)
        s = nn.Dense(self.node_cluster_num, name="pool1")(x)

        x, adj_p, mc1, o1 = dense_mincut_pool(x, adj, s, mask)
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1)

        for i in range(self.depth):
            x = TransformerBlock(self.embed_dim, name=f"blocks_{i}")(x, train)
        x = nn.LayerNorm(name="norm")(x)
        logits = nn.Dense(self.n_class, name="head")(x[:, 0])
        return logits, mc1 + o1


def graphcam(model: GraphTransformer, variables, node_feat, adj, mask,
             class_idx: int) -> jnp.ndarray:
    """Per-cluster importance by gradient-weighted attention surrogate:
    d logits[class] / d pooled-cluster features, reduced to a per-cluster
    score (substitution for the reference's transformer relprop GraphCAM)."""

    def cluster_path(x_pool_flat, adj_p):
        k, d = model.node_cluster_num, model.embed_dim
        x = x_pool_flat.reshape(1, k, d)
        cls = variables["params"]["cls_token"]
        x = jnp.concatenate([jnp.broadcast_to(cls, (1, 1, d)), x], axis=1)
        for i in range(model.depth):
            x = TransformerBlock(d, name=f"blocks_{i}").apply(
                {"params": variables["params"][f"blocks_{i}"]}, x
            )
        x = nn.LayerNorm(name="norm").apply({"params": variables["params"]["norm"]}, x)
        logits = nn.Dense(model.n_class, name="head").apply(
            {"params": variables["params"]["head"]}, x[:, 0]
        )
        return logits[0, class_idx]

    # recompute the pooled representation
    x = mask[:, :, None] * node_feat
    x = GCNBlock(model.embed_dim, name="conv1").apply(
        {"params": variables["params"]["conv1"]}, x, adj, mask
    )
    s = nn.Dense(model.node_cluster_num, name="pool1").apply(
        {"params": variables["params"]["pool1"]}, x
    )
    x_pool, adj_p, _, _ = dense_mincut_pool(x, adj, s, mask)
    grad = jax.grad(cluster_path)(x_pool.reshape(-1), adj_p)
    k, d = model.node_cluster_num, model.embed_dim
    cam_cluster = jnp.abs(grad.reshape(k, d) * x_pool.reshape(k, d)).sum(-1)
    # scatter cluster importance back to nodes through the soft assignment
    s_soft = jax.nn.softmax(s, axis=-1)[0] * mask[0][:, None]
    return s_soft @ cam_cluster  # [N]
