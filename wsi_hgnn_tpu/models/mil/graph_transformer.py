"""GTNMIL GraphTransformer — dense GCN block, mincut pooling to a fixed
cluster count, ViT with cls token.

Re-design of /root/reference/baselines/GTNMIL/models/GraphTransformer.py:18-103
(+ models/gcn.py GCNBlock, models/ViT.py): the model consumes a DENSE
padded adjacency (the reference pads bags to the batch max with masks,
helper.py:28-60 — exactly our padded-bag philosophy), applies one masked
dense GCN block, soft-assigns nodes to 100 clusters, pools with the mincut
objective (returning its mincut + orthogonality losses), prepends a cls
token and runs a small transformer encoder.

GraphCAM is the reference's true transformer-LRP relprop
(models/ViT.py:341-385 + models/layers.py rules at alpha=1), implemented
functionally in `relprop.py` and golden-tested against the torch reference;
`graphcam` here maps the cls-token cluster relevances back to nodes through
the softmaxed assignment matrix exactly as src/vis_graphcam.py:71-87 does.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MaskedBatchNorm


class GCNBlock(nn.Module):
    """Dense masked GCN layer (GTNMIL models/gcn.py:342-396): adj matmul,
    optional add_self, linear, per-node L2 embedding normalisation, then
    masked BatchNorm and optionally ReLU. The GTNMIL Classifier builds it
    with bn=1, relu=0 (GraphTransformer.py:30-34) — so the defaults here
    are BN ON, ReLU OFF. (gcn.py:19's `bn=0` belongs to AGCNBlock, a
    wrapper the Classifier never uses.)"""

    features: int
    add_self: bool = True
    normalize_embedding: bool = True
    use_bn: bool = True
    relu: bool = False

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
        if self.use_bn:
            # the shared masked BatchNorm (layers.py) — the reference
            # gathers real rows, BatchNorm1d's them, and scatters back
            # (gcn.py:373-388)
            y = MaskedBatchNorm(name="bn")(y, mask.astype(bool), train)
        if self.relu:
            y = nn.relu(y)
        return y * mask[:, :, None]


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
    """Reference ViT block (ViT.py:243-264): pre-norm attention with a fused
    bias-free qkv projection (qkv_bias=False, :141), scale = head_dim**-0.5,
    then a pre-norm 2x GELU MLP (mlp_ratio=2.0, VisionTransformer :281).
    Explicit q/k/v so the LRP relprop pass (relprop.py) can mirror it."""

    dim: int
    heads: int = 8
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        hd = self.dim // self.heads
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="qkv")(h)
        # einops 'b n (qkv h d) -> qkv b h n d' (ViT.py:186)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * hd ** -0.5, axis=-1
        )
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        x = x + nn.Dense(self.dim, name="proj")(out)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
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
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)  # torch default eps
        logits = nn.Dense(self.n_class, name="head")(x[:, 0])
        return logits, mc1 + o1


def graphcam(model: GraphTransformer, variables, node_feat, adj, mask,
             class_idx: int,
             method: str = "transformer_attribution") -> jnp.ndarray:
    """GraphCAM: per-node relevance for `class_idx` via the reference's
    transformer-LRP relprop (GraphTransformer.py:86-101 + ViT.py:341-385,
    alpha=1, implemented in relprop.py), mapped from the 100 mincut
    clusters back to nodes through the softmaxed assignment matrix exactly
    as src/vis_graphcam.py:71-87 does (cam_node = softmax(s) @ cam)."""
    from .relprop import vit_relprop

    # recompute the pooled cluster tokens (the ViT input)
    x = mask[:, :, None] * node_feat
    conv_vars = {"params": variables["params"]["conv1"]}
    stats = variables.get("batch_stats", {}).get("conv1")
    if stats:
        conv_vars["batch_stats"] = stats
    x = GCNBlock(model.embed_dim, name="conv1").apply(
        conv_vars, x, adj, mask
    )
    s = nn.Dense(model.node_cluster_num, name="pool1").apply(
        {"params": variables["params"]["pool1"]}, x
    )
    x_pool, _, _, _ = dense_mincut_pool(x, adj, s, mask)
    cls = variables["params"]["cls_token"]
    d = model.embed_dim
    tokens = jnp.concatenate(
        [jnp.broadcast_to(cls, (1, 1, d)), x_pool[:1]], axis=1
    )
    cam_cluster = vit_relprop(
        variables["params"], tokens, class_idx, method=method
    )  # [node_cluster_num]
    # vis_graphcam.py:71-87: assignment = softmax(s), cam_node = assign @ cam
    s_soft = jax.nn.softmax(s, axis=-1)[0] * mask[0][:, None]
    return s_soft @ cam_cluster  # [N]
