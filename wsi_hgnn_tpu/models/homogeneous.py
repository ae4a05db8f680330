"""Homogeneous GNN zoo: GCN, GAT, GIN, NTPoolGCN.

Re-designs of /root/reference/models/{GCN,GAT,GIN,GCN_NTPool}.py for the
flat TypedGraph representation. All share the reference's jumping-knowledge
readout pattern: pool the node features before every conv layer through a
per-layer Dense head, then combine the per-layer graph logits
(mean for GCN/GAT, sum for GIN; /root/reference/models/GCN.py:64-79,
GIN.py:153-177).

Every `__call__` takes a (possibly batched) TypedGraph and returns
logits [n_graphs, out_dim].
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph import TypedGraph, ops
from .layers import MaskedBatchNorm, Pool, TypedDense, TypedHeads


class GraphConvLayer(nn.Module):
    """DGL `GraphConv` with norm='both': out = D_in^{-1/2} A D_out^{-1/2} X W + b.

    (/root/reference/models/GCN.py:11,30-33.) `implicit_self_loops=True`
    reproduces `dgl.add_self_loop` without materialised edges — used by
    NTPoolGCN, which adds self-loops on its internal homogeneous view
    (/root/reference/models/GCN_NTPool.py:90-91).
    """

    features: int
    activation: Optional[Callable] = None
    implicit_self_loops: bool = False

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array) -> jax.Array:
        out_deg, in_deg = g.degrees(implicit_self_loops=self.implicit_self_loops)
        # DGL clamps zero degrees to 1
        c_src = jax.lax.rsqrt(jnp.maximum(out_deg, 1.0))
        c_dst = jax.lax.rsqrt(jnp.maximum(in_deg, 1.0))

        # DGL GraphConv has a single (post-aggregation) bias; the
        # projection itself is bias-free
        h = nn.Dense(self.features, use_bias=False, name="weight")(h)
        msg_in = h * c_src[:, None]
        agg = ops.copy_u_sum(g, msg_in)
        if self.implicit_self_loops:
            agg = agg + jnp.where(g.node_mask[:, None], msg_in, 0.0)
        rst = agg * c_dst[:, None]
        rst = rst + self.param("bias", nn.initializers.zeros, (self.features,))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GCN(nn.Module):
    """Reference GCN (/root/reference/models/GCN.py:15-79)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    dropout: float = 0.0
    graph_pooling_type: str = "att"
    activation: Callable = nn.relu
    implicit_self_loops: bool = False

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        h = g.feat
        h_list = []
        for i in range(self.n_layers):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            pooled = Pool(self.graph_pooling_type, name=f"pool_{i}")(g, h)
            h_list.append(nn.Dense(self.out_dim, name=f"pred_{i}")(pooled))
            h = GraphConvLayer(
                self.hidden_dim,
                activation=self.activation,
                implicit_self_loops=self.implicit_self_loops,
                name=f"conv_{i}",
            )(g, h)
        pooled = Pool(self.graph_pooling_type, name=f"pool_{self.n_layers}")(g, h)
        h_list.append(nn.Dense(self.out_dim, name="classify")(pooled))
        return jnp.stack(h_list).mean(0)


class GATConvLayer(nn.Module):
    """DGL `GATConv` (/root/reference/models/GAT.py:14,36-51): multi-head
    additive attention with feat/attn dropout, optional residual, bias."""

    features: int  # per-head output dim
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array, train: bool = False) -> jax.Array:
        h_in = h
        h = nn.Dropout(self.feat_drop, deterministic=not train)(h)
        z = nn.Dense(self.num_heads * self.features, use_bias=False, name="fc")(h)
        z = z.reshape(-1, self.num_heads, self.features)

        attn_l = self.param(
            "attn_l", nn.initializers.xavier_normal(), (1, self.num_heads, self.features)
        )
        attn_r = self.param(
            "attn_r", nn.initializers.xavier_normal(), (1, self.num_heads, self.features)
        )
        el = (z * attn_l).sum(-1)  # [N, H]
        er = (z * attn_r).sum(-1)
        e = nn.leaky_relu(el[g.src] + er[g.dst], negative_slope=self.negative_slope)
        alpha = ops.segment_softmax(
            e, g.dst, num_segments=g.num_nodes, mask=g.edge_mask,
            indices_are_sorted=g.edges_sorted, axis_name=g.edge_axis,
        )
        alpha = nn.Dropout(self.attn_drop, deterministic=not train)(alpha)
        out = ops.u_mul_e_sum(g, z, alpha[:, :, None])  # [N, H, F]

        if self.residual:
            # DGL GATConv semantics: the residual reads the FEAT-DROPPED
            # input, and is the Identity (no res_fc weights) when the
            # input width already equals num_heads * out_feats
            if h.shape[-1] == self.num_heads * self.features:
                res = h
            else:
                res = nn.Dense(self.num_heads * self.features,
                               use_bias=False, name="res_fc")(h)
            out = out + res.reshape(-1, self.num_heads, self.features)
        out = out + self.param(
            "bias", nn.initializers.zeros, (self.num_heads, self.features)
        )
        if self.activation is not None:
            out = self.activation(out)
        return out


class GAT(nn.Module):
    """Reference GAT (/root/reference/models/GAT.py:18-93): n_layers+1 GATConv
    stack with per-layer head counts, flattened heads, pooled per-layer
    prediction heads averaged into logits."""

    n_layers: int
    in_dim: int
    hidden_dim: int
    out_dim: int
    heads: Sequence[int]
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    graph_pooling_type: str = "att"

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        h = g.feat
        h_list = []
        act = lambda x: nn.leaky_relu(x, negative_slope=0.01)  # F.leaky_relu default
        for i in range(self.n_layers + 1):
            pooled = Pool(self.graph_pooling_type, name=f"pool_{i}")(g, h)
            h_list.append(nn.Dense(self.out_dim, name=f"pred_{i}")(pooled))
            last = i == self.n_layers
            layer = GATConvLayer(
                features=self.out_dim if last else self.hidden_dim,
                num_heads=self.heads[i],
                feat_drop=self.feat_drop,
                attn_drop=self.attn_drop,
                negative_slope=self.negative_slope,
                residual=self.residual if last else (False if i == 0 else self.residual),
                activation=None if last else act,
                name=f"gat_{i}",
            )
            h = layer(g, h, train).reshape(h.shape[0], -1)  # flatten heads
        return jnp.stack(h_list).mean(0)


class GINMLP(nn.Module):
    """GIN's internal MLP with BatchNorm+ReLU between layers
    (/root/reference/models/GIN.py:25-73)."""

    num_layers: int
    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        if self.num_layers == 1:
            return nn.Dense(self.output_dim, name="linear")(x)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, name=f"linears_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, mask, train)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, name=f"linears_{self.num_layers - 1}")(x)


class GINConvLayer(nn.Module):
    """DGL `GINConv(ApplyNodeFunc(MLP), aggr, 0, learn_eps)`
    (/root/reference/models/GIN.py:114-121): rst = (1+eps)h + aggr_neigh(h),
    then MLP -> BN -> ReLU."""

    num_mlp_layers: int
    hidden_dim: int
    output_dim: int
    neighbor_pooling_type: str = "mean"
    learn_eps: bool = True

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array, train: bool) -> jax.Array:
        if self.neighbor_pooling_type == "sum":
            agg = ops.copy_u_sum(g, h)
        elif self.neighbor_pooling_type == "mean":
            agg = ops.copy_u_mean(g, h)
        elif self.neighbor_pooling_type == "max":
            agg = ops.copy_u_max(g, h)
        else:
            raise NotImplementedError(self.neighbor_pooling_type)
        if self.learn_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        rst = (1.0 + eps) * h + agg
        rst = GINMLP(
            self.num_mlp_layers, self.hidden_dim, self.output_dim, name="mlp"
        )(rst, g.node_mask, train)
        rst = MaskedBatchNorm(name="bn")(rst, g.node_mask, train)
        return nn.relu(rst)


class GIN(nn.Module):
    """Reference GIN (/root/reference/models/GIN.py:76-177): num_layers-1
    GINConvs, per-layer pooled heads, SUM-combined logits.

    Deviation (documented): the reference's `self.dropout` at GIN.py:160 is
    an AttributeError for num_layers >= 3 (the attribute is `self.drop`,
    :123); we apply the intended final_dropout instead of crashing.
    """

    input_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int
    num_mlp_layers: int
    final_dropout: float = 0.0
    graph_pooling_type: str = "sum"
    neighbor_pooling_type: str = "mean"
    learn_eps: bool = True

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        h = g.feat
        h_list = []
        for i in range(self.num_layers - 1):
            if i != 0:
                h = nn.Dropout(self.final_dropout, deterministic=not train)(h)
            pooled = Pool(self.graph_pooling_type, name=f"pool_{i}")(g, h)
            h_list.append(nn.Dense(self.out_dim, name=f"pred_{i}")(pooled))
            h = GINConvLayer(
                self.num_mlp_layers,
                self.hidden_dim,
                self.hidden_dim,
                neighbor_pooling_type=self.neighbor_pooling_type,
                learn_eps=self.learn_eps,
                name=f"gin_{i}",
            )(g, h, train)
        pooled = Pool(self.graph_pooling_type, name=f"pool_last")(g, h)
        h_list.append(nn.Dense(self.out_dim, name="classify")(pooled))
        return jnp.stack(h_list).sum(0)


class NTPoolGCN(nn.Module):
    """Reference NTPoolGCN (/root/reference/models/GCN_NTPool.py:16-123):
    GraphConv stack on the homogeneous view (with self-loops added inside the
    forward), but per-layer readouts pooled PER NODE TYPE through per-type
    Dense heads; contributions averaged over (layer, present-type) pairs.
    """

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_node_types: int
    n_layers: int
    dropout: float = 0.0
    graph_pooling_type: str = "att"
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        type_counts = g.node_type_counts().reshape(g.n_graphs, t).sum(0)  # [T] global
        present = (type_counts > 0).astype(g.feat.dtype)  # [T]

        h = g.feat
        hg = jnp.zeros((g.n_graphs, self.out_dim), dtype=g.feat.dtype)
        for i in range(self.n_layers):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            # per-(graph, type) pooled readout -> per-type Dense head
            if self.graph_pooling_type == "mean":
                pooled = ops.readout_mean_all_types(g, h)
            elif self.graph_pooling_type == "sum":
                pooled = ops.readout_sum_all_types(g, h)
            elif self.graph_pooling_type == "max":
                pooled = ops.readout_max_all_types(g, h)
            else:
                # 'att' + per-ntype readout is a TypeError in the reference
                # too (DGL GlobalAttentionPooling has no ntype argument)
                raise NotImplementedError(
                    f"per-ntype pooling {self.graph_pooling_type!r}"
                )
            pooled = pooled.reshape(g.n_graphs, t, -1)
            heads = TypedHeads(t, self.out_dim, name=f"pred_{i}")(pooled)
            hg = hg + (heads * present[None, :, None]).sum(1)
            h = GraphConvLayer(
                self.hidden_dim,
                activation=self.activation,
                implicit_self_loops=True,
                name=f"conv_{i}",
            )(g, h)
        count = jnp.maximum(self.n_layers * present.sum(), 1.0)
        return hg / count
