"""Heterogeneous GNN zoo: HetRGCN, HGT, HEATNet2, HEATNet4.

Re-designs of /root/reference/models/{HetRGCN,HGT,HEATNet2,HEATNet4}.py for
the flat TypedGraph representation. The reference iterates Python-side over
up to T*T*2 canonical-relation subgraphs per layer, each launching small
kernels (/root/reference/models/HGT.py:75-106); here the whole layer is a
few static gathers + GEMMs + segment reductions over one flat edge array.

DGL semantics reproduced exactly:
  * `edge_softmax` runs per (dst node, canonical relation) group — the
    reference calls it on each relation subgraph separately.
  * `multi_update_all(..., cross_reducer='mean')` divides each node's
    aggregated message sum by the number of canonical relations with >= 1
    edge in the (batched) graph that TARGET the node's type — not by the
    node's own relation fan-in (/root/reference/models/HGT.py:105-106).
  * Node types with no incoming relation at all pass features through
    unchanged (the reference's KeyError fallback, HGT.py:116-119).
  * Node types with zero nodes in the batch contribute nothing to the
    pooled prediction sum (the `h[k].shape[0] > 0` guards, HGT.py:193,206).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph import TypedGraph, ops
from .layers import (
    LinearAttentionBlock,
    TypedDense,
    TypedHeads,
    TypedLayerNorm,
    pool_all_types,
)


def _presence(g: TypedGraph):
    """(present_rel[R] bool, dst_denom[T] float, src_denom[T] float,
    type_present[T] bool): relation/type occupancy of the batched graph."""
    t = g.n_node_types
    rel_counts = g.rel_edge_counts()  # [R]
    present = rel_counts > 0
    rel_ids = jnp.arange(g.n_relations)
    dst_t = rel_ids % t
    src_t = (rel_ids // t) % t
    dst_denom = jax.ops.segment_sum(present.astype(jnp.float32), dst_t, num_segments=t)
    src_denom = jax.ops.segment_sum(present.astype(jnp.float32), src_t, num_segments=t)
    counts = g.node_type_counts().reshape(g.n_graphs, t).sum(0)
    return present, dst_denom, src_denom, counts > 0


def _skip_mix(h_new, h_old, alpha, node_type, has_update, node_mask):
    """trans*a + h*(1-a), falling back to h where the type got no update."""
    a = jax.nn.sigmoid(alpha)[node_type][:, None]
    mixed = h_new * a + h_old * (1.0 - a)
    keep = (has_update & node_mask)[:, None]
    return jnp.where(keep, mixed, h_old)


# --------------------------------------------------------------------- #
# HetRGCN
# --------------------------------------------------------------------- #
class HetRGCNLayer(nn.Module):
    """Reference HeteroRGCNLayer (/root/reference/models/HetRGCN.py:13-46).

    The reference layer performs NO message passing: for each canonical
    relation (s, e, t) present in the graph it computes W_r(h[s]) and then
    MEANS the results per SOURCE type. By linearity this equals
    h @ mean(W_r) + mean(b_r) over present relations with src type s, so we
    average the R weight matrices (cheap, R<=72) and run one typed GEMM.
    """

    n_types: int
    n_edge_types: int
    features: int

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array) -> jax.Array:
        r = g.n_relations
        t = self.n_types
        d = h.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(), (r, d, self.features))
        b = self.param("bias", nn.initializers.zeros, (r, self.features))

        present, _, src_denom, _ = _presence(g)
        pm = present.astype(h.dtype)  # [R]
        rel_ids = jnp.arange(r)
        src_t = (rel_ids // t) % t
        onehot = jax.nn.one_hot(src_t, t, dtype=h.dtype) * pm[:, None]  # [R, T]
        denom = jnp.maximum(src_denom, 1.0)  # [T]
        w_eff = jnp.einsum("rt,rdf->tdf", onehot, w) / denom[:, None, None]
        b_eff = jnp.einsum("rt,rf->tf", onehot, b) / denom[:, None]

        out = ops.typed_linear(h, g.node_type, w_eff, b_eff)
        has_update = (src_denom > 0)[g.node_type]
        return jnp.where((has_update & g.node_mask)[:, None], out, h)


class HetRGCN(nn.Module):
    """Reference HeteroRGCN (/root/reference/models/HetRGCN.py:49-125)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_node_types: int
    n_edge_types: int = 2
    graph_pooling_type: str = "sum"

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        _, _, _, type_present = _presence(g)
        pres = type_present.astype(g.feat.dtype)

        # approximate=False: torch F.gelu (the reference's activation,
        # HetRGCN.py:99 / HGT.py:180) is the exact erf form
        h = jax.nn.gelu(
            TypedDense(t, self.hidden_dim, name="adapt_ws")(g.feat, g.node_type),
            approximate=False,
        )
        hg = jnp.zeros((g.n_graphs, self.out_dim), dtype=g.feat.dtype)
        for i in range(self.n_layers):
            pooled = pool_all_types(g, h, self.graph_pooling_type)
            heads = TypedHeads(t, self.out_dim, name=f"pred_{i}")(pooled)
            hg = hg + (heads * pres[None, :, None]).sum(1)
            h = HetRGCNLayer(
                t, self.n_edge_types, self.hidden_dim, name=f"layer_{i}"
            )(g, h)
        return hg


# --------------------------------------------------------------------- #
# HGT
# --------------------------------------------------------------------- #
class HGTLayer(nn.Module):
    """Reference HGTLayer (/root/reference/models/HGT.py:21-127).

    Per-relation K/V transforms (`relation_att`/`relation_msg`) are applied
    at the NODE level for every (edge-sign, dst-type) combo — 2*T versions
    per node instead of R per edge — then gathered per edge by its canonical
    relation. Attention = per-(dst, relation) segment softmax of
    q.k * relation_pri / sqrt(d_k); aggregation is one flat segment-sum with
    the cross_reducer='mean' denominator applied per dst type.
    """

    n_types: int
    out_dim: int
    n_heads: int
    dropout: float = 0.2
    use_norm: bool = True

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array, train: bool = False) -> jax.Array:
        t = self.n_types
        e_t = g.n_edge_types
        n_rel = g.n_relations
        n_h, d_k = self.n_heads, self.out_dim // self.n_heads
        sqrt_dk = math.sqrt(d_k)

        k = TypedDense(t, self.out_dim, name="k_linears")(h, g.node_type)
        q = TypedDense(t, self.out_dim, name="q_linears")(h, g.node_type)
        v = TypedDense(t, self.out_dim, name="v_linears")(h, g.node_type)
        k = k.reshape(-1, n_h, d_k)
        q = q.reshape(-1, n_h, d_k)
        v = v.reshape(-1, n_h, d_k)

        rel_att = self.param(
            "relation_att", nn.initializers.xavier_uniform(), (n_rel, n_h, d_k, d_k)
        )
        rel_msg = self.param(
            "relation_msg", nn.initializers.xavier_uniform(), (n_rel, n_h, d_k, d_k)
        )
        rel_pri = self.param("relation_pri", nn.initializers.ones, (n_rel, n_h))
        skip = self.param("skip", nn.initializers.ones, (t,))

        # node-level per-(sign, dst-type) transforms: combo c = sign*T + dst_t
        onehot_s = jax.nn.one_hot(g.node_type, t, dtype=h.dtype)  # [N, T]
        a_r = rel_att.reshape(e_t, t, t, n_h, d_k, d_k)
        m_r = rel_msg.reshape(e_t, t, t, n_h, d_k, d_k)
        ks = jnp.einsum("ns,nhd->nshd", onehot_s, k)
        vs = jnp.einsum("ns,nhd->nshd", onehot_s, v)
        k_c = jnp.einsum("nshd,zsthde->nzthe", ks, a_r).reshape(
            -1, e_t * t, n_h, d_k
        )
        v_c = jnp.einsum("nshd,zsthde->nzthe", vs, m_r).reshape(
            -1, e_t * t, n_h, d_k
        )

        rel = g.edge_rel()
        combo = g.esign * t + g.node_type[g.dst]
        k_e = k_c[g.src, combo]  # [E, H, dk]
        v_e = v_c[g.src, combo]
        q_e = q[g.dst]

        score = (q_e * k_e).sum(-1) * rel_pri[rel] / sqrt_dk  # [E, H]
        attn = ops.edge_softmax_by_dst_rel(g, score)
        agg = ops.copy_e_sum(g, v_e * attn[:, :, None])  # [N, H, dk]
        agg = agg.reshape(-1, self.out_dim)

        _, dst_denom, _, _ = _presence(g)
        denom = jnp.maximum(dst_denom, 1.0)[g.node_type][:, None]
        t_agg = agg / denom

        trans = TypedDense(t, self.out_dim, name="a_linears")(t_agg, g.node_type)
        trans = nn.Dropout(self.dropout, deterministic=not train)(trans)
        out = _skip_mix(
            trans, h, skip, g.node_type, (dst_denom > 0)[g.node_type], g.node_mask
        )
        if self.use_norm:
            normed = TypedLayerNorm(t, name="norms")(out, g.node_type)
            keep = ((dst_denom > 0)[g.node_type] & g.node_mask)[:, None]
            out = jnp.where(keep, normed, out)
        return out


class HGT(nn.Module):
    """Reference HGT (/root/reference/models/HGT.py:130-209)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_heads: int
    n_node_types: int
    use_norm: bool = True
    graph_pooling_type: str = "mean"

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        _, _, _, type_present = _presence(g)
        pres = type_present.astype(g.feat.dtype)

        # approximate=False: torch F.gelu (the reference's activation,
        # HetRGCN.py:99 / HGT.py:180) is the exact erf form
        h = jax.nn.gelu(
            TypedDense(t, self.hidden_dim, name="adapt_ws")(g.feat, g.node_type),
            approximate=False,
        )
        hg = jnp.zeros((g.n_graphs, self.out_dim), dtype=g.feat.dtype)
        for i in range(self.n_layers):
            pooled = pool_all_types(g, h, self.graph_pooling_type)
            heads = TypedHeads(t, self.out_dim, name=f"pred_{i}")(pooled)
            hg = hg + (heads * pres[None, :, None]).sum(1)
            h = HGTLayer(
                t,
                self.hidden_dim,
                self.n_heads,
                use_norm=self.use_norm,
                name=f"gcs_{i}",
            )(g, h, train)
        return hg


# --------------------------------------------------------------------- #
# HEAT (Heterogeneous Edge Attribute Transformer)
# --------------------------------------------------------------------- #
class HEATLayer(nn.Module):
    """Reference HEATLayer (/root/reference/models/HEATNet4.py:49-138, shared
    with HEATNet2.py:24-113): HGT-style per-type K/Q/V but no per-relation
    tensors; the scalar Pearson edge attribute `sim` goes through a 1->1
    Dense and scales the attention logits before the per-(dst, relation)
    softmax."""

    n_types: int
    out_dim: int
    n_heads: int
    dropout: float = 0.2
    typed_impl: str = "onehot"  # see layers.TypedDense

    @nn.compact
    def __call__(self, g: TypedGraph, h: jax.Array, train: bool = False,
                 tsort=None) -> jax.Array:
        t = self.n_types
        n_h, d_k = self.n_heads, self.out_dim // self.n_heads
        sqrt_dk = math.sqrt(d_k)
        ti = self.typed_impl

        k = TypedDense(t, self.out_dim, impl=ti, name="k_linears")(
            h, g.node_type, tsort)
        q = TypedDense(t, self.out_dim, impl=ti, name="q_linears")(
            h, g.node_type, tsort)
        v = TypedDense(t, self.out_dim, impl=ti, name="v_linears")(
            h, g.node_type, tsort)
        k = k.reshape(-1, n_h, d_k)
        q = q.reshape(-1, n_h, d_k)
        v = v.reshape(-1, n_h, d_k)
        skip = self.param("skip", nn.initializers.ones, (t,))

        ea = nn.Dense(1, name="e_linear")(g.sim[:, None].astype(h.dtype))  # [E, 1]
        score = (q[g.dst] * k[g.src]).sum(-1) * ea / sqrt_dk  # [E, H]
        attn = ops.edge_softmax_by_dst_rel(g, score)
        agg = ops.copy_e_sum(g, v[g.src] * attn[:, :, None]).reshape(-1, self.out_dim)

        _, dst_denom, _, _ = _presence(g)
        denom = jnp.maximum(dst_denom, 1.0)[g.node_type][:, None]
        t_agg = agg / denom

        trans = TypedDense(t, self.out_dim, impl=ti, name="a_linears")(
            t_agg, g.node_type, tsort)
        trans = nn.Dropout(self.dropout, deterministic=not train)(trans)
        return _skip_mix(
            trans, h, skip, g.node_type, (dst_denom > 0)[g.node_type], g.node_mask
        )


class HEATNet2(nn.Module):
    """Reference HEATNet2 (/root/reference/models/HEATNet2.py:116-196):
    HEATLayer stack, single per-type pooled prediction head on the final
    features, summed over present types."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_heads: int
    n_node_types: int
    dropout: float = 0.2
    graph_pooling_type: str = "mean"
    typed_impl: str = "onehot"  # see layers.TypedDense

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        _, _, _, type_present = _presence(g)
        pres = type_present.astype(g.feat.dtype)

        # one type-major sort shared by every typed projection in the net
        tsort = (ops.make_type_sort(g.node_type, t)
                 if self.typed_impl == "ragged" else None)
        h = TypedDense(t, self.hidden_dim, impl=self.typed_impl,
                       name="adapt_ws")(g.feat, g.node_type, tsort)
        for i in range(self.n_layers):
            h = HEATLayer(
                t, self.hidden_dim, self.n_heads, self.dropout,
                typed_impl=self.typed_impl, name=f"gcs_{i}"
            )(g, h, train, tsort)
        pooled = pool_all_types(g, h, self.graph_pooling_type)
        heads = TypedHeads(t, self.out_dim, name="linears_prediction")(pooled)
        return (heads * pres[None, :, None]).sum(1)


class HEATNet4(nn.Module):
    """Reference HEATNet4 — the paper's flagship HEAT
    (/root/reference/models/HEATNet4.py:141-247): HEATLayer stack, per-type
    256-d pooled embeddings gated by LinearAttentionBlock against their sum,
    concatenated and pushed through a 256*T->256->64->C linear head."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_heads: int
    n_node_types: int
    dropout: float = 0.2
    graph_pooling_type: str = "mean"
    embed_dim: int = 256
    typed_impl: str = "onehot"  # see layers.TypedDense

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        _, _, _, type_present = _presence(g)
        pres = type_present.astype(g.feat.dtype)

        # one type-major sort shared by every typed projection in the net
        tsort = (ops.make_type_sort(g.node_type, t)
                 if self.typed_impl == "ragged" else None)
        h = TypedDense(t, self.hidden_dim, impl=self.typed_impl,
                       name="adapt_ws")(g.feat, g.node_type, tsort)
        for i in range(self.n_layers):
            h = HEATLayer(
                t, self.hidden_dim, self.n_heads, self.dropout,
                typed_impl=self.typed_impl, name=f"gcs_{i}"
            )(g, h, train, tsort)

        pooled = pool_all_types(g, h, self.graph_pooling_type)
        out_h = TypedHeads(t, self.embed_dim, name="linears_prediction")(pooled)
        out_h = out_h * pres[None, :, None]  # absent types -> zero embedding

        hg = out_h.sum(1)  # [B, 256] sum over present types
        gated = []
        for k in range(t):
            gk = LinearAttentionBlock(name=f"attn_{k}")(out_h[:, k], hg)
            gated.append(gk * pres[k])  # absent type -> zeros(256) (ref :240)
        cat = jnp.concatenate(gated, axis=1)  # [B, 256*T]
        x = nn.Dense(self.embed_dim, name="head_2")(cat)
        x = nn.Dense(64, name="head_1")(x)
        return nn.Dense(self.out_dim, name="head")(x)
