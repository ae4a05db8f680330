"""ASAPPooling — select-and-pool for homogeneous graphs
(reference /root/reference/pooling/ASAP.py:120-202, with LEConv :20-65 and
the S^T·A·S rewiring :68-117; "ASAP: Adaptive Structure Aware Pooling",
Ranjan et al., AAAI 2020).

The reference implementation is PyTorch-Geometric + torch_sparse.spspmm and
is excluded from its own public pooling API (pooling/__init__.py comments it
out); it is re-designed here TPU-first:

  * the per-edge attention (master-query max, GAT-style score, segment
    softmax per cluster center) runs on the padded TypedGraph edge store
    with `jax.ops.segment_*` — no PyG scatter kernels;
  * cluster selection is a STATIC top-K budget per graph (the same
    redesign IHPool uses, models/mil/h2mil.py) instead of the reference's
    dynamic `ceil(ratio * n)` — dynamic shapes cannot compile; graphs with
    fewer than K real nodes mark the excess clusters invalid in the
    returned mask;
  * the S^T·A·S connectivity rewiring (reference StAS :68-81 via
    torch_sparse.spspmm) becomes two dense GEMMs on the MXU: scatter the
    edge scores into a dense selection matrix S [N, B*K], compute
    M = A·S by segment-sum of gathered S rows, then E = S^Tᵀ·M as one
    [B*K, N] x [N, B*K] matmul. Output adjacency is per-graph dense
    [B, K, K] — the natural TPU form for the pooled graph (a K~O(100)
    dense block, same layout the GTNMIL mincut pool uses).

Semantics mirrored from the reference forward (ASAP.py:146-200):
 self-loops (weight 1) are added for every real node, x_pool = GCNConv
 (symmetric-normalised, edge-weighted), X_q = per-center max of incident
 x_pool, score = leaky_relu(gat_att([lin_q(X_q)_center, x_pool_neighbor]))
 -> segment softmax over the center, out = Σ score·x_neighbor,
 fitness = sigmoid(LEConv(out)), top-K by fitness per graph, pooled
 feature = out[perm]·fitness[perm], E = S^T·A·S with scores
 stop-gradiented (the reference detaches value_S, :102), diagonal reset
 to 1 (remove_self_loops + add_remaining_self_loops fill 1, :114-116).

Orientation: the reference scatters into `edge_index[0]`; here the
cluster center is `dst` (receives from `src`), matching this repo's
message convention. Deviation (documented): existing self edges are
replaced by weight-1 self loops; identical to the reference on its only
exercised path (edge_weight=None => all weights are 1 anyway).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import TypedGraph

NEG_INF = -1e30


def _with_self_loops(g: TypedGraph, edge_weight: jax.Array):
    """Edge arrays extended with one weight-1 self edge per real node;
    pre-existing self edges are masked out (add_remaining_self_loops
    analog, reference ASAP.py:152-154)."""
    n = g.num_nodes
    loop = jnp.arange(n, dtype=g.src.dtype)
    keep = g.edge_mask & (g.src != g.dst)
    src = jnp.concatenate([g.src, loop])
    dst = jnp.concatenate([g.dst, loop])
    w = jnp.concatenate([edge_weight, jnp.ones(n, edge_weight.dtype)])
    mask = jnp.concatenate([keep, g.node_mask])
    return src, dst, w, mask


def _seg_sum(vals, idx, n):
    return jax.ops.segment_sum(vals, idx, num_segments=n)


def _seg_max(vals, idx, n):
    return jax.ops.segment_max(vals, idx, num_segments=n)


class LEConv(nn.Module):
    """Local-extrema convolution (reference ASAP.py:20-65):
    out = deg ⊙ lin1(x) + Σ_j w_ij (x·W)[j] + lin2(x), self loops removed."""

    out_dim: int

    @nn.compact
    def __call__(self, x, src, dst, w, mask):
        n = x.shape[0]
        keep = mask & (src != dst)
        wk = jnp.where(keep, w, 0.0)
        deg = _seg_sum(wk, dst, n)
        h = nn.Dense(self.out_dim, use_bias=False, name="weight")(x)
        aggr = _seg_sum(wk[:, None] * h[src], dst, n)
        return deg[:, None] * nn.Dense(self.out_dim, name="lin1")(x) + aggr \
            + nn.Dense(self.out_dim, name="lin2")(x)


class GCNConv(nn.Module):
    """Symmetric-normalised, edge-weighted GCN layer (the reference's
    `gnn_intra_cluster`, PyG GCNConv semantics: Â = D^-1/2 (A+I) D^-1/2
    with the self loops already materialised in the edge list)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, src, dst, w, mask):
        n = x.shape[0]
        wk = jnp.where(mask, w, 0.0)
        deg = _seg_sum(wk, dst, n)
        inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        norm = wk * inv_sqrt[src] * inv_sqrt[dst]
        h = nn.Dense(self.out_dim, name="lin")(x)
        out = _seg_sum(norm[:, None] * h[src], dst, n)
        return out + self.param(
            "bias", nn.initializers.zeros, (self.out_dim,)
        )


class ASAPPooling(nn.Module):
    """Returns (pooled_x [B,K,F], adj [B,K,K], cluster_mask [B,K],
    perm [B,K], fitness [N])."""

    in_dim: int
    k: int
    negative_slope: float = 0.2
    dropout_att: float = 0.0

    @nn.compact
    def __call__(
        self, g: TypedGraph, h: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        x = g.feat if h is None else h
        n, b, k = g.num_nodes, g.n_graphs, self.k
        # the reference enters with edge_weight=None => all weights 1
        # (ASAP.py:146-154; the Pearson `sim` is NOT used as a weight
        # there) — but it DOES honor a supplied edge_weight, which is how
        # GNNExplainer's learned edge mask reaches the pooling attention
        ew = (jnp.ones_like(g.sim) if g.edge_weight is None
              else g.edge_weight.astype(g.sim.dtype))
        src, dst, w, mask = _with_self_loops(g, ew)

        # orientation: the reference's GCNConv aggregates INTO the same
        # endpoint its score later reads x_pool at (PyG flow
        # source_to_target writes edge_index[1]; x_pool_j = x_pool[
        # edge_index[1]], ASAP.py:157-159). Under this repo's center=dst
        # flip the score reads x_pool[src], so the GCN must aggregate into
        # src — hence the swapped index arguments (on the directed KNN
        # graph in- and out-degrees differ, so the direction matters)
        x_pool = GCNConv(self.in_dim, name="gnn_intra_cluster")(x, dst, src, w, mask)

        # master query: per-center max over incident x_pool (ASAP.py:165-169)
        xs = jnp.where(mask[:, None], x_pool[src], NEG_INF)
        X_q = _seg_max(xs, dst, n)
        X_q = jnp.where(X_q <= NEG_INF / 2, 0.0, X_q)
        M_q = nn.Dense(self.in_dim, name="lin_q")(X_q)

        # GAT-style attention over (center, neighbor) pairs (ASAP.py:171-177)
        pair = jnp.concatenate([M_q[dst], x_pool[src]], axis=-1)
        score = nn.Dense(1, name="gat_att")(pair)[:, 0]
        score = nn.leaky_relu(score, negative_slope=self.negative_slope)
        logits = jnp.where(mask, score, NEG_INF)
        zmax = _seg_max(logits, dst, n)
        zmax = jnp.where(zmax <= NEG_INF / 2, 0.0, zmax)
        ex = jnp.where(mask, jnp.exp(logits - zmax[dst]), 0.0)
        denom = _seg_sum(ex, dst, n)
        score = ex / jnp.maximum(denom[dst], 1e-16)
        if self.dropout_att > 0:
            score = nn.Dropout(self.dropout_att, deterministic=not train)(score)

        # cluster representation out[i] = Σ_j score_ij x_j (ASAP.py:179-183)
        out = _seg_sum(score[:, None] * x[src], dst, n)

        # fitness + static per-graph top-K (ASAP.py:185-188). The reference
        # calls gnn_score WITHOUT edge_weight, so LEConv always builds unit
        # weights (ASAP.py:50-53,183) — even when the pooling itself was
        # entered with weights (the explainer path)
        fitness = nn.sigmoid(
            LEConv(1, name="gnn_score")(
                out, src, dst, jnp.ones_like(w), mask)[:, 0]
        )
        perms, valids = [], []
        for gi in range(b):
            m = g.node_mask & (g.node_graph == gi)
            f = jnp.where(m, fitness, -1.0)
            top_vals, top_idx = jax.lax.top_k(f, k)
            perms.append(top_idx)
            valids.append(top_vals >= 0.0)
        perm = jnp.stack(perms)          # [B, K]
        cluster_mask = jnp.stack(valids)  # [B, K]

        flat_perm = perm.reshape(-1)
        flat_valid = cluster_mask.reshape(-1)
        pooled = out[flat_perm] * fitness[flat_perm][:, None]
        pooled = jnp.where(flat_valid[:, None], pooled, 0.0)

        # connectivity: E = S^T A S (ASAP.py:84-117). S[j, c] = score of edge
        # (j -> center(c)) for selected centers, scores stop-gradiented
        # (the reference detaches value_S, :102).
        # INVALID top-k slots of a small graph tie-break onto foreign
        # low-indexed nodes, so flat_perm can repeat a node that is also a
        # VALID centre of another graph — scatter order between duplicate
        # writes is undefined, which could drop the valid column or route
        # it into the wrong graph's block. Route invalid slots to an
        # overflow row instead; valid selections are disjoint across
        # graphs (each respects node_graph), so the remaining writes are
        # collision-free.
        safe_perm = jnp.where(flat_valid, flat_perm, n)
        col_of = jnp.full((n + 1,), b * k, jnp.int32)  # overflow col default
        col_of = col_of.at[safe_perm].set(jnp.arange(b * k, dtype=jnp.int32))
        col_of = col_of[:n]
        s_val = jax.lax.stop_gradient(jnp.where(mask, score, 0.0))
        s_dense = jnp.zeros((n, b * k + 1), s_val.dtype)
        s_dense = s_dense.at[src, col_of[dst]].add(s_val)
        s_dense = s_dense[:, : b * k]                       # [N, BK]
        m_dense = _seg_sum(jnp.where(mask, w, 0.0)[:, None] * s_dense[src], dst, n)
        e_dense = s_dense.T @ m_dense                       # [BK, BK] via MXU
        adj = e_dense.reshape(b, k, b * k)
        adj = jnp.stack([adj[gi, :, gi * k : (gi + 1) * k] for gi in range(b)])
        # remove self loops, then add them back with weight 1 (ASAP.py:113-116)
        eye = jnp.eye(k, dtype=adj.dtype)
        adj = adj * (1.0 - eye)
        adj = adj + eye * cluster_mask[:, :, None].astype(adj.dtype)
        vm = cluster_mask.astype(adj.dtype)
        adj = adj * vm[:, :, None] * vm[:, None, :]

        return pooled.reshape(b, k, -1), adj, cluster_mask, perm, fitness


class ASAPGCN(nn.Module):
    """GCN classifier with ASAP pooling — the public-surface consumer of
    ASAPPooling (`GNN: name: GCN, graph_pooling_type: asap`), the wiring
    the reference repo itself leaves dangling (pooling/ASAP.py:120-202 is
    excluded from pooling/__init__.py; BASELINE.json configs[1] names
    "GAT/GIN variants with ASAP pooling" as a driver operating point).

    Shape: GraphConv stack on the sparse TypedGraph -> ASAPPooling to a
    static K-cluster budget -> dense masked GCN tail on the pooled [B,K,K]
    adjacency (the same dense block the GTNMIL mincut path uses) -> masked
    mean readout -> Dense logits.
    """

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    k: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: TypedGraph, train: bool = False) -> jax.Array:
        from .mil.graph_transformer import GCNBlock
        from .homogeneous import GraphConvLayer

        h = g.feat
        for i in range(self.n_layers):
            if i != 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = GraphConvLayer(self.hidden_dim, activation=nn.relu,
                               name=f"conv_{i}")(g, h)

        pooled, adj, cmask, _, _ = ASAPPooling(
            self.hidden_dim, self.k, name="asap"
        )(g, h, train)

        # our composition (no reference analog): plain normalized GCN +
        # ReLU tail, no BatchNorm
        x = GCNBlock(self.hidden_dim, use_bn=False, relu=True,
                     name="dense_gcn")(
            pooled, adj, cmask.astype(pooled.dtype), train
        )
        denom = jnp.maximum(cmask.sum(-1, keepdims=True), 1.0)
        hg = (x * cmask[:, :, None]).sum(1) / denom
        return nn.Dense(self.out_dim, name="classify")(hg)
