"""Lattice fast path — HEAT models on the regular KNN edge lattice.

KNN graph construction emits exactly k = radius-1 out-edges per node
(graph_constructor.py:267-273), so the edge set of a constructed slide
graph is a REGULAR [B, N, k] lattice: edge (b, i, j) goes from node i to
its j-th neighbour idx[b, i, j]. The TypedGraph models handle arbitrary
edge sets with segment scatters — TPU's weakest primitive (~5 ms per
scatter at this size). Here every irregular reduction becomes a one-hot
GEMM on the MXU:

    A[b, (i,j), m]    = 1[idx[b,i,j] == m]              (iota compare)
    denom[b, m, c, h] = A^T (combo_onehot * exp_scores)  (matmul)
    agg[b, m, :]      = A^T (attn * v_src)               (matmul)

Semantics match models.HEATLayer / HEATNet2 / HEATNet4 exactly,
including the softmax normalisation: a per-dst max is subtracted before
exp (clipping alone is NOT shift invariant — a group whose logits drift
past the clamp flattens and its gradients zero, silently diverging from
a TypedGraph checkpoint). The shift is one scalar per dst — constant
across that dst's (combo, head) groups, so it cancels exactly in every
group's softmax at any logit magnitude; the residual approximation is
only for a group sitting > ~85 BELOW its dst's max (its exps underflow
to 0 where the exact path still normalises it) — far beyond trained
attention spreads. Runs as one forward-only scalar segment_max under
stop_gradient, so no scatter enters the backward; verified against the
TypedGraph models to 1e-4 in tests.

Parameter trees are IDENTICAL to the TypedGraph models (same flax module
names), so trained checkpoints are interchangeable between the exact and
lattice paths.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph import ops
from .layers import LinearAttentionBlock, TypedDense, TypedHeads

_CLAMP = 60.0


class LatticeGraph(NamedTuple):
    """A cohort of KNN slide graphs in [B, N, k] lattice form. Rows need
    not be full: emask marks the live slots (constructor graphs fill
    every slot; irregular imports pad short rows, DropEdge clears
    more), and every consumer masks by it."""

    feats: jax.Array   # [B, N, D]
    ntypes: jax.Array  # [B, N] int32
    mask: jax.Array    # [B, N] bool
    idx: jax.Array     # [B, N, k] int32 — j-th neighbour of node i
    sim: jax.Array     # [B, N, k] f32 — pearson r of (i, idx[i,j])
    esign: jax.Array   # [B, N, k] int32
    emask: jax.Array   # [B, N, k] bool


@partial(jax.jit, static_argnames=("radius", "n_node_types", "knn_impl"))
def build_lattice_device(features, node_types, mask, radius: int,
                         n_node_types: int = 6,
                         knn_impl: str = "exact") -> LatticeGraph:
    """KNN + Pearson construction keeping the [B, N, k] lattice form.
    Buckets past ops.knn.STREAM_THRESHOLD stream both steps in tiles
    instead of materialising [N, N] (same dispatch as graph.build)."""
    from ..ops.knn import STREAM_THRESHOLD, knn_lookup
    from ..ops.pearson import center_normalize, pearson_sim_at

    k = radius - 1
    stream = features.shape[1] >= STREAM_THRESHOLD

    def per_slide(f, m):
        idx, _ = knn_lookup(f, k, m, impl=knn_impl)
        if stream:
            sim = pearson_sim_at(f, idx)
        else:
            fn = center_normalize(f)
            sim = jnp.take_along_axis(fn @ fn.T, idx, axis=1)
        return idx.astype(jnp.int32), sim

    idx, sim = jax.vmap(per_slide)(features, mask)
    esign = (sim > 0).astype(jnp.int32)
    # row-gather, not a [B, N, N] broadcast + take_along_axis (the same
    # O(B*N*k) idiom lattice_train_transform uses)
    emask = mask[:, :, None] & jax.vmap(lambda mb, ib: mb[ib])(mask, idx)
    # tiny slides (n_real <= k) make top_k fall back to the query itself;
    # the reference's KNN query drops self (graph_constructor.py:273)
    emask = emask & (idx != jnp.arange(features.shape[1])[None, :, None])
    del n_node_types  # typing lives on the models (NamedTuple leaves trace)
    return LatticeGraph(features, node_types.astype(jnp.int32), mask,
                        idx, sim, esign, emask)


def lattice_train_transform(g: LatticeGraph, key: jax.Array,
                            p: float = 0.5) -> LatticeGraph:
    """The reference's training augmentation (DropNode -> DropEdge ->
    NodeShuffle -> FeatMask, /root/reference/data.py:16-23) on the lattice
    form — the same mask-op semantics as graph.transforms.train_transform:
    dropping a node clears it and every incident edge, DropEdge thins the
    survivors (self-edges exempt, though KNN lattices have none —
    graph_constructor.py:273 skips the query point itself), NodeShuffle is
    the identity isomorphism, FeatMask zeroes feature columns."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, n, _ = g.idx.shape
    keep_n = jax.random.bernoulli(k1, 1.0 - p, (b, n))
    mask = g.mask & keep_n
    keep_dst = jax.vmap(lambda kb, ib: kb[ib])(keep_n, g.idx)
    emask = g.emask & keep_n[:, :, None] & keep_dst

    keep_e = jax.random.bernoulli(k2, 1.0 - p, g.idx.shape)
    self_loop = g.idx == jnp.arange(n, dtype=g.idx.dtype)[None, :, None]
    emask = emask & (keep_e | self_loop)

    keep_col = jax.random.bernoulli(k3, 1.0 - p, (g.feats.shape[-1],))
    feats = g.feats * keep_col[None, None, :].astype(g.feats.dtype)
    return g._replace(feats=feats, mask=mask, emask=emask)


def _rel_presence(g: LatticeGraph, t: int, per_graph: bool = False):
    """(dst_denom [B, T], type_present [B, T]) — relation/type occupancy.

    per_graph=False reproduces DGL's semantics on one BATCHED graph
    (cross_reducer='mean' denominators count relations present anywhere
    in the batch) — what the reference's batched TRAINING step computes.
    per_graph=True computes occupancy per slide — what the reference's
    one-graph-at-a-time EVAL computes (eval_homo_graph.py:75-84), making
    the forward independent of how slides are grouped into batches (the
    contract production serving needs). Both return [B, T] so consumers
    are uniform; batch mode broadcasts one shared row."""
    b = g.idx.shape[0]
    sty = g.ntypes[:, :, None]                                  # [B,N,1]
    dty = jax.vmap(lambda tb, ib: tb[ib])(g.ntypes, g.idx)       # [B,N,k]
    rel = g.esign * t * t + sty * t + dty                        # [B,N,k]
    counts = jax.vmap(
        lambda r, m: jax.ops.segment_sum(
            m.astype(jnp.int32).reshape(-1), r.reshape(-1),
            num_segments=2 * t * t,
        )
    )(rel, g.emask)                                              # [B, 2tt]
    present = counts > 0
    node_counts = jax.vmap(
        lambda ty, m: jax.ops.segment_sum(
            m.astype(jnp.int32), ty, num_segments=t
        )
    )(g.ntypes, g.mask)                                          # [B, T]
    if not per_graph:
        present = jnp.broadcast_to(present.any(0)[None], present.shape)
        node_counts = jnp.broadcast_to(
            node_counts.sum(0)[None], node_counts.shape
        )
    # rel = esign*t*t + sty*t + dty -> reshaping [2tt] as [2t, t] puts the
    # DESTINATION type last; dst_denom counts present relations per dst type
    dst_denom = present.reshape(b, 2 * t, t).sum(1).astype(jnp.float32)
    return dst_denom, node_counts > 0


def build_dst_onehot(g: LatticeGraph, dtype=jnp.float32) -> jax.Array:
    """[B, N*k, N] masked one-hot destination matrix — the scatter of the
    lattice aggregation expressed as a GEMM operand. Built ONCE per forward
    and shared by every HEATLayerLattice (it depends only on the graph)."""
    b, n, k = g.idx.shape
    a = jax.nn.one_hot(g.idx.reshape(b, n * k), n, dtype=dtype)
    return a * g.emask.reshape(b, n * k, 1).astype(dtype)


@jax.custom_vjp
def gather_dst(vals: jax.Array, idx: jax.Array, a_mat: jax.Array):
    """vals[b, idx[b, i, j], :] with a GEMM-transposed VJP.

    Forward is a plain per-batch row gather ([B, N, Q] at [B, N, k] ->
    [B, N, k, Q]) — gathers are cheap on TPU. The AUTODIFF transpose of a
    gather, however, is a scatter-add, TPU's weakest primitive (~4-5 ms per
    [N*k, 512] scatter at the training operating point, PERF_NOTES r3);
    this custom VJP reuses the layer's one-hot destination matrix to run
    the transpose as `a_mat^T @ grad` on the MXU instead — the exact same
    contraction as the forward dst_reduce."""
    del a_mat
    return jax.vmap(lambda v, i: v[i])(vals, idx)


def _gather_dst_fwd(vals, idx, a_mat):
    return gather_dst(vals, idx, a_mat), a_mat


def _gather_dst_bwd(a_mat, g):
    b, n, k, q = g.shape
    flat = g.reshape(b, n * k, q)
    dvals = jnp.einsum(
        "bem,beq->bmq", a_mat, flat.astype(a_mat.dtype),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return dvals, None, None


gather_dst.defvjp(_gather_dst_fwd, _gather_dst_bwd)


def build_dst_sort(g: LatticeGraph):
    """(perm, sorted_dst) [B, N*k] — the O(E) aggregation operand (PERF_NOTES
    round-2 roadmap): edges sorted by destination once per forward, shared by
    every layer; each reduction is then a gather + a SORTED segment_sum (XLA
    emits the cheap sorted-scatter path) instead of an O(E*N) one-hot GEMM.
    Masked edges contribute zero values, so their destinations are benign."""
    b, n, k = g.idx.shape
    idx_flat = g.idx.reshape(b, n * k)
    perm = jnp.argsort(idx_flat, axis=1).astype(jnp.int32)
    sorted_dst = jnp.take_along_axis(idx_flat, perm, axis=1)
    return perm, sorted_dst


class HEATLayerLattice(nn.Module):
    """models.HEATLayer on the lattice (same param tree).

    agg_dtype='bfloat16' runs the one-hot aggregation GEMMs in bf16 with
    f32 accumulation (~1e-3 relative error on attention weights, 2x MXU
    rate); default f32 for exact parity with the TypedGraph models."""

    n_types: int
    out_dim: int
    n_heads: int
    dropout: float = 0.2
    agg_dtype: str = "float32"
    # 'onehot' (XLA GEMM, the measured winner on TPU — PERF_NOTES round-3)
    # | 'sorted' (O(E) gather + sorted segment_sum over dst-sorted edges)
    agg_impl: str = "onehot"
    # typed-projection formulation (layers.TypedDense impl switch)
    typed_impl: str = "ragged"

    @nn.compact
    def __call__(self, g: LatticeGraph, h: jax.Array, dst_denom,
                 train: bool = False, a_mat: jax.Array = None,
                 dst_sort=None, tsort=None) -> jax.Array:
        t = self.n_types
        b, n, k = g.idx.shape
        n_h, d_k = self.n_heads, self.out_dim // self.n_heads
        sqrt_dk = math.sqrt(d_k)
        n_combo = 2 * t

        flat_h = h.reshape(b * n, -1)
        flat_ty = g.ntypes.reshape(b * n)
        ti = self.typed_impl
        kv = TypedDense(t, self.out_dim, impl=ti, name="k_linears")(
            flat_h, flat_ty, tsort)
        qv = TypedDense(t, self.out_dim, impl=ti, name="q_linears")(
            flat_h, flat_ty, tsort)
        vv = TypedDense(t, self.out_dim, impl=ti, name="v_linears")(
            flat_h, flat_ty, tsort)
        kk = kv.reshape(b, n, n_h, d_k)
        vv = vv.reshape(b, n, n_h, d_k)
        skip = self.param("skip", nn.initializers.ones, (t,))

        # destination-indexed reductions: GEMMs against a one-hot
        # [B, N*k, N] shared across layers via a_mat (the measured winner;
        # the O(E) sorted alternative kept for reference, PERF_NOTES r3)
        adt = jnp.bfloat16 if self.agg_dtype == "bfloat16" else h.dtype
        if self.agg_impl == "sorted":
            perm, sorted_dst = (build_dst_sort(g) if dst_sort is None
                                else dst_sort)

            def dst_reduce(vals):
                vs = jnp.take_along_axis(vals, perm[:, :, None], axis=1)
                return jax.vmap(
                    lambda v, s: jax.ops.segment_sum(
                        v, s, num_segments=n, indices_are_sorted=True
                    )
                )(vs.astype(jnp.float32), sorted_dst)
        else:
            if a_mat is None:
                a_mat = build_dst_onehot(g, dtype=adt)

            def dst_reduce(vals):
                return jnp.einsum(
                    "bem,beq->bmq", a_mat, vals,
                    preferred_element_type=jnp.float32,
                )

        def edge_gather(vals_q):
            """[B, N, Q] -> rows at g.idx -> [B, N, k, Q]; GEMM-VJP via
            gather_dst on the onehot path (a plain gather's autodiff
            transpose is a TPU scatter — the measured train-step bound)."""
            if self.agg_impl == "sorted":
                return jax.vmap(lambda v, i: v[i])(vals_q, g.idx)
            return gather_dst(vals_q, g.idx, a_mat)

        # per-edge scores: q[dst] . k[src]; q rows gathered at idx -> [B,N,k,H,dk]
        q_dst = edge_gather(qv.reshape(b, n, self.out_dim)).reshape(
            b, n, k, n_h, d_k
        )
        ea = nn.Dense(1, name="e_linear")(g.sim[..., None])[..., 0]  # [B,N,k]
        score = (q_dst * kk[:, :, None]).sum(-1) * ea[..., None] / sqrt_dk

        combo = g.esign * t + g.ntypes[:, :, None]          # [B, N, k]
        combo_oh = jax.nn.one_hot(combo, n_combo, dtype=h.dtype)

        # numerically-exact softmax at ANY logit magnitude without paying
        # for it in the steady state: clipping alone is not shift
        # invariant (a group whose logits drift past the clamp flattens
        # and its gradients zero, silently diverging from a TypedGraph
        # checkpoint), but the exact fix — a per-dst max subtraction, one
        # SCALAR per dst so every (combo, head) group at that dst shifts
        # by the same constant and the softmax cancels it — costs a
        # forward segment_max that measured 8% of the train step. So the
        # shift runs under lax.cond, taken only when some in-range logit
        # actually approaches the clamp; below that threshold the clip is
        # a no-op and the unshifted path is already exact.
        def _dst_shifted(sc):
            flat_idx = g.idx.reshape(b, n * k)
            edge_max = jnp.where(g.emask, sc.max(-1), -jnp.inf)  # [B,N,k]
            dmax = jax.vmap(
                lambda v, s: jax.ops.segment_max(v, s, num_segments=n)
            )(edge_max.reshape(b, n * k), flat_idx)
            # stop_gradient: forward-only, no scatter in the backward
            dmax = jax.lax.stop_gradient(
                jnp.where(jnp.isfinite(dmax), dmax, 0.0)
            )
            shift = jax.vmap(lambda m, s: m[s])(dmax, flat_idx)
            return sc - shift.reshape(b, n, k)[..., None]

        hot = jnp.max(jnp.where(g.emask[..., None], jnp.abs(score), 0.0))
        score = jax.lax.cond(
            hot > 0.9 * _CLAMP, _dst_shifted, lambda sc: sc, score
        )
        # no-op on the unshifted path (all |score| <= 0.9*_CLAMP) and a
        # belt-and-braces floor on the shifted one: values below -_CLAMP
        # are < 9e-27 of their group max, under f32 epsilon
        score = jnp.clip(score, -_CLAMP, _CLAMP)           # [B, N, k, H]
        exp_s = jnp.where(g.emask[..., None], jnp.exp(score), 0.0)

        # denominators per (dst, combo, head)
        num_flat = (combo_oh[..., :, None] * exp_s[..., None, :]).reshape(
            b, n * k, n_combo * n_h
        )
        den = dst_reduce(num_flat.astype(adt))              # [B, N, combo*H]
        den_edge = edge_gather(den.reshape(b, n, n_combo * n_h)).reshape(
            b, n, k, n_combo, n_h
        )
        # combo select as a one-hot multiply-sum (take_along_axis here
        # would put another scatter in the backward)
        den_sel = (den_edge * combo_oh[..., None]).sum(3)   # [B, N, k, H]
        # double-where safe division: den_sel == 0 on edges whose dst is a
        # padded node; a plain eps-clamp makes the VJP compute 0/eps^2 with
        # eps^2 underflowing to 0 -> NaN gradients (x/y backward is -x/y^2)
        den_pos = den_sel > 0
        attn = jnp.where(
            den_pos, exp_s / jnp.where(den_pos, den_sel, 1.0), 0.0
        )

        # aggregation: A^T (attn * v_src)
        msg = (attn[..., None] * vv[:, :, None]).reshape(b, n * k, n_h * d_k)
        agg = dst_reduce(msg.astype(adt)).reshape(b * n, self.out_dim)

        # NOTE: the [N]-gathers from small vectors below (dst_denom, skip)
        # keep fancy indexing on purpose — replacing them with one-hot
        # matmuls measured no win (12.5-13.3 -> 13.5-14.0 ms/step; their
        # scatter transposes are tiny, the extra [N, T] operands are not).
        # dst_denom is [B, T] (per-graph or broadcast batch occupancy);
        # take_along_axis picks each node's own graph's row.
        denom = jnp.take_along_axis(
            jnp.maximum(dst_denom, 1.0), g.ntypes, axis=1
        ).reshape(b * n, 1)
        t_agg = agg / denom
        trans = TypedDense(t, self.out_dim, impl=ti, name="a_linears")(
            t_agg, flat_ty, tsort)
        trans = nn.Dropout(self.dropout, deterministic=not train)(trans)

        alpha = jax.nn.sigmoid(skip)[flat_ty][:, None]
        mixed = trans * alpha + flat_h * (1.0 - alpha)
        has_update = jnp.take_along_axis(
            dst_denom > 0, g.ntypes, axis=1
        ).reshape(b * n)
        keep = (has_update & g.mask.reshape(-1))[:, None]
        return jnp.where(keep, mixed, flat_h).reshape(b, n, self.out_dim)


_NEG_INF = -1e30


def _pool_by_type(g: LatticeGraph, h: jax.Array, t: int, kind: str = "mean"):
    """[B, T, D] per-(graph, type) readout — the lattice form of
    layers.pool_all_types (mean/sum via one-hot contraction; max via a
    masked reduce; empty types read out 0, matching ops.readout_*_all_types)."""
    ty_oh = jax.nn.one_hot(g.ntypes, t, dtype=h.dtype) * g.mask[..., None]
    if kind in ("mean", "sum"):
        sums = jnp.einsum("bnt,bnd->btd", ty_oh, h)
        if kind == "sum":
            return sums
        cnts = ty_oh.sum(1)
        return sums / jnp.maximum(cnts, 1.0)[..., None]
    if kind == "max":
        vals = jnp.where((ty_oh > 0)[..., None], h[:, :, None, :], _NEG_INF)
        out = vals.max(1)
        return jnp.where(out <= _NEG_INF / 2, 0.0, out)
    # 'att' with a per-ntype readout is a TypeError in the reference too
    raise NotImplementedError(f"per-ntype pooling {kind!r}")


class HEATNet4Lattice(nn.Module):
    """models.HEATNet4 on the lattice (identical param tree: adapt_ws,
    gcs_{i}, linears_prediction, attn_{k}, head_2/head_1/head)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_heads: int
    n_node_types: int
    dropout: float = 0.2
    graph_pooling_type: str = "mean"
    embed_dim: int = 256
    agg_dtype: str = "float32"
    agg_impl: str = "onehot"
    # 'ragged' (type-sorted grouped GEMM) measured 1.1-1.5x over 'onehot'
    # across the b2/4/8 train ladder (PERF_NOTES round-3 cont.)
    typed_impl: str = "ragged"
    # 'batch': occupancy over the whole batched graph (the reference's
    # batched TRAINING semantics) | 'graph': per-slide occupancy (the
    # reference's one-at-a-time EVAL semantics; grouping-invariant, used
    # by the evaluator and production serving)
    presence: str = "batch"

    @nn.compact
    def __call__(self, g: LatticeGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        b, n, _ = g.feats.shape
        dst_denom, type_present = _rel_presence(
            g, t, per_graph=self.presence == "graph"
        )
        pres = type_present.astype(g.feats.dtype)

        flat_ty = g.ntypes.reshape(-1)
        tsort = (ops.make_type_sort(flat_ty, t)
                 if self.typed_impl == "ragged" else None)
        flat = TypedDense(t, self.hidden_dim, impl=self.typed_impl,
                          name="adapt_ws")(
            g.feats.reshape(b * n, -1), flat_ty, tsort
        )
        h = flat.reshape(b, n, self.hidden_dim)
        adt = jnp.bfloat16 if self.agg_dtype == "bfloat16" else h.dtype
        a_mat = (build_dst_onehot(g, dtype=adt)
                 if self.agg_impl == "onehot" else None)
        dst_sort = build_dst_sort(g) if self.agg_impl == "sorted" else None
        for i in range(self.n_layers):
            h = HEATLayerLattice(
                t, self.hidden_dim, self.n_heads, self.dropout,
                agg_dtype=self.agg_dtype, agg_impl=self.agg_impl,
                typed_impl=self.typed_impl, name=f"gcs_{i}"
            )(g, h, dst_denom, train, a_mat=a_mat, dst_sort=dst_sort,
              tsort=tsort)

        pooled = _pool_by_type(g, h, t, self.graph_pooling_type)  # [B, T, hidden]
        out_h = TypedHeads(t, self.embed_dim, name="linears_prediction")(pooled)
        out_h = out_h * pres[:, :, None]

        hg = out_h.sum(1)
        gated = []
        for kk in range(t):
            gk = LinearAttentionBlock(name=f"attn_{kk}")(out_h[:, kk], hg)
            gated.append(gk * pres[:, kk : kk + 1])
        cat = jnp.concatenate(gated, axis=1)
        x = nn.Dense(self.embed_dim, name="head_2")(cat)
        x = nn.Dense(64, name="head_1")(x)
        return nn.Dense(self.out_dim, name="head")(x)


class HEATNet2Lattice(nn.Module):
    """models.HEATNet2 on the lattice (identical param tree)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    n_layers: int
    n_heads: int
    n_node_types: int
    dropout: float = 0.2
    graph_pooling_type: str = "mean"
    agg_dtype: str = "float32"
    agg_impl: str = "onehot"
    typed_impl: str = "ragged"  # see HEATNet4Lattice
    presence: str = "batch"  # see HEATNet4Lattice

    @nn.compact
    def __call__(self, g: LatticeGraph, train: bool = False) -> jax.Array:
        t = self.n_node_types
        b, n, _ = g.feats.shape
        dst_denom, type_present = _rel_presence(
            g, t, per_graph=self.presence == "graph"
        )
        pres = type_present.astype(g.feats.dtype)

        flat_ty = g.ntypes.reshape(-1)
        tsort = (ops.make_type_sort(flat_ty, t)
                 if self.typed_impl == "ragged" else None)
        flat = TypedDense(t, self.hidden_dim, impl=self.typed_impl,
                          name="adapt_ws")(
            g.feats.reshape(b * n, -1), flat_ty, tsort
        )
        h = flat.reshape(b, n, self.hidden_dim)
        adt = jnp.bfloat16 if self.agg_dtype == "bfloat16" else h.dtype
        a_mat = (build_dst_onehot(g, dtype=adt)
                 if self.agg_impl == "onehot" else None)
        dst_sort = build_dst_sort(g) if self.agg_impl == "sorted" else None
        for i in range(self.n_layers):
            h = HEATLayerLattice(
                t, self.hidden_dim, self.n_heads, self.dropout,
                agg_dtype=self.agg_dtype, agg_impl=self.agg_impl,
                typed_impl=self.typed_impl, name=f"gcs_{i}"
            )(g, h, dst_denom, train, a_mat=a_mat, dst_sort=dst_sort,
              tsort=tsort)

        pooled = _pool_by_type(g, h, t, self.graph_pooling_type)
        heads = TypedHeads(t, self.out_dim, name="linears_prediction")(pooled)
        return (heads * pres[:, :, None]).sum(1)
