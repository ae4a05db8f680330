"""Segment primitives: the XLA replacement for DGL's C++ message kernels.

Every DGL primitive the reference uses — `fn.u_mul_e`/`fn.v_dot_u` message
functions, `edge_softmax`, `multi_update_all` cross-type reduction, and the
`mean/sum/max_nodes` readouts (/root/reference/models/HGT.py:99-106,
/root/reference/pooling/*.py) — lowers here to gather → elementwise/GEMM →
`jax.ops.segment_*`. All shapes are static; padding is excluded by masks,
never by dynamic slicing.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .typed_graph import TypedGraph

_NEG_INF = -1e30


# ---------------------------------------------------------------------- #
# segment softmax
# ---------------------------------------------------------------------- #
def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Numerically-stable softmax of `scores` within each segment.

    Replaces DGL `edge_softmax(sub_graph, score, norm_by='dst')`
    (/root/reference/models/HGT.py:101). `scores` is [E] or [E, H]; the
    softmax groups are rows sharing `segment_ids`. Masked-out entries get
    probability 0 and do not influence their segment's normalisation.

    With `axis_name` (graph-context parallelism: each device holds one edge
    shard), the segment max and denominator combine across the mesh axis
    with pmax/psum, so the per-edge result equals the unsharded softmax.
    """
    if mask is not None:
        m = mask if scores.ndim == mask.ndim else mask[:, None]
        scores = jnp.where(m, scores, _NEG_INF)
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # the max is only a numerical stabiliser (cancels in the softmax), so
    # it carries no gradient — required: pmax has no differentiation rule
    seg_max = jax.lax.stop_gradient(seg_max)
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        m = mask if exp.ndim == mask.ndim else mask[:, None]
        exp = jnp.where(m, exp, 0.0)
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    denom = jnp.where(denom > 0, denom, 1.0)
    return exp / denom[segment_ids]


def edge_softmax_by_dst_rel(g: TypedGraph, scores: jax.Array) -> jax.Array:
    """Per-(dst node, canonical relation) edge softmax.

    DGL's hetero models call `edge_softmax` on each (src_type, etype,
    dst_type) relation subgraph separately (/root/reference/models/HGT.py:76,
    :101; HEATNet2.py:92,:113), so two in-edges of the same destination node
    belong to the same softmax group only if they share the full canonical
    relation. Since the destination node already pins dst_type, the group is
    fully identified by (dst, esign, src_type) — a keyspace of
    N * 2 * T instead of N * 2 * T^2, which shrinks the scatter buffers of
    the segment reductions ~2x in wall-clock on TPU.
    """
    t = g.n_node_types
    combo = g.esign * t + g.node_type[g.src]  # (esign, src_type)
    n_combo = g.n_edge_types * t
    seg = g.dst * n_combo + combo
    # masked edges must not break the indices_are_sorted contract. Two
    # cases: (a) padding edges sorted to the tail (dst rewritten to the
    # last node slot) can carry a combo SMALLER than real edges into that
    # node at exactly-full capacity; (b) train-time DropEdge/DropNode
    # clear edge_mask of REAL edges mid-array, where pinning them to the
    # maximum segment id (the old fix for (a)) would itself make the
    # sequence non-monotone. A running maximum handles both on a sorted
    # graph: real edges are already non-decreasing, and every masked
    # edge is raised to the last real segment seen — harmless, since its
    # score is -inf-masked out of the max and its exp is zeroed before
    # the denominator sum. On an unsorted graph any id works; keep the
    # max-id pin there.
    if g.edges_sorted:
        seg = jax.lax.cummax(seg)
    else:
        seg = jnp.where(g.edge_mask, seg, g.num_nodes * n_combo - 1)
    return segment_softmax(
        scores, seg, num_segments=g.num_nodes * n_combo, mask=g.edge_mask,
        indices_are_sorted=g.edges_sorted, axis_name=g.edge_axis,
    )


# ---------------------------------------------------------------------- #
# message passing aggregation
# ---------------------------------------------------------------------- #
def _apply_edge_weight(g: TypedGraph, edge_vals: jax.Array) -> jax.Array:
    """Multiply messages by the optional explainer edge mask (TypedGraph
    .edge_weight) — the reference's mask_message UDF
    (gnn_explainer.py:21-26)."""
    if g.edge_weight is None:
        return edge_vals
    w = g.edge_weight.reshape((-1,) + (1,) * (edge_vals.ndim - 1))
    return edge_vals * w


def copy_e_sum(g: TypedGraph, edge_vals: jax.Array) -> jax.Array:
    """sum_e->dst of per-edge values. [E, ...] -> [N, ...]."""
    edge_vals = _apply_edge_weight(g, edge_vals)
    m = g.edge_mask
    ev = jnp.where(m.reshape((-1,) + (1,) * (edge_vals.ndim - 1)), edge_vals, 0.0)
    out = jax.ops.segment_sum(
        ev, g.dst, num_segments=g.num_nodes, indices_are_sorted=g.edges_sorted
    )
    if g.edge_axis is not None:
        out = jax.lax.psum(out, g.edge_axis)
    return out


def u_mul_e_sum(g: TypedGraph, node_vals: jax.Array, edge_vals: jax.Array) -> jax.Array:
    """DGL `fn.u_mul_e(...) -> fn.sum` : dst_n <- sum_e src_vals * edge_vals."""
    msgs = node_vals[g.src] * edge_vals
    return copy_e_sum(g, msgs)


def copy_u_sum(g: TypedGraph, node_vals: jax.Array) -> jax.Array:
    """dst_n <- sum over in-edges of src value (DGL fn.copy_u / fn.sum)."""
    return copy_e_sum(g, node_vals[g.src])


def copy_u_mean(g: TypedGraph, node_vals: jax.Array) -> jax.Array:
    """dst_n <- mean over in-edges of src value; 0 where in-degree is 0."""
    s = copy_u_sum(g, node_vals)
    _, in_deg = g.degrees()
    in_deg = jnp.maximum(in_deg, 1.0)
    return s / in_deg.reshape((-1,) + (1,) * (s.ndim - 1))


def copy_u_max(g: TypedGraph, node_vals: jax.Array) -> jax.Array:
    """dst_n <- max over in-edges of src value; 0 where in-degree is 0."""
    msgs = _apply_edge_weight(g, node_vals[g.src])
    m = g.edge_mask.reshape((-1,) + (1,) * (msgs.ndim - 1))
    msgs = jnp.where(m, msgs, _NEG_INF)
    out = jax.ops.segment_max(
        msgs, g.dst, num_segments=g.num_nodes, indices_are_sorted=g.edges_sorted
    )
    if g.edge_axis is not None:
        # differentiable cross-shard max. pmax has no differentiation
        # rule and all_gather's output fails shard_map's replication
        # inference, so: take the (stop-gradient) global max for the
        # VALUE and route the GRADIENT through a psum over the shards
        # holding it (ties split evenly — the subgradient convention)
        gmax = jax.lax.pmax(jax.lax.stop_gradient(out), g.edge_axis)
        is_max = (out >= gmax) & (out > _NEG_INF / 2)
        num = jax.lax.psum(jnp.where(is_max, out, 0.0), g.edge_axis)
        cnt = jax.lax.psum(is_max.astype(out.dtype), g.edge_axis)
        out = jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), _NEG_INF)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def v_dot_u(g: TypedGraph, dst_vals: jax.Array, src_vals: jax.Array) -> jax.Array:
    """Per-edge dot product <dst_val, src_val> over the last axis.

    Replaces `apply_edges(fn.v_dot_u('q','k','t'))` followed by `.sum(-1)`
    (/root/reference/models/HGT.py:99-100): with [N, H, D] inputs returns
    [E, H] attention logits.
    """
    return jnp.sum(dst_vals[g.dst] * src_vals[g.src], axis=-1)


# ---------------------------------------------------------------------- #
# readouts (pooling) — the pooling/ package replacement
# ---------------------------------------------------------------------- #
def _node_segments(g: TypedGraph, ntype: Optional[int]) -> tuple[jax.Array, jax.Array, int]:
    """(segment_ids, keep_mask, num_segments) for per-graph readout.

    ntype=None pools all real nodes per graph; ntype=k pools only nodes of
    that type (the reference pooling extension over DGL's glob pooling,
    /root/reference/pooling/avg_pooling.py:11-18).
    """
    seg = g.node_graph
    keep = g.node_mask
    if ntype is not None:
        keep = keep & (g.node_type == ntype)
    return seg, keep, g.n_graphs


def readout_sum(g: TypedGraph, feat: jax.Array, ntype: Optional[int] = None) -> jax.Array:
    seg, keep, num = _node_segments(g, ntype)
    vals = jnp.where(keep[:, None], feat, 0.0)
    return jax.ops.segment_sum(vals, seg, num_segments=num)


def readout_mean(g: TypedGraph, feat: jax.Array, ntype: Optional[int] = None) -> jax.Array:
    """Per-graph mean; graphs with zero qualifying nodes read out 0
    (matching DGL `mean_nodes` on empty node sets)."""
    seg, keep, num = _node_segments(g, ntype)
    vals = jnp.where(keep[:, None], feat, 0.0)
    s = jax.ops.segment_sum(vals, seg, num_segments=num)
    cnt = jax.ops.segment_sum(keep.astype(feat.dtype), seg, num_segments=num)
    return s / jnp.maximum(cnt, 1.0)[:, None]


def readout_max(g: TypedGraph, feat: jax.Array, ntype: Optional[int] = None) -> jax.Array:
    seg, keep, num = _node_segments(g, ntype)
    vals = jnp.where(keep[:, None], feat, _NEG_INF)
    out = jax.ops.segment_max(vals, seg, num_segments=num)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def readout_attention(
    g: TypedGraph,
    feat: jax.Array,
    gate_logits: jax.Array,
    ntype: Optional[int] = None,
) -> jax.Array:
    """DGL `GlobalAttentionPooling`: softmax(gate) within each graph, then
    weighted sum (/root/reference/models/GCN.py:12, pool type 'att')."""
    seg, keep, num = _node_segments(g, ntype)
    gl = gate_logits.reshape(-1)
    alpha = segment_softmax(gl, seg, num_segments=num, mask=keep)
    vals = jnp.where(keep[:, None], feat * alpha[:, None], 0.0)
    return jax.ops.segment_sum(vals, seg, num_segments=num)


def readout_mean_all_types(g: TypedGraph, feat: jax.Array) -> jax.Array:
    """[B*T, D] per-(graph, node-type) mean readout in one segment pass.

    Equivalent to calling `readout_mean(g, feat, ntype=k)` for every k but
    with a single scatter; rows are ordered graph-major (b*T + t). Types with
    zero nodes in a graph read out 0.
    """
    t = g.n_node_types
    seg = g.node_graph * t + g.node_type
    num = g.n_graphs * t
    keep = g.node_mask
    vals = jnp.where(keep[:, None], feat, 0.0)
    s = jax.ops.segment_sum(vals, seg, num_segments=num)
    cnt = jax.ops.segment_sum(keep.astype(feat.dtype), seg, num_segments=num)
    return s / jnp.maximum(cnt, 1.0)[:, None]


def readout_sum_all_types(g: TypedGraph, feat: jax.Array) -> jax.Array:
    t = g.n_node_types
    seg = g.node_graph * t + g.node_type
    num = g.n_graphs * t
    vals = jnp.where(g.node_mask[:, None], feat, 0.0)
    return jax.ops.segment_sum(vals, seg, num_segments=num)


def readout_max_all_types(g: TypedGraph, feat: jax.Array) -> jax.Array:
    t = g.n_node_types
    seg = g.node_graph * t + g.node_type
    num = g.n_graphs * t
    vals = jnp.where(g.node_mask[:, None], feat, _NEG_INF)
    out = jax.ops.segment_max(vals, seg, num_segments=num)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


# ---------------------------------------------------------------------- #
# per-node-type parameter application
# ---------------------------------------------------------------------- #
def typed_linear(
    feat: jax.Array,
    node_type: jax.Array,
    weights: jax.Array,
    biases: jax.Array,
) -> jax.Array:
    """y[n] = feat[n] @ W[type[n]] + b[type[n]].

    The reference keeps one nn.Linear per node type (e.g. `adapt_ws`,
    `k/q/v_linears`, /root/reference/models/HGT.py:44-55). On TPU we run all
    T projections as one einsum (T is 6 — the extra FLOPs are negligible
    against MXU utilisation) and select per node, which keeps a single
    static GEMM instead of T dynamic-shaped ones.

    weights: [T, D_in, D_out]; biases: [T, D_out].
    """
    all_out = jnp.einsum(
        "nd,tdh->tnh", feat, weights, preferred_element_type=feat.dtype
    )
    # select via one-hot contraction, not fancy indexing: picking exactly
    # one f32 term is bit-identical to the gather, but the gather's autodiff
    # transpose is a [N]-row scatter into [T, N, H] (slow on TPU) while the
    # contraction's is a broadcast multiply
    oh = jax.nn.one_hot(node_type, weights.shape[0], dtype=feat.dtype)
    sel = jnp.einsum("tnh,nt->nh", all_out, oh)
    return sel + oh @ biases


class TypeSort:
    """Node permutation grouping rows by node type, shared across every
    typed projection of a forward pass (the type vector never changes
    within a model call). perm sorts rows type-major; inv undoes it;
    group_sizes[t] counts rows of type t (summing to N, padding included).
    Registered as a pytree so it can cross jit/vjp boundaries."""

    def __init__(self, perm, inv, group_sizes):
        self.perm = perm
        self.inv = inv
        self.group_sizes = group_sizes

    def tree_flatten(self):
        return (self.perm, self.inv, self.group_sizes), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


jax.tree_util.register_pytree_node(
    TypeSort, TypeSort.tree_flatten, TypeSort.tree_unflatten
)


def make_type_sort(node_type: jax.Array, n_types: int) -> TypeSort:
    perm = jnp.argsort(node_type, stable=True).astype(jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)
    group_sizes = jax.ops.segment_sum(
        jnp.ones_like(node_type, dtype=jnp.int32), node_type,
        num_segments=n_types,
    )
    return TypeSort(perm, inv, group_sizes)


# `jax.lax.ragged_dot`'s batching rule is NYI beyond dim-0 on this
# environment's jax (0.9.0 raises ``NotImplementedError: ragged_dot vmap
# over any dim but 0``), and the failure can surface OUTSIDE any caller's
# frame (vmap of a jax.checkpoint'd model batches the staged jaxpr after
# the module body already ran, so neither an except nor a tracer check in
# the module can intervene).  The robust fix is structural at the op
# level: the forward and backward ragged cores each carry a
# `jax.custom_batching.custom_vmap` rule that swaps in the equivalent
# vmap-polymorphic one-hot form, so `vmap`/`vmap∘checkpoint`/`vmap∘grad`/
# `grad∘vmap` of any model using the ragged path just work, while every
# unbatched trace (jit, grad, shard_map shards — the measured hot paths)
# keeps the grouped GEMM.  custom_vmap alone breaks autodiff, so the
# public entry is a custom_vjp whose fwd AND bwd route through custom_vmap
# cores; the hand-written bwd is exactly the ops jax's native ragged_dot
# VJP lowers to (two ragged_dot_generals, read from its jaxpr), plus
# inverse-permutation gathers instead of autodiff's scatter-add (TPU's
# weakest primitive — same motivation as models.lattice.gather_dst).

# standard ragged-mode: [N, H] x [T, H, D] grouped along rows -> [N, D]
_RAGGED_STD = jax.lax.RaggedDotDimensionNumbers(
    dot_dimension_numbers=(((1,), (1,)), ((), ())),
    lhs_ragged_dimensions=[0], rhs_group_dimensions=[0],
)
# ragged-contracting mode: [N, D] x [N, H] grouped outer product -> [T, D, H]
_RAGGED_OUTER = jax.lax.RaggedDotDimensionNumbers(
    dot_dimension_numbers=(((0,), (0,)), ((), ())),
    lhs_ragged_dimensions=[0], rhs_group_dimensions=[],
)


# The fwd core returns (y, rows) where `rows` is the residual the bwd
# core consumes: the SORTED rows xs = feat[perm] on the ragged path (so
# the bwd's grouped outer product needs no re-gather), and plain `feat`
# on the batched one-hot path. The interpretations never mix because a
# custom_vjp's fwd and bwd calls sit in one consumer computation — any
# vmap batches both, selecting both batched rules together.
@jax.custom_batching.custom_vmap
def _ragged_apply(feat, node_type, weights, biases, perm, inv, group_sizes):
    xs = feat[perm]
    ys = jax.lax.ragged_dot(
        xs, weights, group_sizes, preferred_element_type=feat.dtype
    )
    y = ys[inv]
    oh = jax.nn.one_hot(node_type, weights.shape[0], dtype=feat.dtype)
    return y + oh @ biases, xs


@_ragged_apply.def_vmap
def _ragged_apply_vmap(axis_size, in_batched, feat, node_type, weights,
                       biases, perm, inv, group_sizes):
    fb, nb, wb, bb = in_batched[:4]
    out = jax.vmap(
        typed_linear,
        in_axes=(0 if fb else None, 0 if nb else None,
                 0 if wb else None, 0 if bb else None),
        axis_size=axis_size,
    )(feat, node_type, weights, biases)
    rows = feat if fb else jnp.broadcast_to(feat, (axis_size,) + feat.shape)
    return (out, rows), (True, True)


def _onehot_bwd(g, feat, node_type, weights):
    oh = jax.nn.one_hot(node_type, weights.shape[0], dtype=g.dtype)
    dfeat = jnp.einsum("nh,tdh,nt->nd", g, weights, oh)
    dw = jnp.einsum("nd,nh,nt->tdh", feat, g, oh)
    db = jnp.einsum("nh,nt->th", g, oh)
    return dfeat, dw, db


@jax.custom_batching.custom_vmap
def _ragged_bwd(g, rows, node_type, weights, perm, inv, group_sizes):
    gso = g[perm]
    dxs = jax.lax.ragged_dot_general(
        gso, weights.transpose(0, 2, 1), group_sizes, _RAGGED_STD,
        preferred_element_type=g.dtype,
    )
    dfeat = dxs[inv]
    dw = jax.lax.ragged_dot_general(
        rows, gso, group_sizes, _RAGGED_OUTER,
        preferred_element_type=weights.dtype,
    )
    # bias grad as the one-hot transpose GEMM, not segment_sum — the
    # scatter-add it lowers to is TPU's weakest primitive
    oh = jax.nn.one_hot(node_type, weights.shape[0], dtype=g.dtype)
    db = jnp.einsum("nh,nt->th", g, oh).astype(weights.dtype)
    return dfeat, dw, db


@_ragged_bwd.def_vmap
def _ragged_bwd_vmap(axis_size, in_batched, g, rows, node_type, weights,
                     perm, inv, group_sizes):
    gb, rb, nb, wb = in_batched[:4]
    # `rows` is unsorted feat here — the batched fwd rule put it there
    outs = jax.vmap(
        _onehot_bwd,
        in_axes=(0 if gb else None, 0 if rb else None,
                 0 if nb else None, 0 if wb else None),
        axis_size=axis_size,
    )(g, rows, node_type, weights)
    return outs, (True, True, True)


@jax.custom_vjp
def _typed_linear_ragged(feat, node_type, weights, biases, perm, inv,
                         group_sizes):
    y, _ = _ragged_apply(feat, node_type, weights, biases, perm, inv,
                         group_sizes)
    return y


def _typed_linear_ragged_fwd(feat, node_type, weights, biases, perm, inv,
                             group_sizes):
    y, rows = _ragged_apply(feat, node_type, weights, biases, perm, inv,
                            group_sizes)
    return y, (rows, node_type, weights, perm, inv, group_sizes)


def _typed_linear_ragged_bwd(res, g):
    rows, node_type, weights, perm, inv, group_sizes = res
    dfeat, dw, db = _ragged_bwd(g, rows, node_type, weights, perm, inv,
                                group_sizes)
    return dfeat, None, dw, db, None, None, None


_typed_linear_ragged.defvjp(_typed_linear_ragged_fwd,
                            _typed_linear_ragged_bwd)


def typed_linear_ragged(
    feat: jax.Array,
    node_type: jax.Array,
    weights: jax.Array,
    biases: jax.Array,
    tsort: Optional[TypeSort] = None,
) -> jax.Array:
    """typed_linear via a grouped GEMM over type-sorted rows.

    The einsum form above materialises an all-types [T, N, H] intermediate
    (T x the selected work in both FLOPs and HBM traffic — the measured
    residual bound of the lattice train step, PERF_NOTES r3).  Here rows
    are permuted type-major once and `jax.lax.ragged_dot` runs ONE GEMM
    whose weight matrix switches at group boundaries: 1x FLOPs, no [T,N,H]
    round-trip.  The permutations carry inverse-permutation backwards, so
    the bwd is two gathers + ragged_dot's grouped transposes — no
    scatters.  Exact up to f32 reassociation vs typed_linear.  Measured
    1.1-1.5x over the one-hot form across the b2/4/8 TPU train ladder
    (PERF_NOTES round-3 cont.) — the lattice models' default typed_impl.

    Batching-safe: under ANY vmap (including one applied to a
    jax.checkpoint'd caller, where the batch tracer is invisible from
    here) the custom_vmap rules above swap in the equivalent one-hot
    form, so callers never need to dispatch on the trace themselves.
    """
    if tsort is None:
        tsort = make_type_sort(node_type, weights.shape[0])
    return _typed_linear_ragged(feat, node_type, weights, biases,
                                tsort.perm, tsort.inv, tsort.group_sizes)
