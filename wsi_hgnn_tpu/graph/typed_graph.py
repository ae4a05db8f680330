"""TypedGraph — the fixed-shape typed-graph pytree that replaces DGL.

The reference framework (HKU-MedAI/WSI-HGNN) stores each slide as a DGL
heterogeneous graph: a dict of per-node-type feature arrays plus one edge
store per canonical (src_type, edge_type, dst_type) relation
(/root/reference/construct_graph/graph_constructor.py:284-303). That layout
is hostile to XLA: array shapes change per slide and per relation, forcing a
recompile per graph.

Here a graph — homogeneous or heterogeneous, single or batched — is ONE flat
padded structure:

  * nodes: `feat[N, D]`, `node_type[N]`, `node_graph[N]`, `node_mask[N]`
  * edges: `src[E]`, `dst[E]`, `esign[E]` (0=neg / 1=pos, the Pearson edge
    typing of graph_constructor.py:277-282), `sim[E]`, `edge_mask[E]`

`N` and `E` are padded, size-bucketed capacities, so a whole cohort of
slides compiles to a handful of XLA programs. Heterogeneity is carried by
`node_type` + `esign`; the canonical relation id of an edge is

    rel = esign * T*T + src_type * T + dst_type

matching the reference's canonical-etype enumeration order
(`for r in edge_types for s in range(T) for t in range(T)`,
/root/reference/parser.py:106-113). Batching (`dgl.batch` replacement) is
concatenation plus the `node_graph` segment vector.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class TypedGraph:
    """A padded, possibly-batched typed graph.

    All fields are arrays except the `pytree_node=False` static metadata,
    which is part of the compiled program's signature.
    """

    # --- node store ---
    feat: jax.Array        # [N, D] float — node features ('feat' ndata)
    node_type: jax.Array   # [N] int32 in [0, n_node_types); 0 for padding
    node_graph: jax.Array  # [N] int32 graph id in [0, n_graphs); 0 for padding
    node_mask: jax.Array   # [N] bool — True for real nodes

    # --- edge store ---
    src: jax.Array         # [E] int32 — source node index (0 for padding)
    dst: jax.Array         # [E] int32 — destination node index
    esign: jax.Array       # [E] int32 in {0 (neg), 1 (pos)}
    sim: jax.Array         # [E] float — Pearson correlation edge weight
    edge_mask: jax.Array   # [E] bool — True for real edges

    # --- optional per-edge message multiplier (explainers) ---
    # When set ([E] float), every message aggregation multiplies messages by
    # it — the TPU-native equivalent of the reference GNNExplainer's
    # `update_all` hijack that masks messages before reduction
    # (/root/reference/explainers/gnn_explainer.py:21-33,:156-157).
    edge_weight: Optional[jax.Array] = None

    # --- static metadata (compile-time constants) ---
    n_graphs: int = struct.field(pytree_node=False, default=1)
    n_node_types: int = struct.field(pytree_node=False, default=1)
    n_edge_types: int = struct.field(pytree_node=False, default=2)
    # True when edges are sorted by dst-major key
    # (dst * n_edge_types*T + esign*T + src_type) with padding edges keyed
    # to the end (see graph.batch.sort_graph_edges); lets every dst-keyed
    # segment reduction set `indices_are_sorted=True` on its XLA scatter.
    # Sortedness survives to_homogeneous (the homo key dst*2+esign is a
    # prefix-order of the typed key) and the mask-only training transforms.
    edges_sorted: bool = struct.field(pytree_node=False, default=False)
    # Graph-context parallelism (SURVEY.md §2.4 SP analog): when set to a
    # mesh axis name, this graph's edge arrays hold only THIS device's shard
    # of the edge store (parallel.big_graph.shard_edges) and every
    # edge-keyed segment reduction combines its partial result across the
    # axis with psum/pmax. Node arrays stay replicated. The unmodified
    # models then compute exactly the single-device answer under shard_map.
    edge_axis: Optional[str] = struct.field(pytree_node=False, default=None)

    # ------------------------------------------------------------------ #
    @property
    def num_nodes(self) -> int:
        """Padded node capacity."""
        return self.feat.shape[0]

    @property
    def num_edges(self) -> int:
        """Padded edge capacity."""
        return self.src.shape[0]

    @property
    def feat_dim(self) -> int:
        return self.feat.shape[1]

    @property
    def n_relations(self) -> int:
        """Number of canonical relations = n_edge_types * T * T."""
        return self.n_edge_types * self.n_node_types * self.n_node_types

    @property
    def is_homogeneous(self) -> bool:
        return self.n_node_types == 1

    # ------------------------------------------------------------------ #
    def edge_rel(self) -> jax.Array:
        """Canonical relation id per edge: esign*T*T + src_type*T + dst_type.

        Same (r, s, t) FACTORISATION as the reference's canonical-etype
        expansion (/root/reference/parser.py:106-113: `for r in etypes for
        s for t`), but the r-block ORDER is fixed here by esign (neg=0,
        pos=1) while the reference's follows the config's `edge_types`
        list (typically ["pos", "neg"] — the reverse). Relation-indexed
        checkpoint tensors are permuted between the two layouts by the
        converter (tools/convert_reference_checkpoint._rel_perm).
        Padded edges get relation 0 but are excluded by `edge_mask`.
        """
        t = self.n_node_types
        s_ty = self.node_type[self.src]
        d_ty = self.node_type[self.dst]
        return self.esign * (t * t) + s_ty * t + d_ty

    def node_type_counts(self) -> jax.Array:
        """[n_graphs * T] real-node count per (graph, node_type) segment."""
        seg = self.node_graph * self.n_node_types + self.node_type
        ones = self.node_mask.astype(jnp.int32)
        return jax.ops.segment_sum(
            ones, seg, num_segments=self.n_graphs * self.n_node_types
        )

    def rel_edge_counts(self) -> jax.Array:
        """[n_relations] real-edge count per canonical relation (whole batch).

        Used to reproduce DGL `multi_update_all(..., cross_reducer='mean')`
        semantics, whose denominator is the number of canonical relations
        present (>=1 edge) in the batched graph that target each node type
        (/root/reference/models/HGT.py:105-106).
        """
        rel = self.edge_rel()
        ones = self.edge_mask.astype(jnp.int32)
        counts = jax.ops.segment_sum(ones, rel, num_segments=self.n_relations)
        if self.edge_axis is not None:
            counts = jax.lax.psum(counts, self.edge_axis)
        return counts

    def degrees(self, implicit_self_loops: bool = False):
        """(out_degree[N], in_degree[N]) over real edges.

        `implicit_self_loops=True` adds 1 to both, reproducing
        `dgl.add_self_loop` (/root/reference/data.py:120-121) without
        materialising N extra edges.
        """
        ones = self.edge_mask.astype(jnp.float32)
        out_deg = jax.ops.segment_sum(ones, self.src, num_segments=self.num_nodes)
        in_deg = jax.ops.segment_sum(
            ones, self.dst, num_segments=self.num_nodes,
            indices_are_sorted=self.edges_sorted,
        )
        if self.edge_axis is not None:
            out_deg = jax.lax.psum(out_deg, self.edge_axis)
            in_deg = jax.lax.psum(in_deg, self.edge_axis)
        if implicit_self_loops:
            real = self.node_mask.astype(jnp.float32)
            out_deg = out_deg + real
            in_deg = in_deg + real
        return out_deg, in_deg

    def replace_feat(self, feat: jax.Array) -> "TypedGraph":
        return self.replace(feat=feat)


# ---------------------------------------------------------------------- #
# Host-side constructors
# ---------------------------------------------------------------------- #
def _round_up(x: int, multiple: int) -> int:
    return max(multiple, ((x + multiple - 1) // multiple) * multiple)


def bucket_size(n: int, *, base: int = 256) -> int:
    """Size-bucketing policy: next power-of-two-ish capacity >= n.

    Buckets are {base, 2*base, 4*base, ...} with two midpoints per octave
    (1x, 1.5x) to cap padding waste at ~33% while keeping the number of
    distinct compiled programs logarithmic in cohort spread.
    """
    n = max(int(n), 1)
    cap = base
    while cap < n:
        if cap + cap // 2 >= n:
            return cap + cap // 2
        cap *= 2
    return cap


def from_arrays(
    feat: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    *,
    node_type: Optional[np.ndarray] = None,
    esign: Optional[np.ndarray] = None,
    sim: Optional[np.ndarray] = None,
    n_node_types: int = 1,
    n_edge_types: int = 2,
    node_capacity: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    add_self_loops: bool = False,
    bucket_base: int = 256,
) -> TypedGraph:
    """Build a single padded TypedGraph from host arrays (numpy).

    `add_self_loops=True` materialises one self-edge per real node (placed
    after the real edges, with esign=1 and sim=1), mirroring the reference's
    `dgl.add_self_loop` for homogeneous graphs (/root/reference/data.py:120).
    Self-edges are identifiable as src==dst, which graph transforms use to
    exempt them from DropEdge (the reference adds self loops *after* its
    random transforms, /root/reference/data.py:116-121).
    """
    feat = np.asarray(feat, dtype=np.float32)
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    n, d = feat.shape
    e = src.shape[0]

    if node_type is None:
        node_type = np.zeros(n, dtype=np.int32)
    if esign is None:
        esign = np.ones(e, dtype=np.int32)
    if sim is None:
        sim = np.ones(e, dtype=np.float32)

    if add_self_loops:
        loop = np.arange(n, dtype=np.int32)
        src = np.concatenate([src, loop])
        dst = np.concatenate([dst, loop])
        esign = np.concatenate([esign, np.ones(n, dtype=np.int32)])
        sim = np.concatenate([sim, np.ones(n, dtype=np.float32)])
        e = e + n

    cap_n = node_capacity or bucket_size(n, base=bucket_base)
    cap_e = edge_capacity or bucket_size(e, base=bucket_base)
    if cap_n < n or cap_e < e:
        raise ValueError(f"capacity too small: nodes {n}>{cap_n} or edges {e}>{cap_e}")

    def pad1(x, cap, fill=0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    feat_p = np.zeros((cap_n, d), dtype=np.float32)
    feat_p[:n] = feat

    # NOTE: leaves stay host-side numpy — the loader batches many slides
    # before anything touches the device, and a premature device_put would
    # force a device round-trip per slide (expensive through remote links).
    # jit/device_put transfers the final batched graph once.
    return TypedGraph(
        feat=feat_p,
        node_type=pad1(node_type.astype(np.int32), cap_n),
        node_graph=np.zeros(cap_n, dtype=np.int32),
        node_mask=np.arange(cap_n) < n,
        src=pad1(src, cap_e),
        dst=pad1(dst, cap_e),
        esign=pad1(esign.astype(np.int32), cap_e),
        sim=pad1(sim.astype(np.float32), cap_e),
        edge_mask=np.arange(cap_e) < e,
        n_graphs=1,
        n_node_types=n_node_types,
        n_edge_types=n_edge_types,
    )


def repad_graph(g: TypedGraph, node_capacity: int,
                edge_capacity: int) -> TypedGraph:
    """Re-pad a SINGLE (unbatched) graph to the given capacities.

    Datasets pad each slide to its own size bucket; stacking several
    slides on a leading batch axis (for a vmapped per-slide forward —
    see train.evaluator.make_stacked_eval_fn) needs them at one shared
    capacity. Host-side numpy, like all loader-side packing."""
    n = int(np.asarray(g.node_mask).sum())
    e = int(np.asarray(g.edge_mask).sum())
    return from_arrays(
        np.asarray(g.feat)[:n],
        np.asarray(g.src)[:e],
        np.asarray(g.dst)[:e],
        node_type=np.asarray(g.node_type)[:n],
        esign=np.asarray(g.esign)[:e],
        sim=np.asarray(g.sim)[:e],
        n_node_types=g.n_node_types,
        n_edge_types=g.n_edge_types,
        node_capacity=node_capacity,
        edge_capacity=edge_capacity,
    )


def to_homogeneous(g: TypedGraph) -> TypedGraph:
    """Forget node/edge typing (keep features, edges, masks).

    Replaces the reference's `homo_graph` duplicate emitted by
    graph_constructor.py:299-301 — here it is a zero-copy view change.
    """
    return g.replace(
        node_type=jnp.zeros_like(g.node_type),
        n_node_types=1,
    )
