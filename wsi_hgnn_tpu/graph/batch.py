"""Graph batching — the `dgl.batch` / `GraphDataLoader` collation replacement.

The reference collates B slide graphs into one DGL batched graph per train
step (/root/reference/trainer/train_gnn.py:48-53). Here batching is plain
concatenation with node-index offsets plus the `node_graph` segment vector;
the result is itself a TypedGraph, so models never see batching at all.

Capacities are size-bucketed (`bucket_size`) so a shuffled cohort of slides
re-uses a handful of compiled programs instead of recompiling per batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .typed_graph import TypedGraph, bucket_size


def sort_graph_edges(g: TypedGraph) -> TypedGraph:
    """Host-side edge sort by the segment key dst*(ET*T) + esign*T + src_type
    — the exact grouping of `ops.edge_softmax_by_dst_rel` — with padding
    edges moved to the end (dst rewritten to the last node slot so the dst
    sequence stays non-decreasing). Marks `edges_sorted=True`, which every
    dst-keyed segment op turns into `indices_are_sorted=True` on its scatter
    (PERF_NOTES roadmap #4). Uses the native C++ counting sort when built
    (native.sort_edges_native), NumPy stable argsort otherwise."""
    from ..native import sort_edges_native

    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    esign = np.asarray(g.esign)
    sim = np.asarray(g.sim)
    emask = np.asarray(g.edge_mask)
    node_type = np.asarray(g.node_type)

    t, et = g.n_node_types, g.n_edge_types
    n_combo = et * t
    cap_n = g.num_nodes
    key = dst.astype(np.int64) * n_combo + esign * t + node_type[src]
    pad_key = np.int64(cap_n) * n_combo
    key = np.where(emask, key, pad_key)
    perm = sort_edges_native(key, int(pad_key) + 1)
    if perm is None:
        perm = np.argsort(key, kind="stable")

    dst = np.where(emask, dst, cap_n - 1)
    ew = g.edge_weight
    return g.replace(
        src=src[perm],
        dst=dst[perm],
        esign=esign[perm],
        sim=sim[perm],
        edge_mask=emask[perm],
        edge_weight=None if ew is None else np.asarray(ew)[perm],
        edges_sorted=True,
    )


def batch_graphs(
    graphs: Sequence[TypedGraph],
    *,
    node_capacity: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    bucket_base: int = 256,
) -> TypedGraph:
    """Concatenate graphs into one batched TypedGraph (host-side).

    Works on already-padded graphs: each member's padding is dropped and the
    batch re-padded to a bucketed capacity, so batches of different slides
    land on the same compiled shapes.
    """
    if not graphs:
        raise ValueError("batch_graphs needs at least one graph")
    t = graphs[0].n_node_types
    et = graphs[0].n_edge_types
    for g in graphs:
        if g.n_node_types != t or g.n_edge_types != et:
            raise ValueError("all graphs in a batch must share type metadata")

    b = len(graphs)
    feats, ntys, srcs, dsts, esigns, sims = [], [], [], [], [], []
    ews, any_ew = [], False
    counts = []
    for g in graphs:
        n = int(np.asarray(g.node_mask).sum())
        e = int(np.asarray(g.edge_mask).sum())
        counts.append((n, e))
        feats.append(np.asarray(g.feat)[:n])
        ntys.append(np.asarray(g.node_type)[:n])
        srcs.append(np.asarray(g.src)[:e])
        dsts.append(np.asarray(g.dst)[:e])
        esigns.append(np.asarray(g.esign)[:e])
        sims.append(np.asarray(g.sim)[:e])
        # the explainer's per-edge mask must survive batching (dropping
        # it would silently run every aggregation unmasked)
        if g.edge_weight is not None:
            any_ew = True
            ews.append(np.asarray(g.edge_weight)[:e])
        else:
            ews.append(np.ones(e, np.float32))

    n_total = sum(n for n, _ in counts)
    e_total = sum(e for _, e in counts)
    cap_n = node_capacity or bucket_size(n_total, base=bucket_base)
    cap_e = edge_capacity or bucket_size(e_total, base=bucket_base)
    if cap_n < n_total or cap_e < e_total:
        raise ValueError("batch exceeds requested capacity")

    # native C++ packer fast path (one multithreaded pass; see native/)
    from ..native import pack_batch_native

    ew_p = None
    if any_ew:
        ew_p = np.zeros(cap_e, np.float32)
        ew_p[:e_total] = np.concatenate(ews) if ews else []

    packed = pack_batch_native(
        feats, ntys, srcs, dsts, esigns, sims, cap_n, cap_e
    )
    if packed is not None:
        feat_p, nty_p, ngr_p, nmask, src_p, dst_p, esg_p, sim_p, emask = packed
        return TypedGraph(
            feat=feat_p,
            node_type=nty_p,
            node_graph=ngr_p,
            node_mask=nmask,
            src=src_p,
            dst=dst_p,
            esign=esg_p,
            sim=sim_p,
            edge_mask=emask,
            edge_weight=ew_p,
            n_graphs=b,
            n_node_types=t,
            n_edge_types=et,
        )

    # NumPy fallback
    offset = 0
    ngraph = []
    for i, (n, _) in enumerate(counts):
        srcs[i] = srcs[i] + offset
        dsts[i] = dsts[i] + offset
        ngraph.append(np.full(n, i, dtype=np.int32))
        offset += n

    feat = np.concatenate(feats)
    src = np.concatenate(srcs)

    def pad(x, cap, fill=0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    return TypedGraph(
        feat=pad(feat, cap_n),
        node_type=pad(np.concatenate(ntys), cap_n),
        # padding nodes point at graph 0 but are masked out of every segment op
        node_graph=pad(np.concatenate(ngraph), cap_n),
        node_mask=np.arange(cap_n) < n_total,
        src=pad(src, cap_e),
        dst=pad(np.concatenate(dsts), cap_e),
        esign=pad(np.concatenate(esigns), cap_e),
        sim=pad(np.concatenate(sims), cap_e),
        edge_mask=np.arange(cap_e) < e_total,
        edge_weight=ew_p,  # explainer mask — must survive the fallback too
        n_graphs=b,
        n_node_types=t,
        n_edge_types=et,
    )
