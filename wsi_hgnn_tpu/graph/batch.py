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

    feats, ntys, ngraph, srcs, dsts, esigns, sims = [], [], [], [], [], [], []
    offset = 0
    for i, g in enumerate(graphs):
        nmask = np.asarray(g.node_mask)
        emask = np.asarray(g.edge_mask)
        n = int(nmask.sum())
        e = int(emask.sum())
        feats.append(np.asarray(g.feat)[:n])
        ntys.append(np.asarray(g.node_type)[:n])
        ngraph.append(np.full(n, i, dtype=np.int32))
        srcs.append(np.asarray(g.src)[:e] + offset)
        dsts.append(np.asarray(g.dst)[:e] + offset)
        esigns.append(np.asarray(g.esign)[:e])
        sims.append(np.asarray(g.sim)[:e])
        offset += n

    feat = np.concatenate(feats)
    n_total = feat.shape[0]
    src = np.concatenate(srcs)
    e_total = src.shape[0]

    cap_n = node_capacity or bucket_size(n_total, base=bucket_base)
    cap_e = edge_capacity or bucket_size(e_total, base=bucket_base)
    if cap_n < n_total or cap_e < e_total:
        raise ValueError("batch exceeds requested capacity")

    def pad(x, cap, fill=0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    b = len(graphs)
    return TypedGraph(
        feat=jnp.asarray(pad(feat, cap_n)),
        node_type=jnp.asarray(pad(np.concatenate(ntys), cap_n)),
        # padding nodes point at graph 0 but are masked out of every segment op
        node_graph=jnp.asarray(pad(np.concatenate(ngraph), cap_n)),
        node_mask=jnp.asarray(np.arange(cap_n) < n_total),
        src=jnp.asarray(pad(src, cap_e)),
        dst=jnp.asarray(pad(np.concatenate(dsts), cap_e)),
        esign=jnp.asarray(pad(np.concatenate(esigns), cap_e)),
        sim=jnp.asarray(pad(np.concatenate(sims), cap_e)),
        edge_mask=jnp.asarray(np.arange(cap_e) < e_total),
        n_graphs=b,
        n_node_types=t,
        n_edge_types=et,
    )
