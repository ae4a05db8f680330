"""Lattice-form host batching for lattice-packable slide graphs
(k-regular constructor output AND irregular imports via masked padding).

Every graph the constructor emits is k-regular by construction: the KNN
query gives each node exactly radius-1 out-neighbours
(/root/reference/construct_graph/graph_constructor.py:267-273), and
heterogeneous graphs get no self-loops (the reference adds those to the
homogeneous copies only, data.py:120-121). Such graphs pack losslessly
into the [B, N, k] LatticeGraph form, where every destination-indexed
reduction is a one-hot GEMM on the MXU instead of a segment scatter —
the measured 3-4x train-step win over the TypedGraph path (PERF_NOTES).

`probe_lattice` scans a dataset once and returns the lattice geometry iff
EVERY graph packs into one shared [N, k] masked lattice (k = the dataset
maximum out-degree; shorter rows pad with emask=False slots — the same
masking the train-time DropEdge exercises); the trainer auto-selects the
lattice path on success (train.lattice: auto|off). Reference pickles
converted by tools/convert_reference_graphs.py probe positive even when
HNSW returned fewer than topn neighbours for some nodes (irregular
out-degree, graph_constructor.py:267-273). Out-of-range endpoints and
hub-skewed edge sets (padding ratio past train.lattice_pad_ratio,
default 1.5) fall back to the TypedGraph path.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.typed_graph import TypedGraph, bucket_size
from ..models.lattice import LatticeGraph
from .loader import prefetched_batches


def slide_regular_k(g: TypedGraph) -> Optional[int]:
    """k if the single (unbatched) graph is k-regular in out-degree."""
    geo = slide_lattice_geometry(g)
    if geo is None:
        return None
    k, e, n = geo
    return k if e == n * k else None


def slide_lattice_geometry(
    g: TypedGraph, n: Optional[int] = None, e: Optional[int] = None,
) -> Optional[Tuple[int, int, int]]:
    """(max out-degree k̂, real edges, real nodes) if the single (unbatched)
    graph packs into the MASKED lattice form [N, k̂].

    Out-degree may VARY per node: short rows are padded with emask=False
    slots, which every lattice consumer already honours (relation presence,
    softmax, one-hot aggregation — the same masking train-time DropEdge
    exercises, models/lattice.py:109-113,:140,:164). This is the shape of
    imported reference graphs when HNSW returns fewer than topn neighbours
    (graph_constructor.py:267-273). Out-of-range endpoints reject to the
    TypedGraph path — they would silently clamp in the device gathers /
    vanish from the one-hot aggregation. Self-edges are fine: BOTH paths
    exempt them from DropEdge (graph/transforms.py:42-45,
    lattice_train_transform:112 — the reference adds homo self-loops after
    augmentation, data.py:120-121), so semantics stay identical.

    `n`/`e` accept precomputed real node/edge counts so fused dataset
    scans (probe_lattice_and_capacities) don't re-reduce the masks.
    """
    if n is None:
        n = int(np.asarray(g.node_mask).sum())
    if e is None:
        e = int(np.asarray(g.edge_mask).sum())
    if n == 0 or e == 0:
        return None
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    if (src.max(initial=0) >= n or src.min(initial=0) < 0
            or dst.max(initial=0) >= n or dst.min(initial=0) < 0):
        return None
    counts = np.bincount(src, minlength=n)
    return int(counts.max()), e, n


def probe_lattice(dataset, max_pad_ratio: float = 1.5) -> Optional[Tuple[int, int]]:
    """(k, node_capacity) if every graph in the dataset packs into one
    shared [N, k] masked lattice — the lattice-trainability test. Delegates
    to the fused scan so the packing invariants live in ONE place."""
    return probe_lattice_and_capacities(dataset, 1,
                                        max_pad_ratio=max_pad_ratio)[2]


def probe_lattice_and_capacities(dataset, batch_size: int,
                                 bucket_base: int = 1024,
                                 max_pad_ratio: float = 1.5):
    """(cap_n, cap_e, lattice_probe) in ONE dataset scan — the trainer
    needs both data.loader.dataset_capacities and the lattice probe at
    startup, and each loads every graph from disk; fusing them halves the
    startup I/O. lattice_probe is (k, lattice_node_capacity) or None.

    k is the dataset-wide MAXIMUM out-degree; slides with shorter rows pack
    with emask=False padding slots (slide_lattice_geometry). The probe
    accepts the dataset only while the padding stays cheap:
    sum(n_i) * k / sum(e_i) <= max_pad_ratio — a constructor-regular
    dataset sits at exactly 1.0, HNSW imports with occasional missing
    neighbours just above it, and a hub-skewed hand-edited edge set (one
    node with out-degree >> mean) falls back to the TypedGraph path rather
    than training on mostly-padding lattices."""
    k = 0
    packable = True
    max_n = max_e = 0
    sum_n = sum_e = 0
    for i in range(len(dataset)):
        g = dataset[i][0]
        n = int(np.asarray(g.node_mask).sum())
        e = int(np.asarray(g.edge_mask).sum())
        max_n = max(max_n, n)
        max_e = max(max_e, e)
        if packable:
            geo = slide_lattice_geometry(g, n=n, e=e)
            if geo is None:
                packable = False
            else:
                k = max(k, geo[0])
                sum_e += geo[1]
                sum_n += geo[2]
    probe = None
    if packable and k and sum_n * k <= max_pad_ratio * sum_e:
        probe = (k, bucket_size(max_n))
    return (
        bucket_size(max_n * batch_size, base=bucket_base),
        bucket_size(max_e * batch_size, base=bucket_base),
        probe,
    )


def lattice_batch_for_budget(k: int, cap_n: int, budget: int = 2 << 30,
                             max_batch: int = 8) -> Optional[int]:
    """Largest batch size (<= max_batch) whose one-hot destination matrix
    [B, N*k, N] f32 fits `budget` bytes, or None when even B=1 does not —
    the same working-set guard the trainer applies to its train batches."""
    if k < 1:
        # degenerate lattice (e.g. serving with radius 1): no edges, no
        # one-hot matrix — stay on the TypedGraph path rather than divide
        # by a zero working set below
        return None
    per = cap_n * k * cap_n * 4
    if per > budget:
        return None
    return max(1, min(max_batch, int(budget // per)))


def pack_slide(g: TypedGraph, k: int, cap_n: int):
    """One TypedGraph with out-degrees <= k -> per-slide lattice buffers
    [cap_n, ...]. Real edges are grouped by source (stable order within a
    source), so the j-th out-edge of node i lands at (i, j) whatever order
    the file stored them in; nodes with fewer than k out-edges leave their
    tail slots emask=False (idx 0 — masked slots never reach the softmax,
    the one-hot aggregation, or relation presence)."""
    n = int(np.asarray(g.node_mask).sum())
    e = int(np.asarray(g.edge_mask).sum())
    src = np.asarray(g.src)[:e]
    order = np.argsort(src, kind="stable")
    s = src[order]
    # slot of each edge within its source's group: position minus the
    # group's first position in the sorted array
    slot = np.arange(e) - np.searchsorted(s, s, side="left")
    if e and int(slot.max()) >= k:
        raise ValueError(
            f"pack_slide: out-degree {int(slot.max()) + 1} exceeds lattice "
            f"k={k} (probe_lattice must gate packing)"
        )

    feats = np.zeros((cap_n, g.feat.shape[1]), np.float32)
    ntypes = np.zeros(cap_n, np.int32)
    mask = np.zeros(cap_n, bool)
    idx = np.zeros((cap_n, k), np.int32)
    sim = np.zeros((cap_n, k), np.float32)
    esign = np.zeros((cap_n, k), np.int32)
    emask = np.zeros((cap_n, k), bool)

    feats[:n] = np.asarray(g.feat)[:n]
    ntypes[:n] = np.asarray(g.node_type)[:n]
    mask[:n] = True
    idx[s, slot] = np.asarray(g.dst)[order]
    sim[s, slot] = np.asarray(g.sim)[order]
    esign[s, slot] = np.asarray(g.esign)[order]
    emask[s, slot] = True
    return feats, ntypes, mask, idx, sim, esign, emask


class LatticeLoader:
    """GraphLoader twin yielding (LatticeGraph [B, N, k], labels, weights).
    Host numpy leaves by convention (device transfer happens once per batch
    at jit dispatch); short tail batches repeat the first slide at weight 0,
    so every batch has one fixed shape."""

    def __init__(self, dataset, batch_size: int, k: int, node_capacity: int,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.k = k
        self.node_capacity = node_capacity
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idxs: Sequence[int]):
        slides, labels = [], []
        for i in idxs:
            g, y = self.dataset[i]
            slides.append(pack_slide(g, self.k, self.node_capacity))
            labels.append(int(y))
        weights = [1.0] * len(slides)
        while len(slides) < self.batch_size:
            slides.append(slides[0])
            labels.append(0)
            weights.append(0.0)
        parts = [np.stack(p) for p in zip(*slides)]
        g = LatticeGraph(*parts)
        return g, np.asarray(labels, np.int32), np.asarray(weights, np.float32)

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        return [
            list(order[i : i + self.batch_size])
            for i in range(0, len(order), self.batch_size)
        ]

    def __iter__(self) -> Iterator:
        yield from prefetched_batches(
            self._index_batches(), self._make_batch, self.prefetch
        )
