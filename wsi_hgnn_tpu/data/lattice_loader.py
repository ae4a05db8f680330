"""Lattice-form host batching for k-regular slide graphs.

Every graph the constructor emits is k-regular by construction: the KNN
query gives each node exactly radius-1 out-neighbours
(/root/reference/construct_graph/graph_constructor.py:267-273), and
heterogeneous graphs get no self-loops (the reference adds those to the
homogeneous copies only, data.py:120-121). Such graphs pack losslessly
into the [B, N, k] LatticeGraph form, where every destination-indexed
reduction is a one-hot GEMM on the MXU instead of a segment scatter —
the measured 3-4x train-step win over the TypedGraph path (PERF_NOTES).

`probe_lattice` scans a dataset once and returns the lattice geometry iff
EVERY graph is k-regular with one shared k; the trainer auto-selects the
lattice path on success (train.lattice: auto|off). Reference pickles
converted by tools/convert_reference_graphs.py keep per-node HNSW edges
and probe positive too; anything irregular (explicit self-loops, merged
graphs, hand-edited edge sets) falls back to the TypedGraph path.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.typed_graph import TypedGraph, bucket_size
from ..models.lattice import LatticeGraph
from .loader import prefetched_batches


def slide_regular_k(g: TypedGraph) -> Optional[int]:
    """k if the single (unbatched) graph is k-regular in out-degree."""
    n = int(np.asarray(g.node_mask).sum())
    e = int(np.asarray(g.edge_mask).sum())
    if n == 0 or e == 0 or e % n:
        return None
    k = e // n
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    # out-of-range endpoints would silently clamp in the device gathers /
    # vanish from the one-hot aggregation (and a negative src would crash
    # the bincount below) — reject to the TypedGraph path
    if (src.max(initial=0) >= n or src.min(initial=0) < 0
            or dst.max(initial=0) >= n or dst.min(initial=0) < 0):
        return None
    counts = np.bincount(src, minlength=n)
    return k if np.all(counts == k) else None


def probe_lattice(dataset) -> Optional[Tuple[int, int]]:
    """(k, node_capacity) if every graph in the dataset is k-regular with
    the same k — the lattice-trainability test. Delegates to the fused
    scan so the regularity invariants live in ONE place."""
    return probe_lattice_and_capacities(dataset, 1)[2]


def probe_lattice_and_capacities(dataset, batch_size: int,
                                 bucket_base: int = 1024):
    """(cap_n, cap_e, lattice_probe) in ONE dataset scan — the trainer
    needs both data.loader.dataset_capacities and the regularity probe at
    startup, and each loads every graph from disk; fusing them halves the
    startup I/O. lattice_probe is (k, lattice_node_capacity) or None."""
    k: Optional[int] = None
    regular = True
    max_n = max_e = 0
    for i in range(len(dataset)):
        g = dataset[i][0]
        n = int(np.asarray(g.node_mask).sum())
        e = int(np.asarray(g.edge_mask).sum())
        max_n = max(max_n, n)
        max_e = max(max_e, e)
        if regular:
            ki = slide_regular_k(g)
            if ki is None or (k is not None and ki != k):
                regular = False
            else:
                k = ki
    probe = (k, bucket_size(max_n)) if regular and k else None
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
    """One k-regular TypedGraph -> per-slide lattice buffers [cap_n, ...].
    Real edges are grouped by source (stable order within a source), so the
    j-th out-edge of node i lands at (i, j) whatever order the file stored
    them in."""
    n = int(np.asarray(g.node_mask).sum())
    e = n * k
    src = np.asarray(g.src)[:e]
    order = np.argsort(src, kind="stable")

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
    idx[:n] = np.asarray(g.dst)[order].reshape(n, k)
    sim[:n] = np.asarray(g.sim)[order].reshape(n, k)
    esign[:n] = np.asarray(g.esign)[order].reshape(n, k)
    emask[:n] = True
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
