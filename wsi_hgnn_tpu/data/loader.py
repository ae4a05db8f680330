"""Host-side batching pipeline — the GraphDataLoader replacement.

The reference wraps datasets in `dgl.dataloading.GraphDataLoader(batch_size,
shuffle=True)` (/root/reference/trainer/train_gnn.py:48-53). Here batching is
`batch_graphs` packing into size-bucketed capacities; every batch has a FIXED
graph count (short tails are padded with a zero-weight dummy graph) so one
epoch touches a handful of compiled programs.

A background prefetch thread overlaps the numpy packing with device compute
(the reference's dataloader workers analog, SURVEY.md §2.4 row
'intra-pipeline concurrency').
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..graph import TypedGraph, batch_graphs
from ..graph.batch import sort_graph_edges
from ..graph.typed_graph import bucket_size


def prefetched_batches(batches: Sequence, make_batch, prefetch: int):
    """Yield make_batch(b) for every b, packed on a background thread.

    Shared by GraphLoader and LatticeLoader. A worker exception RE-RAISES
    in the consumer — a bare `finally: put(stop)` would instead end the
    epoch early and let training silently continue on a truncated subset.
    """
    if prefetch <= 0:
        for b in batches:
            yield make_batch(b)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()
    cancel = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator (break / islice mid-epoch) — a plain q.put would
        # block the worker forever, pinning packed batches in memory
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not _put(make_batch(b)):
                    return
            _put(stop)
        except BaseException as e:  # pragma: no cover - exercised in tests
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancel.set()


class GraphLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        node_capacity: Optional[int] = None,
        edge_capacity: Optional[int] = None,
        bucket_base: int = 1024,
        prefetch: int = 2,
        sort_edges: bool = True,
        stacked: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.node_capacity = node_capacity
        self.edge_capacity = edge_capacity
        self.bucket_base = bucket_base
        self.prefetch = prefetch
        # pre-sort batch edges by the dst-major segment key so every
        # dst-keyed segment reduction runs a sorted scatter (host-side,
        # native counting sort; graph.batch.sort_graph_edges)
        self.sort_edges = sort_edges
        # stacked=True: instead of concatenating the batch into ONE
        # flat graph (dgl.batch semantics), repad each slide to the
        # shared PER-SLIDE capacities and stack on a leading axis —
        # the input form of the vmapped per-slide eval forward
        # (train.evaluator.make_stacked_eval_fn). node/edge_capacity
        # are then per-slide, not per-batch, and are REQUIRED: without a
        # shared capacity the per-slide buckets differ and np.stack
        # fails (or the batch stream becomes shape-unstable, forcing a
        # recompile per batch).
        self.stacked = stacked
        if stacked and (node_capacity is None or edge_capacity is None):
            raise ValueError(
                "stacked=True needs explicit per-slide node/edge capacities"
            )

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idxs: Sequence[int]) -> Tuple[TypedGraph, np.ndarray, np.ndarray]:
        graphs: List[TypedGraph] = []
        labels: List[int] = []
        for i in idxs:
            g, y = self.dataset[i]
            graphs.append(g)
            labels.append(int(y))
        weights = [1.0] * len(graphs)
        # pad short tail batches with a repeat of the first graph, weight 0
        while len(graphs) < self.batch_size:
            graphs.append(graphs[0])
            labels.append(0)
            weights.append(0.0)
        if self.stacked:
            import jax

            from ..graph.typed_graph import repad_graph

            padded = [
                repad_graph(g, self.node_capacity, self.edge_capacity)
                for g in graphs
            ]
            if self.sort_edges:
                # keep the sorted-scatter fast path per slide (identical
                # static fields across slides, so stacking still works)
                padded = [sort_graph_edges(g) for g in padded]
            gb = jax.tree.map(lambda *xs: np.stack(xs), *padded)
        else:
            gb = batch_graphs(
                graphs,
                node_capacity=self.node_capacity,
                edge_capacity=self.edge_capacity,
                bucket_base=self.bucket_base,
            )
            if self.sort_edges:
                gb = sort_graph_edges(gb)
        return gb, np.asarray(labels, np.int32), np.asarray(weights, np.float32)

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        return [
            list(order[i : i + self.batch_size])
            for i in range(0, len(order), self.batch_size)
        ]

    def __iter__(self) -> Iterator[Tuple[TypedGraph, np.ndarray, np.ndarray]]:
        yield from prefetched_batches(
            self._index_batches(), self._make_batch, self.prefetch
        )


def dataset_capacities(dataset, batch_size: int, bucket_base: int = 1024):
    """Scan a dataset once for worst-case batch capacities so the whole run
    compiles exactly one program per (node, edge) bucket pair."""
    max_n = max_e = 0
    for i in range(len(dataset)):
        g, _ = dataset[i][:2]
        max_n = max(max_n, int(np.asarray(g.node_mask).sum()))
        max_e = max(max_e, int(np.asarray(g.edge_mask).sum()))
    return (
        bucket_size(max_n * batch_size, base=bucket_base),
        bucket_size(max_e * batch_size, base=bucket_base),
    )
