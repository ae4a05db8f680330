"""Tracing / profiling subsystem (SURVEY.md §5: the reference has none —
its instrumentation is tqdm bars and ad-hoc time.time() deltas,
/root/reference/trainer/train_gnn.py:84-85, extractor.py:65,102-104).

Three first-class tools:
  * `stage_timer` — hierarchical wall-clock stage timing with per-stage
    counts/totals, printable as a table (the per-stage timing the reference
    lacked);
  * `trace` — context manager around `jax.profiler` emitting a TensorBoard
    trace directory for device-level analysis;
  * `annotate` — `jax.profiler.TraceAnnotation` wrapper so pipeline stages
    show up named in the device trace.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating named-stage wall-clock timer.

    >>> timer = StageTimer()
    >>> with timer.stage("featurize"): ...
    >>> with timer.stage("knn"): ...
    >>> print(timer.report())
    """

    def __init__(self) -> None:
        import threading

        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack: list = []
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        full = "/".join([*(s for s in self._stack), name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[full] += dt
            self.counts[full] += 1

    def add(self, name: str, seconds: float, count: int = 1) -> None:
        """Accumulate externally-measured time under an ABSOLUTE stage name
        (no stack prefix — callers may report from worker threads/processes
        whose context is unrelated to the consumer's stage stack, e.g. the
        decode pool's per-batch wall time, pipeline.patches)."""
        with self._lock:
            self.totals[name] += seconds
            self.counts[name] += count

    def report(self) -> str:
        lines = [f"{'stage':<40} {'calls':>6} {'total s':>10} {'mean ms':>10}"]
        for name in sorted(self.totals):
            tot = self.totals[name]
            cnt = self.counts[name]
            lines.append(
                f"{name:<40} {cnt:>6} {tot:>10.3f} {tot / cnt * 1e3:>10.2f}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


# a process-wide default timer for pipeline instrumentation
GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Device-level profiler trace (TensorBoard / Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation wrapper)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
