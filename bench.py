"""Benchmark: slides/sec end-to-end (graph build + GNN forward) on TPU.

Pipeline benchmarked (the BASELINE.json north-star path): a cohort of
slides streams through ONE compiled program — per step, 1024-d patch
features -> on-device exact KNN (radius 9, matching
configs/GraphConstruction/*_graph_constructor.yml) -> Pearson edge typing ->
batched heterogeneous TypedGraph -> HEATNet4 forward -> logits — iterated
with `lax.scan` so the whole cohort runs without host synchronisation.

Measurement notes for this environment: the TPU is reached through a relay
whose `block_until_ready` acknowledges dispatch, not completion, and whose
per-call synchronous round-trip (~40 ms) dwarfs compute. Streaming K batches
inside one program and fetching one reduced scalar AFTER the scan both
amortises the round-trip and forces true completion, giving an honest
per-slide time (verified stable across K).

Baseline: the reference performs graph construction on the host CPU — an
nmslib HNSW build + per-node queries plus a Python loop of
scipy.stats.pearsonr over every edge
(/root/reference/construct_graph/graph_constructor.py:256-303) — followed by
a GPU GNN forward. We measure a faithful CPU re-enactment of the host part
on this machine (sklearn exact KNN standing in for HNSW, the same per-edge
scipy loop) and IGNORE the reference's GNN-forward cost, so `vs_baseline`
understates the true speedup.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "slides/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_PATCHES = 2048      # patches per slide (typical WSI bag size, SURVEY §5)
FEAT_DIM = 1024       # KimiaNet/EfficientNet feature width
RADIUS = 9            # BRCA graph-construction operating point
N_TYPES = 6           # PanNuke node types
BATCH = 4             # slides per device step
HIDDEN = 256
COHORT_STEPS = 32     # batches streamed per compiled call


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_tpu() -> float:
    from functools import partial

    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.models.lattice import HEATNet4Lattice, build_lattice_device

    # The lattice fast path: identical parameters/semantics to the TypedGraph
    # HEATNet4 (verified in tests/test_lattice.py), with scatter-free one-hot
    # GEMM aggregation; KNN uses the fused Pallas streaming kernel — EXACT
    # top-k (unlike the reference's approximate HNSW) at approx-top-k speed.
    model = HEATNet4Lattice(
        in_dim=FEAT_DIM, hidden_dim=HIDDEN, out_dim=2, n_layers=2, n_heads=4,
        n_node_types=N_TYPES, dropout=0.0,
    )
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(BATCH, N_PATCHES, FEAT_DIM).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, N_TYPES, (BATCH, N_PATCHES)).astype(np.int32))
    mask = jnp.ones((BATCH, N_PATCHES), dtype=bool)

    g0 = build_lattice_device(feats, ntypes, mask, RADIUS, N_TYPES)
    params = model.init(jax.random.PRNGKey(0), g0)

    @jax.jit
    def cohort(params, feats, ntypes, mask):
        def step(carry, i):
            f = feats * (1.0 + i * 1e-6)  # distinct slides per step
            g = build_lattice_device(f, ntypes, mask, RADIUS, N_TYPES,
                                     knn_impl="pallas")
            logits = model.apply(params, g, train=False)
            return carry + logits.sum(), None
        s, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(COHORT_STEPS, dtype=jnp.float32)
        )
        return s

    # warm-up / compile; fetching the scalar forces real completion
    s = cohort(params, feats, ntypes, mask)
    _ = np.asarray(s)
    log(f"device: {jax.devices()[0]}, compiled; checksum {float(s):.4f}")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        s = cohort(params, feats, ntypes, mask)
        _ = np.asarray(s)
    dt = time.perf_counter() - t0
    n_slides = reps * COHORT_STEPS * BATCH
    slides_per_sec = n_slides / dt
    log(
        f"tpu: {reps} x {COHORT_STEPS} steps x {BATCH} slides in {dt:.3f}s "
        f"-> {slides_per_sec:.2f} slides/s ({dt / n_slides * 1e3:.2f} ms/slide)"
    )
    return slides_per_sec


def measure_reference_baseline() -> float:
    """CPU re-enactment of the reference's per-slide graph-build hot path."""
    rng = np.random.RandomState(1)
    feats = rng.randn(N_PATCHES, FEAT_DIM).astype(np.float32)

    # KNN stage (reference: nmslib HNSW build + N queries)
    t0 = time.perf_counter()
    try:
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=RADIUS, algorithm="auto").fit(feats)
        _, idx = nn.kneighbors(feats)
        idx = idx[:, 1:]
    except ImportError:
        d2 = ((feats[:, None, :8] - feats[None, :, :8]) ** 2).sum(-1)
        idx = np.argsort(d2, 1)[:, 1:RADIUS]
    t_knn = time.perf_counter() - t0

    # Pearson stage: scipy loop over all edges, timed on a sample
    from scipy.stats import pearsonr

    src = np.repeat(np.arange(N_PATCHES), RADIUS - 1)
    dst = idx.reshape(-1)
    n_edges = len(src)
    sample = min(2000, n_edges)
    t0 = time.perf_counter()
    for i in range(sample):
        pearsonr(feats[src[i]], feats[dst[i]])
    t_pearson = (time.perf_counter() - t0) * (n_edges / sample)

    per_slide = t_knn + t_pearson
    log(
        f"reference baseline (host CPU): knn {t_knn:.3f}s + pearson "
        f"{t_pearson:.3f}s (x{n_edges} edges) = {per_slide:.3f}s/slide"
    )
    return 1.0 / per_slide


def main():
    # TPU first: the baseline's sklearn/OpenMP threadpool spin-waits and
    # can starve the host dispatch loop on low-core machines if run before
    value = measure_tpu()
    baseline = measure_reference_baseline()
    print(
        json.dumps(
            {
                "metric": "slides/sec end-to-end (KNN graph build + HEATNet4 fwd, "
                          f"{N_PATCHES} patches x {FEAT_DIM}d, radius {RADIUS}, "
                          "exact KNN via fused Pallas kernel)",
                "value": round(value, 3),
                "unit": "slides/sec",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
