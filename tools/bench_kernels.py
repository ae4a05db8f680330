"""Kernel-level TPU ladders: lattice aggregation impls + dense-layer conv2.

Relay-honest protocol (PERF_NOTES.md): reps stream through one `lax.scan`,
one reduced scalar fetched after.

Usage:
    python tools/bench_kernels.py agg     # HEAT4 lattice fwd: onehot/sorted
    python tools/bench_kernels.py dense   # dense_layer_fused per block shape
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, reps=3):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def bench_agg():
    """HEAT4Lattice forward at the bench operating point, per agg_impl."""
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from wsi_hgnn_tpu.models.lattice import (
        HEATNet4Lattice,
        build_lattice_device,
    )

    b, n, d, t, radius, scan_reps = 4, 2048, 1024, 6, 9, 16
    rng = np.random.RandomState(0)
    # feature pool: graphs vary per scan step so nothing (KNN, a_mat,
    # dst_sort) is loop-invariant — matches bench.py's per-slide reality
    pool = jnp.asarray(rng.randn(2, b, n, d).astype(np.float32))
    nty = jnp.asarray(rng.randint(0, t, (b, n)).astype(np.int32))
    mask = jnp.ones((b, n), bool)
    g0 = build_lattice_device(pool[0], nty, mask, radius, t)

    params = None
    for impl, typed in (("onehot", "ragged"), ("onehot", "onehot"),
                        ("sorted", "ragged")):
        model = HEATNet4Lattice(
            in_dim=d, hidden_dim=256, out_dim=2, n_layers=2, n_heads=4,
            n_node_types=t, dropout=0.0, agg_impl=impl, typed_impl=typed,
        )
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), g0)

        @jax.jit
        def run(params, pool, _model=model):
            def step(c, i):
                g = build_lattice_device(
                    jax.lax.dynamic_index_in_dim(pool, i % 2, keepdims=False),
                    nty, mask, radius, t, knn_impl="pallas",
                )
                out = _model.apply(params, g, train=False)
                return c + out.sum(), None
            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(scan_reps))
            return s

        tag = f"agg={impl} typed={typed}"
        try:
            compile_s, best = _timeit(run, params, pool)
        except Exception as e:
            print(f"{tag:24s}: FAILED {type(e).__name__}: {e}")
            continue
        per_slide = best / (scan_reps * b) * 1e3
        print(f"{tag:24s}: {per_slide:.3f} ms/slide graph+fwd "
              f"({b / (best / scan_reps):.0f} slides/s; "
              f"compile {compile_s:.0f}s)", flush=True)


def bench_dense():
    """dense_layer_fused at each DenseNet block's shape (the taps-vs-
    sliced conv2 ladder ran here; sliced lost everywhere and was removed —
    PERF_NOTES round-3)."""
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from wsi_hgnn_tpu.ops.pallas_densenet import dense_layer_fused

    rng = np.random.RandomState(0)
    # (H, C_end, c_cur): block1 mid, block2 mid, block3 mid, block4 mid
    shapes = [(64, 256, 160), (32, 512, 256), (16, 1024, 640), (8, 1024, 768)]
    b, scan_reps = 32, 32
    for h, c_end, c_cur in shapes:
        # 2-pool rotated by step index: a loop-invariant body would let XLA
        # hoist the whole layer out of the scan and time only overhead
        x = np.zeros((2, b, h, h, c_end), np.float32)
        x[..., :c_cur] = rng.randn(2, b, h, h, c_cur)
        x = jnp.asarray(x, jnp.bfloat16)
        a1 = jnp.asarray(np.pad(rng.rand(c_cur) + 0.5, (0, c_end - c_cur))[None],
                         jnp.float32)
        b1 = jnp.zeros((1, c_end), jnp.float32)
        w1f = jnp.asarray(
            np.pad(rng.randn(c_cur, 128) * 0.05, ((0, c_end - c_cur), (0, 0))),
            jnp.bfloat16)
        b2 = jnp.zeros((1, 128), jnp.float32)
        w2 = jnp.asarray(rng.randn(128, 288) * 0.05, jnp.bfloat16)
        kw = dict(n_active_groups=-(-c_cur // 128), slot=c_cur // 32)

        @jax.jit
        def run(x):
            def step(c, i):
                xi = jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False)
                y = dense_layer_fused(xi, a1, b1, w1f, b2, w2, **kw)
                return c + y[..., c_cur:c_cur + 32].astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(scan_reps))
            return s

        try:
            compile_s, best = _timeit(run, x)
        except Exception as e:
            print(f"H={h:3d} c={c_cur:4d}: FAILED {type(e).__name__}: {e}")
            continue
        per_call = best / scan_reps * 1e3
        print(f"H={h:3d} c={c_cur:4d}: {per_call:.3f} ms per "
              f"{b}-img layer (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "agg"
    (bench_agg if which == "agg" else bench_dense)()
