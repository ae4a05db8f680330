"""HoVer-Net typing throughput on TPU: pixels -> per-patch node types.

The reference constructor ALWAYS runs HoVer-Net for node typing whatever
the feature encoder (/root/reference/construct_graph/graph_constructor.py:239,
types at :131-148). This benchmarks the typing stage alone — encoder + tp
decoder + on-device majority typing — as ONE compiled program streamed via
`lax.scan` (relay-honest protocol, PERF_NOTES.md). The round-2 staged-jit
recipe (separate encode/decode programs, per-chunk tp-map fetch) measured
27.6 ms/patch; the hypothesis is that was relay dispatch + D2H, not compute.

Usage: python tools/bench_hovernet.py [batch ...]   (default: 16 32)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATCH = 256
N_TYPES = 6
# fallback when cost_analysis is unavailable: XLA counts 213 GF/patch for
# the typing program (the encoder has no downsampling stem, so d0's three
# bottleneck units run at full 256^2 — ~171 GF of it; the early hand
# estimate of 52 GF undercounted exactly that)
FLOPS_PER_PATCH = 213e9
V5E_BF16_PEAK = 197e12


def main(batches):
    import jax

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from wsi_hgnn_tpu.models.featurizers.hovernet import (
        HoVerNet,
        hovernet_typing_apply,
    )

    model = HoVerNet(nr_types=N_TYPES, mode="fast")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, PATCH, PATCH, 3), jnp.float32)
    )
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        variables = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables,
        )
    for batch in batches:
        POOL = 2
        pool = jax.random.uniform(
            jax.random.PRNGKey(7), (POOL, batch, PATCH, PATCH, 3), dtype
        )
        reps = max(1, 256 // batch)

        @jax.jit
        def run(pool, variables):
            def step(carry, i):
                imgs = jax.lax.dynamic_index_in_dim(
                    pool, i % POOL, keepdims=False
                )
                ty = hovernet_typing_apply(model, variables, imgs,
                                           N_TYPES)
                return carry + ty.sum(), None

            s, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(reps))
            return s

        t0 = time.perf_counter()
        compiled = run.lower(pool, variables).compile()
        s = int(np.asarray(compiled(pool, variables)))
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gf_patch = float(ca.get("flops", 0.0)) / (reps * batch) / 1e9
        except Exception:
            gf_patch = FLOPS_PER_PATCH / 1e9
        print(f"batch {batch}: compile+first "
              f"{time.perf_counter() - t0:.1f}s, type-sum {s}", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(compiled(pool, variables))
            best = min(best, time.perf_counter() - t0)
        per_patch = best / (reps * batch) * 1e3
        mfu = gf_patch * 1e9 / (per_patch / 1e3) / V5E_BF16_PEAK
        print(f"batch {batch}: {per_patch:.3f} ms/patch "
              f"({per_patch * 2048 / 1e3:.2f} s per 2048-patch slide), "
              f"XLA {gf_patch:.0f} GF/patch -> MFU {mfu * 100:.1f}%",
              flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [16, 32])
