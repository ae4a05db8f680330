"""Stage-cost ladder for the HoVer-Net typing program on TPU.

hovernet_typing_apply measures 2.30 ms/patch at the b128 operating point
(47% MFU at the XLA-counted 213 GF/patch); the bytes-accessed floor is
~2.0 ms/patch (PERF_NOTES). This times each pipeline stage
as raw jnp ops with random weights of the exact shapes (timing-faithful;
the flax modules lower to the same XLA ops) so the optimisation target is
chosen by measurement, not guess. Relay-honest scan protocol throughout.

Usage: python tools/bench_hover_parts.py [batch]   (default 16)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from wsi_hgnn_tpu.models.featurizers.hovernet import HoVerNet

    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def conv(x, cin, cout, k, stride=1, pad="VALID", groups=1, key=0):
        w = jax.random.normal(
            jax.random.fold_in(rng, key), (k, k, cin // groups, cout), dt
        ) * 0.05
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ).astype(dt)

    def up2(x):
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, :, None].transpose(0, 1, 2, 3, 5, 4),
                             (b, h, 2, w, 2, c))
        return x.reshape(b, h * 2, w * 2, c)

    def dense_unit(x, k, key):
        cin = x.shape[-1]
        u = jax.nn.relu(x.astype(jnp.float32)).astype(dt)
        u = conv(u, cin, 128, 1, key=key)
        u = jax.nn.relu(u.astype(jnp.float32)).astype(dt)
        y = conv(u, 128, 32, k, groups=4, key=key + 1)
        d = (x.shape[1] - y.shape[1]) // 2
        return jnp.concatenate(
            [x[:, d:d + y.shape[1], d:d + y.shape[2], :], y], axis=-1
        )

    b = batch

    def stage_encoder(x):
        model = HoVerNet(nr_types=6, mode="fast")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3), jnp.float32)
        )
        variables = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, variables
        )
        d = model.apply(variables, x, method="encode")
        return sum(v.astype(jnp.float32).sum() for v in d)

    def stage_u3a(x):  # up2(d3)+d2 add, conv3x3 1024->256 valid
        d3 = conv(x[:, ::8, ::8, :], 3, 1024, 1, key=10)
        u = up2(d3) + conv(x[:, ::4, ::4, :], 3, 1024, 1, key=11)
        return conv(u, 1024, 256, 3, key=12).astype(jnp.float32).sum()

    def stage_u3dense(x):
        v = conv(x[:, : 62 + 2, : 62 + 2, :], 3, 256, 1, key=20)[:, :62, :62]
        for i in range(8):
            v = dense_unit(v, 3, key=30 + 2 * i)
        return v.astype(jnp.float32).sum()

    def stage_u3f_u2a(x):
        v = conv(x[:, :46, :46, :], 3, 512, 1, key=40)       # u3 output [46,512]
        u = up2(v)                                            # 92
        u = u + conv(x[:, :92, :92, :], 3, 512, 1, key=41)    # + d1 crop
        return conv(u, 512, 128, 3, key=42).astype(jnp.float32).sum()

    def stage_u2dense(x):
        v = conv(x[:, :90, :90, :], 3, 128, 1, key=50)
        for i in range(4):
            v = dense_unit(v, 3, key=60 + 2 * i)
        return v.astype(jnp.float32).sum()

    def stage_u2f_u1(x):
        v = conv(x[:, :82, :82, :], 3, 256, 1, key=70)        # u2 out [82,256]
        u = up2(v)                                             # 164
        u = u + conv(x[:, :164, :164, :], 3, 256, 1, key=71)   # + d0 crop
        u = conv(u, 256, 64, 3, pad="SAME", key=72)            # u1_conva
        u = jax.nn.relu(u.astype(jnp.float32)).astype(dt)
        tp = conv(u, 64, 6, 1, key=73)                         # u0 head
        t = jnp.argmax(tp, axis=-1)
        counts = jax.nn.one_hot(t, 6, dtype=jnp.int32).sum(axis=(1, 2))
        return counts.sum()

    stages = [
        ("encoder(+conv_bot)", stage_encoder),
        ("u3_conva (up2+add+3x3 1024->256)", stage_u3a),
        ("u3 dense x8 (62^2)", stage_u3dense),
        ("u3_convf+up2+u2_conva", stage_u3f_u2a),
        ("u2 dense x4 (90^2)", stage_u2dense),
        ("u2_convf+up2+u1+typing", stage_u2f_u1),
    ]

    pool = jax.random.uniform(jax.random.PRNGKey(7), (2, b, 256, 256, 3), dt)
    reps = 8
    total = 0.0
    for name, fn in stages:
        @jax.jit
        def run(pool, _fn=fn):
            def step(c, i):
                x = jax.lax.dynamic_index_in_dim(pool, i % 2, keepdims=False)
                return c + jnp.float32(_fn(x)), None
            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(reps))
            return s

        t0 = time.perf_counter()
        np.asarray(run(pool))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(pool))
            best = min(best, time.perf_counter() - t0)
        ms = best / (reps * b) * 1e3
        total += ms
        print(f"{name:36s}: {ms:7.3f} ms/patch (compile {compile_s:.0f}s)",
              flush=True)
    print(f"{'sum of stages':36s}: {total:7.3f} ms/patch")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
