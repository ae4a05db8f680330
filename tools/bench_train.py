"""Training-step throughput on TPU: the jitted DP train step (forward +
backward + Adam) for HEATNet4 at the BRCA operating point (hidden 512,
/root/reference/configs/BRCA/HEAT4_kimia_classification_v2.yml), on
synthetic constructed graphs of 2048 patches.

Relay-honest protocol (PERF_NOTES.md): K steps stream through one
`lax.scan`; one reduced scalar is fetched after.

Usage: python tools/bench_train.py [batch_size]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 2):
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import optax

    from wsi_hgnn_tpu.graph.build import build_batch_device
    from wsi_hgnn_tpu.models import HEATNet4

    n, d, t, radius, reps = 2048, 1024, 6, 9, 8
    model = HEATNet4(in_dim=d, hidden_dim=512, out_dim=2, n_layers=2,
                     n_heads=4, n_node_types=t, dropout=0.2)
    tx = optax.adamw(1e-5, weight_decay=0.005)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, n, d).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, t, (batch, n)).astype(np.int32))
    mask = jnp.ones((batch, n), bool)
    labels = jnp.asarray(rng.randint(0, 2, batch).astype(np.int32))
    g = build_batch_device(feats, ntypes, mask, radius, t)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_fn(params, g, key):
        logits = model.apply(
            {"params": params}, g, train=True, rngs={"dropout": key}
        )
        lp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(lp, labels[:, None], 1).mean()

    @jax.jit
    def run(params, opt_state, g):
        def step(carry, i):
            params, opt_state = carry
            key = jax.random.fold_in(jax.random.PRNGKey(1), i)
            loss, grads = jax.value_and_grad(loss_fn)(params, g, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(reps)
        )
        return losses.sum()

    t0 = time.perf_counter()
    s = float(np.asarray(run(params, opt_state, g)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s, loss sum {s:.4f}")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params, opt_state, g))
        best = min(best, time.perf_counter() - t0)
    per_step = best / reps * 1e3
    print(f"HEAT4 h512 train step (fwd+bwd+adamw), batch {batch} x {n} "
          f"nodes: {per_step:.2f} ms/step = {batch / (per_step / 1e3):.0f} "
          f"slides/s training throughput")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
