"""Training-step throughput on TPU: the jitted DP train step (forward +
backward + Adam) for HEATNet4 at the BRCA operating point (hidden 512,
/root/reference/configs/BRCA/HEAT4_kimia_classification_v2.yml), on
synthetic constructed graphs of 2048 patches.

Relay-honest protocol (PERF_NOTES.md): K steps stream through one
`lax.scan`; one reduced scalar is fetched after. MFU comes from the XLA
compiler's own flop count for the compiled step (cost_analysis), so it
includes everything the program actually does, not just the GEMMs.

Usage: python tools/bench_train.py [--lattice] [batch_size ...]
(default ladder: 2 4 8; --lattice runs the same step on the [B, N, k]
lattice twin — the path the trainer auto-selects for k-regular datasets)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12


def main(batch: int = 2, lattice: bool = False, agg_dtype: str = "float32",
         agg_impl: str = "onehot", typed_impl: str = None):
    # default typed_impl follows what production configs actually run
    # (config.parse_gnn_model): ragged is the lattice default, the hetero
    # TypedGraph zoo stays one-hot — benching the non-shipped combination
    # silently would mislead ladder comparisons (ADVICE r3)
    if typed_impl is None:
        typed_impl = "ragged" if lattice else "onehot"
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import optax

    from wsi_hgnn_tpu.graph.build import build_batch_device
    from wsi_hgnn_tpu.models import HEATNet4
    from wsi_hgnn_tpu.models.lattice import (
        HEATNet4Lattice,
        build_lattice_device,
    )

    n, d, t, radius, reps = 2048, 1024, 6, 9, 8
    kw = dict(in_dim=d, hidden_dim=512, out_dim=2, n_layers=2,
              n_heads=4, n_node_types=t, dropout=0.2)
    model = (HEATNet4Lattice(agg_dtype=agg_dtype, agg_impl=agg_impl,
                             typed_impl=typed_impl, **kw)
             if lattice else HEATNet4(typed_impl=typed_impl, **kw))
    tx = optax.adamw(1e-5, weight_decay=0.005)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, n, d).astype(np.float32))
    ntypes = jnp.asarray(rng.randint(0, t, (batch, n)).astype(np.int32))
    mask = jnp.ones((batch, n), bool)
    labels = jnp.asarray(rng.randint(0, 2, batch).astype(np.int32))
    if lattice:
        g = build_lattice_device(feats, ntypes, mask, radius, t)
    else:
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
    compiled = run.lower(params, opt_state, g).compile()
    s = float(np.asarray(compiled(params, opt_state, g)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s, loss sum {s:.4f}")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_step = float(ca.get("flops", 0.0)) / reps
    except Exception:
        flops_per_step = 0.0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(compiled(params, opt_state, g))
        best = min(best, time.perf_counter() - t0)
    per_step = best / reps * 1e3
    path = (f"lattice {agg_impl} agg={agg_dtype} typed={typed_impl}"
            if lattice else f"TypedGraph typed={typed_impl}")
    line = (f"HEAT4 h512 train step (fwd+bwd+adamw, {path} path), batch "
            f"{batch} x {n} nodes: {per_step:.2f} ms/step = "
            f"{batch / (per_step / 1e3):.0f} slides/s training throughput")
    if flops_per_step:
        mfu = flops_per_step / (per_step / 1e3) / V5E_BF16_PEAK
        line += (f"; XLA-counted {flops_per_step / 1e9:.1f} GFLOP/step -> "
                 f"est. MFU {mfu * 100:.2f}% of bf16 peak "
                 f"({mfu * V5E_BF16_PEAK / V5E_F32_PEAK * 100:.2f}% of f32 peak; "
                 "graph train steps are gather/segment-bound, not GEMM-bound)")
    print(line, flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    lattice = "--lattice" in args
    bf16_agg = "--bf16-agg" in args
    sorted_agg = "--sorted" in args
    ragged = "--ragged" in args  # grouped-GEMM typed projections
    onehot_typed = "--onehot-typed" in args  # the pre-round-3 formulation
    args = [a for a in args
            if a not in ("--lattice", "--bf16-agg", "--sorted", "--ragged",
                         "--onehot-typed")]
    # unflagged: each path benches its production default (lattice=ragged,
    # hetero=onehot — matching config.parse_gnn_model)
    typed_impl = "onehot" if onehot_typed else ("ragged" if ragged else None)
    for b in [int(a) for a in args] or [2, 4, 8]:
        main(b, lattice=lattice,
             agg_dtype="bfloat16" if bf16_agg else "float32",
             agg_impl="sorted" if sorted_agg else "onehot",
             typed_impl=typed_impl)
