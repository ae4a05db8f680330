"""Pallas TPU kernel: fused L2 KNN (distance tiles + running top-k).

The XLA path (ops/knn.py) materialises the full [N, N] distance matrix in
HBM and runs a separate top-k pass over it. This kernel streams candidate
tiles through VMEM: each (query-tile, candidate-tile) grid step computes a
distance tile on the MXU and folds it into a per-query running top-k held
in VMEM scratch, so the N x N matrix never exists and HBM traffic drops
from O(N^2) to O(N*D + N*k). Grid execution on TPU is sequential, so the
scratch carries across candidate steps of one query tile.

Top-k fold: the running best (k) and the fresh tile (TILE_C) are
concatenated in scratch and reduced by k argmin/mask passes on the VPU —
exact, ties broken toward lower candidate index like lax.top_k.

Self-exclusion and padded-candidate masking match ops.knn.knn_l2.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp scalars would be captured as consts


def _kernel(q_ref, c_ref, cmask_ref, idx_out, d_out, best_d, best_i, *, k,
            tile_q, tile_c, n_cand_tiles):
    qi = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        best_d[:] = jnp.full((tile_q, k), _BIG, jnp.float32)
        best_i[:] = jnp.zeros((tile_q, k), jnp.int32)

    q = q_ref[:]                       # [TILE_Q, D]
    c = c_ref[:]                       # [TILE_C, D]
    sq_q = jnp.sum(q * q, axis=1)      # [TILE_Q]
    sq_c = jnp.sum(c * c, axis=1)      # [TILE_C]
    d2 = (
        sq_q[:, None] + sq_c[None, :]
        - 2.0 * jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(d2, 0.0)

    # global indices of this candidate tile
    cand_base = ci * tile_c
    cand_ids = cand_base + jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_c), 1)
    query_ids = qi * tile_q + jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, tile_c), 0
    )
    invalid = (cand_ids == query_ids) | (cmask_ref[0, :] == 0)[None, :]
    d2 = jnp.where(invalid, _BIG, d2)

    # fold tile into running top-k: combined [TILE_Q, k + TILE_C]
    comb_d = jnp.concatenate([best_d[:], d2], axis=1)
    comb_i = jnp.concatenate([best_i[:], cand_ids], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, comb_d.shape, 1)
    vals, idxs = [], []
    for _slot in range(k):  # static unroll; no scatters in Mosaic
        amin = jnp.argmin(comb_d, axis=1)              # [TILE_Q]
        vals.append(jnp.min(comb_d, axis=1))
        sel = cols == amin[:, None]
        # row gather via select+reduce (Mosaic has no general gather)
        idxs.append(jnp.sum(jnp.where(sel, comb_i, 0), axis=1))
        comb_d = jnp.where(sel, _BIG, comb_d)
    best_d[:] = jnp.stack(vals, axis=1)
    best_i[:] = jnp.stack(idxs, axis=1)

    @pl.when(ci == n_cand_tiles - 1)
    def _():
        idx_out[:] = best_i[:]
        d_out[:] = best_d[:]


@partial(jax.jit, static_argnames=("k", "tile_q", "tile_c", "interpret"))
def knn_l2_pallas(features: jax.Array, k: int, mask: jax.Array | None = None,
                  tile_q: int = 128, tile_c: int = 512,
                  interpret: bool = False):
    """(idx [N, k], d2 [N, k]) — drop-in for ops.knn.knn_l2 on one slide.

    N must be divisible by tile_q and tile_c (pad to a bucket first — the
    construction pipeline always does).
    """
    n, d = features.shape
    if n % tile_q or n % tile_c:
        raise ValueError(f"N={n} must be divisible by tiles ({tile_q}, {tile_c})")
    f32 = features.astype(jnp.float32)
    cmask = (
        jnp.ones(n, jnp.int32) if mask is None else mask.astype(jnp.int32)
    )[None, :]  # 2-D for standard TPU tiling (1-D int blocks mis-lay out)
    n_cand_tiles = n // tile_c

    grid = (n // tile_q, n_cand_tiles)
    kernel = partial(
        _kernel, k=k, tile_q=tile_q, tile_c=tile_c, n_cand_tiles=n_cand_tiles
    )
    idx, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(f32, f32, cmask)
    return idx, d2
