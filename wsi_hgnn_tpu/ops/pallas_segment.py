"""Pallas TPU kernel: destination-indexed segment GEMM for the lattice path.

The lattice HEAT models (models/lattice.py) express their per-destination
edge reductions as GEMMs against a materialised one-hot destination matrix
[B, N*k, N] — at the production operating point (B=4, N=2048, k=8, f32)
that matrix is 537 MB of HBM read per aggregation, and it is what makes
B=8 batches slower per slide than B=4 (PERF_NOTES round-1 roadmap #2).

This kernel computes the same reduction

    out[b, m, q] = sum_e [idx[b, e] == m] * vals[b, e, q]

without ever materialising the one-hot: each (batch, edge-tile) grid step
builds the [N, e_tile] membership block in VMEM from an iota compare and
accumulates one MXU GEMM into the resident [N, q] output block. HBM
traffic drops from O(E*N) to O(E*q + N*q).

Masked/padded edges need no special handling: callers zero their `vals`
rows (attention weights are zero on masked edges), so whatever node a
padded `idx` points at receives zero.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, vals_ref, out_ref, *, n, e_tile):
    ei = pl.program_id(1)

    @pl.when(ei == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, 0]                                # [e_tile] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, e_tile), 0)
    member = (rows == idx[None, :]).astype(vals_ref.dtype)   # [n, e_tile]
    out_ref[0] += jnp.dot(
        member, vals_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _pick_tile(e: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if e % t == 0:
            return t
    return 0


@partial(jax.jit, static_argnames=("n", "e_tile", "interpret"))
def segment_matmul_by_dst(idx: jax.Array, vals: jax.Array, n: int,
                          e_tile: int = 0, interpret: bool = False):
    """out [B, n, Q] f32 with out[b, m] = sum over edges e of vals[b, e]
    where idx[b, e] == m. idx [B, E] int32, vals [B, E, Q]."""
    b, e = idx.shape
    q = vals.shape[-1]
    e_tile = e_tile or _pick_tile(e)
    if not e_tile:
        raise ValueError(f"E={e} has no supported tile size")
    n_e_tiles = e // e_tile
    kernel = partial(_kernel, n=n, e_tile=e_tile)
    return pl.pallas_call(
        kernel,
        grid=(b, n_e_tiles),
        in_specs=[
            # [B, 1, E] with a unit sublane dim: a (1, e_tile) block of a
            # [B, E] int array violates Mosaic's (8, 128) tiling rule
            pl.BlockSpec((1, 1, e_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_tile, q), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, q), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, q), jnp.float32),
        interpret=interpret,
    )(idx[:, None, :], vals)
