"""Pallas TPU kernel: fused DenseNet dense-layer step.

The XLA path (models/featurizers/densenet.DenseLayer) materialises, per
layer, the BN+ReLU of the full concatenated input, the 1x1 bottleneck, a
second BN+ReLU, the 3x3 conv, and a fresh concat — ~87% of the measured
layer time is this elementwise/concat HBM traffic, not conv compute. This
kernel runs the whole dense layer out of VMEM with the concat replaced by
an in-place 32-channel slot write (input_output_aliases), so per-layer HBM
traffic collapses to `read active prefix + write one 128-group` — near the
floor.

Math per layer (torchvision densenet121 inference semantics, reproduced
from the reference featurizer /root/reference/construct_graph/
graph_constructor.py:167-197):

    u = relu(a1 * x + b1)            # norm1 folded to an affine
    z = u @ W1f + b2                 # conv1 1x1; norm2's scale folded in
    v = relu(z)
    y = conv3x3_same(v, W2)          # tap-major: one [128, 9*32] GEMM
                                     # + 9 shifted VMEM adds
    x[..., slot*32:(slot+1)*32] = y  # the "concat", in place

Feature layout: one buffer x [B, H, W, C_end] per dense block, channels
beyond the written prefix zero. Each grid step processes a sub-batch of
images through the WHOLE layer (a first cut with a (batch, channel-group)
grid measured grid-step-overhead-bound at ~20k tiny steps per chunk): the
active prefix is read as one [bb, H, W, nag*128] block, the bottleneck is
a single K = nag*128 GEMM, and the 3x3 conv is cross-correlation with SAME
zero padding, realised as Z = v @ W2cat ([*, 288] on the MXU) followed by
9 statically shifted adds out of a zero-ringed scratch. Unwritten channels
are neutralised by zero rows in (a1, b1, W1f), so reading a partially
written 128-group is exact, and Mosaic's 128-lane output-block rule is met
by splicing y into its group (whose current contents are the block's last
128 input lanes, or zeros for a fresh group).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROWTH = 32
GROUP = 128
_X_BLOCK_BYTES = 2 * 1024 * 1024  # target input block size per grid step


def _kernel(x_ref, a1_ref, b1_ref, w1f_ref, b2_ref, w2_ref, y_ref, zp,
            *, h, w, bb, pos, fresh_group):
    """pos: which 32-slot of the output 128-group this layer fills;
    fresh_group: no earlier slot of that group has been written yet (the
    group's contents are all-zero and it is NOT inside the input block)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        # zero only the one-pixel halo ring once per call: the centre is
        # fully overwritten every step, and scratch persists across steps
        zp[:, 0:1, :, :] = jnp.zeros_like(zp[:, 0:1, :, :])
        zp[:, h + 1:h + 2, :, :] = jnp.zeros_like(zp[:, 0:1, :, :])
        zp[:, :, 0:1, :] = jnp.zeros_like(zp[:, :, 0:1, :])
        zp[:, :, w + 1:w + 2, :] = jnp.zeros_like(zp[:, :, 0:1, :])

    raw = x_ref[...]                                  # [bb, H, W, K]
    k_ch = raw.shape[-1]
    x = raw.astype(jnp.float32)
    u = jnp.maximum(x * a1_ref[0] + b1_ref[0], 0.0)
    u = u.astype(w1f_ref.dtype).reshape(bb * h * w, k_ch)
    z = jnp.dot(u, w1f_ref[...], preferred_element_type=jnp.float32)
    v = jnp.maximum(z + b2_ref[0], 0.0).astype(w2_ref.dtype)
    zmat = jnp.dot(v, w2_ref[...], preferred_element_type=jnp.float32)
    zp[:, 1:h + 1, 1:w + 1, :] = zmat.reshape(bb, h, w, 9 * GROWTH).astype(zp.dtype)
    acc = jnp.zeros((bb, h, w, GROWTH), jnp.float32)
    for di in range(3):
        for dj in range(3):
            t = di * 3 + dj
            acc += zp[:, di:di + h, dj:dj + w,
                      t * GROWTH:(t + 1) * GROWTH].astype(jnp.float32)
    y = acc.astype(y_ref.dtype)
    # Mosaic requires 128-wide output blocks: write the whole group,
    # splicing y into its slot. A non-fresh group is exactly the input
    # block's last 128 lanes (slot // 4 == nag - 1).
    base = (jnp.zeros((bb, h, w, GROUP), y_ref.dtype) if fresh_group
            else raw[..., k_ch - GROUP:])
    pieces = []
    if pos > 0:
        pieces.append(base[..., :pos * GROWTH])
    pieces.append(y)
    if (pos + 1) * GROWTH < GROUP:
        pieces.append(base[..., (pos + 1) * GROWTH:])
    y_ref[...] = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)


@partial(jax.jit, static_argnames=("n_active_groups", "slot", "interpret"))
def dense_layer_fused(x_full, a1, b1, w1f, b2, w2cat, *,
                      n_active_groups: int, slot: int,
                      interpret: bool = False):
    """One fused dense-layer step, updating x_full's slot in place.

    x_full  [B, H, W, C_end] (C_end % 128 == 0), written prefix = slot*32
    a1, b1  [1, C_end] f32 — norm1 folded affine, zero beyond the prefix
    w1f     [C_end, 128]    — conv1 kernel with norm2's scale folded in
    b2      [1, 128] f32    — norm2 folded shift
    w2cat   [128, 288]      — conv2 HWIO kernel as [I, tap*O], tap = 3*di+dj
    (conv2 factorisations were laddered on hardware — tap-major GEMM +
    shifted adds vs 9 narrow GEMMs from a 128-ch scratch ('sliced', removed)
    — taps won or tied at every block shape; PERF_NOTES round-3.)
    """
    b, h, w, c_end = x_full.shape
    assert c_end % GROUP == 0 and 0 < n_active_groups <= c_end // GROUP
    assert slot * GROWTH < c_end
    per_group = GROUP // GROWTH
    pos = slot % per_group
    fresh_group = pos == 0
    assert fresh_group or slot // per_group == n_active_groups - 1
    k_ch = n_active_groups * GROUP

    bb = 1
    itemsize = jnp.dtype(x_full.dtype).itemsize
    while (bb * 2 <= b and b % (bb * 2) == 0
           and bb * 2 * h * w * k_ch * itemsize <= _X_BLOCK_BYTES):
        bb *= 2

    kernel = partial(_kernel, h=h, w=w, bb=bb, pos=pos,
                     fresh_group=fresh_group)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, k_ch), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_ch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_ch, GROUP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 9 * GROWTH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, h, w, GROUP),
            lambda i, _g=slot // per_group: (i, 0, 0, _g),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x_full.shape, x_full.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, h + 2, w + 2, 9 * GROWTH), x_full.dtype),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_full, a1, b1, w1f, b2, w2cat)


def _transition_kernel(x_ref, a_ref, b_ref, w_ref, o_ref, *, h, w, bb):
    x = x_ref[...].astype(jnp.float32)                 # [bb, H, W, C]
    c = x.shape[-1]
    u = jnp.maximum(x * a_ref[0] + b_ref[0], 0.0)
    u = u.astype(w_ref.dtype).reshape(bb * h * w, c)
    z = jnp.dot(u, w_ref[...], preferred_element_type=jnp.float32)
    z = z.reshape(bb, h // 2, 2, w // 2, 2, c // 2)
    o_ref[...] = (0.25 * (z[:, :, 0, :, 0] + z[:, :, 0, :, 1]
                          + z[:, :, 1, :, 0] + z[:, :, 1, :, 1])
                  ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def transition_fused(x, a, b, w, interpret: bool = False):
    """Fused DenseNet transition: relu(a*x+b) @ w -> 2x2 average pool.
    x [B, H, W, C], a/b [1, C] f32, w [C, C//2]; returns [B, H/2, W/2, C/2]."""
    bsz, h, w_sp, c = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    bb = 1
    while (bb * 2 <= bsz and bsz % (bb * 2) == 0
           and bb * 2 * h * w_sp * c * itemsize <= _X_BLOCK_BYTES):
        bb *= 2
    kernel = partial(_transition_kernel, h=h, w=w_sp, bb=bb)
    return pl.pallas_call(
        kernel,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w_sp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h // 2, w_sp // 2, c // 2),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h // 2, w_sp // 2, c // 2),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, a, b, w)


def dense_layer_reference(x, a1, b1, w1, a2, b2, w2):
    """Unfused jnp reference of one dense layer on the ACTIVE prefix
    (torchvision semantics; w1 [C,128] unfolded, w2 [3,3,128,32] HWIO)."""
    u = jax.nn.relu(x * a1 + b1)
    z = u @ w1
    v = jax.nn.relu(z * a2 + b2)
    return jax.lax.conv_general_dilated(
        v, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=v.dtype,
    )


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """BatchNorm inference -> affine: a = scale/sqrt(var+eps), b = bias - mean*a."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a
