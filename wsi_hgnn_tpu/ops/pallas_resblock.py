"""Pallas TPU kernel: fused pre-activation ResNet bottleneck block.

HoVer-Net's encoder (the dominant cost of the typing program — 2.8 of the
~2.65+ ms/patch, tools/bench_hover_parts.py) has NO downsampling stem: its
d0 block runs three (64, 64, 256) pre-act bottleneck units at the FULL
256x256 resolution (reference net_desc.py:32-35, net_utils.py:152-263).
Unfused, every unit round-trips four+ [B, 256, 256, 64..256] activation
tensors through HBM; this kernel keeps the whole block resident in VMEM:

    unit 0: s = x @ Ws;           h1 = relu(a1 * (x @ W1) + b1)
    unit i>0: h = relu(a0*buf+b0); h1 = relu(a1 * (h @ W1) + b1)
    h2 = relu(a2 * conv3x3_same(h1, W2) + b2)     (9 shifted GEMMs, W2cat)
    buf = h2 @ W3 + shortcut                       (shortcut = s or buf)
    out = relu(af * buf + bf)                      (blk_bna, once per block)

One grid step = one image through the WHOLE block: HBM traffic collapses
to `read x + write out` (the unfused path reads/writes ~6x that). Only the
stride-1 configuration is fused — d1-d3 run at <=128^2 where XLA's convs
are already compute-bound. BN is folded to affines at load time
(inference running stats), exactly like ops/pallas_densenet.fold_bn.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unit(x_hbm_like, vp, p, h, w):
    """One bottleneck unit on VMEM values. `x_hbm_like` is the unit input
    ([h*w, cin] f32, already pre-activated for units > 0); returns the
    [h*w, c3] f32 body output (caller adds the residual)."""
    c_mid = p["w2cat"].shape[0]
    h1 = jnp.dot(x_hbm_like.astype(p["w1"].dtype), p["w1"],
                 preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 * p["a1"] + p["b1"], 0.0)
    # 3x3 SAME conv as 9 shifted GEMMs out of a zero-ringed scratch
    vp[0, 1:h + 1, 1:w + 1, :] = h1.reshape(h, w, c_mid).astype(vp.dtype)
    acc = jnp.zeros((h * w, c_mid), jnp.float32)
    for di in range(3):
        for dj in range(3):
            t = di * 3 + dj
            vblk = vp[0, di:di + h, dj:dj + w, :].reshape(h * w, c_mid)
            acc += jnp.dot(vblk, p["w2cat"][:, t * c_mid:(t + 1) * c_mid],
                           preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc * p["a2"] + p["b2"], 0.0)
    return jnp.dot(h2.astype(p["w3"].dtype), p["w3"],
                   preferred_element_type=jnp.float32)


def _kernel(x_ref, *refs, h, w, n_units, names, out_ref, vp):
    params = []
    it = iter(refs)
    for u in range(n_units):
        params.append({k: next(it)[...] for k in names[u]})
    af = next(it)[...]
    bf = next(it)[...]

    @pl.when(pl.program_id(0) == 0)
    def _():
        vp[:, 0:1, :, :] = jnp.zeros_like(vp[:, 0:1, :, :])
        vp[:, h + 1:h + 2, :, :] = jnp.zeros_like(vp[:, 0:1, :, :])
        vp[:, :, 0:1, :] = jnp.zeros_like(vp[:, :, 0:1, :])
        vp[:, :, w + 1:w + 2, :] = jnp.zeros_like(vp[:, :, 0:1, :])

    x = x_ref[0].astype(jnp.float32).reshape(h * w, -1)
    p0 = params[0]
    shortcut = jnp.dot(x.astype(p0["ws"].dtype), p0["ws"],
                       preferred_element_type=jnp.float32)
    buf = _unit(x, vp, p0, h, w) + shortcut
    for u in range(1, n_units):
        p = params[u]
        hpre = jnp.maximum(buf * p["a0"] + p["b0"], 0.0)
        buf = _unit(hpre, vp, p, h, w) + buf
    out = jnp.maximum(buf * af[0] + bf[0], 0.0)
    out_ref[0] = out.reshape(h, w, -1).astype(out_ref.dtype)


def fold_bn(scale, bias, mean, var, eps=1e-5):
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def fuse_preact_block(params, batch_stats, unit_count: int,
                      dtype=jnp.bfloat16):
    """Flax ResidualBlock (featurizers/hovernet.ResidualBlock) subtree ->
    (unit_params, af, bf) for preact_block_fused. BN running stats fold to
    f32 affines; conv kernels cast to `dtype` with conv2 in tap-major
    [Cm, 9*Cm] layout."""
    def bn(name):
        p, s = params[name]["bn"], batch_stats[name]["bn"]
        a, b = fold_bn(p["scale"], p["bias"], s["mean"], s["var"])
        return (jnp.asarray(a, jnp.float32)[None],
                jnp.asarray(b, jnp.float32)[None])

    units = []
    for u in range(unit_count):
        w2 = jnp.asarray(params[f"u{u}_conv2"]["kernel"])  # [3,3,Cm,Cm]
        cm = w2.shape[-1]
        d = {
            "w1": jnp.asarray(params[f"u{u}_conv1"]["kernel"], dtype)[0, 0],
            "w2cat": jnp.asarray(w2.transpose(2, 0, 1, 3).reshape(cm, 9 * cm),
                                 dtype),
            "w3": jnp.asarray(params[f"u{u}_conv3"]["kernel"], dtype)[0, 0],
        }
        d["a1"], d["b1"] = bn(f"u{u}_bn1")
        d["a2"], d["b2"] = bn(f"u{u}_bn2")
        if u == 0:
            d["ws"] = jnp.asarray(params["shortcut"]["kernel"], dtype)[0, 0]
        else:
            d["a0"], d["b0"] = bn(f"u{u}_preact")
        units.append(d)
    af, bf = bn("blk_bna")
    return units, af[0], bf[0]


@partial(jax.jit, static_argnames=("interpret",))
def preact_block_fused(x, unit_params: Sequence[dict], af, bf,
                       interpret: bool = False):
    """Fused stride-1 pre-act bottleneck block (HoVer-Net d0 config).

    x            [B, H, W, Cin]
    unit_params  per unit: {'w1' [Cin_u, Cm], 'a1','b1' [Cm],
                 'w2cat' [Cm, 9*Cm] (tap-major HWIO as in pallas_densenet),
                 'a2','b2' [Cm], 'w3' [Cm, C3]; unit 0 adds 'ws' [Cin, C3],
                 units >0 add 'a0','b0' [C3]} — BN affines f32, weights in
                 x.dtype
    af, bf       [C3] f32 — blk_bna folded affine
    """
    b, h, w, _ = x.shape
    n_units = len(unit_params)
    c3 = unit_params[0]["w3"].shape[1]
    c_mid = unit_params[0]["w2cat"].shape[0]

    # params flatten in sorted-name order per unit (1-D affines as [1, n]
    # rows); the kernel rebuilds the dicts in the same order
    names = [sorted(p.keys()) for p in unit_params]
    flat = []
    specs = [pl.BlockSpec((1, h, w, x.shape[-1]), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
    for u, p in enumerate(unit_params):
        for k in names[u]:
            arr = p[k]
            arr = arr.reshape(1, -1) if arr.ndim == 1 else arr
            flat.append(arr)
            specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for arr in (af.reshape(1, -1), bf.reshape(1, -1)):
        flat.append(arr)
        specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))

    def kernel(x_ref, *rest):
        *in_refs, out_ref, vp = rest
        _kernel(x_ref, *in_refs, h=h, w=w, n_units=n_units, names=names,
                out_ref=out_ref, vp=vp)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, w, c3), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c3), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, h + 2, w + 2, c_mid), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *flat)
