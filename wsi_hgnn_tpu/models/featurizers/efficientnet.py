"""EfficientNet-B4 in Flax (NHWC) — the 'efficientnet-b4' featurizer.

The reference uses `efficientnet_pytorch.EfficientNet.from_pretrained(
'efficientnet-b4', num_classes=1024)` (/root/reference/construct_graph/
graph_constructor.py:200-215): pretrained backbone, RANDOMLY-initialised
1024-way final fc, whose output is the patch feature. The architecture
follows the standard compound-scaled B0 (width 1.4, depth 1.8 for B4):
MBConv blocks with squeeze-excite, swish activations, BatchNorm(momentum
.01, eps 1e-3), and — crucially — efficientnet_pytorch's STATIC same
padding: Conv2dStaticSamePadding freezes each conv's padding from the
model's NATIVE resolution ladder (380 -> 190 -> 95 -> 48 -> 24 -> 12 for
B4), so on a 256 input the k=5/s=2 stage-3 depthwise conv pads (2, 2)
where dynamic SAME would pad (1, 2) — a one-pixel shift that would make
every downstream activation diverge from the reference's pretrained
weights (efficientnet_pytorch utils.get_same_padding_conv2d with
image_size set).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# B0 block args: (num_repeat, kernel, stride, expand, in_ch, out_ch, se_ratio)
_B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

_SCALES = {  # name -> (width, depth, resolution, dropout)
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def static_same_pad(ladder: int, kernel: int, stride: int):
    """Conv2dStaticSamePadding's frozen pads for a conv whose NATIVE-input
    feature map is `ladder` px (efficientnet_pytorch utils: ZeroPad2d
    (pad//2, pad - pad//2) per spatial dim). Returns (((lo, hi),) * 2,
    next_ladder)."""
    pad = max((math.ceil(ladder / stride) - 1) * stride + kernel - ladder, 0)
    lo, hi = pad // 2, pad - pad // 2
    return ((lo, hi), (lo, hi)), math.ceil(ladder / stride)


class MBConv(nn.Module):
    kernel: int
    stride: int
    expand: int
    out_ch: int
    se_ratio: float
    # feature-map size of the model's NATIVE resolution at this block —
    # the depthwise conv's padding is frozen from it (static same padding)
    ladder: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name=name
        )
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False, name="expand_conv")(h)
            h = nn.swish(bn("bn0")(h))
        dw_pad, _ = static_same_pad(self.ladder, self.kernel, self.stride)
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel), strides=self.stride,
            padding=dw_pad, feature_group_count=h.shape[-1], use_bias=False,
            name="depthwise_conv",
        )(h)
        h = nn.swish(bn("bn1")(h))

        if self.se_ratio > 0:
            se_ch = max(1, int(in_ch * self.se_ratio))
            s = h.mean(axis=(1, 2), keepdims=True)
            s = nn.swish(nn.Conv(se_ch, (1, 1), name="se_reduce")(s))
            s = jax.nn.sigmoid(nn.Conv(h.shape[-1], (1, 1), name="se_expand")(s))
            h = h * s

        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(h)
        h = bn("bn2")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x  # (drop-connect omitted at inference)
        return h


class EfficientNet(nn.Module):
    """efficientnet_pytorch-compatible backbone + fc head."""

    width: float = 1.4
    depth: float = 1.8
    num_classes: int = 1024
    dropout: float = 0.4
    native_size: int = 380  # padding ladder anchor (B4 resolution)

    @classmethod
    def from_name(cls, name: str, num_classes: int = 1024) -> "EfficientNet":
        w, d, res, drop = _SCALES[name]
        return cls(width=w, depth=d, num_classes=num_classes, dropout=drop,
                   native_size=res)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name=name
        )
        ladder = self.native_size
        stem_pad, ladder = static_same_pad(ladder, 3, 2)
        x = nn.Conv(round_filters(32, self.width), (3, 3), strides=2,
                    padding=stem_pad, use_bias=False, name="conv_stem")(x)
        x = nn.swish(bn("bn_stem")(x))

        idx = 0
        for (r, k, s, e, ci, co, se) in _B0_BLOCKS:
            co_r = round_filters(co, self.width)
            for j in range(round_repeats(r, self.depth)):
                stride = s if j == 0 else 1
                x = MBConv(
                    kernel=k, stride=stride, expand=e,
                    out_ch=co_r, se_ratio=se, ladder=ladder,
                    name=f"block{idx}",
                )(x, train)
                ladder = math.ceil(ladder / stride)
                idx += 1

        x = nn.Conv(round_filters(1280, self.width), (1, 1), use_bias=False,
                    name="conv_head")(x)
        x = nn.swish(bn("bn_head")(x))
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)
