"""EfficientNetV2 in Flax (NHWC) — the from-scratch variant the reference
ships at /root/reference/models/efficient_net_v2.py:46-231 (exported via
models/__init__ but unused by the live featurizer path; kept for capability
parity). Fused-MBConv for early stages (use_se=0) and SE-MBConv later;
s/m/l/xl size configs (:167-231)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SELayer(nn.Module):
    inp: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.silu(nn.Dense(_make_divisible(self.inp // 4, 8), name="fc1")(y))
        y = jax.nn.sigmoid(nn.Dense(c, name="fc2")(y))
        return x * y[:, None, None, :]


class MBConvV2(nn.Module):
    out_ch: int
    stride: int
    expand: int
    use_se: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        inp = x.shape[-1]
        hidden = round(inp * self.expand)
        identity = self.stride == 1 and inp == self.out_ch
        h = x
        if self.use_se:
            h = nn.silu(bn("bn0")(nn.Conv(hidden, (1, 1), use_bias=False, name="pw")(h)))
            h = nn.Conv(hidden, (3, 3), strides=self.stride, padding=1,
                        feature_group_count=hidden, use_bias=False, name="dw")(h)
            h = nn.silu(bn("bn1")(h))
            h = SELayer(inp, name="se")(h)
            h = bn("bn2")(nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pw_linear")(h))
        else:
            h = nn.Conv(hidden, (3, 3), strides=self.stride, padding=1,
                        use_bias=False, name="fused")(h)
            h = nn.silu(bn("bn0")(h))
            h = bn("bn1")(nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pw_linear")(h))
        return x + h if identity else h


# (expand, channels, repeats, stride, use_se) per stage — reference :167-231
_CFGS = {
    "s": [(1, 24, 2, 1, 0), (4, 48, 4, 2, 0), (4, 64, 4, 2, 0),
          (4, 128, 6, 2, 1), (6, 160, 9, 1, 1), (6, 256, 15, 2, 1)],
    "m": [(1, 24, 3, 1, 0), (4, 48, 5, 2, 0), (4, 80, 5, 2, 0),
          (4, 160, 7, 2, 1), (6, 176, 14, 1, 1), (6, 304, 18, 2, 1),
          (6, 512, 5, 1, 1)],
    "l": [(1, 32, 4, 1, 0), (4, 64, 7, 2, 0), (4, 96, 7, 2, 0),
          (4, 192, 10, 2, 1), (6, 224, 19, 1, 1), (6, 384, 25, 2, 1),
          (6, 640, 7, 1, 1)],
    "xl": [(1, 32, 4, 1, 0), (4, 64, 8, 2, 0), (4, 96, 8, 2, 0),
           (4, 192, 16, 2, 1), (6, 256, 24, 1, 1), (6, 512, 32, 2, 1),
           (6, 640, 8, 1, 1)],
}


class EffNetV2(nn.Module):
    cfgs: Tuple[Tuple[int, int, int, int, int], ...]
    num_classes: int = 1000
    width_mult: float = 1.0

    @classmethod
    def s(cls, num_classes=1000):
        return cls(tuple(_CFGS["s"]), num_classes)

    @classmethod
    def m(cls, num_classes=1000):
        return cls(tuple(_CFGS["m"]), num_classes)

    @classmethod
    def l(cls, num_classes=1000):
        return cls(tuple(_CFGS["l"]), num_classes)

    @classmethod
    def xl(cls, num_classes=1000):
        return cls(tuple(_CFGS["xl"]), num_classes)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        ch = _make_divisible(24 * self.width_mult, 8)
        x = nn.Conv(ch, (3, 3), strides=2, padding=1, use_bias=False, name="stem")(x)
        x = nn.silu(bn("bn_stem")(x))

        idx = 0
        for (t, c, n, s, use_se) in self.cfgs:
            out_ch = _make_divisible(c * self.width_mult, 8)
            for i in range(n):
                x = MBConvV2(out_ch, s if i == 0 else 1, t, bool(use_se),
                             name=f"block{idx}")(x, train)
                idx += 1

        head = _make_divisible(1792 * self.width_mult, 8) if self.width_mult > 1.0 else 1792
        x = nn.silu(bn("bn_head")(nn.Conv(head, (1, 1), use_bias=False, name="conv_head")(x)))
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(x)
