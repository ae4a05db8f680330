"""DenseNet121 + KimiaNet head in Flax (NHWC).

The reference's 'kimia' featurizer (/root/reference/construct_graph/
graph_constructor.py:167-197) is torchvision densenet121 whose `features`
are pooled and flattened; the 1024-d PRE-classifier vector (`out_1`) is the
patch embedding, with the 512-way `fc_4` head unused at feature time.
Parity notes:
  * KimiaNet's wrapper bypasses torchvision's `DenseNet.forward`, so there
    is NO ReLU between the final BatchNorm (norm5) and the global average
    pool (graph_constructor.py:175-177,:159-164) — reproduced here;
  * KimiaNet weights load by ZIP-ORDERED state-dict copy
    (graph_constructor.py:182-186) — see convert.load_kimianet.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class DenseLayer(nn.Module):
    growth_rate: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="norm2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class Transition(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet121(nn.Module):
    """torchvision densenet121: blocks (6, 12, 24, 16), growth 32, init 64."""

    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(self.num_init_features, (7, 7), strides=2, padding="VALID",
                    use_bias=False, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="norm0")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        ch = self.num_init_features
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth_rate, name=f"denseblock{bi+1}_layer{li+1}")(x, train)
                ch += self.growth_rate
            if bi != len(self.block_config) - 1:
                ch = ch // 2
                x = Transition(ch, name=f"transition{bi+1}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="norm5")(x)
        return x  # NO relu here (KimiaNet path, see module docstring)


class KimiaNet(nn.Module):
    """DenseNet121 features -> global avg pool -> (out_1 [B,1024],
    out_3 [B,512]) matching `fully_connected` (graph_constructor.py:151-164)."""

    num_classes: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = DenseNet121(name="backbone")(x, train)
        pooled = feat.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        out_1 = pooled
        out_3 = nn.Dense(self.num_classes, name="fc_4")(pooled)
        return out_1, out_3


# ---------------------------------------------------------------------------
# Fused inference path: BN folded to affines, dense layers as one Pallas
# kernel each (ops/pallas_densenet.py), the concat replaced by in-place slot
# writes. ~5x less HBM traffic per layer than the flax path; equality-tested
# against KimiaNet.apply in tests/test_pallas_densenet.py.
# ---------------------------------------------------------------------------

_BLOCK_CONFIG = (6, 12, 24, 16)


def fuse_kimianet(variables, dtype=jnp.bfloat16):
    """flax KimiaNet variables (params + batch_stats) -> fused inference
    params: BN -> affine (a, b), norm2's scale folded into conv1's kernel,
    conv2 as the tap-major [128, 288] matrix, per-layer arrays zero-padded
    to the block's final width."""
    from ...ops.pallas_densenet import fold_bn

    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    def affine(name):
        return fold_bn(p[name]["scale"].astype(jnp.float32),
                       p[name]["bias"].astype(jnp.float32),
                       s[name]["mean"].astype(jnp.float32),
                       s[name]["var"].astype(jnp.float32))

    fp = {
        "conv0": p["conv0"]["kernel"].astype(dtype),
        "fc4_w": variables["params"]["fc_4"]["kernel"].astype(dtype),
        "fc4_b": variables["params"]["fc_4"]["bias"].astype(jnp.float32),
        "blocks": [],
    }
    fp["stem_a"], fp["stem_b"] = affine("norm0")
    fp["norm5_a"], fp["norm5_b"] = affine("norm5")

    ch = 64
    for bi, n_layers in enumerate(_BLOCK_CONFIG):
        c_end = ch + 32 * n_layers
        block = {"layers": []}
        for li in range(n_layers):
            lp = p[f"denseblock{bi+1}_layer{li+1}"]
            ls = s[f"denseblock{bi+1}_layer{li+1}"]
            c_cur = ch + 32 * li
            a1, b1 = fold_bn(
                lp["norm1"]["scale"].astype(jnp.float32),
                lp["norm1"]["bias"].astype(jnp.float32),
                ls["norm1"]["mean"].astype(jnp.float32),
                ls["norm1"]["var"].astype(jnp.float32),
            )
            a2, b2 = fold_bn(
                lp["norm2"]["scale"].astype(jnp.float32),
                lp["norm2"]["bias"].astype(jnp.float32),
                ls["norm2"]["mean"].astype(jnp.float32),
                ls["norm2"]["var"].astype(jnp.float32),
            )
            w1 = lp["conv1"]["kernel"][0, 0]            # [C_cur, 128]
            w1f = jnp.zeros((c_end, 128), dtype).at[:c_cur].set(
                (w1.astype(jnp.float32) * a2[None, :]).astype(dtype)
            )
            w2 = lp["conv2"]["kernel"]                  # [3, 3, 128, 32] HWIO
            w2cat = w2.transpose(2, 0, 1, 3).reshape(128, 288).astype(dtype)
            pad = jnp.zeros(c_end - c_cur, jnp.float32)
            block["layers"].append({
                "a1": jnp.concatenate([a1, pad])[None],
                "b1": jnp.concatenate([b1, pad])[None],
                "w1f": w1f,
                "b2": b2[None],
                "w2cat": w2cat,
            })
        ch = c_end
        if bi != len(_BLOCK_CONFIG) - 1:
            tr = p[f"transition{bi+1}"]
            trs = s[f"transition{bi+1}"]
            block["trans_a"], block["trans_b"] = fold_bn(
                tr["norm"]["scale"].astype(jnp.float32),
                tr["norm"]["bias"].astype(jnp.float32),
                trs["norm"]["mean"].astype(jnp.float32),
                trs["norm"]["var"].astype(jnp.float32),
            )
            block["trans_w"] = tr["conv"]["kernel"][0, 0].astype(dtype)
            ch = ch // 2
        fp["blocks"].append(block)
    return fp


def kimianet_fused_apply(fp, pixels, interpret: bool = False):
    """(out_1 [B,1024], out_3 [B,512]) — fused-kernel twin of
    KimiaNet.apply(..., train=False). pixels [B, H, W, 3]; H, W multiples
    of 32 (the production patch size is 256)."""
    from ...ops.pallas_densenet import dense_layer_fused

    dtype = pixels.dtype
    x = jnp.pad(pixels, ((0, 0), (3, 3), (3, 3), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, fp["conv0"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    x = jnp.maximum(
        x.astype(jnp.float32) * fp["stem_a"] + fp["stem_b"], 0.0
    ).astype(dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )

    ch = 64
    for bi, n_layers in enumerate(_BLOCK_CONFIG):
        block = fp["blocks"][bi]
        c_end = ch + 32 * n_layers
        b, h, w, _ = x.shape
        x = jnp.concatenate(
            [x, jnp.zeros((b, h, w, c_end - ch), dtype)], axis=-1
        )
        for li in range(n_layers):
            c_cur = ch + 32 * li
            lp = block["layers"][li]
            x = dense_layer_fused(
                x, lp["a1"], lp["b1"], lp["w1f"], lp["b2"], lp["w2cat"],
                n_active_groups=-(-c_cur // 128), slot=c_cur // 32,
                interpret=interpret,
            )
        ch = c_end
        if bi != len(_BLOCK_CONFIG) - 1:
            from ...ops.pallas_densenet import transition_fused

            x = transition_fused(
                x, block["trans_a"][None], block["trans_b"][None],
                block["trans_w"], interpret=interpret,
            )
            ch = ch // 2

    x = x.astype(jnp.float32) * fp["norm5_a"] + fp["norm5_b"]  # no relu
    out_1 = x.mean(axis=(1, 2))
    out_3 = out_1.astype(dtype) @ fp["fc4_w"] + fp["fc4_b"]
    return out_1, out_3
