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
