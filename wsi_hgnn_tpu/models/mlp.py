"""Plain MLP baselines (reference /root/reference/models/MLP.py:6-37 —
exported but unused in the training path; kept for capability parity)."""
from __future__ import annotations

import jax
from flax import linen as nn


class MLP2Layers(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.out_dim)(x)


class MLP4Layers(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.out_dim)(x)
