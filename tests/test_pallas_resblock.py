"""Fused pre-act bottleneck block (ops/pallas_resblock.py) vs the flax
ResidualBlock — f32 interpret-mode equality on HoVer-Net's d0 config."""
from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wsi_hgnn_tpu.models.featurizers.hovernet import HoVerNet  # noqa: E402
from wsi_hgnn_tpu.ops.pallas_resblock import (  # noqa: E402
    fuse_preact_block,
    preact_block_fused,
)


def test_fused_d0_matches_flax():
    model = HoVerNet(nr_types=6, mode="fast")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    # jitter running stats so BN folding is non-trivial
    variables = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 1 else a, variables
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 64).astype(np.float32))

    ref = model.apply(variables, x, method=lambda m, v: m.d0(v, False))

    units, af, bf = fuse_preact_block(
        variables["params"]["d0"], variables["batch_stats"]["d0"],
        unit_count=3, dtype=jnp.float32,
    )
    out = preact_block_fused(x, units, af, bf, interpret=True)
    assert out.shape == ref.shape == (2, 16, 16, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
