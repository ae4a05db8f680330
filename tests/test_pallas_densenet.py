"""Fused Pallas DenseNet path (ops/pallas_densenet.py +
densenet.fuse_kimianet/kimianet_fused_apply) vs the flax reference
implementation — kernel-level and full-network equality in f32 interpret
mode, plus in-place slot semantics."""
from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wsi_hgnn_tpu.models.featurizers.densenet import (  # noqa: E402
    KimiaNet,
    fuse_kimianet,
    kimianet_fused_apply,
)
from wsi_hgnn_tpu.ops.pallas_densenet import (  # noqa: E402
    dense_layer_fused,
    dense_layer_reference,
)


def test_dense_layer_kernel_matches_reference():
    rng = np.random.RandomState(0)
    b, h, w, c_end = 2, 16, 16, 256
    c_cur = 160  # non-multiple of 128: exercises the zero-padded group tail
    slot = c_cur // 32

    x = np.zeros((b, h, w, c_end), np.float32)
    x[..., :c_cur] = rng.randn(b, h, w, c_cur)
    a1 = np.zeros((1, c_end), np.float32)
    b1 = np.zeros((1, c_end), np.float32)
    a1[0, :c_cur] = rng.rand(c_cur) + 0.5
    b1[0, :c_cur] = rng.randn(c_cur) * 0.1
    w1 = rng.randn(c_cur, 128).astype(np.float32) * 0.05
    a2 = (rng.rand(128) + 0.5).astype(np.float32)
    b2 = (rng.randn(128) * 0.1).astype(np.float32)
    w2 = rng.randn(3, 3, 128, 32).astype(np.float32) * 0.05

    w1f = np.zeros((c_end, 128), np.float32)
    w1f[:c_cur] = w1 * a2[None, :]
    w2cat = w2.transpose(2, 0, 1, 3).reshape(128, 288)

    y_ref = np.asarray(dense_layer_reference(
        jnp.asarray(x[..., :c_cur]), jnp.asarray(a1[0, :c_cur]),
        jnp.asarray(b1[0, :c_cur]), jnp.asarray(w1), jnp.asarray(a2),
        jnp.asarray(b2), jnp.asarray(w2),
    ))
    out = np.asarray(dense_layer_fused(
        jnp.asarray(x), jnp.asarray(a1), jnp.asarray(b1), jnp.asarray(w1f),
        jnp.asarray(b2[None]), jnp.asarray(w2cat),
        n_active_groups=-(-c_cur // 128), slot=slot, interpret=True,
    ))
    # the in-place contract: prefix untouched, slot written, tail still zero
    np.testing.assert_allclose(out[..., :c_cur], x[..., :c_cur])
    np.testing.assert_allclose(out[..., c_cur + 32:], 0.0)
    np.testing.assert_allclose(
        out[..., c_cur:c_cur + 32], y_ref, rtol=1e-4, atol=1e-5
    )


def test_fused_kimianet_matches_flax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    kimia = KimiaNet()
    variables = kimia.init(jax.random.PRNGKey(0), x)
    # jitter the running stats so the BN folding is non-trivial
    variables = jax.tree.map(lambda a: a + 0.01 if a.ndim == 1 else a,
                             variables)
    o1_ref, o3_ref = kimia.apply(variables, x, train=False)
    fp = fuse_kimianet(variables, dtype=jnp.float32)
    o1, o3 = kimianet_fused_apply(fp, x, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o3_ref),
                               rtol=1e-4, atol=1e-6)
