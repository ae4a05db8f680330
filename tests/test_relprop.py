"""GraphCAM LRP golden tests: the functional JAX relprop
(models/mil/relprop.py) vs the reference torch implementation
(/root/reference/baselines/GTNMIL/models/ViT.py + layers.py), loaded
read-only as an oracle. Covers forward logits parity, the
transformer_attribution cam, and the rollout variant."""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

from wsi_hgnn_tpu.models.mil import GraphTransformer, graphcam
from wsi_hgnn_tpu.models.mil.relprop import vit_forward, vit_relprop

REF_MODELS = "/root/reference/baselines/GTNMIL/models"

EMBED, DEPTH, HEADS, N_CLS, N_TOK = 16, 3, 8, 2, 9


def _load_ref_vit():
    """Import the reference ViT module without executing the GTNMIL
    models/__init__.py (which needs torch_geometric)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("einops")
    if "refgtnm" not in sys.modules:
        pkg = types.ModuleType("refgtnm")
        pkg.__path__ = [REF_MODELS]
        sys.modules["refgtnm"] = pkg
    return torch, importlib.import_module("refgtnm.ViT")


def _flax_vit_params(seed=0):
    import jax

    model = GraphTransformer(
        n_class=N_CLS, in_dim=8, embed_dim=EMBED, node_cluster_num=N_TOK - 1,
        depth=DEPTH,
    )
    rng = np.random.RandomState(seed)
    feat = rng.randn(1, 12, 8).astype(np.float32)
    adj = rng.rand(1, 12, 12).astype(np.float32)
    mask = np.ones((1, 12), np.float32)
    variables = model.init(jax.random.PRNGKey(seed), feat, adj, mask)
    # non-degenerate head/cls values: flax zero-inits some of these
    params = variables["params"]

    def jitter(p, key):
        leaves, treedef = jax.tree.flatten(p)
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten(
            [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)]
        )

    return model, jitter(params, jax.random.PRNGKey(seed + 1))


def _copy_to_torch(torch, ViT, params):
    vt = ViT.VisionTransformer(
        num_classes=N_CLS, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=2.0,
    )
    vt.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        for i in range(DEPTH):
            p = params[f"blocks_{i}"]
            blk = vt.blocks[i]
            blk.norm1.weight.copy_(t(p["norm1"]["scale"]))
            blk.norm1.bias.copy_(t(p["norm1"]["bias"]))
            blk.attn.qkv.weight.copy_(t(p["qkv"]["kernel"]).T)
            blk.attn.proj.weight.copy_(t(p["proj"]["kernel"]).T)
            blk.attn.proj.bias.copy_(t(p["proj"]["bias"]))
            blk.norm2.weight.copy_(t(p["norm2"]["scale"]))
            blk.norm2.bias.copy_(t(p["norm2"]["bias"]))
            blk.mlp.fc1.weight.copy_(t(p["fc1"]["kernel"]).T)
            blk.mlp.fc1.bias.copy_(t(p["fc1"]["bias"]))
            blk.mlp.fc2.weight.copy_(t(p["fc2"]["kernel"]).T)
            blk.mlp.fc2.bias.copy_(t(p["fc2"]["bias"]))
        vt.norm.weight.copy_(t(params["norm"]["scale"]))
        vt.norm.bias.copy_(t(params["norm"]["bias"]))
        vt.head.weight.copy_(t(params["head"]["kernel"]).T)
        vt.head.bias.copy_(t(params["head"]["bias"]))
    return vt


def _ref_cam(torch, vt, x_np, class_idx, method):
    """The reference GraphCAM driver, GraphTransformer.py:86-101."""
    xt = torch.from_numpy(x_np).requires_grad_(True)
    out = vt(xt)
    out_sm = torch.softmax(out, dim=-1)
    one_hot_np = np.zeros((1, N_CLS), np.float32)
    one_hot_np[0, class_idx] = out_sm[0, class_idx].item()
    one_hot = torch.from_numpy(one_hot_np).requires_grad_(True)
    scalar = torch.sum(one_hot * out_sm)
    vt.zero_grad()
    scalar.backward(retain_graph=True)
    cam = vt.relprop(
        torch.from_numpy(one_hot_np), method=method, is_ablation=False,
        start_layer=0, alpha=1,
    )
    return out.detach().numpy(), cam.detach().numpy()


@pytest.fixture(scope="module")
def setup():
    torch, ViT = _load_ref_vit()
    model, params = _flax_vit_params()
    vt = _copy_to_torch(torch, ViT, params)
    x = np.random.RandomState(7).randn(1, N_TOK, EMBED).astype(np.float32)
    return torch, vt, model, params, x


def test_forward_parity_flax_pure_and_torch(setup):
    import jax.numpy as jnp

    torch, vt, model, params, x = setup
    logits_pure = np.asarray(vit_forward(params, jnp.asarray(x), heads=HEADS))
    with torch.no_grad():
        logits_torch = vt(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(logits_pure, logits_torch, rtol=1e-4, atol=1e-5)


def test_transformer_attribution_matches_reference(setup):
    import jax.numpy as jnp

    torch, vt, model, params, x = setup
    for class_idx in range(N_CLS):
        _, cam_ref = _ref_cam(torch, vt, x, class_idx,
                              "transformer_attribution")
        cam = np.asarray(vit_relprop(
            params, jnp.asarray(x), class_idx, heads=HEADS,
            method="transformer_attribution",
        ))
        assert cam.shape == (N_TOK - 1,)
        np.testing.assert_allclose(cam, cam_ref[0], rtol=5e-3, atol=1e-6)


def test_rollout_matches_reference(setup):
    import jax.numpy as jnp

    torch, vt, model, params, x = setup
    _, cam_ref = _ref_cam(torch, vt, x, 1, "rollout")
    cam = np.asarray(vit_relprop(
        params, jnp.asarray(x), 1, heads=HEADS, method="rollout",
    ))
    np.testing.assert_allclose(cam, cam_ref[0], rtol=5e-3, atol=1e-6)


def test_graphcam_maps_clusters_to_nodes():
    """End-to-end graphcam: LRP cam over clusters -> per-node scores through
    the softmaxed assignment (vis_graphcam.py:71-87); masked nodes get 0."""
    import jax
    import jax.numpy as jnp

    model = GraphTransformer(n_class=2, in_dim=8, embed_dim=EMBED,
                             node_cluster_num=6, depth=2)
    rng = np.random.RandomState(3)
    n = 10
    feat = jnp.asarray(rng.randn(1, n, 8).astype(np.float32))
    adj = jnp.asarray(rng.rand(1, n, n).astype(np.float32))
    mask = jnp.asarray(np.r_[np.ones(7), np.zeros(3)][None].astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    cam = np.asarray(graphcam(model, variables, feat, adj, mask, class_idx=0))
    assert cam.shape == (n,)
    assert np.all(np.isfinite(cam))
    np.testing.assert_allclose(cam[7:], 0.0, atol=1e-7)
