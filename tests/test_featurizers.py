"""Featurizer tests.

The HoVer-Net test is an ACTIVATION-LEVEL parity check (SURVEY.md §7 hard
part 3): the reference torch implementation (loaded directly from
/root/reference as an oracle, skipped when unavailable) and our Flax
re-implementation + state-dict converter must produce matching tp/np/hv
maps and fc1 features on the same random input and random weights.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsi_hgnn_tpu.models.featurizers import (
    DenseNet121,
    EfficientNet,
    EffNetV2,
    HoVerNet,
    KimiaNet,
    convert,
    node_types_from_tp,
    node_types_on_device,
)
from wsi_hgnn_tpu.models.featurizers.hovernet import (
    hovernet_full_apply,
    hovernet_typing_apply,
)

REF_HOVERNET = "/root/reference/models/hovernet"


def _load_ref_hovernet():
    if not os.path.isdir(REF_HOVERNET):
        pytest.skip("reference hovernet not available")
    torch = pytest.importorskip("torch")
    pytest.importorskip("matplotlib")
    pkg = types.ModuleType("refhov")
    pkg.__path__ = [REF_HOVERNET]
    sys.modules.setdefault("refhov", pkg)

    def load(name):
        if f"refhov.{name}" in sys.modules:
            return sys.modules[f"refhov.{name}"]
        spec = importlib.util.spec_from_file_location(
            f"refhov.{name}", os.path.join(REF_HOVERNET, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refhov.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("utils")
    load("net_utils")
    return load("net_desc"), torch


@pytest.mark.slow
def test_hovernet_activation_parity_with_reference():
    net_desc, torch = _load_ref_hovernet()
    tnet = net_desc.create_model(mode="fast", nr_types=6)
    tnet.eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    model = HoVerNet(nr_types=6, mode="fast")
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    # NOTE: 64x64 fast-mode input -> crop arithmetic still holds? The crops
    # (92/36) require >=256 inputs; use the real 256 size.
    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = convert.merge_into(variables, convert.hovernet_torch_to_flax(sd, 6))
    out, feats = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        t_out, t_feats = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # random-init logits reach |x| ~ 3e3; fp32 accumulation-order noise is
    # ~1e-2 absolute, i.e. relative ~1e-5 — atol must scale with magnitude
    for k in ("tp", "np", "hv"):
        ours = np.asarray(out[k])
        theirs = t_out[k].numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape, (k, ours.shape, theirs.shape)
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4 * scale)
    t_f = t_feats.numpy()
    np.testing.assert_allclose(
        np.asarray(feats), t_f, rtol=1e-3, atol=1e-4 * np.abs(t_f).max()
    )


def test_hovernet_shapes_fast():
    model = HoVerNet(nr_types=6, mode="fast")
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, feats = model.apply(variables, x, train=False)
    assert out["tp"].shape == (1, 164, 164, 6)
    assert out["np"].shape == (1, 164, 164, 2)
    assert out["hv"].shape == (1, 164, 164, 2)
    assert feats.shape == (1, 1024)


def test_hover_typing_ckpt_with_fc1_is_filtered(tmp_path):
    """Checkpoints saved from the reference's own net carry fc1 weights
    (net_desc.py:38 adds fc1 as a plain nn.Linear). The typing-only loader
    (with_fc1=False) must drop them before conversion instead of crashing
    merge_into — and must not materialise the 4 GB fc1 kernel."""
    torch = pytest.importorskip("torch")
    from wsi_hgnn_tpu.models.featurizers import _load_hover_variables

    # shapes are irrelevant: fc1.* must be filtered out before conversion
    sd = {
        "fc1.weight": torch.zeros(4, 8),
        "fc1.bias": torch.zeros(4),
        "conv0.weight": torch.zeros(64, 3, 7, 7),
    }
    ckpt = tmp_path / "hover_with_fc1.pth"
    torch.save({"desc": sd}, ckpt)
    model, variables, _ = _load_hover_variables(
        {"hovernet_model_path": str(ckpt)}, nr_types=6, with_fc1=False
    )
    assert "fc1" not in variables["params"]
    # the conv0 weight DID merge (converted, transposed to HWIO)
    assert np.asarray(variables["params"]["conv0"]["kernel"]).shape == (
        7, 7, 3, 64)


def test_node_types_from_tp():
    tp = np.zeros((2, 4, 4, 6), np.float32)
    # patch 0: all background (class 0 highest everywhere)
    tp[0, :, :, 0] = 1.0
    # patch 1: mostly class 3, some class 2
    tp[1, :, :, 0] = 0.1
    tp[1, :2, :, 3] = 1.0
    tp[1, 2, 0, 2] = 1.0
    tp[1, 2:, 1:, 0] = 1.0
    types = node_types_from_tp(tp)
    assert types[0] == 0
    assert types[1] == 3


def test_node_types_on_device_matches_host():
    """The jittable typing head must agree with the host bincount loop,
    including the all-background -> type 0 case and lowest-class ties."""
    rng = np.random.RandomState(0)
    tp = rng.randn(16, 12, 12, 6).astype(np.float32)
    tp[:4, :, :, 1:] -= 100.0  # force all-background patches
    host = node_types_from_tp(tp)
    dev = np.asarray(node_types_on_device(jnp.asarray(tp)))
    np.testing.assert_array_equal(host, dev)
    assert (host[:4] == 0).all()


def test_hovernet_single_program_paths():
    """hovernet_typing_apply / hovernet_full_apply (the single-jit encoder
    paths that replaced the round-2 staged jits) must match the reference
    CONSTRUCTOR composition exactly — including its H/W transpose: the
    reference feeds HoVer-Net the spatially transposed patch
    (graph_constructor.py:135 permute(0,3,2,1) then run_desc.py:176-177
    permute(0,3,1,2) compose to [B,C,W,H]), so the wrappers transpose too.
    Asymmetric input makes a missing/extra transpose fail loudly."""
    model = HoVerNet(nr_types=6, mode="fast")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    xt = jnp.swapaxes(x, 1, 2)  # what the reference net actually convolves
    out, feats = model.apply(variables, xt, train=False)
    expect_types = node_types_from_tp(np.asarray(out["tp"]))

    types = np.asarray(hovernet_typing_apply(model, variables, x))
    np.testing.assert_array_equal(types, expect_types)
    # a transpose-less application gives DIFFERENT types on this input —
    # the orientation is semantically load-bearing, not a layout detail
    out_plain, _ = model.apply(variables, x, train=False)
    assert not np.array_equal(
        node_types_from_tp(np.asarray(out_plain["tp"])), expect_types
    ) or not np.allclose(np.asarray(out_plain["tp"]), np.asarray(out["tp"]))

    f2, t2 = hovernet_full_apply(model, variables, x)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(feats),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(t2), expect_types)


def test_kimianet_output_dims():
    model = KimiaNet()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out_1, out_3 = model.apply(variables, x, train=False)
    assert out_1.shape == (1, 1024)  # densenet121 final features
    assert out_3.shape == (1, 512)


def test_kimianet_zip_load_roundtrip():
    """The zip-ordered KimiaNet loader must fill every backbone tensor."""
    model = KimiaNet()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    # fabricate a checkpoint with arbitrary keys but torchvision ordering
    order = convert.densenet121_key_order()
    rng = np.random.RandomState(0)

    def shape_for(key, kind):
        # derive shapes from our own flax tree via the named converter
        return None

    # build a name->value dict by converting the flax init tree back is
    # complex; instead synthesise values with the correct shapes by reading
    # them from a forward converter pass over a fake torchvision sd.
    import collections

    fake_sd = collections.OrderedDict()
    # walk flax tree to get shapes per torchvision key
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    def bn_entries(prefix, node_p, node_s):
        fake_sd[prefix + ".weight"] = np.asarray(node_p["scale"])
        fake_sd[prefix + ".bias"] = rng.randn(*node_p["bias"].shape).astype(np.float32)
        fake_sd[prefix + ".running_mean"] = rng.randn(*node_s["mean"].shape).astype(np.float32)
        fake_sd[prefix + ".running_var"] = np.abs(rng.randn(*node_s["var"].shape)).astype(np.float32)
        fake_sd[prefix + ".num_batches_tracked"] = np.asarray(0)

    def conv_entry(key, node):
        k = np.asarray(node["kernel"])  # HWIO
        fake_sd[key] = rng.randn(*np.transpose(k, (3, 2, 0, 1)).shape).astype(np.float32)

    conv_entry("features.conv0.weight", p["conv0"])
    bn_entries("features.norm0", p["norm0"], s["norm0"])
    for bi, n in enumerate((6, 12, 24, 16), start=1):
        for li in range(1, n + 1):
            fp = p[f"denseblock{bi}_layer{li}"]
            fs = s[f"denseblock{bi}_layer{li}"]
            bn_entries(f"features.denseblock{bi}.denselayer{li}.norm1", fp["norm1"], fs["norm1"])
            conv_entry(f"features.denseblock{bi}.denselayer{li}.conv1.weight", fp["conv1"])
            bn_entries(f"features.denseblock{bi}.denselayer{li}.norm2", fp["norm2"], fs["norm2"])
            conv_entry(f"features.denseblock{bi}.denselayer{li}.conv2.weight", fp["conv2"])
        if bi != 4:
            bn_entries(f"features.transition{bi}.norm", p[f"transition{bi}"]["norm"], s[f"transition{bi}"]["norm"])
            conv_entry(f"features.transition{bi}.conv.weight", p[f"transition{bi}"]["conv"])
    bn_entries("features.norm5", p["norm5"], s["norm5"])
    fake_sd["fc_4.weight"] = rng.randn(512, 1024).astype(np.float32)
    fake_sd["fc_4.bias"] = rng.randn(512).astype(np.float32)

    # ordering sanity: keys must match the canonical order exactly
    canonical = [k for k, _ in convert.densenet121_key_order()]
    assert list(fake_sd.keys())[: len(canonical)] == canonical

    # save via torch and load through the real path
    torch = pytest.importorskip("torch")
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        # arbitrary RENAMED keys to prove the zip-load ignores names
        renamed = {f"module.model.0.xxx{i}": torch.from_numpy(np.asarray(v))
                   for i, v in enumerate(fake_sd.values())}
        torch.save(renamed, f.name)
        trees = convert.load_kimianet(f.name)

    merged = convert.merge_into(variables, trees)
    # the fabricated bias made it into the merged tree
    np.testing.assert_allclose(
        merged["params"]["backbone"]["norm0"]["bias"],
        fake_sd["features.norm0.bias"],
    )
    np.testing.assert_allclose(
        merged["params"]["fc_4"]["bias"], fake_sd["fc_4.bias"]
    )
    # conv weights transposed OIHW -> HWIO
    got = merged["params"]["backbone"]["conv0"]["kernel"]
    np.testing.assert_allclose(
        got, np.transpose(fake_sd["features.conv0.weight"], (2, 3, 1, 0))
    )
    # (no forward-finiteness check: 121 layers of N(0,1) fabricated weights
    # legitimately overflow fp32)


def test_efficientnet_b4_dims():
    model = EfficientNet.from_name("efficientnet-b4", num_classes=1024)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 1024)
    # B4 block count = sum(ceil(1.8 * r)) over B0 stages = 32
    assert sum(1 for k in variables["params"] if k.startswith("block")) == 32


def test_effnetv2_s_runs():
    model = EffNetV2.s(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)


def test_efficientnet_convert_skips_mismatched_fc():
    """The stock ImageNet checkpoint carries a 1000-way _fc; converting for
    our 1024-d feature head must skip it (the reference's from_pretrained
    re-inits fc), not crash merge_into."""
    rng = np.random.RandomState(0)
    sd = {
        "_conv_stem.weight": rng.randn(48, 3, 3, 3).astype(np.float32),
        "_fc.weight": rng.randn(1000, 1792).astype(np.float32),
        "_fc.bias": rng.randn(1000).astype(np.float32),
    }
    out = convert.efficientnet_torch_to_flax(sd, num_classes=1024)
    assert "fc" not in out["params"]
    # a MATCHING head converts
    sd["_fc.weight"] = rng.randn(1024, 1792).astype(np.float32)
    sd["_fc.bias"] = rng.randn(1024).astype(np.float32)
    out = convert.efficientnet_torch_to_flax(sd, num_classes=1024)
    assert out["params"]["fc"]["kernel"].shape == (1792, 1024)


def test_make_encode_fixed_shape_padding():
    """_make_encode with pad_batch_to pads every chunk (full, trailing,
    batch-1 thumbnail) to ONE compiled shape and slices the pad back off —
    a compile per trailing-chunk size costs minutes on remote-compile
    platforms (pipeline operating point: hovernet batch_size)."""
    from wsi_hgnn_tpu.models.featurizers import _make_encode

    seen = []

    def fn(imgs):
        seen.append(imgs.shape[0])
        return imgs.reshape(imgs.shape[0], -1)[:, :4], np.full(
            imgs.shape[0], 2, np.int32)

    enc = _make_encode(fn, n_dev=1, pad_batch_to=8)
    for b in (8, 5, 1):
        feats, types = enc(np.random.RandomState(b).rand(b, 2, 2, 3))
        assert feats.shape == (b, 4) and feats.dtype == np.float32
        assert types.shape == (b,)
    assert set(seen) == {8}  # one shape -> one XLA program

    # tuple-vs-array outputs normalise: a featurizer without typing
    enc2 = _make_encode(lambda im: im.reshape(im.shape[0], -1)[:, :4],
                        n_dev=4, pad_batch_to=None)
    feats, types = enc2(np.ones((6, 2, 2, 3), np.float32))
    assert feats.shape == (6, 4) and types is None


def test_encoder_uint8_chunks_match_f32():
    """CNN encoders accept raw uint8 chunks (accepts_uint8) and normalise
    ON DEVICE (_norm_pixels inside the jitted program) — the real-file
    ingestion path ships 4x fewer bytes. Must equal the f32 host path
    exactly (uint8 -> f32/255 is the same arithmetic either side)."""
    import jax

    from wsi_hgnn_tpu.models.featurizers import make_cnn_encoder

    enc = make_cnn_encoder(
        "kimia", {"feature_dim": 1024, "n_node_type": 6}, {}, {},
        with_typing=False, pad_batch_to=4,
    )
    assert enc.accepts_uint8
    rng = np.random.RandomState(0)
    # small patches keep the CPU DenseNet trace cheap; conv nets accept
    # any spatial size
    u8 = rng.randint(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    f_u8, _ = enc(u8)
    f_f32, _ = enc(u8.astype(np.float32) / np.float32(255.0))
    assert f_u8.shape == (3, 1024)
    np.testing.assert_allclose(f_u8, f_f32, atol=1e-6)


def test_efficientnet_static_same_padding_ladder():
    """B4's conv pads are frozen from the NATIVE 380 ladder
    (efficientnet_pytorch Conv2dStaticSamePadding): at the k=5/s=2
    stage-3 depthwise the ladder size is 95 (odd) -> pad (2, 2), where
    dynamic SAME on a 256 input (map 64, even) would pad (1, 2) — a
    one-pixel shift against the pretrained weights."""
    from wsi_hgnn_tpu.models.featurizers.efficientnet import static_same_pad

    assert static_same_pad(95, 5, 2)[0] == ((2, 2), (2, 2))
    # what dynamic SAME would do at the 256-input map size
    assert static_same_pad(64, 5, 2)[0] == ((1, 2), (1, 2))
    # the B4 ladder itself
    s = 380
    for k, stride, want in [(3, 2, 190), (3, 1, 190)]:
        _, s2 = static_same_pad(s, k, stride)
        if stride == 2:
            assert s2 == want
            s = s2
