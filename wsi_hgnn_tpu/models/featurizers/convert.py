"""Torch -> Flax checkpoint converters for the pretrained featurizers.

The reference loads three external checkpoints (SURVEY.md §2.1 C4/C5):
  * HoVer-Net PanNuke: `hovernet_fast_pannuke_type_tf2pytorch.tar`, loaded
    with a DataParallel 'module.' strip and strict=False — the repo's custom
    fc1 bottleneck head stays at its random init
    (/root/reference/construct_graph/graph_constructor.py:84-98,:118-123);
  * KimiaNet DenseNet121 weights, loaded by ZIP-ORDERED positional copy
    onto the torchvision state dict (graph_constructor.py:182-186);
  * EfficientNet-B4 ImageNet weights via efficientnet_pytorch, with a
    randomly re-initialised 1024-way fc (:200-215).

Each converter takes the raw torch state dict (tensor values; torch import
is gated) and returns {'params': ..., 'batch_stats': ...} trees matching
the corresponding Flax module in this package. Layout transforms:
conv OIHW -> HWIO (grouped convs keep group-major order), linear
[out,in] -> [in,out], BatchNorm weight/bias -> scale/bias and
running_mean/var -> batch_stats.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------- #
# generic helpers
# --------------------------------------------------------------------- #
def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """torch.load -> {key: numpy}; unwraps common checkpoint wrappers
    ('desc' for hovernet tars, 'state_dict', 'model')."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("desc", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def strip_dataparallel(sd: Dict[str, Any]) -> Dict[str, Any]:
    """convert_pytorch_checkpoint (graph_constructor.py:84-98)."""
    keys = list(sd.keys())
    if keys and all(k.split(".")[0] == "module" for k in keys):
        return {".".join(k.split(".")[1:]): v for k, v in sd.items()}
    return sd


def conv_w(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_w(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn(params: Dict, stats: Dict, flax_path: List[str], sd: Dict, torch_prefix: str):
    _set(params, flax_path + ["scale"], sd[torch_prefix + ".weight"])
    _set(params, flax_path + ["bias"], sd[torch_prefix + ".bias"])
    _set(stats, flax_path + ["mean"], sd[torch_prefix + ".running_mean"])
    _set(stats, flax_path + ["var"], sd[torch_prefix + ".running_var"])


# --------------------------------------------------------------------- #
# HoVer-Net
# --------------------------------------------------------------------- #
def hovernet_torch_to_flax(sd: Dict[str, np.ndarray], nr_types: int = 6) -> Dict:
    """Map the reference's HoVerNet module names (net_desc.py:23-96) onto
    featurizers.hovernet.HoVerNet. Missing keys (fc1) keep random init —
    the reference's strict=False semantics."""
    sd = strip_dataparallel(sd)
    params: Dict = {}
    stats: Dict = {}

    def conv(flax_path, key, bias=False):
        if key + ".weight" in sd:
            _set(params, flax_path + ["kernel"], conv_w(sd[key + ".weight"]))
            if bias and key + ".bias" in sd:
                _set(params, flax_path + ["bias"], sd[key + ".bias"])

    def bn(flax_path, key):
        if key + ".weight" in sd:
            _bn(params, stats, flax_path + ["bn"], sd, key)

    conv(["conv0"], "conv0./")
    bn(["bn0"], "conv0.bn")

    res_cfg = {"d0": 3, "d1": 4, "d2": 6, "d3": 3}
    for dname, units in res_cfg.items():
        conv([dname, "shortcut"], f"{dname}.shortcut")
        for i in range(units):
            base = f"{dname}.units.{i}"
            if i != 0:
                bn([dname, f"u{i}_preact"], f"{base}.preact/bn")
            conv([dname, f"u{i}_conv1"], f"{base}.conv1")
            bn([dname, f"u{i}_bn1"], f"{base}.conv1/bn")
            conv([dname, f"u{i}_conv2"], f"{base}.conv2")
            bn([dname, f"u{i}_bn2"], f"{base}.conv2/bn")
            conv([dname, f"u{i}_conv3"], f"{base}.conv3")
        bn([dname, "blk_bna"], f"{dname}.blk_bna.bn")

    conv(["conv_bot"], "conv_bot")

    dense_units = {"u3": 8, "u2": 4}
    for branch in ("tp", "np", "hv"):
        b = ["decoder_" + branch]
        t = f"decoder.{branch}"
        for u, nunits in dense_units.items():
            conv(b + [f"{u}_conva"], f"{t}.{u}.conva")
            for i in range(nunits):
                db = b + [f"{u}_dense"]
                tb = f"{t}.{u}.dense.units.{i}"
                bn(db + [f"u{i}_preact"], f"{tb}.preact_bna/bn")
                conv(db + [f"u{i}_conv1"], f"{tb}.conv1")
                bn(db + [f"u{i}_bn1"], f"{tb}.conv1/bn")
                conv(db + [f"u{i}_conv2"], f"{tb}.conv2")
            bn(b + [f"{u}_dense", "blk_bna"], f"{t}.{u}.dense.blk_bna.bn")
            conv(b + [f"{u}_convf"], f"{t}.{u}.convf")
        conv(b + ["u1_conva"], f"{t}.u1.conva")
        bn(b + ["u0_bn"], f"{t}.u0.bn")
        conv(b + ["u0_conv"], f"{t}.u0.conv", bias=True)

    if "fc1.weight" in sd:  # usually absent (strict=False in the reference)
        w = sd["fc1.weight"]  # [1024, C*H*W] over torch's NCHW flatten
        if w.shape[1] == 1024 * 32 * 32:
            # our input flattens NHWC: reorder columns (C,H,W) -> (H,W,C)
            w = w.reshape(-1, 1024, 32, 32).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        _set(params, ["fc1", "kernel"], linear_w(w))
        _set(params, ["fc1", "bias"], sd["fc1.bias"])

    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------- #
# DenseNet121 / KimiaNet
# --------------------------------------------------------------------- #
_DENSENET_BLOCKS = (6, 12, 24, 16)


def densenet121_key_order() -> List[Tuple[str, str]]:
    """torchvision densenet121 `features` state-dict keys in registration
    order, (key, kind) with kind in {conv, bn_w, bn_b, bn_rm, bn_rv, nbt}.
    This IS the order KimiaNet's zip-load relies on
    (graph_constructor.py:182-186)."""
    order: List[Tuple[str, str]] = []

    def add_bn(prefix):
        order.extend([
            (f"{prefix}.weight", "bn_w"), (f"{prefix}.bias", "bn_b"),
            (f"{prefix}.running_mean", "bn_rm"),
            (f"{prefix}.running_var", "bn_rv"),
            (f"{prefix}.num_batches_tracked", "nbt"),
        ])

    order.append(("features.conv0.weight", "conv"))
    add_bn("features.norm0")
    for bi, n in enumerate(_DENSENET_BLOCKS, start=1):
        for li in range(1, n + 1):
            p = f"features.denseblock{bi}.denselayer{li}"
            add_bn(f"{p}.norm1")
            order.append((f"{p}.conv1.weight", "conv"))
            add_bn(f"{p}.norm2")
            order.append((f"{p}.conv2.weight", "conv"))
        if bi != len(_DENSENET_BLOCKS):
            p = f"features.transition{bi}"
            add_bn(f"{p}.norm")
            order.append((f"{p}.conv.weight", "conv"))
    add_bn("features.norm5")
    return order


def densenet_torch_to_flax(sd: Dict[str, np.ndarray], prefix: str = "features.") -> Dict:
    """torchvision-named densenet121 features -> featurizers.densenet
    DenseNet121 trees."""
    params: Dict = {}
    stats: Dict = {}

    def conv(flax_path, key):
        _set(params, flax_path + ["kernel"], conv_w(sd[key]))

    def bn(flax_path, key):
        _bn(params, stats, flax_path, sd, key)

    conv(["conv0"], f"{prefix}conv0.weight")
    bn(["norm0"], f"{prefix}norm0")
    for bi, n in enumerate(_DENSENET_BLOCKS, start=1):
        for li in range(1, n + 1):
            t = f"{prefix}denseblock{bi}.denselayer{li}"
            f = [f"denseblock{bi}_layer{li}"]
            bn(f + ["norm1"], f"{t}.norm1")
            conv(f + ["conv1"], f"{t}.conv1.weight")
            bn(f + ["norm2"], f"{t}.norm2")
            conv(f + ["conv2"], f"{t}.conv2.weight")
        if bi != len(_DENSENET_BLOCKS):
            bn([f"transition{bi}", "norm"], f"{prefix}transition{bi}.norm")
            conv([f"transition{bi}", "conv"], f"{prefix}transition{bi}.conv.weight")
    bn(["norm5"], f"{prefix}norm5")
    return {"params": params, "batch_stats": stats}


def load_kimianet(path) -> Dict:
    """Reproduce KimiaNet's zip-ordered load (graph_constructor.py:182-186):
    the checkpoint's values are copied positionally onto the torchvision
    densenet121 key order, then converted to the Flax KimiaNet trees
    (backbone + fc_4 head)."""
    raw = load_torch_state_dict(path)
    raw = strip_dataparallel(raw)
    values = list(raw.values())

    order = densenet121_key_order()
    # the fully_connected wrapper appends fc_4.{weight,bias} after features
    order = order + [("fc_4.weight", "linear"), ("fc_4.bias", "b")]
    if len(values) < len(order):
        raise ValueError(
            f"KimiaNet checkpoint has {len(values)} tensors, need {len(order)}"
        )
    sd = {k: v for (k, kind), v in zip(order, values)}

    trees = densenet_torch_to_flax(sd, prefix="features.")
    params = {"backbone": trees["params"]}
    stats = {"backbone": trees["batch_stats"]}
    params["fc_4"] = {
        "kernel": linear_w(sd["fc_4.weight"]),
        "bias": sd["fc_4.bias"],
    }
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------- #
# EfficientNet (efficientnet_pytorch naming)
# --------------------------------------------------------------------- #
def efficientnet_torch_to_flax(sd: Dict[str, np.ndarray],
                               num_classes: Optional[int] = None) -> Dict:
    """efficientnet_pytorch state dict (_conv_stem/_blocks.N._*/_fc) ->
    featurizers.efficientnet.EfficientNet trees. The reference's fc is
    freshly initialised (from_pretrained(num_classes=1024) re-inits it), so
    an absent/mismatched _fc is simply skipped (pass num_classes to accept
    a matching head)."""
    sd = strip_dataparallel(sd)
    params: Dict = {}
    stats: Dict = {}

    def conv(flax_path, key, bias=False):
        if key + ".weight" in sd:
            _set(params, flax_path + ["kernel"], conv_w(sd[key + ".weight"]))
            if bias and key + ".bias" in sd:
                _set(params, flax_path + ["bias"], sd[key + ".bias"])

    def bn(flax_path, key):
        if key + ".weight" in sd:
            _bn(params, stats, flax_path, sd, key)

    conv(["conv_stem"], "_conv_stem")
    bn(["bn_stem"], "_bn0")
    i = 0
    while f"_blocks.{i}._depthwise_conv.weight" in sd:
        b = [f"block{i}"]
        t = f"_blocks.{i}"
        conv(b + ["expand_conv"], f"{t}._expand_conv")
        bn(b + ["bn0"], f"{t}._bn0")
        conv(b + ["depthwise_conv"], f"{t}._depthwise_conv")
        bn(b + ["bn1"], f"{t}._bn1")
        conv(b + ["se_reduce"], f"{t}._se_reduce", bias=True)
        conv(b + ["se_expand"], f"{t}._se_expand", bias=True)
        conv(b + ["project_conv"], f"{t}._project_conv")
        bn(b + ["bn2"], f"{t}._bn2")
        i += 1
    conv(["conv_head"], "_conv_head")
    bn(["bn_head"], "_bn1")
    if "_fc.weight" in sd and num_classes is not None and int(
            sd["_fc.weight"].shape[0]) == num_classes:
        _set(params, ["fc", "kernel"], linear_w(sd["_fc.weight"]))
        _set(params, ["fc", "bias"], sd["_fc.bias"])
    # a mismatched _fc (e.g. the stock 1000-way ImageNet head vs our
    # 1024-d feature head) is skipped — the reference from_pretrained
    # (num_classes=1024) drops the fc weights too
    return {"params": params, "batch_stats": stats}


def merge_into(variables: Dict, converted: Dict) -> Dict:
    """Overlay converted trees onto freshly-initialised module variables
    (strict=False load): leaves present in `converted` replace the init
    values; everything else (e.g. hovernet fc1, efficientnet fc) stays."""
    import jax

    def overlay(init, conv):
        if not isinstance(conv, dict):
            if np.shape(init) != np.shape(conv):
                raise ValueError(
                    f"shape mismatch {np.shape(init)} vs {np.shape(conv)}"
                )
            # read dtype/shape without materialising the init leaf on the
            # host — np.asarray(init) would fetch every parameter through
            # the TPU relay (and the first D2H degrades later dispatches)
            return np.asarray(conv, dtype=init.dtype)
        out = dict(init)
        for k, v in conv.items():
            if k not in init:
                raise KeyError(f"converted key {k!r} not in module variables")
            out[k] = overlay(init[k], v)
        return out

    out = {}
    for col in variables:
        out[col] = overlay(variables[col], converted.get(col, {}))
    return out
