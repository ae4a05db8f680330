"""CNN featurizers (Flax, NHWC) + torch checkpoint converters + the
encoder registry the graph-construction pipeline consumes."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .densenet import DenseNet121, KimiaNet
from .efficientnet import EfficientNet
from .effnetv2 import EffNetV2
from .hovernet import HoVerNet, node_types_from_tp
from . import convert

__all__ = [
    "DenseNet121", "KimiaNet", "EfficientNet", "EffNetV2", "HoVerNet",
    "node_types_from_tp", "convert", "make_cnn_encoder",
]


def make_cnn_encoder(name: str, config: Dict, hovernet_config: Dict,
                     kimianet_config: Dict):
    """Build an `(patches [B,256,256,3] f32) -> (features, node_types)`
    encoder, mirroring GraphConstructor.__init__'s dispatch
    (/root/reference/construct_graph/graph_constructor.py:237-254).

    'hover'            -> HoVer-Net: features = fc1 bottleneck, node types
                          from the tp map;
    'kimia'            -> KimiaNet 1024-d out_1 (node types from a separate
                          HoVer-Net pass or node_type_dir);
    'efficientnet-b4'  -> EfficientNet-B4 1024-d fc output.

    Checkpoints are loaded when the corresponding *_model_path exists;
    otherwise the encoder runs from random init (documented degradation —
    this environment ships no pretrained weights).
    """
    import jax
    import jax.numpy as jnp
    import os

    feat_dim = int(config.get("feature_dim", 1024))
    nr_types = int(config.get("n_node_type", 6))

    if name == "hover":
        model = HoVerNet(nr_types=nr_types, mode=hovernet_config.get("mode", "fast"))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
        )
        ckpt = hovernet_config.get("hovernet_model_path")
        if ckpt and os.path.exists(str(ckpt)):
            sd = convert.load_torch_state_dict(ckpt)
            variables = convert.merge_into(
                variables, convert.hovernet_torch_to_flax(sd, nr_types)
            )

        # stage-wise jits: one monolithic HoVer-Net XLA program is large
        # enough to crash TPU AOT compilers, and so is fc1's 4 GB f32
        # kernel ([32*32*1024, 1024]) even alone — on TPU the inference
        # variables run bf16 (2 GB compiles fine; it is the production
        # precision anyway), and encoder/decoder/feature-head compile as
        # separate programs
        run_vars = variables
        in_dtype = jnp.float32
        if jax.default_backend() == "tpu":
            run_vars = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if getattr(a, "dtype", None) == np.float32 else a,
                variables,
            )
            in_dtype = jnp.bfloat16

        enc = jax.jit(
            lambda imgs: model.apply(run_vars, imgs, method="encode")
        )
        dec_tp = jax.jit(
            lambda d: model.apply(run_vars, "tp", d, method="decode_branch")
        )
        if jax.default_backend() == "tpu":
            # even a lone program holding fc1's [1M, 1024] kernel crashes
            # this AOT compiler; drive the contraction as a host loop of
            # 64 MB-weight matmul programs (one compiled program total)
            fc_k = np.asarray(variables["params"]["fc1"]["kernel"])
            fc_b = jnp.asarray(
                np.asarray(variables["params"]["fc1"]["bias"]), jnp.float32
            )
            n_chunks = 32
            cs = fc_k.shape[0] // n_chunks
            w_chunks = [
                jnp.asarray(fc_k[i * cs:(i + 1) * cs], in_dtype)
                for i in range(n_chunks)
            ]
            mm = jax.jit(
                lambda xr, w, i: jax.lax.dynamic_index_in_dim(
                    xr, i, axis=1, keepdims=False) @ w
            )

            def feat_head(d3):
                xr = jnp.reshape(d3, (d3.shape[0], n_chunks, cs))
                acc = None
                for i, w in enumerate(w_chunks):
                    part = mm(xr, w, i)
                    acc = part if acc is None else acc + part
                return acc.astype(jnp.float32) + fc_b
        else:
            feat_head = jax.jit(
                lambda d3: model.apply(run_vars, d3, method="feature_head")
            )

        def encode(patches: np.ndarray):
            d = enc(jnp.asarray(patches, in_dtype))
            tp = dec_tp(d)
            feats = feat_head(d[3])
            return (np.asarray(feats, np.float32),
                    node_types_from_tp(np.asarray(tp, np.float32), nr_types))

        return encode

    if name == "kimia":
        model = KimiaNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
        )
        ckpt = kimianet_config.get("kimianet_model_path")
        if ckpt and os.path.exists(str(ckpt)):
            variables = convert.merge_into(variables, convert.load_kimianet(ckpt))

        if jax.default_backend() == "tpu":
            # fused Pallas inference path (BN folded, one kernel per dense
            # layer — see ops/pallas_densenet.py), ~5x the flax throughput;
            # equality-tested in tests/test_pallas_densenet.py
            from .densenet import fuse_kimianet, kimianet_fused_apply

            fp = fuse_kimianet(variables, dtype=jnp.bfloat16)

            @jax.jit
            def fwd(imgs):
                out_1, _ = kimianet_fused_apply(fp, imgs.astype(jnp.bfloat16))
                return out_1.astype(jnp.float32)
        else:
            @jax.jit
            def fwd(imgs):
                out_1, _ = model.apply(variables, imgs, train=False)
                return out_1

        def encode(patches: np.ndarray):
            return np.asarray(fwd(jnp.asarray(patches))), None

        return encode

    if name == "efficientnet-b4":
        model = EfficientNet.from_name("efficientnet-b4", num_classes=feat_dim)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
        )
        ckpt = config.get("efficientnet_model_path")
        if ckpt and os.path.exists(str(ckpt)):
            sd = convert.load_torch_state_dict(ckpt)
            variables = convert.merge_into(
                variables, convert.efficientnet_torch_to_flax(sd)
            )

        @jax.jit
        def fwd(imgs):
            return model.apply(variables, imgs, train=False)

        def encode(patches: np.ndarray):
            return np.asarray(fwd(jnp.asarray(patches))), None

        return encode

    raise NotImplementedError(f"encoder {name!r}")
