"""CNN featurizers (Flax, NHWC) + torch checkpoint converters + the
encoder registry the graph-construction pipeline consumes."""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from .densenet import DenseNet121, KimiaNet
from .efficientnet import EfficientNet
from .effnetv2 import EffNetV2
from .hovernet import (
    HoVerNet,
    hovernet_full_apply,
    hovernet_typing_apply,
    node_types_from_tp,
    node_types_on_device,
)
from . import convert

__all__ = [
    "DenseNet121", "KimiaNet", "EfficientNet", "EffNetV2", "HoVerNet",
    "node_types_from_tp", "node_types_on_device", "convert",
    "make_cnn_encoder", "make_hover_typing", "make_hover_typing_device",
]


def _load_hover_variables(hovernet_config: Dict, nr_types: int,
                          with_fc1: bool = True):
    """HoVer-Net init + optional torch checkpoint, bf16 on TPU (the 4 GB
    f32 fc1 kernel crashes this environment's AOT compiler; bf16 is the
    production inference precision anyway — PERF_NOTES.md). with_fc1=False
    skips the fc1 feature head entirely (typing-only use never runs it,
    and its kernel alone is 4.3 GB f32 at init)."""
    import os

    import jax
    import jax.numpy as jnp

    model = HoVerNet(nr_types=nr_types, mode=hovernet_config.get("mode", "fast"),
                     with_fc1=with_fc1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
    )
    ckpt = hovernet_config.get("hovernet_model_path")
    if ckpt and os.path.exists(str(ckpt)):
        sd = convert.load_torch_state_dict(ckpt)
        if not with_fc1:
            # checkpoints saved from the reference's own net carry fc1
            # (it adds fc1 as a plain nn.Linear, net_desc.py:38); the
            # typing-only module has no fc1 to merge it into, and the
            # conversion alone would materialise the 4 GB kernel
            sd = {k: v for k, v in sd.items() if not k.startswith("fc1.")}
        variables = convert.merge_into(
            variables, convert.hovernet_torch_to_flax(sd, nr_types)
        )
    in_dtype = jnp.float32
    if jax.default_backend() == "tpu":
        in_dtype = jnp.bfloat16
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == np.float32 else a,
            variables,
        )
    return model, variables, in_dtype


def make_hover_typing_device(hovernet_config: Dict, nr_types: int = 6):
    """Traceable typing head: imgs [B,256,256,3] f32 -> node types [B]
    int32 (encoder + tp decoder + on-device majority typing). NOT jitted —
    built to compose into a caller's larger program (make_cnn_encoder
    fuses it with the featurizer so one patch upload feeds both CNNs)."""
    model, variables, in_dtype = _load_hover_variables(
        hovernet_config, nr_types, with_fc1=False
    )

    def typing_dev(imgs):
        return hovernet_typing_apply(
            model, variables, imgs.astype(in_dtype), nr_types
        )

    return typing_dev


def make_hover_typing(hovernet_config: Dict, nr_types: int = 6
                      ) -> Callable[[np.ndarray], np.ndarray]:
    """Node-typing stage the reference constructor ALWAYS runs
    (graph_constructor.py:239, types at :131-148): patches [B,256,256,3]
    f32 -> node types [B] int32. One jitted program (encoder + tp decoder +
    on-device majority typing, 2.6 ms/patch on a v5e — the round-2 staged
    recipe's 27.6 ms/patch was relay dispatch overhead, PERF_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    typed = jax.jit(make_hover_typing_device(hovernet_config, nr_types))

    def typing(patches: np.ndarray) -> np.ndarray:
        return np.asarray(typed(jnp.asarray(patches, np.float32)))

    return typing


def _norm_pixels(imgs):
    """uint8 pixels -> f32 [0,1] ON DEVICE (dtype is static at trace time).
    Callers may ship uint8 patch chunks — 4x less host->device traffic
    (the real-file ingestion path measured the f32 upload + host astype as
    its dominant cost, PERF_NOTES 'real-file ingestion') — and the
    conversion fuses into the first conv's input handling."""
    import jax.numpy as jnp

    if imgs.dtype == jnp.uint8:
        return imgs.astype(jnp.float32) / 255.0
    return imgs


def _batch_jit(fn, mesh):
    """jit `fn(imgs) -> pytree of [B, ...]`; with a mesh, shard the batch
    dim over its devices via shard_map (parallel.make_sharded_batch_apply)
    — the reference's DataParallel featurizer axis
    (graph_constructor.py:124,179) as per-device unbatched programs.
    Accepts uint8 or f32 pixels (_norm_pixels runs inside the program)."""
    import jax

    body = lambda imgs: fn(_norm_pixels(imgs))  # noqa: E731
    if mesh is None:
        return jax.jit(body)
    from ...parallel.mesh import make_sharded_batch_apply

    return make_sharded_batch_apply(body, mesh)


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the batch dim up to a multiple by repeating the last row (the
    sharded program needs a divisible global batch; callers slice back)."""
    r = (-arr.shape[0]) % multiple
    if r:
        arr = np.concatenate([arr, np.repeat(arr[-1:], r, axis=0)])
    return arr


def _make_encode(fn, n_dev: int, pad_batch_to: Optional[int]):
    """The numpy boundary shared by every encoder: pad the chunk's batch
    dim, run the jitted/sharded program, slice the pad back off, and
    normalise the output to `(features f32, node_types | None)`.

    pad_batch_to pads every chunk up to the caller's fixed chunk size so
    full AND trailing chunks (and a lone thumbnail) hit ONE compiled XLA
    program — a trailing chunk of every possible size would otherwise
    each compile its own program (minutes per shape on remote-compile
    platforms). The extra rows are repeats of the last patch; their cost
    is milliseconds of MXU time. Padding to a multiple of the mesh size
    (n_dev) keeps the sharded batch divisible either way.

    uint8 chunks pass through UNCONVERTED — the [0,1] scaling happens on
    device (_norm_pixels), so the host never materialises the 4x-bigger
    f32 buffer and the device link carries a quarter of the bytes."""
    def encode(patches: np.ndarray):
        arr = np.asarray(patches)
        if arr.dtype != np.uint8:
            arr = np.asarray(arr, np.float32)
        b = arr.shape[0]
        if pad_batch_to:
            arr = _pad_rows(arr, pad_batch_to)
        arr = _pad_rows(arr, n_dev)
        out = fn(arr)
        feats, types = out if isinstance(out, tuple) else (out, None)
        feats = np.asarray(feats, np.float32)[:b]
        return feats, (None if types is None else np.asarray(types)[:b])

    # the construction/serving pipelines check this marker to keep patch
    # batches uint8 end-to-end (pipeline.patches out_dtype, serve.featurize)
    encode.accepts_uint8 = True
    return encode


def make_cnn_encoder(name: str, config: Dict, hovernet_config: Dict,
                     kimianet_config: Dict, with_typing: bool = False,
                     mesh=None, pad_batch_to: Optional[int] = None):
    """Build a `(patches [B,256,256,3] f32) -> (features, node_types)`
    encoder, mirroring GraphConstructor.__init__'s dispatch
    (/root/reference/construct_graph/graph_constructor.py:237-254).

    'hover'            -> HoVer-Net: features = fc1 bottleneck, node types
                          from the tp map (one jitted program);
    'kimia'            -> KimiaNet 1024-d out_1;
    'efficientnet-b4'  -> EfficientNet-B4 1024-d fc output.

    with_typing: for the kimia/efficientnet encoders, also run the
    HoVer-Net typing head on the SAME decoded patch batch — the reference
    runs both CNNs over one patch stream in a single constructor pass
    (graph_constructor.py:239-254); node_types then comes back non-None.

    mesh: a 1-axis jax.sharding.Mesh scales the patch stream over its
    devices (the reference's `torch.nn.DataParallel` around both CNNs,
    graph_constructor.py:124,179): each chunk is batch-sharded via
    shard_map, weights replicated; chunks whose size does not divide the
    mesh are padded with the last patch and sliced back.

    pad_batch_to: pad every chunk to this fixed batch so all chunk sizes
    share one compiled program (see _make_encode) — pass the pipeline's
    chunk size (hovernet_config batch_size) here.

    Checkpoints are loaded when the corresponding *_model_path exists;
    otherwise the encoder runs from random init (documented degradation —
    this environment ships no pretrained weights).
    """
    import jax
    import jax.numpy as jnp
    import os

    feat_dim = int(config.get("feature_dim", 1024))
    nr_types = int(config.get("n_node_type", 6))
    n_dev = 1 if mesh is None else mesh.devices.size

    if name == "hover":
        model, variables, in_dtype = _load_hover_variables(
            hovernet_config, nr_types
        )
        full = _batch_jit(
            lambda imgs: hovernet_full_apply(
                model, variables, imgs.astype(in_dtype), nr_types
            ),
            mesh,
        )
        return _make_encode(full, n_dev, pad_batch_to)

    # fused two-CNN program: the typing head composes into the SAME jitted
    # call as the featurizer, so each decoded patch chunk is uploaded once
    # and dispatched once (the reference runs both CNNs over one patch
    # stream, graph_constructor.py:239-254; two separate dispatches cost
    # ~40 ms each on this environment's relay)
    typing_dev = None
    if with_typing and name in ("kimia", "efficientnet-b4"):
        typing_dev = make_hover_typing_device(hovernet_config, nr_types)

    def _wrap(feat_part):
        if typing_dev is None:
            fn = _batch_jit(feat_part, mesh)
        else:
            fn = _batch_jit(
                lambda imgs: (feat_part(imgs), typing_dev(imgs)), mesh
            )
        return _make_encode(fn, n_dev, pad_batch_to)

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

            def feat_part(imgs):
                out_1, _ = kimianet_fused_apply(fp, imgs.astype(jnp.bfloat16))
                return out_1.astype(jnp.float32)
        else:
            def feat_part(imgs):
                out_1, _ = model.apply(variables, imgs, train=False)
                return out_1

        return _wrap(feat_part)

    if name == "efficientnet-b4":
        model = EfficientNet.from_name("efficientnet-b4", num_classes=feat_dim)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
        )
        ckpt = config.get("efficientnet_model_path")
        if ckpt and os.path.exists(str(ckpt)):
            sd = convert.load_torch_state_dict(ckpt)
            variables = convert.merge_into(
                variables,
                convert.efficientnet_torch_to_flax(sd, num_classes=feat_dim),
            )

        def feat_part(imgs):
            return model.apply(variables, imgs, train=False)

        return _wrap(feat_part)

    raise NotImplementedError(f"encoder {name!r}")
