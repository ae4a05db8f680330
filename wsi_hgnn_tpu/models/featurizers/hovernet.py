"""HoVer-Net in Flax (NHWC) — nucleus typing + per-patch features.

Re-implementation of /root/reference/models/hovernet/net_desc.py:10-151 and
net_utils.py:36-291: a pre-activation ResNet50 encoder (d0-d3) with TF
'same' padding quirks, three valid-convolution decoder branches (tp/np/hv)
built from dense blocks, and the repo's custom `fc1 = Linear(32*32*1024,
1024)` bottleneck feature (net_desc.py:38,:142-144) that the graph
constructor uses as the per-patch embedding.

Inference contract (run_desc.py:171-202 + graph_constructor.py:131-148):
  * tp branch -> softmax -> argmax type map;
  * per-patch node type = bincount-argmax over NONZERO type pixels, 0 when
    no nucleus pixel exists;
  * features = fc1 of the 32x32x1024 bottleneck.

'fast' mode (the PanNuke checkpoint's mode) uses ksize 3 decoders and a
same-padded stem; 'original' uses ksize 5 valid stem. Valid-conv crop
arithmetic follows net_desc.py:120-126 (d0 cropped by 92/184, d1 by 36/72).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def tf_same_pad(x: jax.Array, ksize: int, stride: int) -> jax.Array:
    """TFSamepaddingLayer (net_utils.py:36-64), NHWC."""
    size = x.shape[1]
    if size % stride == 0:
        pad = max(ksize - stride, 0)
    else:
        pad = max(ksize - (size % stride), 0)
    lo = pad // 2
    hi = pad - lo
    return jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))


def crop_op(x: jax.Array, cropping) -> jax.Array:
    """Centre crop by a subtracted amount (hovernet/utils.py:11-28), NHWC."""
    ct = cropping[0] // 2
    cb = cropping[0] - ct
    cl = cropping[1] // 2
    cr = cropping[1] - cl
    return x[:, ct : x.shape[1] - cb, cl : x.shape[2] - cr, :]


def crop_to_shape(x: jax.Array, y: jax.Array) -> jax.Array:
    return crop_op(x, (x.shape[1] - y.shape[1], x.shape[2] - y.shape[2]))


class BNRelu(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """Pre-act bottleneck stack (net_utils.py:152-263); spatial dims are
    preserved (1x1 valid + same-padded 3x3 + 1x1 valid), stride applied in
    the first unit + shortcut."""

    unit_ch: Tuple[int, int, int]
    unit_count: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3 = self.unit_ch
        in_ch = x.shape[-1]
        if in_ch != c3 or self.stride != 1:
            shortcut = nn.Conv(
                c3, (1, 1), strides=self.stride, padding="VALID", use_bias=False,
                name="shortcut",
            )(x)
        else:
            shortcut = x

        prev = x
        for idx in range(self.unit_count):
            stride = self.stride if idx == 0 else 1
            h = prev
            if idx != 0:  # first unit skips preact (net_utils.py:220-222)
                h = BNRelu(name=f"u{idx}_preact")(h, train)
            h = nn.Conv(c1, (1, 1), padding="VALID", use_bias=False,
                        name=f"u{idx}_conv1")(h)
            h = BNRelu(name=f"u{idx}_bn1")(h, train)
            h = tf_same_pad(h, 3, stride)
            h = nn.Conv(c2, (3, 3), strides=stride, padding="VALID",
                        use_bias=False, name=f"u{idx}_conv2")(h)
            h = BNRelu(name=f"u{idx}_bn2")(h, train)
            h = nn.Conv(c3, (1, 1), padding="VALID", use_bias=False,
                        name=f"u{idx}_conv3")(h)
            prev = h + shortcut
            shortcut = prev
        return BNRelu(name="blk_bna")(prev, train)


class DenseBlock(nn.Module):
    """Valid-conv dense block (net_utils.py:68-148): each unit shrinks the
    spatial dims by ksize-1; the running concat is centre-cropped to match."""

    unit_ch: Tuple[int, int]
    ksize: int
    unit_count: int
    split: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        prev = x
        for idx in range(self.unit_count):
            h = BNRelu(name=f"u{idx}_preact")(prev, train)
            h = nn.Conv(self.unit_ch[0], (1, 1), padding="VALID", use_bias=False,
                        name=f"u{idx}_conv1")(h)
            h = BNRelu(name=f"u{idx}_bn1")(h, train)
            h = nn.Conv(
                self.unit_ch[1], (self.ksize, self.ksize), padding="VALID",
                use_bias=False, feature_group_count=self.split,
                name=f"u{idx}_conv2",
            )(h)
            prev = jnp.concatenate([crop_to_shape(prev, h), h], axis=-1)
        return BNRelu(name="blk_bna")(prev, train)


class DecoderBranch(nn.Module):
    """One tp/np/hv decoder (net_desc.py:40-71)."""

    out_ch: int
    ksize: int

    @nn.compact
    def __call__(self, d, train: bool = False):
        d0, d1, d2, d3 = d
        k = self.ksize

        def upsample2x(x):
            # FixedUnpooling (net_utils.py:267-291): nearest 2x
            b, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
            return x.reshape(b, h * 2, w * 2, c)

        u3 = upsample2x(d3) + d2
        u3 = nn.Conv(256, (k, k), padding="VALID", use_bias=False, name="u3_conva")(u3)
        u3 = DenseBlock((128, 32), k, 8, name="u3_dense")(u3, train)
        u3 = nn.Conv(512, (1, 1), padding="VALID", use_bias=False, name="u3_convf")(u3)

        u2 = upsample2x(u3) + d1
        u2 = nn.Conv(128, (k, k), padding="VALID", use_bias=False, name="u2_conva")(u2)
        u2 = DenseBlock((128, 32), k, 4, name="u2_dense")(u2, train)
        u2 = nn.Conv(256, (1, 1), padding="VALID", use_bias=False, name="u2_convf")(u2)

        u1 = upsample2x(u2) + d0
        u1 = tf_same_pad(u1, k, 1)
        u1 = nn.Conv(64, (k, k), padding="VALID", use_bias=False, name="u1_conva")(u1)

        u0 = BNRelu(name="u0_bn")(u1, train)
        u0 = nn.Conv(self.out_ch, (1, 1), padding="VALID", use_bias=True, name="u0_conv")(u0)
        return u0


class ChunkedDense(nn.Module):
    """nn.Dense with the contraction scanned over K-chunks. Param tree and
    math are identical to nn.Dense (kernel [K, F] lecun-normal + bias); the
    chunking keeps the XLA program small — HoVer-Net's fc1 kernel is
    [32*32*1024, 1024] (1B params) and a single dot over K=1M operands can
    crash/stall TPU AOT compilers."""

    features: int
    chunks: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        chunks = self.chunks if k % self.chunks == 0 else 1
        xr = x.reshape(x.shape[0], chunks, k // chunks)
        # checkpoint-loaded variables carry host numpy leaves by design
        # (see CLAUDE.md); jnp.asarray so the scan can index them traced
        wr = jnp.asarray(kernel).reshape(chunks, k // chunks, self.features)

        out_dtype = jnp.result_type(x.dtype, wr.dtype)  # nn.Dense promotion

        def body(acc, i):
            xc = jax.lax.dynamic_index_in_dim(xr, i, axis=1, keepdims=False)
            wc = jax.lax.dynamic_index_in_dim(wr, i, axis=0, keepdims=False)
            return acc + (xc @ wc).astype(out_dtype), None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((x.shape[0], self.features), out_dtype),
            jnp.arange(chunks),
        )
        return acc + bias


class HoVerNet(nn.Module):
    """net_desc.py:10-144. Input NHWC float; mode 'fast' expects 256x256.

    setup-style so the stages are separately jittable (`encode`,
    `decode_branch`, `feature_head`): a single monolithic XLA program for
    the whole net is large enough to crash/stall AOT compilers on some
    TPU toolchains, while the stages each compile in ~2 min. `__call__`
    composes the stages and is unchanged (activation-parity tested)."""

    nr_types: Optional[int] = 6
    mode: str = "fast"
    feat_dim: int = 1024
    # the custom fc1 bottleneck holds a [32*32*1024, feat_dim] kernel
    # (4.3 GB f32); typing-only uses (encoder + tp decoder) never touch it,
    # so with_fc1=False skips allocating it entirely
    with_fc1: bool = True

    def setup(self):
        assert self.mode in ("original", "fast")
        self.conv0 = nn.Conv(64, (7, 7), padding="VALID", use_bias=False)
        self.bn0 = BNRelu()
        self.d0 = ResidualBlock((64, 64, 256), 3, stride=1)
        self.d1 = ResidualBlock((128, 128, 512), 4, stride=2)
        self.d2 = ResidualBlock((256, 256, 1024), 6, stride=2)
        self.d3 = ResidualBlock((512, 512, 2048), 3, stride=2)
        self.conv_bot = nn.Conv(1024, (1, 1), padding="VALID", use_bias=False)
        ksize = 5 if self.mode == "original" else 3
        branches = ["np", "hv"] if self.nr_types is None else ["tp", "np", "hv"]
        for name in branches:
            ch = 2 if name != "tp" else self.nr_types
            setattr(self, f"decoder_{name}", DecoderBranch(ch, ksize))
        self.branches = branches
        if self.with_fc1:
            self.fc1 = ChunkedDense(self.feat_dim)

    def encode(self, imgs: jax.Array, train: bool = False):
        """Stem + pre-act ResNet50 + bottleneck conv -> cropped skips
        (d0, d1, d2, d3) as the decoders consume them."""
        x = imgs
        if self.mode == "fast":
            x = tf_same_pad(x, 7, 1)
        x = self.bn0(self.conv0(x), train)
        d0 = self.d0(x, train)
        d1 = self.d1(d0, train)
        d2 = self.d2(d1, train)
        d3 = self.conv_bot(self.d3(d2, train))
        if self.mode == "original":
            d0 = crop_op(d0, (184, 184))
            d1 = crop_op(d1, (72, 72))
        else:
            d0 = crop_op(d0, (92, 92))
            d1 = crop_op(d1, (36, 36))
        return d0, d1, d2, d3

    def decode_branch(self, name: str, d, train: bool = False):
        return getattr(self, f"decoder_{name}")(d, train)

    def feature_head(self, d3: jax.Array):
        """The repo's custom fc1 bottleneck feature (net_desc.py:38,142-144)."""
        return self.fc1(d3.reshape(d3.shape[0], -1))

    def __call__(self, imgs: jax.Array, train: bool = False):
        d = self.encode(imgs, train)
        out = {name: self.decode_branch(name, d, train)
               for name in self.branches}
        feats = self.feature_head(d[3]) if self.with_fc1 else None
        return out, feats


def node_types_from_tp(tp_map: np.ndarray, nr_types: int = 6) -> np.ndarray:
    """Per-patch node type: majority NONZERO class of the argmax type map,
    0 when no nucleus pixel (graph_constructor.py:140-147)."""
    types = np.asarray(tp_map).argmax(axis=-1)  # [B, H, W]
    out = np.zeros(types.shape[0], np.int32)
    for i, t in enumerate(types):
        nz = t[t != 0]
        out[i] = 0 if nz.size == 0 else int(np.bincount(nz, minlength=nr_types).argmax())
    return out


def node_types_on_device(tp_logits: jax.Array, nr_types: int = 6) -> jax.Array:
    """Jittable twin of node_types_from_tp: [B, H, W, T] type logits ->
    [B] int32 node types, entirely on device. Ties break to the lowest
    class index, exactly like np.bincount(...).argmax(). Keeping this on
    device means only [B] int32 ever crosses the host link instead of the
    full [B, H, W, T] map (~40 MB per 64-patch chunk)."""
    t = jnp.argmax(tp_logits, axis=-1)                       # [B, H, W]
    counts = jax.nn.one_hot(t, nr_types, dtype=jnp.int32).sum(axis=(1, 2))
    nz = counts[:, 1:]                                       # exclude class 0
    has_nucleus = nz.sum(axis=-1) > 0
    return jnp.where(has_nucleus, jnp.argmax(nz, axis=-1) + 1, 0).astype(jnp.int32)


def _constructor_orientation(imgs: jax.Array) -> jax.Array:
    """The reference constructor feeds HoVer-Net the spatially TRANSPOSED
    patch: PatchData yields NCHW (data.py:53 ToTensor), Hovernet_infer
    permutes (0,3,2,1) -> [B,W,H,C] (graph_constructor.py:135) and
    infer_step permutes (0,3,1,2) -> [B,C,W,H] (run_desc.py:176-177) —
    the composition swaps H and W, and the net is not
    transpose-equivariant. KimiaNet/EfficientNet consume the UNtransposed
    batch (their permute is commented out, graph_constructor.py:193,:211).
    Reproduced here so node types and hover fc1 features match
    reference-produced artifacts."""
    return jnp.swapaxes(imgs, 1, 2)


def hovernet_typing_apply(model: "HoVerNet", variables, imgs: jax.Array,
                          nr_types: int = 6) -> jax.Array:
    """One jittable program: pixels [B,256,256,3] -> node types [B] int32
    (encoder + tp decoder + on-device majority typing). This is the typing
    stage the reference constructor ALWAYS runs
    (graph_constructor.py:239,:131-148) regardless of the feature encoder,
    including its H/W transpose (_constructor_orientation).
    The np/hv segmentation branches are skipped — typing only consumes tp.
    The encoder stays on XLA's convs: a fused Pallas pre-act-bottleneck d0
    kernel was built and measured neutral-to-slower in-program (PERF_NOTES
    round-3 d0 ladder) and dropped."""
    d = model.apply(variables, _constructor_orientation(imgs),
                    method="encode")
    tp = model.apply(variables, "tp", d, method="decode_branch")
    return node_types_on_device(tp, nr_types)


def hovernet_full_apply(model: "HoVerNet", variables, imgs: jax.Array,
                        nr_types: int = 6):
    """One jittable program for the 'hover' encoder: pixels -> (features
    [B,1024] f32, node types [B] int32), on the constructor's transposed
    orientation (_constructor_orientation). fc1 runs as ChunkedDense inside
    the program (a lone monolithic dot over its [1M, 1024] kernel stalls
    this environment's AOT compiler; the 32-chunk lax.scan compiles fine)."""
    d = model.apply(variables, _constructor_orientation(imgs),
                    method="encode")
    tp = model.apply(variables, "tp", d, method="decode_branch")
    feats = model.apply(variables, d[3], method="feature_head")
    return feats.astype(jnp.float32), node_types_on_device(tp, nr_types)
