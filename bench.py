"""Benchmark: slides/sec SLIDE-TO-PREDICTION on TPU.

Pipeline benchmarked (the BASELINE.json north star; the COMPLETE
constructor pipeline, including BOTH CNNs the reference always runs —
HoVer-Net nucleus typing at graph_constructor.py:239/:131-148 and the
KimiaNet feature encoder at :124-197): per slide, 2048 patches of
256x256x3 pixels -> HoVer-Net (encoder + tp decoder + on-device majority
typing, bf16) per-patch node types AND KimiaNet (DenseNet121, bf16) 1024-d
features over the SAME patch stream -> on-device exact KNN (radius 9,
fused Pallas kernel) -> Pearson edge typing -> heterogeneous lattice graph
-> HEATNet4 forward -> logits. A cohort of slides streams through ONE
compiled program (`lax.scan`), patch pixels synthesised on device so the
relay link is not part of the number.

Measurement notes for this environment: the TPU is reached through a relay
whose `block_until_ready` acknowledges dispatch, not completion, and whose
per-call synchronous round-trip (~40 ms) dwarfs compute. Streaming K slides
inside one program and fetching one reduced scalar AFTER the scan both
amortises the round-trip and forces true completion (PERF_NOTES.md).

Baseline: the PRIMARY vs_baseline figure normalises the reference to the
GPU it actually ran on — its CNN FLOPs at a V100's published eager-torch
efficiency band (2.5 TF/s effective; assumptions in the JSON) plus the
host graph build measured here. A faithful same-host CPU-torch
re-enactment of the reference's dominant stages — the HoVer-Net typing
pass (preact-ResNet50 encoder + tp decoder, graph_constructor.py:239/
:131-148), torchvision densenet121 inference (the reference wraps it as
KimiaNet and runs it per patch batch, graph_constructor.py:167-197) and
the host-side graph build (nmslib HNSW + a Python loop of scipy pearsonr
per edge, :256-303) — is also measured and reported as the secondary
vs_baseline_cpu_reenactment key (torch here is CPU-only, which makes that
number ~30x more flattering than the GPU-normalised one).

Task-metric caveat: AUC parity on the real TCGA/Camelyon16 cohorts cannot
be measured in this environment (no WSI data); the speedups here compare
pipeline throughput at equal work, with model/converter fidelity pinned by
the golden tests (README "Reproducing the reference's numbers").

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "slides/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_PATCHES = 2048      # patches per slide (typical WSI bag size, SURVEY §5)
PATCH = 256           # reference feeds Resize(256) RGB (data.py:52)
FEAT_DIM = 1024       # KimiaNet feature width
RADIUS = 9            # BRCA/COAD graph-construction operating point
N_TYPES = 6           # PanNuke node types
HIDDEN = 256
CHUNK = 128           # patches per CNN step (batch-ladder winner: 2.30 ms/patch
                      # typing at b128 vs 2.64 at b16/2.69 at b32; b256 OOMs on
                      # d0's full-res activations — PERF_NOTES round-4 ladder)
COHORT_STEPS = 4      # slides streamed per compiled call
# DenseNet121 ~2.83 GMACs at 224^2 (torchvision), scaled to 256^2, x2 FLOPs,
# + HoVer-Net encoder + tp decoder 213 GF/patch (XLA-counted; the encoder
# has no downsampling stem so d0 runs at full 256^2 — tools/bench_hovernet)
FLOPS_PER_SLIDE = (2 * 2.83e9 * (PATCH / 224.0) ** 2 + 213e9) * N_PATCHES
V5E_BF16_PEAK = 197e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_tpu() -> "tuple[float, int]":
    """Returns (slides/sec across the cohort, device count used)."""
    import jax

    from wsi_hgnn_tpu.utils import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the ~4 min cold kernel build
    import jax.numpy as jnp

    from wsi_hgnn_tpu.models.featurizers.densenet import (
        KimiaNet,
        fuse_kimianet,
        kimianet_fused_apply,
    )
    from wsi_hgnn_tpu.models.featurizers.hovernet import (
        HoVerNet,
        hovernet_typing_apply,
    )
    from wsi_hgnn_tpu.models.lattice import HEATNet4Lattice, build_lattice_device

    kimia = KimiaNet()
    # fused Pallas featurizer path (BN folded, dense layers as single
    # kernels, in-place concat), equality-tested against the flax path.
    # The lattice aggregation stays on the shared one-hot GEMM — the
    # measured winner over both the Pallas segment kernel and the O(E)
    # sorted-segment formulation — while the typed projections run the
    # ragged grouped GEMM (PERF_NOTES round-3 ladders)
    heat = HEATNet4Lattice(
        in_dim=FEAT_DIM, hidden_dim=HIDDEN, out_dim=2, n_layers=2, n_heads=4,
        n_node_types=N_TYPES, dropout=0.0,
    )

    rng = np.random.RandomState(0)
    p0 = jnp.asarray(rng.rand(1, PATCH, PATCH, 3).astype(np.float32))
    kvars = jax.jit(kimia.init)(jax.random.PRNGKey(0), p0)
    # bf16 inference weights: the production path for CNN featurizers on TPU
    # (f32 measured 1.55x slower, PERF_NOTES.md)
    fp = fuse_kimianet(kvars, dtype=jnp.bfloat16)

    # HoVer-Net typing — the second CNN the reference constructor ALWAYS
    # runs (graph_constructor.py:239): encoder + tp decoder + on-device
    # majority typing, bf16, one program (2.65 ms/patch, PERF_NOTES.md)
    hover = HoVerNet(nr_types=N_TYPES, mode="fast")
    hvars = jax.jit(hover.init)(jax.random.PRNGKey(2), p0)
    hvars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        hvars,
    )

    feats0 = jnp.asarray(rng.randn(1, N_PATCHES, FEAT_DIM).astype(np.float32))
    nty0 = jnp.asarray(rng.randint(0, N_TYPES, (1, N_PATCHES)).astype(np.int32))
    mask0 = jnp.ones((1, N_PATCHES), bool)
    g0 = build_lattice_device(feats0, nty0, mask0, RADIUS, N_TYPES)
    hparams = jax.jit(heat.init)(jax.random.PRNGKey(1), g0)

    n_chunks = N_PATCHES // CHUNK
    # the slide cohort is DATA-PARALLEL over every local device (the
    # reference's DataParallel featurizer axis, graph_constructor.py:
    # 124,179): each device runs its own slide stream under shard_map —
    # per-device unbatched programs, so the Pallas KNN/featurizer kernels
    # need no SPMD partitioning rules. One real chip in this environment
    # (n_dev=1 degrades to the single-chip program + a trivial psum); on a
    # v5e-8 the same code runs 8 slide streams.
    from jax.sharding import Mesh, PartitionSpec as P

    # single-process bench: the mesh and the pool sizing must agree, so both
    # derive from the same jax.devices() list (a multi-host run would need
    # per-host pool shards via make_array_from_process_local_data instead)
    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.asarray(devices), ("data",))
    log(f"slide cohort sharded over all {n_dev} local device(s)")

    # pixel pool: patch pixels pregenerated ON DEVICE, outside the timed
    # region (RNG synthesis measured ~1.1 ms per chunk — a benchmark
    # artifact, not pipeline work; a pool read is ~15 us). Chunks rotate
    # through the pool so no stage is loop-invariant; each device gets its
    # own pool slice.
    POOL = 4
    pool = jax.random.uniform(
        jax.random.PRNGKey(7), (n_dev, POOL, CHUNK, PATCH, PATCH, 3),
        jnp.bfloat16,
    )

    def make_cohort(featurize):
        def per_device(pool, fp, hvars, hparams):
            def slide(carry, i):
                def cnn_chunk(_, j):
                    patches = jax.lax.dynamic_index_in_dim(
                        pool, (i.astype(jnp.int32) + j) % POOL, keepdims=False
                    )
                    # both CNNs consume the SAME decoded patch chunk, as the
                    # reference's single constructor pass does (:239-254)
                    types = hovernet_typing_apply(hover, hvars, patches, N_TYPES)
                    return None, (featurize(fp, patches), types)
                _, (feats, types) = jax.lax.scan(
                    cnn_chunk, None, jnp.arange(n_chunks)
                )
                feats = feats.reshape(1, N_PATCHES, FEAT_DIM).astype(jnp.float32)
                ntypes = types.reshape(1, N_PATCHES)
                mask = jnp.ones((1, N_PATCHES), bool)
                g = build_lattice_device(
                    feats, ntypes, mask, RADIUS, N_TYPES, knn_impl="pallas"
                )
                logits = heat.apply(hparams, g, train=False)
                return carry + logits.sum() + feats.sum() * 1e-6, None
            s, _ = jax.lax.scan(
                slide, jnp.float32(0), jnp.arange(COHORT_STEPS, dtype=jnp.float32)
            )
            return s

        def body(pool_all, fp, hvars, hparams):
            # local shard: [1, POOL, CHUNK, H, W, 3] — one stream per device
            s = per_device(pool_all[0], fp, hvars, hparams)
            return jax.lax.psum(s, "data")

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the replication checker requires
        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data"), P(), P(), P()), out_specs=P(),
            check_vma=False,
        ))

    t0 = time.perf_counter()
    try:
        cohort = make_cohort(lambda fp, p: kimianet_fused_apply(fp, p)[0])
        s = cohort(pool, fp, hvars, hparams)
        _ = np.asarray(s)
    except Exception as e:  # safety net: fall back to the flax featurizer
        log(f"fused Pallas featurizer path failed ({type(e).__name__}: {e}); "
            "falling back to the flax path")
        fp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            kvars,
        )
        cohort = make_cohort(
            lambda v, p: kimia.apply(v, p, train=False)[0].astype(jnp.bfloat16)
        )
        s = cohort(pool, fp, hvars, hparams)
        _ = np.asarray(s)
    log(f"device: {jax.devices()[0]}; compile+first run "
        f"{time.perf_counter() - t0:.1f}s, checksum {float(s):.4f}")

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        s = cohort(pool, fp, hvars, hparams)
        _ = np.asarray(s)
    dt = time.perf_counter() - t0
    n_slides = reps * COHORT_STEPS * n_dev
    sps = n_slides / dt
    mfu = FLOPS_PER_SLIDE * sps / (V5E_BF16_PEAK * n_dev)
    log(
        f"tpu slide-to-prediction: {n_slides} slides in {dt:.3f}s on "
        f"{n_dev} device(s) -> {sps:.3f} slides/s "
        f"({dt / n_slides * 1e3:.1f} ms/slide); "
        f"CNN-dominated (typing is ~95% of it), est. MFU {mfu * 100:.1f}% "
        f"({FLOPS_PER_SLIDE / 1e12:.1f} TFLOP/slide vs {V5E_BF16_PEAK / 1e12:.0f} TF/s bf16 peak per chip)"
    )
    return sps, n_dev


def _torch_hovernet_typing_seconds_per_slide() -> float:
    """Torch CPU re-enactment of the reference's typing pass: preact-
    ResNet50 encoder + conv_bot + the tp valid-conv decoder branch
    (net_desc.py:32-92 'fast' mode) — the same conv structure, so the same
    CPU timing the reference's constructor would see per patch."""
    import torch
    from torch import nn as tnn

    class PreactUnit(tnn.Module):
        def __init__(self, cin, c1, c2, c3, stride, preact):
            super().__init__()
            self.preact = (tnn.Sequential(tnn.BatchNorm2d(cin), tnn.ReLU())
                           if preact else tnn.Identity())
            self.body = tnn.Sequential(
                tnn.Conv2d(cin, c1, 1, bias=False),
                tnn.BatchNorm2d(c1), tnn.ReLU(),
                tnn.Conv2d(c1, c2, 3, stride=stride, padding=1, bias=False),
                tnn.BatchNorm2d(c2), tnn.ReLU(),
                tnn.Conv2d(c2, c3, 1, bias=False),
            )

        def forward(self, x):
            return self.body(self.preact(x))

    class ResBlock(tnn.Module):
        def __init__(self, cin, chs, count, stride):
            super().__init__()
            c1, c2, c3 = chs
            self.short = tnn.Conv2d(cin, c3, 1, stride=stride, bias=False)
            self.units = tnn.ModuleList(
                [PreactUnit(cin if i == 0 else c3, c1, c2, c3,
                            stride if i == 0 else 1, preact=i != 0)
                 for i in range(count)]
            )
            self.bna = tnn.Sequential(tnn.BatchNorm2d(c3), tnn.ReLU())

        def forward(self, x):
            s = self.short(x)
            for u in self.units:
                s = u(x) + s
                x = s
            return self.bna(s)

    def dense_block(cin, units):
        return [tnn.Sequential(
            tnn.BatchNorm2d(cin + 32 * i), tnn.ReLU(),
            tnn.Conv2d(cin + 32 * i, 128, 1, bias=False),
            tnn.BatchNorm2d(128), tnn.ReLU(),
            tnn.Conv2d(128, 32, 3, bias=False, groups=4),
        ) for i in range(units)]

    class TpDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.u3a = tnn.Conv2d(1024, 256, 3, bias=False)
            self.u3d = tnn.ModuleList(dense_block(256, 8))
            self.u3f = tnn.Conv2d(256 + 8 * 32, 512, 1, bias=False)
            self.u2a = tnn.Conv2d(512, 128, 3, bias=False)
            self.u2d = tnn.ModuleList(dense_block(128, 4))
            self.u2f = tnn.Conv2d(128 + 4 * 32, 256, 1, bias=False)
            self.u1a = tnn.Conv2d(256, 64, 3, padding=1, bias=False)
            self.out = tnn.Sequential(
                tnn.BatchNorm2d(64), tnn.ReLU(), tnn.Conv2d(64, 6, 1)
            )

        @staticmethod
        def crop(x, target):
            d = (x.shape[-1] - target) // 2
            return x[..., d : d + target, d : d + target]

        @staticmethod
        def up2(x):
            return torch.nn.functional.interpolate(x, scale_factor=2,
                                                   mode="nearest")

        def run_dense(self, x, units):
            for u in units:
                y = u(x)
                x = torch.cat([self.crop(x, y.shape[-1]), y], 1)
            return x

        def forward(self, d0, d1, d2, d3):
            u = self.u3f(self.run_dense(self.u3a(self.up2(d3) + d2), self.u3d))
            u = self.u2f(self.run_dense(
                self.u2a(self.up2(u) + self.crop(d1, u.shape[-1] * 2)), self.u2d
            ))
            u = self.u1a(self.up2(u) + self.crop(d0, u.shape[-1] * 2))
            return self.out(u)

    class HoverTyping(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 64, 7, padding=3, bias=False),
                tnn.BatchNorm2d(64), tnn.ReLU(),
            )
            self.d0 = ResBlock(64, (64, 64, 256), 3, 1)
            self.d1 = ResBlock(256, (128, 128, 512), 4, 2)
            self.d2 = ResBlock(512, (256, 256, 1024), 6, 2)
            self.d3 = ResBlock(1024, (512, 512, 2048), 3, 2)
            self.bot = tnn.Conv2d(2048, 1024, 1, bias=False)
            self.dec = TpDecoder()

        def forward(self, x):
            d0 = self.d0(self.stem(x))
            d1 = self.d1(d0)
            d2 = self.d2(d1)
            d3 = self.bot(self.d3(d2))
            tp = self.dec(d0, d1, d2, d3)
            return tp.argmax(1)

    import numpy as _np

    model = HoverTyping()
    model.eval()
    batch = torch.from_numpy(
        _np.random.RandomState(2).rand(1, 3, PATCH, PATCH).astype(_np.float32)
    )
    with torch.no_grad():
        model(batch)  # warm-up
        t0 = time.perf_counter()
        model(batch)
        per_patch = time.perf_counter() - t0
    return per_patch * N_PATCHES


def measure_reference_baseline() -> "tuple[float, float]":
    """Same-host re-enactment of the reference's dominant stages: HoVer-Net
    typing + torchvision densenet121 per-patch inference (CPU torch — the
    reference used a GPU; see module docstring) + host KNN/Pearson build.
    Returns (slides/sec, host graph-build seconds/slide)."""
    rng = np.random.RandomState(1)

    t_hover = 0.0
    try:
        t_hover = _torch_hovernet_typing_seconds_per_slide()
        log(f"reference typing re-enactment (torch CPU): "
            f"{t_hover / N_PATCHES * 1e3:.0f} ms/patch -> {t_hover:.1f}s/slide")
    except Exception as e:
        log(f"torch hovernet baseline unavailable ({e})")

    # featurizer stage: a torch DenseNet121 with torchvision's architecture
    # (blocks 6/12/24/16, growth 32 — torchvision isn't installed here, so
    # the equivalent stack is built inline; identical conv/BN structure =
    # identical timing)
    t_feat = 0.0
    try:
        import torch
        from torch import nn as tnn

        def dense_layer(cin):
            return tnn.Sequential(
                tnn.BatchNorm2d(cin), tnn.ReLU(),
                tnn.Conv2d(cin, 128, 1, bias=False),
                tnn.BatchNorm2d(128), tnn.ReLU(),
                tnn.Conv2d(128, 32, 3, padding=1, bias=False),
            )

        class TorchDenseNet121(tnn.Module):
            def __init__(self):
                super().__init__()
                self.stem = tnn.Sequential(
                    tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
                    tnn.BatchNorm2d(64), tnn.ReLU(),
                    tnn.MaxPool2d(3, stride=2, padding=1),
                )
                self.layers = tnn.ModuleList()
                self.trans = tnn.ModuleList()
                ch = 64
                for bi, n in enumerate((6, 12, 24, 16)):
                    block = tnn.ModuleList()
                    for _ in range(n):
                        block.append(dense_layer(ch))
                        ch += 32
                    self.layers.append(block)
                    if bi != 3:
                        self.trans.append(tnn.Sequential(
                            tnn.BatchNorm2d(ch), tnn.ReLU(),
                            tnn.Conv2d(ch, ch // 2, 1, bias=False),
                            tnn.AvgPool2d(2),
                        ))
                        ch //= 2

            def forward(self, x):
                x = self.stem(x)
                for bi, block in enumerate(self.layers):
                    for layer in block:
                        x = torch.cat([x, layer(x)], 1)
                    if bi != 3:
                        x = self.trans[bi](x)
                return x

        model = TorchDenseNet121()
        model.eval()
        batch = torch.from_numpy(
            rng.rand(2, 3, PATCH, PATCH).astype(np.float32)
        )
        with torch.no_grad():
            model(batch)  # warm-up
            t0 = time.perf_counter()
            model(batch)
            per_patch = (time.perf_counter() - t0) / 2
        t_feat = per_patch * N_PATCHES
        log(f"reference featurizer re-enactment (torch CPU): "
            f"{per_patch * 1e3:.0f} ms/patch -> {t_feat:.1f}s/slide "
            f"(reference used a GPU: ~3-4 s/slide on V100-class hardware)")
    except Exception as e:  # torch missing: baseline = graph build only
        log(f"torch featurizer baseline unavailable ({e})")

    # graph-build stage (HNSW analog + per-edge scipy pearson loop)
    feats = rng.randn(N_PATCHES, FEAT_DIM).astype(np.float32)
    t0 = time.perf_counter()
    try:
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=RADIUS, algorithm="auto").fit(feats)
        _, idx = nn.kneighbors(feats)
        idx = idx[:, 1:]
    except ImportError:
        d2 = ((feats[:, None, :8] - feats[None, :, :8]) ** 2).sum(-1)
        idx = np.argsort(d2, 1)[:, 1 : RADIUS]
    t_knn = time.perf_counter() - t0

    from scipy.stats import pearsonr

    src = np.repeat(np.arange(N_PATCHES), RADIUS - 1)
    dst = idx.reshape(-1)
    n_edges = len(src)
    sample = min(2000, n_edges)
    t0 = time.perf_counter()
    for i in range(sample):
        pearsonr(feats[src[i]], feats[dst[i]])
    t_pearson = (time.perf_counter() - t0) * (n_edges / sample)

    per_slide = t_hover + t_feat + t_knn + t_pearson
    log(
        f"reference baseline (this host): typing {t_hover:.1f}s + featurizer "
        f"{t_feat:.1f}s + knn {t_knn:.2f}s + pearson {t_pearson:.2f}s = "
        f"{per_slide:.1f}s/slide"
    )
    return 1.0 / per_slide, t_knn + t_pearson


def _wait_for_backend(attempts: int = 5, delay_s: float = 60.0,
                      probe_timeout_s: float = 300.0) -> None:
    """Block until the TPU relay answers; raise only after `attempts`
    failures so a transient relay outage doesn't void the benchmark run.
    The relay fails two ways — a fast UNAVAILABLE error, or an indefinite
    hang inside backend init — so each probe runs in a SUBPROCESS with a
    timeout (an in-process jax.devices() hang cannot be interrupted)."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {probe_timeout_s:.0f}s"
        if i == attempts - 1:
            raise RuntimeError(
                f"TPU backend unavailable after {attempts} probes: {err}"
            )
        log(f"backend unavailable ({err}); retry {i + 1}/{attempts} "
            f"in {delay_s:.0f}s")
        time.sleep(delay_s)


# The reference ran its CNNs on a GPU; this host's torch is CPU-only, so the
# raw vs_baseline overstates the gap. Two self-contained GPU normalisations
# (VERDICT r3 weak #2) bracket the honest figure:
#   floor: reference CNN work at 100% of V100 fp16 tensor-core peak
#          (125 TF/s) — a physics bound no eager fp32 torch pipeline reaches
#          (the reference never casts to half, graph_constructor.py).
#   est.:  reference CNN work at 2.5 TF/s effective — 16% of V100 fp32 peak
#          (15.7 TF/s), the efficiency band published eager-torch
#          DenseNet121 V100 fp32 inference throughput lands in (NVIDIA
#          DeepLearningExamples order ~400-600 img/s at 5.7 GF/img);
#          HoVer-Net is the same dense-conv mix.
# Host graph build (nmslib HNSW + per-edge scipy pearson) is measured here
# and added to both (it is host-side in the reference regardless of GPU).
V100_FP16_PEAK = 125e12
V100_FP32_EFFECTIVE = 2.5e12


def main():
    _wait_for_backend()
    # TPU first: the baseline's torch/OpenMP threadpools spin-wait and can
    # starve the host dispatch loop on low-core machines if run before
    value, n_dev = measure_tpu()
    baseline, t_graph_host = measure_reference_baseline()
    ref_gpu_floor_s = FLOPS_PER_SLIDE / V100_FP16_PEAK + t_graph_host
    ref_gpu_est_s = FLOPS_PER_SLIDE / V100_FP32_EFFECTIVE + t_graph_host
    log(
        f"GPU-normalised reference estimate: {ref_gpu_est_s:.1f}s/slide at "
        f"2.5 TF/s effective V100 fp32 (-> {value * ref_gpu_est_s:.1f}x); "
        f"floor {ref_gpu_floor_s:.1f}s/slide at 100% V100 fp16 peak "
        f"(-> {value * ref_gpu_floor_s:.1f}x)"
    )
    print(
        json.dumps(
            {
                "metric": "slides/sec slide-to-prediction incl. HoVer-Net "
                          "typing (2048 patches x 256x256x3 pixels -> "
                          "HoVer-Net nucleus typing bf16 + KimiaNet "
                          "DenseNet121 bf16 features, one patch stream -> "
                          "exact-KNN radius-9 Pearson graph (fused Pallas "
                          "kernel) -> HEATNet4 logits; slide cohort "
                          "data-parallel over all local devices)",
                "value": round(value, 3),
                "unit": "slides/sec",
                # PRIMARY comparison (VERDICT r4 item 6): the reference
                # normalised to the GPU it actually ran on (V100 at the
                # published eager-torch efficiency band) — the defensible
                # figure. The same-host CPU-torch re-enactment is ~30x more
                # flattering and is kept as a secondary key only.
                "vs_baseline": round(value * ref_gpu_est_s, 1),
                "devices": n_dev,
                "vs_baseline_cpu_reenactment": round(value / baseline, 2),
                "vs_baseline_gpu_floor": round(value * ref_gpu_floor_s, 1),
                "gpu_baseline_assumption": (
                    "reference CNNs (451 TFLOP/slide) at 2.5 TF/s effective "
                    "on V100 — 16% of fp32 peak, the band published "
                    "eager-torch DenseNet121 inference lands in; floor = "
                    "100% of V100 fp16 peak (125 TF/s), unreachable for "
                    "the reference's eager fp32 torch; + host graph build "
                    "measured on this host"
                ),
                "scaling_evidence": (
                    "one chip here; tests/test_scaling_cert.py certifies "
                    "per-device FLOPs constant at mesh 1/2/4/8 (XLA cost "
                    "analysis) with all-reduce as the only collective, so "
                    "slides/sec scales with chip count on a v5e-8"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
