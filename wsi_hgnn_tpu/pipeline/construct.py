"""Slide -> graph construction orchestration — the GraphConstructor /
get_graph.py CONSTRUCT loop (/root/reference/construct_graph/
graph_constructor.py:218-303, /root/reference/get_graph.py:252-294).

Per slide: load its patch directory, run the configured encoder (KimiaNet /
EfficientNet-B4 / HoVer-Net — see models.featurizers) for 1024-d features
and PanNuke node types, build the KNN/Pearson typed graph on device, and
write the reference's three outputs per slide under out_dir:
heterogeneous/<slide>.npz, homogeneous/<slide>.npz, node_types/<slide>.npy.

Encoders are pluggable callables `(patches [B,256,256,3] f32 in [0,1] —
or raw uint8 when the encoder sets .accepts_uint8, normalised on device)
-> (features [B, D], node_types [B] | None)`; 'precomputed' reads
<slide>.features.npz from disk for feature-level workflows.
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..data.datasets import save_graph_npz
from ..profiling import GLOBAL_TIMER
from ..graph import build_graph
from .patches import iter_patch_batches, list_patches

EncoderFn = Callable[[np.ndarray], Tuple[np.ndarray, Optional[np.ndarray]]]


def random_encoder(dim: int = 1024, seed: int = 0, n_types: int = 6) -> EncoderFn:
    """Deterministic pseudo-featurizer for tests/benchmarks (hash of pixel
    sums seeds per-patch features)."""
    def fn(patches: np.ndarray):
        b = patches.shape[0]
        feats = np.empty((b, dim), np.float32)
        types = np.empty((b,), np.int32)
        for i in range(b):
            h = int(np.abs(patches[i]).sum() * 1000) % (2**31)
            r = np.random.RandomState((seed + h) % (2**31))
            feats[i] = r.randn(dim)
            types[i] = r.randint(0, n_types)
        return feats, types
    return fn


def encoder_mesh(config: Dict):
    """The device mesh the constructor's CNN encoders scale over — ALL
    local devices by default (the reference's DataParallel axis around both
    featurizer CNNs, graph_constructor.py:124,179; typing is ~95% of
    slide-to-prediction and embarrassingly parallel over patches).

    `dp_devices` in the graph_constructor config bounds it: "all"
    (default), an int device count, or 1/0/null to stay single-device.
    Returns None when one device (or fewer) would be used."""
    dp = config.get("dp_devices", "all")
    if dp in (None, 0, 1, "0", "1"):
        return None
    import jax

    n = jax.local_device_count()
    if dp != "all":
        n = min(int(dp), n)
    if n <= 1:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(n)


def make_encoder(name: str, config: Dict, hovernet_config: Dict, kimianet_config: Dict,
                 with_typing: bool = False, mesh=None,
                 pad_batch_to: Optional[int] = None) -> EncoderFn:
    """Encoder registry mirroring graph_constructor.py:237-254's dispatch on
    `encoder_name` in {'hover', 'kimia', 'efficientnet-b4'}. with_typing
    adds the HoVer-Net typing head to the kimia/efficientnet encoders so
    both CNNs consume ONE decoded patch stream (the reference constructor
    always runs typing, graph_constructor.py:239-246). mesh batch-shards
    every patch chunk over its devices (see encoder_mesh). pad_batch_to
    pads every chunk to one fixed compiled batch (pass the loop's chunk
    size so trailing chunks don't each compile their own XLA program)."""
    if name == "random":
        return random_encoder(config.get("feature_dim", 1024),
                              n_types=config.get("n_node_type", 6))
    if name in ("kimia", "efficientnet-b4", "hover"):
        from ..models.featurizers import make_cnn_encoder

        return make_cnn_encoder(name, config, hovernet_config, kimianet_config,
                                with_typing=with_typing, mesh=mesh,
                                pad_batch_to=pad_batch_to)
    raise NotImplementedError(f"encoder {name!r}")


def build_default_encoder(config: Dict, hovernet_config: Dict,
                          kimianet_config: Dict) -> Optional[EncoderFn]:
    """The encoder a GraphConstructor would build for this config — made
    once per construction RUN, not per slide (a CNN encoder init is heavy:
    HoVer-Net variables + jit setup). 'precomputed' needs no encoder.

    The reference constructor runs HoVer-Net typing whenever no
    node_type_dir is given, whatever the feature encoder
    (graph_constructor.py:239-246); `inline_typing: false` opts out.

    CNN encoders scale over all local devices by default (dp_devices,
    see encoder_mesh)."""
    enc_name = config["encoder_name"]
    if enc_name == "precomputed":
        return None
    want_typing = (
        enc_name in ("kimia", "efficientnet-b4")
        and config.get("node_type_dir") is None
        and bool(config.get("inline_typing", True))
    )
    mesh = encoder_mesh(config) if enc_name != "random" else None
    # the construction loop feeds chunks of hovernet batch_size; padding
    # every chunk to that one shape means each slide's trailing chunk does
    # NOT compile its own XLA program (minutes per shape on remote-compile
    # platforms)
    batch = int(hovernet_config.get("batch_size", 32) or 32)
    return make_encoder(enc_name, config, hovernet_config, kimianet_config,
                        with_typing=want_typing, mesh=mesh,
                        pad_batch_to=batch)


class GraphConstructor:
    """Reference constructor contract: (graph_config, hovernet_config,
    kimianet_config, wsi_patch_dir) -> .construct_graph() ->
    (het_graph, homo_graph, node_types)."""

    def __init__(self, config: Dict, hovernet_config: Dict, kimianet_config: Dict,
                 wsi_data, encoder: Optional[EncoderFn] = None):
        self.config = config
        self.radius = config["radius"]
        self.n_node_type = config.get("n_node_type", 6)
        self.wsi_data = wsi_data

        enc_name = config["encoder_name"]
        node_type_dir = config.get("node_type_dir")
        if encoder is None:
            # both CNNs share one patch stream when typing is inlined —
            # see build_default_encoder (None for 'precomputed')
            encoder = build_default_encoder(
                config, hovernet_config, kimianet_config
            )

        if enc_name == "precomputed":
            z = np.load(str(wsi_data) + ".features.npz")
            self.features = z["features"].astype(np.float32)
            self.node_type = z.get("node_types", np.zeros(len(self.features), np.int32))
        else:
            feats, types = [], []
            paths = list_patches(wsi_data)
            if not paths:
                raise FileNotFoundError(f"no patches under {wsi_data}")
            batch = int(hovernet_config.get("batch_size", 32) or 32)
            # decode_workers: 0 = one prefetch thread; N = N-process decode
            # pool; "auto" = one per host core. The reference reaches the
            # same overlap with DataLoader num_workers
            # (graph_constructor.py:228-235). Stage split (PERF_NOTES
            # "real-file ingestion"): 'construct/decode' = decode work
            # (even when overlapped), 'construct/patch_wait' = time the
            # pipeline actually STALLED for pixels, 'construct/encode' =
            # the device featurizer call.
            workers = self.config.get("decode_workers", 0)
            if workers == "auto":
                # leave one core for the device-dispatch thread — on a
                # 1-core host the pool starves it (measured 22 -> 32 s/slide,
                # PERF_NOTES "real-file ingestion"), so auto degrades to the
                # prefetch thread there
                workers = max((os.cpu_count() or 1) - 1, 0)
            # CNN encoders normalise on device (accepts_uint8): ship raw
            # decoded bytes — no host f32 materialisation, 4x fewer bytes
            # over the device link (PERF_NOTES "real-file ingestion")
            out_dtype = ("uint8"
                         if getattr(encoder, "accepts_uint8", False)
                         else "float32")
            it = iter_patch_batches(
                paths, batch, decode_workers=int(workers or 0),
                timer=GLOBAL_TIMER, timer_stage="construct/decode",
                out_dtype=out_dtype,
            )
            sentinel = object()
            while True:
                # relative names: under construct_all these render nested as
                # construct/featurize/{patch_wait,encode}; the decode work
                # itself is accumulated under the absolute 'construct/decode'
                # (worker-side wall time, overlapped with encode)
                with GLOBAL_TIMER.stage("patch_wait"):
                    pb = next(it, sentinel)
                if pb is sentinel:
                    break
                with GLOBAL_TIMER.stage("encode"):
                    f, t = encoder(pb)
                feats.append(f)
                types.append(
                    t if t is not None else np.zeros(len(f), np.int32)
                )
            self.features = np.concatenate(feats)
            self.node_type = np.concatenate(types)

        # node types may instead come from a previous HoVer-Net pass on disk
        if node_type_dir and enc_name != "hover":
            head, tail = os.path.split(str(wsi_data))
            f = Path(node_type_dir) / (tail + ".npy")
            if f.exists():
                loaded = np.load(f)
                if len(loaded) != len(self.features):
                    raise ValueError(
                        f"stale node_type_dir: {f} holds {len(loaded)} "
                        f"types but {tail!r} has {len(self.features)} "
                        f"patches — re-run the HoVer-Net typing pass"
                    )
                self.node_type = loaded
            else:
                warnings.warn(
                    f"node_type_dir is set but {f} does not exist; "
                    f"node types for {tail!r} stay as computed/zero"
                )
        if (self.n_node_type > 1 and len(self.node_type)
                and not np.any(self.node_type)):
            # a 'heterogeneous' graph whose nodes are all type 0 is
            # degenerate — every hetero model collapses to one bucket
            warnings.warn(
                f"all node types are 0 for {wsi_data!r}: the heterogeneous "
                "graph is degenerate. Provide node_type_dir, enable "
                "inline_typing, or use encoder_name 'hover'."
            )

    def construct_graph(self):
        het, homo = build_graph(
            self.features,
            self.node_type,
            radius=self.radius,
            n_node_types=self.n_node_type,
            # 'exact' (default) | 'approx' (HNSW analog) | 'pallas' (fused)
            knn_impl=self.config.get("knn_impl", "exact"),
        )
        return het, homo, self.node_type


def construct_all(graph_config: Dict, hovernet_config: Dict, kimianet_config: Dict,
                  encoder: Optional[EncoderFn] = None, verbose: bool = True) -> int:
    """The get_graph.py CONSTRUCT loop (get_graph.py:252-294): iterate every
    slide patch dir under patch_path, skip existing outputs, swallow
    per-slide failures (robustness-by-skip, SURVEY.md §5). Returns the
    number of slides written."""
    import glob as _glob

    out_dir = Path(graph_config["out_dir"])
    (out_dir / "heterogeneous").mkdir(parents=True, exist_ok=True)
    (out_dir / "homogeneous").mkdir(parents=True, exist_ok=True)
    (out_dir / "node_types").mkdir(parents=True, exist_ok=True)

    patch_dirs = sorted(_glob.glob(str(graph_config["patch_path"]) + "*/*"))

    def get_encoder():
        # ONE encoder for the whole cohort: CNN variable init + jit setup
        # happen once, every slide reuses the same compiled programs — but
        # built lazily so idempotent re-runs whose outputs all exist skip
        # the (minutes-scale) CNN init entirely
        nonlocal encoder
        if encoder is None:
            with GLOBAL_TIMER.stage("construct/encoder_init"):
                encoder = build_default_encoder(
                    graph_config, hovernet_config, kimianet_config
                )
        return encoder

    written = 0
    for i, wsi_input in enumerate(patch_dirs):
        if verbose:
            print(f"Processing {i + 1} / {len(patch_dirs)}")
        try:
            tail = os.path.split(wsi_input)[1]
            het_file = out_dir / "heterogeneous" / (tail + ".npz")
            homo_file = out_dir / "homogeneous" / (tail + ".npz")
            if het_file.exists() or homo_file.exists():
                continue
            with GLOBAL_TIMER.stage("construct/featurize"):
                gc = GraphConstructor(
                    graph_config, hovernet_config, kimianet_config, wsi_input,
                    encoder=get_encoder(),
                )
            with GLOBAL_TIMER.stage("construct/graph"):
                het, homo, node_type = gc.construct_graph()

            def dump(g, path, is_hetero):
                n = int(np.asarray(g.node_mask).sum())
                e = int(np.asarray(g.edge_mask).sum())
                save_graph_npz(
                    path,
                    np.asarray(g.feat)[:n],
                    np.asarray(g.src)[:e], np.asarray(g.dst)[:e],
                    node_type=np.asarray(g.node_type)[:n],
                    esign=np.asarray(g.esign)[:e],
                    sim=np.asarray(g.sim)[:e],
                    n_node_types=g.n_node_types,
                    is_hetero=is_hetero,
                )
            with GLOBAL_TIMER.stage("construct/save"):
                dump(het, het_file, True)
                dump(homo, homo_file, False)
                np.save(out_dir / "node_types" / (tail + ".npy"), node_type)
            written += 1
            if verbose:
                print(f"Graphs saved for {tail}")
        except (ValueError, KeyError, IndexError, RuntimeError, FileNotFoundError) as e:
            if verbose:
                print(f"Failed to construct graph ({e}), moves to next WSI image")
    return written
