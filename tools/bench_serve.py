"""Serving throughput: concurrent HTTP clients against the micro-batching
server (wsi_hgnn_tpu/serve.py) — the reproducible form of the PERF_NOTES
serving measurement.

Spins up a SlidePredictor (a synthetic HEAT4 checkpoint at the BRCA
operating point unless -config/--checkpoint point at a real one), runs the
batcher on the MAIN thread (this environment's relay aborts on compiles
from other threads — CLAUDE.md), and fires `--requests` slide requests
from `--clients` concurrent HTTP clients. Prints one summary line with
slides/s, latency percentiles, and the server's batching stats.

  python tools/bench_serve.py                    # synthetic checkpoint
  python tools/bench_serve.py --requests 64 --clients 16 --max-wait-ms 20
  python tools/bench_serve.py -config configs/BRCA/HEAT2_kimia_v2.yml
  python tools/bench_serve.py --inproc            # no HTTP: device ceiling

Prints the serving-overhead SPLIT alongside throughput: per-request npz
decode, per-batch host packing, and per-batch device time (predictor
.timing), so "device-bound on a production host" is a measurement —
everything outside decode+pack+device is transport/queueing. --inproc
bypasses HTTP entirely and drives predict_many with PRE-DECODED feature
groups: the server-less ceiling the HTTP numbers are judged against.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SYNTH_CFG = """
name: BenchServe
GNN:
  name: "HEAT4"
  n_node_types: 6
  num_layers: 2
  in_dim: {dim}
  hidden_dim: 512
  out_dim: 2
  n_heads: 4
  feat_drop: 0.2
  graph_pooling_type: mean
checkpoint:
  path: "{ckpt}"
"""


def synth_predictor(dim: int, radius: int):
    """HEAT4 h512 predictor over a freshly-initialised synthetic
    checkpoint (weights don't affect throughput)."""
    import jax

    from wsi_hgnn_tpu.config import loads_config, parse_gnn_model
    from wsi_hgnn_tpu.graph.build import build_batch_device
    from wsi_hgnn_tpu.serve import SlidePredictor
    from wsi_hgnn_tpu.train.checkpoint import CheckpointManager

    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    cfg = loads_config(SYNTH_CFG.format(dim=dim, ckpt=os.path.join(tmp, "ckpt")))
    model, _ = parse_gnn_model(cfg["GNN"])
    rng = np.random.RandomState(0)
    g = build_batch_device(
        rng.randn(1, 64, dim).astype(np.float32),
        rng.randint(0, 6, (1, 64)).astype(np.int32),
        np.ones((1, 64), bool), radius, 6,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    cm = CheckpointManager(os.path.join(tmp, "ckpt"))
    cm.write_new_version(
        cfg, {"params": variables["params"], "batch_stats": {}}, {"Epoch": 1}
    )
    return SlidePredictor(cfg, radius=radius, n_node_types=6)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-config", default="", help="training YAML (else synthetic)")
    p.add_argument("--checkpoint", default="", help="override checkpoint dir")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--patches", type=int, default=2048)
    p.add_argument("--feat-dim", type=int, default=1024)
    p.add_argument("--radius", type=int, default=9)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=20.0)
    p.add_argument("--inproc", action="store_true",
                   help="skip HTTP: drive predict_many directly with "
                        "pre-decoded features (device+pack ceiling)")
    p.add_argument("--pixels", action="store_true",
                   help="serve RAW PATCH PIXELS: requests carry [N,256,256,3]"
                        " uint8 and the server runs the fused two-CNN "
                        "encoder (KimiaNet + HoVer-Net typing) before the "
                        "graph — the benchmarked slide-to-prediction "
                        "pipeline as a service")
    p.add_argument("--pixel-chunk", type=int, default=128,
                   help="encoder chunk (the b128 ladder winner)")
    args = p.parse_args()

    from wsi_hgnn_tpu.serve import BatchingServer, SlidePredictor
    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    if args.config:
        from wsi_hgnn_tpu.config import load_config

        predictor = SlidePredictor(
            load_config(args.config), radius=args.radius,
            checkpoint_path=args.checkpoint or None,
        )
    else:
        predictor = synth_predictor(args.feat_dim, args.radius)

    if args.pixels:
        predictor.enable_pixels({"batch_size": args.pixel_chunk}, {})

    if args.inproc:
        print(f"warmup: batch {args.max_batch} x {args.patches} patches ...",
              flush=True)
        t0 = time.perf_counter()
        if args.pixels:
            predictor.warmup_pixels(args.patches,
                                    batch_sizes=(args.max_batch,))
        else:
            predictor.warmup(args.patches, batch_sizes=(args.max_batch,))
        print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)
        rng = np.random.RandomState(1)
        if args.pixels:
            groups = [
                [rng.randint(0, 255, (args.patches, 256, 256, 3)
                             ).astype(np.uint8)
                 for _ in range(args.max_batch)]
                for _ in range(2)
            ]
            run = predictor.predict_many_pixels
        else:
            groups = [
                [(rng.randn(args.patches, predictor.in_dim
                            ).astype(np.float32),
                  rng.randint(0, 6, args.patches).astype(np.int32))
                 for _ in range(args.max_batch)]
                for _ in range(2)
            ]
            run = predictor.predict_many
        predictor.reset_timing()
        n_batches = max(args.requests // args.max_batch, 1)
        t0 = time.perf_counter()
        for i in range(n_batches):
            run(groups[i % len(groups)])
        wall_s = time.perf_counter() - t0
        tm = predictor.timing
        n = n_batches * args.max_batch
        warm = max(tm["calls"] - tm["cold_calls"], 1)
        feat_note = (
            f", featurize {tm['featurize_ms'] / max(n, 1):.1f} ms/slide "
            f"({tm['featurize_ms'] / 1e3 / wall_s * 100:.0f}% of wall)"
            if args.pixels else ""
        )
        print(
            f"inproc (no HTTP{', pixels-in' if args.pixels else ', pre-decoded'}): "
            f"{n} slides of {args.patches} x "
            f"{'256x256x3 px' if args.pixels else str(predictor.in_dim) + '-d'} "
            f"in {wall_s:.1f}s -> {n / wall_s:.2f} "
            f"slides/s; per WARM device batch of {args.max_batch}: pack "
            f"{tm['pack_ms'] / tm['calls']:.1f} ms, device "
            f"{tm['device_ms'] / warm:.1f} ms "
            f"({tm['device_ms'] / max(tm['pack_ms'] + tm['device_ms'], 1e-9) * 100:.0f}% device)"
            f"{feat_note}; "
            f"{tm['cold_calls']} cold call(s) booked "
            f"{tm['compile_ms'] / 1e3:.1f}s compile"
        )
        return

    server = BatchingServer(
        predictor, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        max_body_mb=1024.0 if args.pixels else 256.0,
    )
    print(f"warmup: batch {args.max_batch} x {args.patches} patches ...",
          flush=True)
    t0 = time.perf_counter()
    server.warmup(args.patches, pixels=args.pixels)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)
    predictor.reset_timing()

    # one request body per client, rotated (synthesis off the clock);
    # pixel bodies are ~0.2 MB/patch — cap the pool at 2
    rng = np.random.RandomState(1)
    bodies = []
    for _ in range(min(args.clients, 2 if args.pixels else 4)):
        buf = io.BytesIO()
        if args.pixels:
            np.savez(buf, pixels=rng.randint(
                0, 255, (args.patches, 256, 256, 3)).astype(np.uint8))
        else:
            np.savez(
                buf,
                features=rng.randn(
                    args.patches, predictor.in_dim).astype(np.float32),
                node_types=rng.randint(0, 6, args.patches).astype(np.int32),
            )
        bodies.append(buf.getvalue())

    latencies: list[float] = []
    lat_lock = threading.Lock()
    wall = {}

    def client(i: int, n: int):
        for j in range(n):
            body = bodies[(i + j) % len(bodies)]
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/predict", data=body,
                headers={"Content-Type": "application/octet-stream"},
            )
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                json.loads(r.read())
            with lat_lock:
                latencies.append(time.perf_counter() - t0)

    per_client = args.requests // args.clients
    extra = args.requests - per_client * args.clients

    def drive():
        threads = [
            threading.Thread(target=client, args=(i, per_client + (1 if i < extra else 0)))
            for i in range(args.clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall["s"] = time.perf_counter() - t0
        server.stop()

    driver = threading.Thread(target=drive, daemon=True)
    driver.start()
    server.serve_forever()  # batcher (device work) on the MAIN thread
    driver.join(timeout=30)

    lats = np.asarray(sorted(latencies))
    stats = dict(server.stats)
    print(
        f"{len(lats)} requests of {args.patches} x {predictor.in_dim}-d "
        f"features from {args.clients} clients: "
        f"{len(lats) / wall['s']:.2f} slides/s end-to-end "
        f"(wall {wall['s']:.1f}s; p50 {np.percentile(lats, 50):.2f}s, "
        f"p95 {np.percentile(lats, 95):.2f}s); "
        f"{stats['batches']} device batches, max group "
        f"{stats['batched_requests_max']}, errors {stats['errors']}"
    )
    # overhead split: where the wall time went. decode is per-request
    # handler work; pack/device/compile/lock-wait are per device batch
    # (predictor.timing — cold per-shape compiles are booked separately so
    # one multi-second XLA compile can't read as steady-state device time);
    # the remainder of the wall clock is transport + micro-batch queueing.
    tm = predictor.timing
    dec = stats["decode_ms_sum"] / max(stats["requests"], 1)
    pack_s = tm["pack_ms"] / 1e3
    dev_s = tm["device_ms"] / 1e3
    comp_s = tm["compile_ms"] / 1e3
    feat_s = tm["featurize_ms"] / 1e3
    other = wall["s"] - pack_s - dev_s - comp_s - feat_s
    warm = max(tm["calls"] - tm["cold_calls"], 1)
    feat_note = (
        f"featurize {feat_s:.1f}s ({feat_s / wall['s'] * 100:.0f}%, "
        f"{tm['featurize_chunks']} chunks) + " if feat_s else ""
    )
    print(
        f"split: decode {dec:.1f} ms/req; per batch pack "
        f"{tm['pack_ms'] / max(tm['calls'], 1):.1f} ms, warm device "
        f"{tm['device_ms'] / warm:.1f} ms, lock wait "
        f"{tm['lock_wait_ms'] / max(tm['calls'], 1):.1f} ms; wall = "
        f"{feat_note}device "
        f"{dev_s:.1f}s ({dev_s / wall['s'] * 100:.0f}%) + compile {comp_s:.1f}s "
        f"({tm['cold_calls']} cold calls) + pack {pack_s:.1f}s "
        f"({pack_s / wall['s'] * 100:.0f}%) + transport/queueing "
        f"{other:.1f}s ({other / wall['s'] * 100:.0f}%)"
    )


if __name__ == "__main__":
    main()
