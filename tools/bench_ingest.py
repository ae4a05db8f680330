"""Real-file ingestion benchmark: the get_graph.py CONSTRUCT path timed on
JPEGs read from DISK (VERDICT r4 item 1 — the one stage of the north-star
slide-to-prediction metric bench.py synthesises away).

Writes a synthetic JPEG cohort (realistic texture: smooth low-frequency
field + pixel noise, so libjpeg decode cost matches tissue patches), then
runs the ACTUAL `pipeline.construct.construct_all` loop — decode ->
fused two-CNN encoder (KimiaNet features + HoVer-Net typing over one patch
stream) -> KNN/Pearson graph -> npz save — once per `--decode-workers`
value, printing the GLOBAL_TIMER stage split each time:

  construct/decode       worker-side decode seconds (even when overlapped)
  .../featurize/patch_wait  time the pipeline STALLED waiting for pixels
  .../featurize/encode      device featurizer calls (incl. dispatch)
  construct/graph        on-device KNN + Pearson + assembly
  construct/save         npz writes

decode-bound <=> patch_wait is a large share of featurize; the fix is the
`decode_workers` graph-constructor knob (pipeline/patches.py). Matches the
reference's disk-read loop at graph_constructor.py:228-235 / data.py:42-64.

  python tools/bench_ingest.py --slides 2 --patches 512 --batch 128 \
      --decode-workers 0,2,4            # TPU, full two-CNN encoder
  python tools/bench_ingest.py --encoder random --slides 2 --patches 64 \
      --batch 16 --decode-workers 0,2   # host-only smoke
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def write_cohort(root: Path, n_slides: int, n_patches: int, size: int,
                 quality: int, seed: int = 0) -> Path:
    """<root>/patches/<class>/<slide>/<i>_0.jpeg — the tiler's on-disk
    layout construct_all globs (patch_path + '*/*')."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    base = root / "patches" / "tumor"
    for s in range(n_slides):
        d = base / f"TCGA-{s:02d}-0000-01Z-00-DX1"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_patches):
            # smooth field (tissue-like gradients) + noise: JPEG files of
            # realistic size/entropy (~15-40 KB at q90), unlike pure noise
            low = rng.rand(8, 8, 3)
            lowimg = np.asarray(
                Image.fromarray((low * 255).astype(np.uint8)).resize(
                    (size, size), Image.Resampling.BILINEAR
                ),
                np.float32,
            )
            noise = rng.randn(size, size, 3) * 12.0
            arr = np.clip(lowimg + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}_0.jpeg", quality=quality)
    return root / "patches"


def run_once(patch_path: Path, out_dir: Path, encoder, graph_config,
             hovernet_config, n_slides: int, n_patches: int):
    from wsi_hgnn_tpu.pipeline.construct import construct_all
    from wsi_hgnn_tpu.profiling import GLOBAL_TIMER

    GLOBAL_TIMER.reset()
    cfg = dict(graph_config)
    cfg["patch_path"] = str(patch_path) + "/"
    cfg["out_dir"] = str(out_dir)
    t0 = time.perf_counter()
    written = construct_all(cfg, hovernet_config, {}, encoder=encoder,
                            verbose=False)
    wall = time.perf_counter() - t0
    assert written == n_slides, f"wrote {written}/{n_slides} slides"
    t = GLOBAL_TIMER.totals
    split = {
        "wall_s_per_slide": wall / n_slides,
        "decode_s_per_slide": t.get("construct/decode", 0.0) / n_slides,
        "patch_wait_s_per_slide":
            t.get("construct/featurize/patch_wait", 0.0) / n_slides,
        "encode_s_per_slide":
            t.get("construct/featurize/encode", 0.0) / n_slides,
        "graph_s_per_slide": t.get("construct/graph", 0.0) / n_slides,
        "save_s_per_slide": t.get("construct/save", 0.0) / n_slides,
        "decode_ms_per_patch":
            t.get("construct/decode", 0.0) / (n_slides * n_patches) * 1e3,
        "slides_per_s": n_slides / wall,
    }
    log(GLOBAL_TIMER.report())
    return split


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=2)
    ap.add_argument("--patches", type=int, default=512)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--batch", type=int, default=128,
                    help="encoder chunk size (hovernet_config.batch_size)")
    ap.add_argument("--decode-workers", type=str, default="0,2",
                    help="comma ladder of decode_workers values")
    ap.add_argument("--encoder", type=str, default="kimia",
                    choices=["kimia", "random"],
                    help="kimia = fused two-CNN production encoder (TPU); "
                         "random = host-only pseudo-featurizer smoke")
    ap.add_argument("--radius", type=int, default=9)
    ap.add_argument("--keep", action="store_true",
                    help="keep the cohort dir (printed) for reuse")
    ap.add_argument("--root", type=str, default="",
                    help="reuse an existing cohort dir from --keep")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (host-only smoke; the env's "
                         "sitecustomize pre-registers TPU, so this must go "
                         "through jax.config, not env vars)")
    args = ap.parse_args()

    if args.cpu or args.encoder == "random":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.root:
        root = Path(args.root)
        patch_path = root / "patches"
    else:
        root = Path(tempfile.mkdtemp(prefix="ingest_bench_"))
        log(f"writing cohort: {args.slides} slides x {args.patches} "
            f"patches of {args.size}^2 q{args.quality} JPEG under {root}")
        t0 = time.perf_counter()
        patch_path = write_cohort(root, args.slides, args.patches,
                                  args.size, args.quality)
        log(f"cohort written in {time.perf_counter() - t0:.1f}s")

    graph_config = {
        "encoder_name": args.encoder,
        "feature_dim": 1024,
        "n_node_type": 6,
        "radius": args.radius,
        "knn_impl": "pallas" if args.encoder == "kimia" else "exact",
        "dataset_name": "ingest_bench",
    }
    hovernet_config = {"batch_size": args.batch}

    # ONE encoder across the ladder: the CNN init + jit setup (minutes on
    # the relay) must not be re-paid per decode_workers value
    from wsi_hgnn_tpu.pipeline.construct import build_default_encoder
    from wsi_hgnn_tpu.utils import enable_compile_cache

    if args.encoder == "kimia":
        enable_compile_cache()
    t0 = time.perf_counter()
    encoder = build_default_encoder(graph_config, hovernet_config, {})
    # warm the compiled chunk program outside the timed region
    if encoder is not None:
        encoder(np.zeros((args.batch, args.size, args.size, 3), np.float32))
    log(f"encoder init + warm compile: {time.perf_counter() - t0:.1f}s")

    # warm the decode pool's forkserver outside the timed region (its
    # server pays sitecustomize's import once per process, ~5 s here;
    # subsequent pools fork from it in ~50 ms)
    from wsi_hgnn_tpu.pipeline.patches import iter_patch_batches, list_patches
    t0 = time.perf_counter()
    warm_paths = list_patches(next(iter(
        sorted((patch_path / "tumor").iterdir())
    )))[:2]
    list(iter_patch_batches(warm_paths, 2, decode_workers=1))
    log(f"decode-pool forkserver warm: {time.perf_counter() - t0:.1f}s")

    results = {}
    for w in [int(x) for x in args.decode_workers.split(",")]:
        out_dir = root / f"graphs_w{w}"
        if out_dir.exists():
            shutil.rmtree(out_dir)
        cfg = dict(graph_config, decode_workers=w)
        log(f"--- decode_workers={w} ---")
        split = run_once(patch_path, out_dir, encoder, cfg,
                         hovernet_config, args.slides, args.patches)
        results[str(w)] = split
        log(json.dumps({"decode_workers": w, **{
            k: round(v, 4) for k, v in split.items()}}))

    print(json.dumps({
        "bench": "real-file ingestion (JPEG on disk -> construct_all)",
        "slides": args.slides, "patches_per_slide": args.patches,
        "encoder": args.encoder, "chunk": args.batch,
        "results": {k: {kk: round(vv, 4) for kk, vv in v.items()}
                    for k, v in results.items()},
    }))
    if args.keep or args.root:
        log(f"cohort kept at {root}")
    else:
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
