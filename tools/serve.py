"""Serve a trained slide-graph model over HTTP with micro-batching.

  python tools/serve.py -config configs/BRCA/HEAT2_kimia_v2.yml \
      --port 8080 --radius 9 --warmup 2048

Requests: POST /predict with an .npz body holding `features` [N, D] f32
(+ optional `node_types` [N] int — the per-slide arrays
pipeline.construct writes); response JSON {"probs": [...], "pred": k}.
GET /healthz, GET /stats. See wsi_hgnn_tpu/serve.py.

--pixels-config <GraphConstruction YAML> additionally serves RAW PATCH
PIXELS (`pixels` [N, 256, 256, 3] uint8 in the npz): the full
slide-to-prediction pipeline — fused two-CNN featurize (KimiaNet +
HoVer-Net typing) -> on-device graph -> logits — as a service.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-config", required=True, help="training YAML (GNN + checkpoint sections)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--radius", type=int, default=9,
                   help="KNN radius of the construction operating point")
    p.add_argument("--n-node-types", type=int, default=6)
    p.add_argument("--knn-impl", default="exact",
                   choices=["exact", "approx", "pallas"])
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--warmup", type=int, default=0,
                   help="pre-compile for this many patches per slide (0 = off)")
    p.add_argument("--lattice-mem-budget", type=int, default=2 << 30,
                   help="bytes allowed for the lattice path's [B, N*k, N] "
                        "one-hot working set; oversized groups fall back "
                        "to the TypedGraph program")
    p.add_argument("--pixels-config", default="",
                   help="GraphConstruction YAML (hovernet_config/"
                        "kimianet_config sections); enables POST `pixels` "
                        "requests through the fused two-CNN encoder")
    p.add_argument("--max-body-mb", type=float, default=512.0,
                   help="request body cap (a 2048-patch uint8 pixel slide "
                        "is ~402 MB)")
    args = p.parse_args()

    from wsi_hgnn_tpu.config import load_config
    from wsi_hgnn_tpu.serve import BatchingServer, SlidePredictor
    from wsi_hgnn_tpu.utils import enable_compile_cache, ensure_backend

    ensure_backend()
    enable_compile_cache()

    config = load_config(args.config)
    predictor = SlidePredictor(
        config, radius=args.radius, n_node_types=args.n_node_types,
        knn_impl=args.knn_impl, lattice_mem_budget=args.lattice_mem_budget,
    )
    if args.pixels_config:
        gcfg = load_config(args.pixels_config)
        predictor.enable_pixels(
            gcfg.get("hovernet_config", {}), gcfg.get("kimianet_config", {})
        )
    if args.warmup:
        # the batcher pads every device call to max_batch, so one warmup
        # shape per bucket covers all group sizes. Warm BEFORE binding the
        # server socket: clients probing during a minutes-long cold
        # compile should get connection-refused (a clean not-ready
        # signal), not an accepted connection that never answers.
        print(f"warmup: compiling batch {args.max_batch} x "
              f"{args.warmup}-patch slides ...")
        predictor.warmup(args.warmup, batch_sizes=(args.max_batch,))
        if predictor.pixels_enabled:
            print("warmup: compiling the two-CNN encoder chunk ...")
            predictor.warmup_pixels(args.warmup,
                                    batch_sizes=(args.max_batch,))
    server = BatchingServer(
        predictor, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        max_body_mb=args.max_body_mb,
    )
    print(f"serving model v{predictor.version} on "
          f"http://{args.host}:{server.port}  (POST /predict"
          + (", pixels enabled)" if predictor.pixels_enabled else ")"))
    server.serve_forever()


if __name__ == "__main__":
    main()
