"""Serving layer (wsi_hgnn_tpu/serve.py): checkpoint-loading predictor +
micro-batching HTTP server. The reference has no serving path (inference
is the evaluator's per-slide loop, eval_homo_graph.py:61-96); these tests
pin the deployed-inference contract: padding invariance across request
grouping, wire format, and that concurrent requests coalesce into fewer
device calls."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from wsi_hgnn_tpu.config import loads_config, parse_gnn_model
from wsi_hgnn_tpu.serve import BatchingServer, SlidePredictor
from wsi_hgnn_tpu.train.checkpoint import CheckpointManager

CFG_TMPL = """
name: ServeTest
GNN:
  name: "{gnn}"
  n_node_types: 6
  num_layers: 2
  in_dim: 16
  hidden_dim: 32
  out_dim: 2
  n_heads: 2
  num_heads: 2
  feat_drop: 0.0
  graph_pooling_type: mean
checkpoint:
  path: "{ckpt}"
"""

RADIUS = 4


def make_predictor(tmp_path, gnn="GCN"):
    import jax

    from wsi_hgnn_tpu.graph.build import build_batch_device
    from wsi_hgnn_tpu.graph import to_homogeneous

    cfg = loads_config(CFG_TMPL.format(gnn=gnn, ckpt=str(tmp_path / "ckpt")))
    model, is_hetero = parse_gnn_model(cfg["GNN"])
    rng = np.random.RandomState(0)
    f = rng.randn(1, 64, 16).astype(np.float32)
    t = rng.randint(0, 6, (1, 64)).astype(np.int32)
    m = np.ones((1, 64), bool)
    g = build_batch_device(f, t, m, RADIUS, 6)
    g = g if is_hetero else to_homogeneous(g)
    variables = model.init(jax.random.PRNGKey(0), g)

    cm = CheckpointManager(str(tmp_path / "ckpt"))
    cm.write_new_version(
        cfg, {"params": variables["params"],
              "batch_stats": variables.get("batch_stats", {})},
        {"Epoch": 1},
    )
    return SlidePredictor(cfg, radius=RADIUS, n_node_types=6)


def _slide(n, seed):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 16).astype(np.float32),
            rng.randint(0, 6, n).astype(np.int32))


def test_predict_single_and_grouped_agree(tmp_path):
    pred = make_predictor(tmp_path, "GCN")
    slides = [_slide(60, 1), _slide(200, 2), _slide(37, 3)]
    grouped = pred.predict_many(slides)
    assert grouped.shape == (3, 2)
    np.testing.assert_allclose(grouped.sum(1), 1.0, rtol=1e-5)
    # grouping / padding must not change per-slide results
    for s, expect in zip(slides, grouped):
        np.testing.assert_allclose(pred.predict(*s), expect, atol=2e-5)
    # the overhead-split accounting (tools/bench_serve.py) saw every call;
    # first calls at a fresh (program, batch, cap) shape book their XLA
    # compile to compile_ms, keeping device_ms steady-state only
    assert pred.timing["calls"] == 4
    assert pred.timing["cold_calls"] == 2  # batch-3 group + first batch-1
    assert pred.timing["compile_ms"] > 0
    assert pred.timing["device_ms"] > 0 and pred.timing["pack_ms"] > 0


def test_predict_hetero_model(tmp_path):
    pred = make_predictor(tmp_path, "HEAT2")
    assert pred.lattice_model is not None  # HEAT2 serves on the fast path
    probs = pred.predict(*_slide(50, 4))
    assert probs.shape == (2,)
    assert np.isfinite(probs).all()
    # the lattice serving path agrees with the TypedGraph serving path
    pred_t = SlidePredictor(pred.config, radius=RADIUS, n_node_types=6,
                            use_lattice=False)
    assert pred_t.lattice_model is None
    for s in (_slide(50, 4), _slide(33, 5)):
        np.testing.assert_allclose(pred.predict(*s), pred_t.predict(*s),
                                   atol=2e-5)


def test_predictor_restores_trained_weights(tmp_path):
    """The predictor must serve the CHECKPOINTED weights, not fresh inits:
    two predictors over the same checkpoint dir agree exactly."""
    p1 = make_predictor(tmp_path, "GCN")
    p2 = SlidePredictor(
        loads_config(CFG_TMPL.format(gnn="GCN", ckpt=str(tmp_path / "ckpt"))),
        radius=RADIUS, n_node_types=6,
    )
    s = _slide(64, 5)
    np.testing.assert_allclose(p1.predict(*s), p2.predict(*s), atol=1e-6)
    assert p2.version == 1


def _post_npz(port, feats, ntypes):
    buf = io.BytesIO()
    np.savez(buf, features=feats, node_types=ntypes)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_server_batches_concurrent_requests(tmp_path):
    pred = make_predictor(tmp_path, "GCN")
    slides = [_slide(48, 10 + i) for i in range(6)]
    expected = pred.predict_many(slides)  # also pre-compiles the program

    server = BatchingServer(pred, max_batch=6, max_wait_ms=2000.0)
    server.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=10
        ) as r:
            health = json.loads(r.read())
        assert health == {"status": "ok", "model_version": 1}

        results = [None] * len(slides)

        def call(i):
            results[i] = _post_npz(server.port, *slides[i])

        threads = [
            threading.Thread(target=call, args=(i,))
            for i in range(len(slides))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)

        for i, r in enumerate(results):
            assert r is not None, f"request {i} did not complete"
            np.testing.assert_allclose(r["probs"], expected[i], atol=2e-5)
            assert r["pred"] == int(np.argmax(expected[i]))

        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 6
        assert stats["errors"] == 0
        # concurrent requests must coalesce into fewer device calls
        assert stats["batches"] < 6
        assert stats["batched_requests_max"] >= 2
    finally:
        server.stop()


def test_http_server_rejects_malformed_body(tmp_path):
    pred = make_predictor(tmp_path, "GCN")
    server = BatchingServer(pred)
    server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=b"not-an-npz"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 400

        # wrong feature dim 400s at the handler (never reaches a batch,
        # so it cannot fail concurrent well-formed requests)
        bad = np.zeros((10, 99), np.float32)
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npz(server.port, bad, np.zeros(10, np.int32))
        assert exc.value.code == 400

        # out-of-range node-type ids would silently clamp on device
        # (JAX gather semantics) — must 400, not return wrong answers
        feats, _ = _slide(10, 31)
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npz(server.port, feats,
                      np.full(10, pred.n_node_types, np.int32))
        assert exc.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npz(server.port, feats, np.full(10, -1, np.int32))
        assert exc.value.code == 400
        good = pred.predict(*_slide(20, 30))
        out = _post_npz(server.port, *_slide(20, 30))
        np.testing.assert_allclose(out["probs"], good, atol=2e-5)
    finally:
        server.stop()


def test_homo_serving_matches_loaded_graph_semantics(tmp_path):
    """A served homogeneous prediction must equal the forward on the
    training-time data path (host build -> npz -> load, which adds the
    self-loops the model was trained with)."""
    import jax

    from wsi_hgnn_tpu.data import load_graph_npz, save_graph_npz
    from wsi_hgnn_tpu.graph.build import build_graph

    pred = make_predictor(tmp_path, "GCN")
    feats, ntypes = _slide(60, 7)
    probs = pred.predict(feats, ntypes)

    _, homo = build_graph(feats, ntypes, radius=RADIUS, n_node_types=6)
    ne = int(np.asarray(homo.node_mask).sum())
    ee = int(np.asarray(homo.edge_mask).sum())
    p = str(tmp_path / "slide.npz")
    save_graph_npz(p, np.asarray(homo.feat)[:ne],
                   np.asarray(homo.src)[:ee], np.asarray(homo.dst)[:ee],
                   esign=np.asarray(homo.esign)[:ee],
                   sim=np.asarray(homo.sim)[:ee], is_hetero=False)
    g = load_graph_npz(p)
    logits = pred.model.apply({"params": pred.variables["params"]}, g,
                              train=False)
    ref = np.asarray(jax.nn.softmax(logits))[0]
    np.testing.assert_allclose(probs, ref, atol=2e-5)


def test_lattice_budget_falls_back_to_typed(tmp_path):
    """A group whose one-hot working set exceeds the lattice memory budget
    must serve on the TypedGraph path — same answer, no [B, N*k, N] blow-up."""
    pred = make_predictor(tmp_path, "HEAT2")
    assert pred._predict_lattice is not None
    slides = [_slide(48, 50), _slide(40, 51)]
    want = pred.predict_many(slides)

    tiny = SlidePredictor(pred.config, radius=RADIUS, n_node_types=6,
                          lattice_mem_budget=1)  # nothing fits
    assert tiny._predict_fn_for(2, 256) is tiny._predict_typed
    got = tiny.predict_many(slides)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # a roomy budget picks the lattice program
    assert pred._predict_fn_for(2, 256) is pred._predict_lattice


def test_batcher_groups_by_bucket(tmp_path):
    """Mixed-size concurrent requests must NOT share a device batch: a
    small slide never pays a big slide's padding (docstring contract)."""
    pred = make_predictor(tmp_path, "GCN")
    small = [_slide(40, 60 + i) for i in range(2)]
    big = [_slide(300, 70 + i) for i in range(2)]  # different 256-bucket
    for s in (small, big):
        pred.predict_many(s)  # pre-compile both buckets

    server = BatchingServer(pred, max_batch=4, max_wait_ms=1500.0)
    server.start()
    try:
        results = {}

        def call(name, slide):
            results[name] = _post_npz(server.port, *slide)

        threads = [
            threading.Thread(target=call, args=(f"s{i}", s))
            for i, s in enumerate(small)
        ] + [
            threading.Thread(target=call, args=(f"b{i}", s))
            for i, s in enumerate(big)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4 and all(
            "probs" in r for r in results.values())
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        # 2 buckets -> at least 2 device batches, and never one batch of 4
        assert stats["batches"] >= 2
        assert stats["batched_requests_max"] <= 2
        assert stats["errors"] == 0
    finally:
        server.stop()


def test_stop_fails_pending_requests(tmp_path):
    """stop() must complete queued requests with an error instead of
    leaving their handler threads blocked forever."""
    from wsi_hgnn_tpu.serve import _Request

    pred = make_predictor(tmp_path, "GCN")
    server = BatchingServer(pred)  # never started: batcher not running
    f, t = _slide(12, 80)
    req = _Request(f, t)
    server.queue.put(req)
    server.stop()
    assert req.event.wait(timeout=5)
    assert req.error is not None


def test_batcher_completes_group_on_fatal_error(tmp_path):
    """Even a BaseException during predict (e.g. KeyboardInterrupt on a
    main-thread batcher) must complete every grouped request — an unset
    event hangs its handler thread and client forever."""
    from wsi_hgnn_tpu.serve import _Request

    pred = make_predictor(tmp_path, "GCN")
    server = BatchingServer(pred, max_wait_ms=1.0)

    def boom(slides):
        raise KeyboardInterrupt

    server.predictor = type("P", (), {"predict_many": staticmethod(boom)})()
    req = _Request(*_slide(12, 90))
    server.queue.put(req)
    with pytest.raises(KeyboardInterrupt):
        server._batch_once()
    assert req.event.is_set()
    assert req.error is not None


def test_hetero_serving_is_grouping_invariant(tmp_path):
    """A served hetero prediction must not depend on co-batched requests.
    Hetero models compute relation/type occupancy, which on one batched
    graph is batch-global — serving therefore uses per-slide occupancy
    (the reference's one-graph-at-a-time eval semantics): slide A
    (node types {0,1} only) served alone must equal A co-batched with a
    full-type slide B, on BOTH the lattice (HEAT2) and TypedGraph (HGT)
    serving paths."""
    rng = np.random.RandomState(7)
    fa = rng.randn(40, 16).astype(np.float32)
    ta = (rng.randint(0, 6, 40) % 2).astype(np.int32)  # types {0,1} only
    fb, tb = _slide(40, 99)

    for gnn in ("HEAT2", "HGT"):
        sub = tmp_path / gnn.lower()
        sub.mkdir()
        pred = make_predictor(sub, gnn)
        if gnn == "HEAT2":
            assert pred._predict_lattice is not None
        else:
            assert pred.lattice_model is None  # TypedGraph path
        solo = pred.predict(fa, ta)
        grouped = pred.predict_many([(fa, ta), (fb, tb)])[0]
        np.testing.assert_allclose(grouped, solo, atol=2e-5,
                                   err_msg=f"{gnn} grouping-dependent")


def _fake_encoder(in_dim=16, n_types=6):
    """Deterministic stand-in for the fused two-CNN encoder: mean RGB per
    patch through a fixed projection (chunk-invariant, so the predictor's
    chunked featurize equals a whole-slide call)."""
    rng = np.random.RandomState(123)
    W = rng.randn(3, in_dim).astype(np.float32)

    def enc(patches):
        p = np.asarray(patches, np.float32)
        m = p.mean(axis=(1, 2))
        feats = (m @ W).astype(np.float32)
        types = (np.abs(m.sum(1) * 1e3).astype(np.int64) % n_types
                 ).astype(np.int32)
        return feats, types

    return enc


def _pixels(n, seed, ps=8):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, ps, ps, 3)).astype(np.uint8)


def _post_pixels(port, px):
    buf = io.BytesIO()
    np.savez(buf, pixels=px)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_predict_pixels_matches_feature_path(tmp_path):
    """Pixels-in serving == featurize + feature-path predict, exactly:
    the served slide-to-prediction pipeline is the benchmarked one."""
    pred = make_predictor(tmp_path, "GCN")
    pred.enable_pixels(encoder=_fake_encoder(), patch_size=8, chunk=16)
    px = [_pixels(40, 1), _pixels(70, 2)]
    probs = pred.predict_many_pixels(px)
    enc = _fake_encoder()
    want = pred.predict_many(
        [enc(p.astype(np.float32) / 255.0) for p in px]
    )
    np.testing.assert_allclose(probs, want, atol=2e-5)
    # 40 and 70 patches at chunk 16 -> 3 + 5 encoder chunks, timed
    assert pred.timing["featurize_chunks"] == 8
    assert pred.timing["featurize_ms"] > 0


def test_http_pixels_requests(tmp_path):
    pred = make_predictor(tmp_path, "GCN")
    pred.enable_pixels(encoder=_fake_encoder(), patch_size=8, chunk=16)
    px = _pixels(40, 5)
    want = pred.predict_many_pixels([px])[0]

    server = BatchingServer(pred, max_batch=4, max_wait_ms=50.0)
    server.warmup(40, pixels=True)
    server.start()
    try:
        out = _post_pixels(server.port, px)
        np.testing.assert_allclose(out["probs"], want, atol=2e-5)
        # f32 pixels in [0,1] are accepted and agree with uint8
        out_f = _post_pixels(server.port,
                             px.astype(np.float32) / np.float32(255.0))
        np.testing.assert_allclose(out_f["probs"], out["probs"], atol=2e-5)
        # wrong patch size / dtype 400 at the handler
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_pixels(server.port, _pixels(4, 6, ps=16))
        assert exc.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_pixels(server.port, _pixels(4, 6).astype(np.float64))
        assert exc.value.code == 400
    finally:
        server.stop()


def test_http_pixels_rejected_when_not_enabled(tmp_path):
    """A pixels request against a features-only server must 400 with a
    clear message, not 500 inside a device batch."""
    pred = make_predictor(tmp_path, "GCN")
    server = BatchingServer(pred)
    server.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_pixels(server.port, _pixels(8, 1))
        assert exc.value.code == 400
        assert "not configured" in exc.value.read().decode()
    finally:
        server.stop()


def test_pixel_and_feature_requests_never_share_a_batch(tmp_path):
    """Pixel and feature requests of the SAME node bucket run different
    program chains — they must coalesce only with their own kind."""
    pred = make_predictor(tmp_path, "GCN")
    pred.enable_pixels(encoder=_fake_encoder(), patch_size=8, chunk=16)
    px = [_pixels(40, 7 + i) for i in range(2)]
    ft = [_slide(40, 9 + i) for i in range(2)]
    want_px = pred.predict_many_pixels(px)
    want_ft = pred.predict_many(ft)

    server = BatchingServer(pred, max_batch=4, max_wait_ms=1500.0)
    server.start()
    try:
        results = {}

        def call_px(i):
            results[f"px{i}"] = _post_pixels(server.port, px[i])

        def call_ft(i):
            results[f"ft{i}"] = _post_npz(server.port, *ft[i])

        threads = [threading.Thread(target=call_px, args=(i,))
                   for i in range(2)]
        threads += [threading.Thread(target=call_ft, args=(i,))
                    for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(2):
            np.testing.assert_allclose(
                results[f"px{i}"]["probs"], want_px[i], atol=2e-5)
            np.testing.assert_allclose(
                results[f"ft{i}"]["probs"], want_ft[i], atol=2e-5)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        # kinds never mix: >= 2 batches, never one batch of 4
        assert stats["batches"] >= 2
        assert stats["batched_requests_max"] <= 2
        assert stats["errors"] == 0
    finally:
        server.stop()


def test_oversized_body_is_rejected(tmp_path):
    """An oversized client-declared Content-Length must 413 before the
    body is read into RAM (one request must not be able to OOM the
    server)."""
    pred = make_predictor(tmp_path, "GCN")
    server = BatchingServer(pred, max_body_mb=0.001)
    server.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npz(server.port, *_slide(24, 1))
        assert exc.value.code == 413
    finally:
        server.stop()
