"""Production serving: trained slide-graph models behind one predictor.

The reference has no serving story — inference is `HomoGraphEvaluator`
iterating a test split one pickled graph at a time
(/root/reference/evaluator/eval_homo_graph.py:61-96). A deployed system
needs the same capability as an online service: load a versioned
checkpoint once, keep the compiled programs warm, and answer per-slide
requests at high throughput. This module provides that, TPU-first:

  * `SlidePredictor` — config + CheckpointManager -> jitted
    features->graph->logits programs (the full on-device construction path
    of `graph.build.build_batch_device`, so a request carries only the
    [N, D] patch features + node types; the KNN/Pearson graph never exists
    on the host). Per-slide buffers are padded to size buckets so the
    whole request population compiles to a handful of XLA programs.
  * `BatchingServer` — a stdlib ThreadingHTTPServer with a micro-batching
    loop: concurrent requests landing within `max_wait_ms` of each other
    are packed into ONE device program call (same-bucket slides stack on
    the batch axis), amortising dispatch exactly like the training
    cohort `lax.scan` does.

Request wire format (POST /predict): an .npz body with `features`
[N, D] f32 and optionally `node_types` [N] int — the same arrays
`pipeline.construct` writes per slide — answered with JSON
`{"probs": [...], "pred": k}`. GET /healthz and GET /stats are liveness
and observability endpoints.

PIXELS-IN serving (the full slide-to-prediction pipeline as a service —
the same path bench.py measures): `SlidePredictor.enable_pixels` attaches
the constructor's fused two-CNN encoder (KimiaNet features + HoVer-Net
nucleus typing over one patch stream, models.featurizers.make_cnn_encoder
— the reference constructor's semantics, graph_constructor.py:239-254);
requests then POST `pixels` [N, P, P, 3] uint8 (or f32 in [0,1]) instead
of `features`, and the server featurizes -> constructs the graph on
device -> predicts. Pixel and feature requests coexist; they never share
a device batch (different bucket kinds).
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import parse_gnn_model
from .graph import to_homogeneous
from .graph.build import build_batch_device
from .graph.typed_graph import bucket_size
from .train.checkpoint import CheckpointManager


class SlidePredictor:
    """Loads a trained GNN from its versioned checkpoint dir and serves
    per-slide predictions from patch features.

    `config` is the training YAML dict (the reference's config surface,
    main.py:40-47); the GNN section picks the model, the checkpoint
    section the weights, and `radius`/`n_node_types` default to the
    graph-construction operating point they were trained with.

    `knn_impl="exact"` is size-aware: buckets past ops.knn.STREAM_THRESHOLD
    nodes stream KNN + Pearson in tiles (ops.knn.knn_l2_tiled /
    ops.pearson.pearson_sim_at) instead of materialising the [N, N]
    distance and gram matrices, so a 16k-patch request does not allocate
    ~1 GB buffers inside the serving program.
    """

    def __init__(
        self,
        config: Dict,
        radius: int = 9,
        n_node_types: int = 6,
        checkpoint_path: Optional[str] = None,
        knn_impl: str = "exact",
        use_lattice: bool = True,
        lattice_mem_budget: int = 2 << 30,
    ):
        import jax

        from .config import parse_lattice_twin

        self.config = config
        self.model, self.is_hetero = parse_gnn_model(config["GNN"])
        self.in_dim = int(config["GNN"]["in_dim"])
        self.radius = int(radius)
        self.n_node_types = int(n_node_types)
        self.knn_impl = knn_impl
        self.lattice_mem_budget = int(lattice_mem_budget)
        path = checkpoint_path or config["checkpoint"]["path"]
        self._load_variables(path)

        # on-device construction always yields a k-regular graph, so models
        # with a lattice twin serve on the [B, N, k] fast path (identical
        # param tree — the checkpoint loads unchanged). Per-call the same
        # memory budget the trainer applies gates the [B, N*k, N] one-hot
        # working set; oversized groups fall back to the TypedGraph path.
        self.lattice_model = parse_lattice_twin(config["GNN"]) if use_lattice else None
        model, is_hetero = self.model, self.is_hetero

        # SERVING SEMANTICS: a response must not depend on which other
        # requests share its device batch. Hetero models compute
        # relation/type occupancy, which on one batched graph is
        # batch-global (the reference's batched-training semantics) —
        # so serving uses per-slide occupancy, exactly the reference's
        # one-graph-at-a-time eval (eval_homo_graph.py:75-84): the
        # lattice twin runs with presence='graph', the TypedGraph path
        # vmaps the single-slide forward over the group.
        self._predict_lattice = None
        if self.lattice_model is not None:
            from .models.lattice import build_lattice_device

            lat = self.lattice_model.clone(presence="graph")

            @jax.jit
            def _predict_lattice(variables, feats, ntypes, mask):
                g = build_lattice_device(
                    feats, ntypes, mask, self.radius, self.n_node_types,
                    knn_impl=self.knn_impl,
                )
                logits = lat.apply(
                    {"params": variables["params"]}, g, train=False
                )
                return jax.nn.softmax(logits)

            self._predict_lattice = _predict_lattice

        @jax.jit
        def _predict_typed(variables, feats, ntypes, mask):
            def one(f, t, m):
                # homogeneous models train on loaded graphs that carry
                # explicit self-loops (data layer contract, reference
                # data.py:120-121) — the served graph must match
                g = build_batch_device(
                    f[None], t[None], m[None], self.radius,
                    self.n_node_types, knn_impl=self.knn_impl,
                    add_self_loops=not is_hetero,
                )
                g = g if is_hetero else to_homogeneous(g)
                return model.apply(variables, g, train=False)[0]

            return jax.nn.softmax(jax.vmap(one)(feats, ntypes, mask), -1)

        self._predict_typed = _predict_typed
        self._lock = threading.Lock()  # device calls serialized per predictor
        # per-call host-packing vs device time, for the serving-overhead
        # split (tools/bench_serve.py): answers WHERE a deployment's time
        # goes without a profiler attached. The first call at each
        # (program, batch, cap) shape compiles inside the call, so it is
        # booked to compile_ms — NOT device_ms — lest one multi-second XLA
        # compile masquerade as steady-state device time; lock_wait_ms
        # isolates serialization behind another thread's device call.
        self._warm_keys: set = set()
        self.reset_timing()

    def reset_timing(self) -> None:
        """Zero the overhead-split counters (warm program shapes persist)."""
        self.timing = {
            "pack_ms": 0.0, "lock_wait_ms": 0.0, "device_ms": 0.0,
            "compile_ms": 0.0, "calls": 0, "cold_calls": 0,
            "featurize_ms": 0.0, "featurize_chunks": 0,
        }

    # ------------------------------------------------------------------ #
    # pixels-in: the full slide-to-prediction pipeline as a service
    # ------------------------------------------------------------------ #
    def enable_pixels(
        self,
        hovernet_config: Optional[Dict] = None,
        kimianet_config: Optional[Dict] = None,
        encoder=None,
        patch_size: int = 256,
        chunk: Optional[int] = None,
        encoder_name: str = "kimia",
    ) -> None:
        """Attach a patch-pixel featurizer so requests can carry raw patch
        pixels. Default: the production fused two-CNN encoder (KimiaNet
        1024-d features + HoVer-Net typing over ONE decoded patch stream,
        make_cnn_encoder with_typing=True) at the constructor's chunk size
        (hovernet_config batch_size, default 128 — the b128 ladder winner).
        `encoder` injects a custom `(patches [B,P,P,3] f32) -> (features,
        node_types)` callable (tests; 'precomputed' feature workflows).
        """
        hovernet_config = dict(hovernet_config or {})
        if chunk is None:
            chunk = int(hovernet_config.get("batch_size", 128) or 128)
        if encoder is None:
            from .models.featurizers import make_cnn_encoder

            encoder = make_cnn_encoder(
                encoder_name,
                {"feature_dim": self.in_dim, "n_node_type": self.n_node_types},
                hovernet_config, dict(kimianet_config or {}),
                with_typing=True, pad_batch_to=chunk,
            )
        self._encoder = encoder
        self._patch_size = int(patch_size)
        self._chunk = int(chunk)

    @property
    def pixels_enabled(self) -> bool:
        return getattr(self, "_encoder", None) is not None

    def featurize(self, pixels: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Patch pixels [N, P, P, 3] (uint8 or f32 in [0,1]) -> (features
        [N, D] f32, node_types [N] i32) via the attached encoder, in
        chunks of the compiled batch size. Device work — serialized under
        the predictor lock like every predict call."""
        if not self.pixels_enabled:
            raise RuntimeError("pixels not enabled: call enable_pixels()")
        px = np.asarray(pixels)
        if px.dtype == np.uint8:
            if not getattr(self._encoder, "accepts_uint8", False):
                px = px.astype(np.float32) / 255.0
            # else: ship raw bytes; the encoder normalises on device
        else:
            px = px.astype(np.float32)
        feats, types = [], []
        with self._lock:
            t0 = time.perf_counter()  # after the lock: pure featurize time
            for i in range(0, len(px), self._chunk):
                f, t = self._encoder(px[i : i + self._chunk])
                feats.append(np.asarray(f, np.float32))
                types.append(
                    np.zeros(len(f), np.int32) if t is None
                    else np.asarray(t, np.int32)
                )
                self.timing["featurize_chunks"] += 1
            self.timing["featurize_ms"] += (time.perf_counter() - t0) * 1e3
        return np.concatenate(feats), np.concatenate(types)

    def predict_many_pixels(
        self, slides: Sequence[np.ndarray]
    ) -> np.ndarray:
        """[pixels [N_i, P, P, 3]] -> probs [B, C]: featurize every slide
        through the fused two-CNN encoder, then one grouped feature-path
        call (the graph never exists on the host)."""
        return self.predict_many([self.featurize(px) for px in slides])

    def warmup_pixels(self, n_patches: int = 2048,
                      batch_sizes: Sequence[int] = (1,)) -> None:
        """Pre-compile the encoder chunk program AND the downstream
        feature-path program(s) for pixel requests."""
        px = np.zeros(
            (min(n_patches, self._chunk), self._patch_size,
             self._patch_size, 3), np.uint8,
        )
        self.featurize(px)  # one chunk compiles the (padded) encoder shape
        self.warmup(n_patches, batch_sizes=batch_sizes)

    def _predict_fn_for(self, batch: int, cap: int):
        """Pick the lattice or TypedGraph program for a padded group of
        `batch` slides at node capacity `cap` — the lattice one-hot
        aggregation materialises [B, N*k, N] f32, so the trainer's memory
        budget applies here too (data.lattice_loader.lattice_batch_for_budget)."""
        if self._predict_lattice is None:
            return self._predict_typed
        from .data.lattice_loader import lattice_batch_for_budget

        fit = lattice_batch_for_budget(
            self.radius - 1, cap, self.lattice_mem_budget, max_batch=batch
        )
        return self._predict_lattice if fit == batch else self._predict_typed

    def _load_variables(self, path: str) -> None:
        import jax
        import jax.numpy as jnp

        self.checkpoint_manager = CheckpointManager(path)
        restored = self.checkpoint_manager.load_model_raw()
        restored = jax.tree.map(jnp.asarray, restored)
        self.variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            self.variables["batch_stats"] = restored["batch_stats"]
        self.version = self.checkpoint_manager.version

    # ---------------------------------------------------------------- #
    def pack(
        self, slides: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Stack same-bucket slides into [B, N_cap, ...] padded buffers."""
        cap = max(bucket_size(len(f), base=256) for f, _ in slides)
        b = len(slides)
        d = slides[0][0].shape[1]
        feats = np.zeros((b, cap, d), np.float32)
        ntypes = np.zeros((b, cap), np.int32)
        mask = np.zeros((b, cap), bool)
        for i, (f, t) in enumerate(slides):
            n = len(f)
            feats[i, :n] = f
            if t is not None:
                ntypes[i, :n] = t
            mask[i, :n] = True
        return feats, ntypes, mask

    def predict_many(
        self, slides: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]]
    ) -> np.ndarray:
        """[(features [N_i, D], node_types [N_i] | None)] -> probs [B, C].
        One compiled call for the whole group (slides are padded to the
        group's bucket capacity)."""
        t0 = time.perf_counter()
        feats, ntypes, mask = self.pack(slides)
        import jax.numpy as jnp

        fn = self._predict_fn_for(feats.shape[0], feats.shape[1])
        t1 = time.perf_counter()  # pack done, before any lock wait
        with self._lock:
            t2 = time.perf_counter()
            key = (fn is self._predict_lattice,
                   feats.shape[0], feats.shape[1])
            cold = key not in self._warm_keys
            probs = np.asarray(fn(
                self.variables, jnp.asarray(feats), jnp.asarray(ntypes),
                jnp.asarray(mask),
            ))
            t3 = time.perf_counter()
            self._warm_keys.add(key)
            self.timing["pack_ms"] += (t1 - t0) * 1e3
            self.timing["lock_wait_ms"] += (t2 - t1) * 1e3
            self.timing["compile_ms" if cold else "device_ms"] += \
                (t3 - t2) * 1e3
            self.timing["calls"] += 1
            self.timing["cold_calls"] += int(cold)
        return probs

    def predict(
        self, features: np.ndarray, node_types: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Single slide: features [N, D] (+ node types [N]) -> probs [C]."""
        return self.predict_many([(np.asarray(features), node_types)])[0]

    def warmup(self, n_patches: int = 2048, feat_dim: Optional[int] = None,
               batch_sizes: Sequence[int] = (1,)) -> None:
        """Pre-compile the predict program(s) so the first request doesn't
        pay the XLA compile (~seconds warm-cache, minutes cold)."""
        d = feat_dim or int(self.config["GNN"]["in_dim"])
        rng = np.random.RandomState(0)
        f = rng.randn(n_patches, d).astype(np.float32)
        t = rng.randint(0, self.n_node_types, n_patches).astype(np.int32)
        for b in batch_sizes:
            self.predict_many([(f, t)] * b)


# -------------------------------------------------------------------- #
# Micro-batching HTTP server
# -------------------------------------------------------------------- #
class _Request:
    __slots__ = ("features", "node_types", "pixels", "bucket", "event",
                 "probs", "error")

    def __init__(self, features, node_types, pixels=None):
        self.features = features
        self.node_types = node_types
        self.pixels = pixels
        # size bucket (same rounding as SlidePredictor.pack): only
        # same-bucket requests share a device batch, so a small slide
        # never pays a big slide's padding. Pixel requests carry a distinct
        # bucket KIND — they run a different program chain (featurize +
        # predict) and must never group with feature requests.
        n = len(features) if pixels is None else len(pixels)
        self.bucket = ("px" if pixels is not None else "ft",
                       bucket_size(n, base=256))
        self.event = threading.Event()
        self.probs: Optional[np.ndarray] = None
        self.error: Optional[str] = None


class BatchingServer:
    """HTTP front-end with a micro-batching device loop.

    Handler threads enqueue requests; a single batcher thread drains the
    queue, groups up to `max_batch` requests that arrive within
    `max_wait_ms`, and issues ONE `predict_many` per group. Under
    concurrent load the device sees large batches (high MXU utilisation);
    a lone request pays at most `max_wait_ms` extra latency.
    """

    def __init__(
        self,
        predictor: SlidePredictor,
        host: str = "127.0.0.1",
        port: int = 0,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        pad_batches: bool = True,
        max_body_mb: float = 256.0,
    ):
        self.predictor = predictor
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        # legitimate slide payloads are ~8 MB; reading an unbounded
        # client-declared Content-Length into RAM would let one request
        # OOM the server
        self.max_body = int(max_body_mb * (1 << 20))
        # pad every device call to max_batch (repeats of the first slide,
        # extra outputs dropped): ONE compiled program per node bucket
        # instead of one per (group size, bucket) — on remote-compile
        # platforms a cold compile stalls every waiting client
        self.pad_batches = pad_batches
        self.queue: "Queue[_Request]" = Queue()
        from collections import deque

        # other-bucket requests set aside while a group forms (batcher
        # thread owns it; _fail_pending may drain it on shutdown)
        self._backlog: "deque[_Request]" = deque()
        self.stats = {
            "requests": 0, "batches": 0, "errors": 0,
            "batched_requests_max": 0, "latency_ms_sum": 0.0,
            "decode_ms_sum": 0.0,  # HTTP body read + npz decode per request
        }
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: Dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {
                        "status": "ok",
                        "model_version": server.predictor.version,
                    })
                elif self.path == "/stats":
                    with server._stats_lock:
                        self._reply(200, dict(server.stats))
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/predict":
                    self._reply(404, {"error": "not found"})
                    return
                t0 = time.perf_counter()
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    length = -1
                if length < 0:
                    # negative would make rfile.read() block until EOF,
                    # hanging the handler thread on a waiting client
                    self._reply(400, {"error": "bad Content-Length"})
                    return
                if length > server.max_body:
                    self._reply(413, {
                        "error": f"body {length} bytes exceeds limit "
                                 f"{server.max_body}"})
                    return
                try:
                    t_dec = time.perf_counter()
                    z = np.load(io.BytesIO(self.rfile.read(length)),
                                allow_pickle=False)
                    pixels = feats = ntypes = None
                    if "pixels" in z:
                        pixels = np.asarray(z["pixels"])
                    else:
                        feats = np.asarray(z["features"], np.float32)
                        ntypes = (np.asarray(z["node_types"], np.int32)
                                  if "node_types" in z else None)
                    t_dec = (time.perf_counter() - t_dec) * 1e3
                except Exception as e:
                    self._reply(400, {"error": f"bad request: {e}"})
                    return
                with server._stats_lock:
                    server.stats["decode_ms_sum"] += t_dec
                # validate per request so one bad payload 400s alone
                # instead of failing its whole micro-batch
                if pixels is not None:
                    if not server.predictor.pixels_enabled:
                        self._reply(400, {
                            "error": "server not configured for pixel "
                                     "requests (no featurizer attached)"})
                        return
                    ps = server.predictor._patch_size
                    if (pixels.ndim != 4 or pixels.shape[0] == 0
                            or pixels.shape[1:] != (ps, ps, 3)):
                        self._reply(400, {
                            "error": f"pixels must be [N, {ps}, {ps}, 3]"})
                        return
                    if pixels.dtype not in (np.uint8, np.float32):
                        self._reply(400, {
                            "error": "pixels must be uint8 or float32"})
                        return
                else:
                    if feats.ndim != 2 or feats.shape[0] == 0:
                        self._reply(400, {"error": "features must be [N, D]"})
                        return
                    if feats.shape[1] != server.predictor.in_dim:
                        self._reply(400, {
                            "error": f"feature dim {feats.shape[1]} != model "
                                     f"in_dim {server.predictor.in_dim}"})
                        return
                    if ntypes is not None and (
                        ntypes.ndim != 1 or len(ntypes) != len(feats)
                    ):
                        self._reply(400, {
                            "error": "node_types must be [N] matching features"})
                        return
                    if ntypes is not None and len(ntypes) and (
                        int(ntypes.min()) < 0
                        or int(ntypes.max()) >= server.predictor.n_node_types
                    ):
                        # out-of-range ids would silently clamp on device
                        # (JAX gather semantics) and corrupt the prediction
                        self._reply(400, {
                            "error": f"node_types must be in [0, "
                                     f"{server.predictor.n_node_types})"})
                        return
                if server._stop.is_set():
                    self._reply(503, {"error": "server stopping"})
                    return
                req = _Request(feats, ntypes, pixels=pixels)
                server.queue.put(req)
                if server._stop.is_set():
                    # raced with shutdown: the batcher's drain may already
                    # have run, so complete the request ourselves
                    server._fail_pending("server stopped")
                req.event.wait()
                dt = (time.perf_counter() - t0) * 1e3
                with server._stats_lock:
                    server.stats["requests"] += 1
                    server.stats["latency_ms_sum"] += dt
                    if req.error:
                        server.stats["errors"] += 1
                if req.error:
                    self._reply(500, {"error": req.error})
                else:
                    probs = [float(p) for p in req.probs]
                    self._reply(200, {
                        "probs": probs,
                        "pred": int(np.argmax(req.probs)),
                        "latency_ms": round(dt, 2),
                    })

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        self._threads: List[threading.Thread] = []

    # ---------------------------------------------------------------- #
    def _fail_pending(self, msg: str) -> None:
        """Complete every queued/backlogged request with an error so no
        handler thread waits forever (idempotent; also called by stop())."""
        while self._backlog:
            try:
                r = self._backlog.popleft()
            except IndexError:
                break
            r.error = msg
            r.event.set()
        while True:
            try:
                r = self.queue.get_nowait()
            except Empty:
                break
            r.error = msg
            r.event.set()

    def _batcher(self) -> None:
        # whatever ends this loop — stop(), or an unexpected error — the
        # finally drains pending requests instead of leaving their handler
        # threads blocked on event.wait() forever
        try:
            while not self._stop.is_set():
                self._batch_once()
        finally:
            self._stop.set()
            self._fail_pending("server stopped")

    def _pop_backlog(self) -> Optional[_Request]:
        # _fail_pending may drain the backlog concurrently during
        # shutdown, so a truthiness check alone cannot guard the pop
        try:
            return self._backlog.popleft()
        except IndexError:
            return None

    def _batch_once(self) -> None:
        first = self._pop_backlog()
        if first is None:
            try:
                first = self.queue.get(timeout=0.1)
            except Empty:
                return
        group = [first]
        try:
            skipped: List[_Request] = []
            deadline = time.perf_counter() + self.max_wait
            while len(group) < self.max_batch:
                # same-bucket requests already set aside come first
                while len(group) < self.max_batch:
                    r = self._pop_backlog()
                    if r is None:
                        break
                    (group if r.bucket == first.bucket else skipped).append(r)
                if len(group) >= self.max_batch:
                    break
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    r = self.queue.get(timeout=remaining)
                except Empty:
                    break
                (group if r.bucket == first.bucket else skipped).append(r)
            # other-bucket arrivals keep their order for the next round
            self._backlog.extendleft(reversed(skipped))
            try:
                if first.pixels is not None:
                    # pixel group: featurize each request through the fused
                    # two-CNN encoder FIRST, then join the normal feature
                    # path — batch padding repeats cheap features, never
                    # re-featurizes pixels
                    slides = [self.predictor.featurize(r.pixels)
                              for r in group]
                else:
                    slides = [(r.features, r.node_types) for r in group]
                if self.pad_batches and len(slides) < self.max_batch:
                    slides += [slides[0]] * (self.max_batch - len(slides))
                probs = self.predictor.predict_many(slides)[: len(group)]
                for r, p in zip(group, probs):
                    r.probs = p
            except Exception as e:  # propagate to every waiter
                for r in group:
                    r.error = f"{type(e).__name__}: {e}"
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["batched_requests_max"] = max(
                    self.stats["batched_requests_max"], len(group)
                )
        finally:
            # EVERY grouped request completes, even if a BaseException
            # (KeyboardInterrupt on a main-thread batcher) or a shutdown
            # race aborts the round — an unset event hangs its handler
            # thread and client forever
            for r in group:
                if r.probs is None and r.error is None:
                    r.error = "server error"
                r.event.set()

    def warmup(self, n_patches: int, feat_dim: Optional[int] = None,
               pixels: bool = False) -> None:
        """Pre-compile the shapes THIS server will dispatch. With the
        default pad_batches=True every device call uses batch ==
        max_batch, so predictor.warmup's own default (batch 1) would
        compile a program the batcher never calls — and on remote-compile
        platforms the first real request would then cold-compile off the
        main thread. Call this from the main thread before start().
        pixels=True also compiles the fused two-CNN encoder chunk."""
        if pixels:
            self.predictor.warmup_pixels(
                n_patches, batch_sizes=(self.max_batch,)
            )
        else:
            self.predictor.warmup(
                n_patches, feat_dim=feat_dim, batch_sizes=(self.max_batch,)
            )

    def start(self) -> None:
        """Run both loops in background threads (in-process / test use)."""
        for target in (self._batcher, self.httpd.serve_forever):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        # httpd.shutdown() waits for serve_forever() to exit — and waits
        # FOREVER if the accept loop was never started (stdlib semantics),
        # so only call it once start()/serve_forever() ran
        if self._threads:
            self.httpd.shutdown()
        self.httpd.server_close()
        # the batcher's finally drains too, but it may already be dead —
        # fail anything still pending so no client hangs
        self._fail_pending("server stopped")

    def serve_forever(self) -> None:
        """Blocking server: HTTP accept loop in a background thread, the
        batcher — ALL device work, including XLA compiles of new size
        buckets — on the calling (main) thread. On remote-compile
        platforms (this environment's TPU relay) compiling off the main
        thread with the persistent compile cache enabled aborts the
        process, so the device loop must own the main thread."""
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        self._threads.append(t)
        try:
            self._batcher()
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()
