"""Full-workflow pipeline test: synthetic slide image -> tiling -> graph
construction -> split lists -> one training epoch, exercising the
get_patches -> get_graph -> main public workflow end-to-end."""
import glob
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from wsi_hgnn_tpu.pipeline import (
    PilDeepZoom,
    construct_all,
    generate_splits,
    random_encoder,
    tile_slides,
)
from wsi_hgnn_tpu.pipeline.tiler import tile_is_foreground


def make_fake_slide(path, w=1024, h=768, seed=0):
    """White background with a textured 'tissue' blob in the middle."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - h / 2) ** 2 / (h / 3) ** 2 + (xx - w / 2) ** 2 / (w / 3) ** 2) < 1
    noise = rng.randint(80, 200, (h, w, 3)).astype(np.uint8)
    img[blob] = noise[blob]
    Image.fromarray(img).save(path)


def test_pil_deepzoom_addressing(tmp_path):
    p = tmp_path / "s.png"
    make_fake_slide(p, 600, 400)
    dz = PilDeepZoom(Image.open(p), tile_size=256)
    # top level is full resolution
    assert dz.level_dimensions[-1] == (600, 400)
    assert dz.level_tiles[-1] == (3, 2)
    t = dz.get_tile(dz.level_count - 1, (0, 0))
    assert t.size == (256, 256)
    # edge tiles are clipped
    t = dz.get_tile(dz.level_count - 1, (2, 1))
    assert t.size == (600 - 512, 400 - 256)


def test_background_filter():
    white = Image.new("RGB", (256, 256), (255, 255, 255))
    assert not tile_is_foreground(white, 256, 15)
    noisy = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (256, 256, 3), dtype=np.uint8)
    )
    assert tile_is_foreground(noisy, 256, 15)


def test_full_workflow(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # --- stage 1: tiling (get_patches) ---
    slide_dir = tmp_path / "data" / "FAKE" / "images"
    slide_dir.mkdir(parents=True)
    slides = []
    for i in range(3):
        barcode = f"TCGA-{i:02d}-0000-01Z-00-DX1"
        p = slide_dir / f"{barcode}.png"
        make_fake_slide(p, 1024, 768, seed=i)
        slides.append(str(p))
    out_base = str(tmp_path / "patches" / "FAKE" / "patches_lv0_ps256")
    tile_slides(slides, out_base, levels=(0,), base_mag=40, objective=40,
                workers=2, tile_size=256, background_t=10, class_index=len(
                    str(tmp_path).split(os.sep)) + 1)
    bags = sorted(glob.glob(out_base + "/*/*"))
    assert len(bags) == 3
    for bag in bags:
        tiles = os.listdir(bag)
        assert len(tiles) >= 4, "foreground tiles missing"
        # background-only corners rejected: a 1024x768 slide has 12 tiles,
        # the white corners must be dropped
        assert len(tiles) < 12

    # --- stage 2: graph construction (get_graph --construct) ---
    graph_config = {
        "dataset": "FAKE",
        "task": "cancer classification",
        "patch_path": out_base + "/",
        "out_dir": str(tmp_path / "graphs"),
        "encoder_name": "random",
        "radius": 3,
        "n_node_type": 6,
        "feature_dim": 32,
        "node_type_dir": None,
    }
    n = construct_all(graph_config, {"batch_size": 8}, {}, verbose=False)
    assert n == 3
    het = glob.glob(str(tmp_path / "graphs" / "heterogeneous" / "*.npz"))
    homo = glob.glob(str(tmp_path / "graphs" / "homogeneous" / "*.npz"))
    assert len(het) == 3 and len(homo) == 3
    # idempotent re-run skips existing outputs
    assert construct_all(graph_config, {"batch_size": 8}, {}, verbose=False) == 0

    # --- stage 3: split lists (get_graph --trainval) ---
    normal = tmp_path / "normal.txt"
    normal.write_text("TCGA-00-0000-01Z\n")
    list_dir = generate_splits(graph_config, fold=1, seed=0,
                               normal_path=str(normal))
    lists = sorted(os.listdir(list_dir))
    assert lists == [
        "heterogeneous_test.txt", "heterogeneous_train.txt",
        "heterogeneous_val.txt", "homogeneous_test.txt",
        "homogeneous_train.txt", "homogeneous_val.txt",
    ]
    train_files = Path(list_dir, "heterogeneous_train.txt").read_text().split()
    assert all(f.endswith(".npz") for f in train_files)


def test_tiler_skips_out_of_range_levels(tmp_path):
    """Shipped CLI defaults (base_mag=40, objective=20) on a slide without
    objective-power metadata (every PIL-backend image): the reference
    skips non-existent DeepZoom levels (get_patches.py:95-100); direct
    indexing would crash or silently tile the wrong pyramid level."""
    slide_dir = tmp_path / "d" / "C" / "i"
    slide_dir.mkdir(parents=True)
    p = slide_dir / "TCGA-90-0000-01Z-00-DX1.png"
    make_fake_slide(p, 1024, 768)
    out_base = str(tmp_path / "o")
    # objective != base_mag -> first_level = -1 -> dz_level out of range
    tile_slides([str(p)], out_base, levels=(0,), base_mag=40, objective=20,
                workers=1, tile_size=256, background_t=10,
                class_index=len(str(tmp_path).split(os.sep)))
    # no crash; the out-of-range level produced no tiles
    assert glob.glob(out_base + "/**/*.jpeg", recursive=True) == []


def test_nested_patches_keeps_childless_low_mag(tmp_path):
    """2-level bags: a low-mag tile whose high-mag children were all
    background-rejected KEEPS its low-mag patch — the reference's
    os.remove targets the already-moved temp path, always fails, and is
    swallowed (get_patches.py:230-237), so its bags keep these tiles."""
    from wsi_hgnn_tpu.pipeline.tiler import nested_patches

    temp = tmp_path / "t"
    (temp.parent / "t_files" / "20").mkdir(parents=True)
    (temp.parent / "t_files" / "40").mkdir(parents=True)
    img = Image.new("RGB", (8, 8))
    # low-mag tile 0_0 with one high-mag child; low-mag 1_0 childless
    img.save(temp.parent / "t_files" / "20" / "0_0.jpeg")
    img.save(temp.parent / "t_files" / "20" / "1_0.jpeg")
    img.save(temp.parent / "t_files" / "40" / "0_0.jpeg")
    bag = nested_patches(str(tmp_path / "c" / "SLIDE.png"), str(tmp_path / "out"),
                         str(temp), levels=(0, 1), class_index=len(
                             str(tmp_path).split(os.sep)))
    names = sorted(os.listdir(bag))
    assert "0_0.jpeg" in names and "1_0.jpeg" in names  # childless kept
    assert os.path.isdir(os.path.join(bag, "0_0"))
    assert not os.path.isdir(os.path.join(bag, "1_0"))  # empty dir dropped


def test_patch_stream_propagates_decode_errors(tmp_path):
    """A corrupt patch file must raise, not silently truncate the stream
    (a graph built from a partial patch set would save without warning)."""
    from wsi_hgnn_tpu.pipeline.patches import iter_patch_batches, list_patches

    d = tmp_path / "bag"
    d.mkdir()
    for i in range(3):
        Image.new("RGB", (256, 256)).save(d / f"{i}_0.jpeg")
    (d / "zz_corrupt.jpeg").write_bytes(b"not a jpeg")
    paths = list_patches(d)
    with pytest.raises(Exception):
        list(iter_patch_batches(paths, batch_size=2))
    with pytest.raises(Exception):
        list(iter_patch_batches(paths, batch_size=2, prefetch=0))
    with pytest.raises(Exception):
        # the decode POOL must propagate worker errors too (apply_async
        # .get re-raises), not hang or truncate
        list(iter_patch_batches(paths, batch_size=2, decode_workers=2))


def test_decode_pool_yields_identical_batches(tmp_path):
    """The multi-process decode pool (decode_workers>0) must yield byte-
    identical batches, in order, vs the single-thread path — including the
    trailing short batch (PERF_NOTES 'real-file ingestion' knob)."""
    from wsi_hgnn_tpu.pipeline.patches import iter_patch_batches, list_patches
    from wsi_hgnn_tpu.profiling import StageTimer

    rng = np.random.RandomState(0)
    d = tmp_path / "bag"
    d.mkdir()
    for i in range(7):  # 7 patches at batch 3 -> trailing batch of 1
        arr = rng.randint(0, 255, (256, 256, 3), np.uint8)
        Image.fromarray(arr).save(d / f"{i}_0.jpeg", quality=90)
    paths = list_patches(d)

    timer = StageTimer()
    seq = list(iter_patch_batches(paths, batch_size=3, timer=timer,
                                  timer_stage="decode"))
    pooled = list(iter_patch_batches(paths, batch_size=3, decode_workers=2,
                                     timer=timer, timer_stage="decode"))
    assert len(seq) == len(pooled) == 3
    assert [b.shape for b in seq] == [(3, 256, 256, 3)] * 2 + [(1, 256, 256, 3)]
    for a, b in zip(seq, pooled):
        np.testing.assert_array_equal(a, b)
    # decode seconds were attributed for both paths (6 batches total)
    assert timer.counts["decode"] == 6 and timer.totals["decode"] > 0

    # out_dtype='uint8' (the CNN-encoder fast path: scaling happens on
    # device) yields the same pixels, unscaled, on BOTH decode paths
    u8_seq = list(iter_patch_batches(paths, batch_size=3,
                                     out_dtype="uint8"))
    u8_pool = list(iter_patch_batches(paths, batch_size=3,
                                      decode_workers=2, out_dtype="uint8"))
    for a, b8, c8 in zip(seq, u8_seq, u8_pool):
        assert b8.dtype == np.uint8 and c8.dtype == np.uint8
        np.testing.assert_array_equal(b8, c8)
        np.testing.assert_allclose(a, b8.astype(np.float32) / 255.0)


def test_splits_with_tcga_in_directory_name(tmp_path):
    """A 'TCGA' substring in the graphs directory must not corrupt the
    barcode slicing (it would silently empty every split)."""
    from wsi_hgnn_tpu.pipeline.splits import typing_trainval
    import random as _random

    out = tmp_path / "TCGA_BRCA" / "graphs"
    (out / "homogeneous").mkdir(parents=True)
    (out / "heterogeneous").mkdir(parents=True)
    labels = tmp_path / "labels.txt"
    rows = []
    for i in range(10):
        bc = f"TCGA-{i:02d}-0000"
        (out / "homogeneous" / f"{bc}-01Z-00-DX1.npz").write_bytes(b"x")
        label = ("Infiltrating Ductal Carcinoma" if i % 2
                 else "Infiltrating Lobular Carcinoma")
        rows.append(f"{bc}\t{label}")
    labels.write_text("\n".join(rows))
    normal = tmp_path / "normal.txt"
    normal.write_text("")
    train, val, test = typing_trainval(
        str(out), str(normal), str(labels), rng=_random.Random(0)
    )
    assert len(train) + len(val) + len(test) == 10


def test_staging_stage_ib_filter_per_dataset(tmp_path):
    """The reference's COAD staging filter EXCLUDES 'Stage IB'
    (get_graph.py:134-136, 13 stages); only BRCA's includes it
    (get_graph.py:168-171). Split membership must match per dataset."""
    import random as _random

    from wsi_hgnn_tpu.pipeline.splits import staging_trainval

    homo = tmp_path / "homogeneous"
    homo.mkdir()
    cases = [("TCGA-AA-0001", "Stage IB"), ("TCGA-AA-0002", "Stage IA"),
             ("TCGA-AA-0003", "Stage II")]
    for case, _ in cases:
        (homo / f"{case}-01Z-00-DX1.npz").touch()
    normal = tmp_path / "normal.txt"
    normal.write_text("")
    staging = tmp_path / "staging.txt"
    staging.write_text("".join(f"{c}\t{s}\n" for c, s in cases))

    def members(dataset):
        tr, va, te = staging_trainval(str(tmp_path), str(normal),
                                      str(staging), _random.Random(0),
                                      dataset=dataset)
        return {os.path.basename(p) for p in tr + va + te}

    coad, brca = members("COAD"), members("BRCA")
    assert "TCGA-AA-0001-01Z-00-DX1.npz" not in coad  # Stage IB dropped
    assert len(coad) == 2
    assert "TCGA-AA-0001-01Z-00-DX1.npz" in brca  # Stage IB kept
    assert len(brca) == 3


def test_pil_deepzoom_honors_overlap():
    """The PIL fallback must extend tiles by `overlap` px on non-edge
    sides like openslide's DeepZoomGenerator (TileWorker then resizes
    them back, get_patches.py:63-64) — ignoring -e would emit different
    pixels per backend."""
    from wsi_hgnn_tpu.pipeline.tiler import PilDeepZoom

    img = Image.new("RGB", (32, 32))  # 4x4 tiles of 8 at the top level
    dz = PilDeepZoom(img, tile_size=8, overlap=2)
    top = dz.level_count - 1  # native resolution level
    # interior tile: 2px of context on every side
    t = dz.get_tile(top, (1, 1))
    assert t.size == (8 + 4, 8 + 4)
    # corner tile: no extension past the image edge
    t0 = dz.get_tile(top, (0, 0))
    assert t0.size == (8 + 2, 8 + 2)
    # zero overlap unchanged
    dz0 = PilDeepZoom(img, tile_size=8, overlap=0)
    assert dz0.get_tile(top, (1, 1)).size == (8, 8)
