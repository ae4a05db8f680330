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
