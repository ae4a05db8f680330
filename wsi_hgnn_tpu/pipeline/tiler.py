"""WSI tiling — the get_patches.py replacement
(/root/reference/get_patches.py:27-285).

Semantics preserved:
  * DeepZoom pyramid tiling at 1-2 magnification levels chosen relative to
    the slide's objective power (get_patches.py:163-168);
  * background rejection by the FIND_EDGES mean-edge statistic against a
    threshold (TileWorker, :57-65);
  * `{col}_{row}.<ext>` tile naming and the per-slide "bag" directory
    reorganisation, with 2-level pyramids nesting high-mag patches under
    their low-mag parent (nested_patches, :200-241);
  * a worker process pool fed by a JoinableQueue (:141-146).

Backends: openslide's DeepZoomGenerator when the library is present
(real .svs/.tif pyramids); otherwise a pure-PIL DeepZoom clone that serves
tiles of any PIL-readable image from a downsampled pyramid — identical
level/tile addressing, good for tests and plain-image corpora.
"""
from __future__ import annotations

import glob
import math
import os
import shutil
import sys
from multiprocessing import JoinableQueue, Process
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFilter, ImageStat

try:  # openslide is a C library; optional in this environment
    import openslide
    from openslide import open_slide
    from openslide.deepzoom import DeepZoomGenerator as _OSDeepZoom

    HAVE_OPENSLIDE = True
except ImportError:  # pragma: no cover
    HAVE_OPENSLIDE = False


class PilDeepZoom:
    """Minimal DeepZoom generator over a PIL image: level L has dimensions
    ceil(dim / 2^(level_count-1-L)); tiles are tile_size squares."""

    def __init__(self, image: Image.Image, tile_size: int, overlap: int = 0):
        self.image = image
        self.tile_size = tile_size
        self.overlap = overlap
        w, h = image.size
        self.level_count = int(math.ceil(math.log2(max(w, h)))) + 1
        self.level_dimensions = []
        for lv in range(self.level_count):
            scale = 2 ** (self.level_count - 1 - lv)
            self.level_dimensions.append(
                (max(1, int(math.ceil(w / scale))), max(1, int(math.ceil(h / scale))))
            )
        self.level_tiles = [
            (int(math.ceil(dw / tile_size)), int(math.ceil(dh / tile_size)))
            for dw, dh in self.level_dimensions
        ]
        self.tile_count = sum(c * r for c, r in self.level_tiles)
        self._cache_level: Optional[int] = None
        self._cache_img: Optional[Image.Image] = None

    def _level_image(self, level: int) -> Image.Image:
        if self._cache_level != level:
            dw, dh = self.level_dimensions[level]
            self._cache_img = self.image.resize((dw, dh))
            self._cache_level = level
        return self._cache_img

    def get_tile(self, level: int, address: Tuple[int, int]) -> Image.Image:
        # DeepZoom overlap semantics: each tile is extended by `overlap`
        # pixels on every side that is not an image edge (openslide's
        # DeepZoomGenerator does the same; TileWorker then resizes
        # oversized tiles back to tile_size, get_patches.py:63-64) —
        # ignoring it would make the PIL fallback emit pixel-different
        # tiles than the openslide backend for the same -e argument
        col, row = address
        img = self._level_image(level)
        ts, ov = self.tile_size, self.overlap
        left = max(col * ts - ov, 0)
        top = max(row * ts - ov, 0)
        right = min((col + 1) * ts + ov, img.size[0])
        bottom = min((row + 1) * ts + ov, img.size[1])
        return img.crop((left, top, right, bottom))


def _open_dz(slidepath: str, tile_size: int, overlap: int, limit_bounds: bool):
    if HAVE_OPENSLIDE:
        slide = open_slide(slidepath)
        return slide, _OSDeepZoom(slide, tile_size, overlap, limit_bounds=limit_bounds)
    img = Image.open(slidepath).convert("RGB")
    return None, PilDeepZoom(img, tile_size, overlap)


def tile_is_foreground(tile: Image.Image, tile_size: int, threshold: float) -> bool:
    """FIND_EDGES mean-edge background filter (get_patches.py:57-62)."""
    edge = tile.filter(ImageFilter.FIND_EDGES)
    edge = ImageStat.Stat(edge).sum
    return float(np.mean(edge)) / (tile_size ** 2) > threshold


class TileWorker(Process):
    """Child process writing foreground tiles (get_patches.py:27-76)."""

    def __init__(self, q, slidepath, tile_size, overlap, limit_bounds, quality, threshold):
        super().__init__(name="TileWorker", daemon=True)
        self._queue = q
        self._slidepath = slidepath
        self._tile_size = tile_size
        self._overlap = overlap
        self._limit_bounds = limit_bounds
        self._quality = quality
        self._threshold = threshold

    def run(self):
        _, dz = _open_dz(self._slidepath, self._tile_size, self._overlap, self._limit_bounds)
        while True:
            data = self._queue.get()
            if data is None:
                self._queue.task_done()
                break
            level, address, outfile = data
            try:
                tile = dz.get_tile(level, address)
                if tile_is_foreground(tile, self._tile_size, self._threshold):
                    w, h = tile.size
                    if not (w == self._tile_size and h == self._tile_size):
                        tile = tile.resize((self._tile_size, self._tile_size))
                    tile.save(outfile, quality=self._quality)
            except Exception:
                pass  # skip-and-continue, like the reference (:66-67)
            self._queue.task_done()


class DeepZoomStaticTiler:
    """Whole-slide tiler (get_patches.py:127-197): picks DeepZoom levels by
    target magnifications relative to the slide objective power and streams
    tile jobs to the worker pool."""

    def __init__(self, slidepath, basename, mag_levels: Sequence[int], base_mag: float,
                 objective: float, fmt: str, tile_size: int, overlap: int,
                 limit_bounds: bool, quality: int, workers: int, threshold: float):
        self._slidepath = slidepath
        self._basename = basename
        self._format = fmt
        self._tile_size = tile_size
        self._overlap = overlap
        self._mag_levels = list(mag_levels)
        self._base_mag = base_mag
        self._objective = objective
        self._limit_bounds = limit_bounds
        self._queue: JoinableQueue = JoinableQueue(2 * workers)
        self._workers = workers
        self._threshold = threshold
        for _ in range(workers):
            TileWorker(self._queue, slidepath, tile_size, overlap, limit_bounds,
                       quality, threshold).start()

    def run(self):
        slide, dz = _open_dz(self._slidepath, self._tile_size, self._overlap,
                             self._limit_bounds)
        mag_base = None
        if HAVE_OPENSLIDE and slide is not None:
            mag_base = slide.properties.get(openslide.PROPERTY_NAME_OBJECTIVE_POWER)
        if mag_base is None:
            mag_base = self._objective
        first_level = int(math.log2(float(mag_base) / self._base_mag))
        target_levels = [i + first_level for i in self._mag_levels]
        target_levels.reverse()

        dz_levels = [dz.level_count - i - 1 for i in target_levels]
        mag_list = [int(int(mag_base) / 2 ** i) for i in target_levels]
        for mag, level in zip(mag_list, dz_levels):
            if not 0 <= level < dz.level_count:
                # the reference iterates existing levels and skips
                # out-of-range targets (get_patches.py:95-100); direct
                # indexing would crash (level == level_count when the
                # slide lacks objective-power metadata) or silently tile
                # the WRONG level via negative-index wraparound
                print(f"skipping magnification {mag}: DeepZoom level "
                      f"{level} outside [0, {dz.level_count})",
                      file=sys.stderr)
                continue
            tiledir = os.path.join(f"{self._basename}_files", str(mag))
            os.makedirs(tiledir, exist_ok=True)
            cols, rows = dz.level_tiles[level]
            for row in range(rows):
                for col in range(cols):
                    tilename = os.path.join(tiledir, f"{col}_{row}.{self._format}")
                    if not os.path.exists(tilename):
                        self._queue.put((level, (col, row), tilename))
        self._shutdown()

    def _shutdown(self):
        for _ in range(self._workers):
            self._queue.put(None)
        self._queue.join()


def nested_patches(img_slide: str, out_base: str, temp_base: str,
                   levels: Sequence[int] = (0,), ext: str = "jpeg",
                   class_index: int = 2) -> str:
    """Reorganise tiles into per-slide bag dirs (get_patches.py:200-241);
    2-level pyramids nest high-mag tiles under their low-mag parent tile.
    Returns the bag path."""
    parts = img_slide.split(os.sep)
    img_name = parts[-1].split(".")[0]
    img_class = parts[class_index] if len(parts) > class_index else "default"
    bag_path = os.path.join(out_base, img_class, img_name)
    os.makedirs(bag_path, exist_ok=True)
    temp_files = f"{temp_base}_files"

    if len(levels) == 1:
        patches = glob.glob(os.path.join(temp_files, "*", "*." + ext))
        for patch in patches:
            shutil.move(patch, os.path.join(bag_path, os.path.basename(patch)))
    else:
        level_factor = 2 ** int(levels[1] - levels[0])
        mags = sorted(int(os.path.basename(i))
                      for i in glob.glob(os.path.join(temp_files, "*")))
        low_patches = glob.glob(os.path.join(temp_files, str(mags[0]), "*." + ext))
        for low_patch in low_patches:
            name = os.path.basename(low_patch)
            shutil.move(low_patch, os.path.join(bag_path, name))
            folder = name.split(".")[0]
            high_dir = os.path.join(bag_path, folder)
            os.makedirs(high_dir, exist_ok=True)
            low_x, low_y = (int(v) for v in folder.split("_"))
            for x in range(low_x * level_factor, (low_x + 1) * level_factor):
                for y in range(low_y * level_factor, (low_y + 1) * level_factor):
                    hp = glob.glob(os.path.join(temp_files, str(mags[1]), f"{x}_{y}." + ext))
                    if hp:
                        shutil.move(hp[0], os.path.join(high_dir, os.path.basename(hp[0])))
            try:
                # drop childless folders; KEEP the low-mag patch — the
                # reference's os.remove targets the already-moved temp
                # path, always raises, and is swallowed
                # (get_patches.py:230-237), so its bags keep these tiles
                os.rmdir(high_dir)
            except OSError:
                pass
    return bag_path


def tile_slides(slides: Sequence[str], out_base: str, *, levels=(0,), base_mag=40.0,
                objective=20.0, fmt="jpeg", tile_size=256, overlap=0, quality=70,
                workers=4, background_t=15, class_index: int = 2) -> None:
    """The get_patches __main__ loop (:275-283): tile each slide into a temp
    DeepZoom tree, reorganise into bags, clean up."""
    # WSIs legitimately exceed PIL's decompression-bomb threshold; lift the
    # guard only for the tiling entry point, not at library import (the
    # reference sets this in its __main__, get_patches.py)
    Image.MAX_IMAGE_PIXELS = None
    temp_base = "WSI_temp_2" if len(levels) == 1 else "WSI_temp"
    for idx, c_slide in enumerate(slides):
        print(f"Process slide {idx + 1}/{len(slides)}")
        DeepZoomStaticTiler(c_slide, temp_base, levels, base_mag, objective, fmt,
                            tile_size, overlap, True, quality, workers,
                            background_t).run()
        nested_patches(c_slide, out_base, temp_base, levels, fmt, class_index)
        shutil.rmtree(f"{temp_base}_files", ignore_errors=True)
    print(f"Patch extraction done for {len(slides)} slides.")
