"""In-memory WSI patch extractor — the alternative tissue-segmentation path
(/root/reference/construct_graph/extractor.py:12-340).

Semantics preserved: load one WSI level fully into RAM; HSV in-range
threshold [20,20,20]..[200,200,200]; morphological close (15x15) then open
(5x5); contours; take the 5 largest regions; slide a patch_size/2-stride
window over each region's bounding box; keep patches whose tissue-mask
coverage is >= 25% and that are full-size. Returns (patches, coords, mask).

Backends: openslide for pyramid slides when available; PIL for plain
images (level = repeated 2x downsample).
"""
from __future__ import annotations

import time
from typing import List, Tuple

import numpy as np


class Extractor:
    def __init__(self, config: dict, wsi_path: str):
        self.cfg = config
        self.wsi_path = str(wsi_path)
        self.level = config.get("level", 0)
        self.patch_size = config.get("patch_size", 256)
        self.verbose = config.get("verbose", 0)
        self.verboseprint = print if self.verbose else (lambda *a, **k: None)

    # ------------------------------------------------------------------ #
    def read_wsi(self) -> np.ndarray:
        """Whole chosen level as RGBA (extractor.py:57-106). RAM warning is
        the scale ceiling, SURVEY.md §5."""
        try:
            # open_slide returns an ImageSlide wrapper for plain images
            # (the documented PIL-class inputs), where OpenSlide(path)
            # would raise OpenSlideUnsupportedFormatError
            from openslide import open_slide

            wsi = open_slide(self.wsi_path)
            if self.level >= wsi.level_count:
                # surface the misconfiguration like the reference's
                # level_dimensions[level] IndexError (extractor.py:69) —
                # silently clamping would extract at the wrong
                # magnification with no signal
                raise IndexError(
                    f"config level {self.level} out of range: "
                    f"{self.wsi_path} has {wsi.level_count} level(s)"
                )
            dims = wsi.level_dimensions[self.level]
            img = wsi.read_region((0, 0), self.level, dims)
            return np.asarray(img.convert("RGBA"))
        except ImportError:
            from PIL import Image

            img = Image.open(self.wsi_path).convert("RGBA")
            for _ in range(self.level):
                img = img.resize((max(1, img.size[0] // 2), max(1, img.size[1] // 2)))
            return np.asarray(img)

    @staticmethod
    def construct_colored_wsi(rgba: np.ndarray):
        """(rgb, gray, hsv) splits (extractor.py:108-123)."""
        import cv2

        r, g, b, a = cv2.split(rgba)
        rgb = cv2.merge((r, g, b))
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        hsv = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
        return rgb, gray, hsv

    def segmentation_hsv(self, hsv: np.ndarray, rgb: np.ndarray):
        """HSV threshold + close(15)/open(5) morphology + contours
        (extractor.py:125-188)."""
        import cv2

        thresh = cv2.inRange(hsv, np.array([20, 20, 20]), np.array([200, 200, 200]))
        image_close = cv2.morphologyEx(thresh, cv2.MORPH_CLOSE, np.ones((15, 15), np.uint8))
        image_open = cv2.morphologyEx(image_close, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
        return self.get_contours(image_open, rgb.shape)

    def get_contours(self, cont_img: np.ndarray, rgb_shape):
        """(bounding_boxes, contour_coords, contours, mask)
        (extractor.py:190-219)."""
        import cv2

        contours, _ = cv2.findContours(cont_img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        bounding_boxes = [cv2.boundingRect(c) for c in contours]
        contour_coords = [np.squeeze(c, axis=1) if c.ndim == 3 else c for c in contours]
        mask = np.zeros(rgb_shape[:2], np.uint8)
        cv2.drawContours(mask, contours, -1, 255, thickness=cv2.FILLED)
        return bounding_boxes, contour_coords, contours, mask

    def construct_bags(self, rgb: np.ndarray, contours, mask: np.ndarray):
        """5 largest regions, half-patch-stride window, >=25% tissue filter
        (extractor.py:221-340)."""
        import cv2

        patches: List[np.ndarray] = []
        coords: List[Tuple[int, int]] = []
        ps = self.patch_size
        contours_ = sorted(contours, key=cv2.contourArea, reverse=True)[:5]
        for box in contours_:
            x, y, w, h = cv2.boundingRect(np.squeeze(box))
            for y0 in np.arange(y, y + h, step=ps // 2):
                for x0 in np.arange(x, x + w, step=ps // 2):
                    patch = rgb[y0 : y0 + ps, x0 : x0 + ps, :]
                    pm = mask[y0 : y0 + ps, x0 : x0 + ps]
                    if patch.shape[:2] != (ps, ps):
                        continue
                    # keep by the count of NONZERO GRAY pixels of the
                    # mask-ANDed patch (extractor.py:299-326): a masked
                    # pixel that is (near-)black in the IMAGE does not
                    # count — plain mask coverage would keep patches the
                    # reference rejects (pen marks, shadow, slide border)
                    masked = cv2.bitwise_and(
                        patch, patch, mask=(pm > 0).astype(np.uint8)
                    )
                    gray = cv2.cvtColor(masked, cv2.COLOR_RGB2GRAY)
                    if cv2.countNonZero(gray) >= 0.25 * ps * ps:
                        patches.append(patch)
                        coords.append((int(x0), int(y0)))
        return patches, coords

    # ------------------------------------------------------------------ #
    def extract_patches(self):
        """(patches, coords, mask) — the public entry (extractor.py:30-55)."""
        t0 = time.time()
        rgba = self.read_wsi()
        rgb, gray, hsv = self.construct_colored_wsi(rgba)
        _, _, contours, mask = self.segmentation_hsv(hsv, rgb)
        patches, coords = self.construct_bags(rgb, contours, mask)
        self.verboseprint(f"extracted {len(patches)} patches in {time.time()-t0:.2f}s")
        return patches, coords, mask
