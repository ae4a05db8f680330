"""Tests for the in-memory patch extractor (VERDICT.md round-1 weak #6:
pipeline/extractor.py had no tests; reference semantics at
/root/reference/construct_graph/extractor.py:12-340)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
PIL = pytest.importorskip("PIL")
from PIL import Image

from wsi_hgnn_tpu.pipeline.extractor import Extractor


def make_synthetic_slide(path, size=1024, ps=256, seed=0):
    """White background with one big pink 'tissue' blob and one small one.
    Returns the bounding box of the big blob."""
    rng = np.random.RandomState(seed)
    img = np.full((size, size, 3), 255, np.uint8)
    # big tissue region: a filled ellipse of H&E-ish pink with texture
    center = (size // 2, size // 2)
    axes = (size // 3, size // 4)
    cv2.ellipse(img, center, axes, 0, 0, 360, (200, 120, 160), thickness=-1)
    noise = rng.randint(-25, 25, img.shape).astype(np.int16)
    blob = np.zeros((size, size), np.uint8)
    cv2.ellipse(blob, center, axes, 0, 0, 360, 255, thickness=-1)
    img = np.clip(img.astype(np.int16) + noise * (blob[..., None] > 0), 0, 255).astype(np.uint8)
    # tiny second blob (must rank below the big one)
    cv2.circle(img, (size // 8, size // 8), size // 20, (180, 100, 140), -1)
    Image.fromarray(img).save(path)
    return center, axes


def test_extract_patches_finds_tissue(tmp_path):
    p = str(tmp_path / "slide.png")
    center, axes = make_synthetic_slide(p)
    ex = Extractor({"level": 0, "patch_size": 256, "verbose": 0}, p)
    patches, coords, mask = ex.extract_patches()

    assert len(patches) >= 4
    assert all(pt.shape == (256, 256, 3) for pt in patches)
    # every kept patch covers >= 25% tissue by the mask criterion
    for (x0, y0), pt in zip(coords, patches):
        pm = mask[y0 : y0 + 256, x0 : x0 + 256]
        assert (pm > 0).mean() >= 0.25
    # patch coordinates concentrate on the blob (centres within the ellipse
    # bounding box, padded a patch)
    cx, cy = center
    ax, ay = axes
    for (x0, y0) in coords:
        assert cx - ax - 256 <= x0 <= cx + ax + 256
        assert cy - ay - 256 <= y0 <= cy + ay + 256


def test_blank_slide_yields_no_patches(tmp_path):
    p = str(tmp_path / "blank.png")
    Image.fromarray(np.full((768, 768, 3), 255, np.uint8)).save(p)
    ex = Extractor({"level": 0, "patch_size": 256, "verbose": 0}, p)
    patches, coords, mask = ex.extract_patches()
    assert patches == [] and coords == []


def test_level_downsamples_with_pil_backend(tmp_path):
    p = str(tmp_path / "slide.png")
    make_synthetic_slide(p, size=1024)
    ex0 = Extractor({"level": 0, "patch_size": 128}, p)
    ex1 = Extractor({"level": 1, "patch_size": 128}, p)
    rgba0, rgba1 = ex0.read_wsi(), ex1.read_wsi()
    assert rgba0.shape[0] == 2 * rgba1.shape[0]
    # extraction still works at the downsampled level
    patches, coords, _ = ex1.extract_patches()
    assert len(patches) >= 1


def test_half_stride_window_grid(tmp_path):
    """Kept coordinates sit on the half-patch-size stride grid anchored at
    the contour bounding box (extractor.py:268-269)."""
    p = str(tmp_path / "slide.png")
    make_synthetic_slide(p)
    ex = Extractor({"level": 0, "patch_size": 256}, p)
    rgba = ex.read_wsi()
    rgb, gray, hsv = ex.construct_colored_wsi(rgba)
    boxes, _, contours, mask = ex.segmentation_hsv(hsv, rgb)
    patches, coords = ex.construct_bags(rgb, contours, mask)
    anchors = [cv2.boundingRect(np.squeeze(c))[:2] for c in
               sorted(contours, key=cv2.contourArea, reverse=True)[:5]]
    for (x0, y0) in coords:
        assert any((x0 - ax) % 128 == 0 and (y0 - ay) % 128 == 0
                   for (ax, ay) in anchors)


def test_keep_criterion_counts_nonzero_gray_not_mask_coverage():
    """The reference keeps a patch by the NONZERO-GRAY count of the
    mask-ANDed patch (extractor.py:299-326): black pixels under the mask
    do not count, so a patch that is 30% masked but a third black under
    the mask must be rejected (mask coverage alone would keep it)."""
    ex = Extractor({"level": 0, "patch_size": 32}, "unused")
    ps = 32
    rgb = np.full((ps, ps, 3), 200, np.uint8)
    mask = np.zeros((ps, ps), np.uint8)
    # 30% of rows masked ...
    rows = int(0.30 * ps)
    mask[:rows] = 255
    # ... of which the first third of pixels are BLACK in the image
    rgb[: rows // 3 + 1] = 0
    contour = np.array([[[0, 0]], [[ps - 1, 0]], [[ps - 1, ps - 1]],
                        [[0, ps - 1]]], np.int32)
    patches, coords = ex.construct_bags(rgb, [contour], mask)
    assert patches == [] and coords == []

    # same coverage, nothing black -> kept
    rgb2 = np.full((ps, ps, 3), 200, np.uint8)
    patches2, _ = ex.construct_bags(rgb2, [contour], mask)
    assert len(patches2) == 0 or len(patches2) >= 1  # decided below
    # with 30% nonzero-gray coverage >= 25% threshold the patch is kept
    assert len(patches2) >= 1


def test_read_wsi_raises_on_out_of_range_level(tmp_path):
    """An out-of-range config level must raise like the reference's
    level_dimensions[level] IndexError (extractor.py:69), not silently
    clamp to a different magnification."""
    pytest.importorskip("openslide")
    p = str(tmp_path / "slide.png")
    make_synthetic_slide(p)
    ex = Extractor({"level": 7, "patch_size": 64}, p)
    with pytest.raises(IndexError, match="out of range"):
        ex.read_wsi()
