"""Host-side patch loading for graph construction — the PatchData analog
(/root/reference/data.py:42-64): read every patch image of one slide's
directory, resize to 256, scale to [0,1] float, batch for the featurizer.

Decoding is I/O-bound host work (SURVEY.md §2.3 keeps it host-side); batches
stream to the device featurizer through a double-buffered iterator.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np


def list_patches(wsi_dir) -> List[Path]:
    """All files of one slide's patch directory, sorted for determinism
    (the reference's glob order is filesystem-dependent)."""
    return sorted(p for p in Path(wsi_dir).glob("*") if p.is_file())


def load_patch(path, size: int = 256) -> np.ndarray:
    """[size, size, 3] float32 in [0,1] (torchvision Resize+ToTensor analog,
    channel-last for TPU-friendly conv layouts)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    # torchvision Resize(256) scales the SHORT side to 256, keeping aspect,
    # with BILINEAR resampling (InterpolationMode.BILINEAR is torchvision's
    # default — PIL's own default is BICUBIC, which decodes non-256 patches
    # to different pixels than the reference)
    if min(w, h) != size:
        if w < h:
            img = img.resize((size, int(round(h * size / w))),
                             Image.Resampling.BILINEAR)
        else:
            img = img.resize((int(round(w * size / h)), size),
                             Image.Resampling.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    # center-crop to square if the aspect wasn't 1:1 — deliberate deviation
    # for static shapes: the reference keeps the full resized image, but
    # its own DataLoader could not stack mixed sizes either (in practice
    # every tiled patch is already square)
    hh, ww = arr.shape[:2]
    if hh != size or ww != size:
        top = (hh - size) // 2
        left = (ww - size) // 2
        arr = arr[top : top + size, left : left + size]
    return arr


def iter_patch_batches(
    paths: List[Path],
    batch_size: int,
    size: int = 256,
    prefetch: int = 2,
) -> Iterator[np.ndarray]:
    """Yield [b, size, size, 3] float32 batches with background decoding."""

    def make(idxs):
        return np.stack([load_patch(paths[i], size) for i in idxs])

    chunks = [
        list(range(i, min(i + batch_size, len(paths))))
        for i in range(0, len(paths), batch_size)
    ]
    # a corrupt patch must RAISE, not silently truncate the stream — a
    # graph built from a partial patch set would save without warning
    # (prefetched_batches re-raises worker exceptions in the consumer)
    from ..data.loader import prefetched_batches

    yield from prefetched_batches(chunks, make, prefetch)
