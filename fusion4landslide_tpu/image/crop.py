"""Standalone sliding-window image cropping utility.

Capability parity with the reference's ``src/image_crop.py`` (:9-37): crop
src/tgt epoch images into overlapping windows written as
``cropped_images/<image_name>/x_y.jpg``; the same sliding-window logic is
embedded in the online matchers (base:1109-1121). Host-side only (PIL /
numpy) — crops feed the image matchers or external tools.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

__all__ = ["grid_crop_boxes", "crop_image", "crop_and_save"]


def grid_crop_boxes(
    image_size: tuple[int, int],
    crop_size: tuple[int, int],
    overlap_size: tuple[int, int],
) -> list[tuple[int, int, int, int]]:
    """Sliding-window boxes (top, left, height, width) covering the image.

    Stride = crop - overlap; the final row/column is clamped flush with the
    image border so every pixel is covered (reference image_crop.py:20-33).
    """
    h, w = image_size
    ch, cw = crop_size
    oh, ow = overlap_size
    sy = max(ch - oh, 1)
    sx = max(cw - ow, 1)
    ys = sorted({min(y, max(h - ch, 0)) for y in range(0, max(h - ch, 0) + sy, sy)})
    xs = sorted({min(x, max(w - cw, 0)) for x in range(0, max(w - cw, 0) + sx, sx)})
    return [(y, x, min(ch, h), min(cw, w)) for y in ys for x in xs]


def crop_image(
    image: np.ndarray,
    crop_size: tuple[int, int],
    overlap_size: tuple[int, int],
) -> list[tuple[tuple[int, int], np.ndarray]]:
    """[((top, left), crop array)] for every sliding window."""
    out = []
    for y, x, ch, cw in grid_crop_boxes(image.shape[:2], crop_size, overlap_size):
        out.append(((y, x), image[y : y + ch, x : x + cw]))
    return out


def crop_and_save(
    image_path: str,
    out_root: str,
    crop_size: tuple[int, int],
    overlap_size: tuple[int, int],
) -> list[str]:
    """Crop an image file to ``out_root/cropped_images/<name>/x_y.jpg``
    (reference image_crop.py:9-37). Returns the written paths."""
    from PIL import Image

    img = np.asarray(Image.open(image_path).convert("RGB"))
    name = osp.splitext(osp.basename(image_path))[0]
    out_dir = osp.join(out_root, "cropped_images", name)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for (y, x), crop in crop_image(img, crop_size, overlap_size):
        path = osp.join(out_dir, f"{x}_{y}.jpg")
        Image.fromarray(crop).save(path)
        written.append(path)
    return written
