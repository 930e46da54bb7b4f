"""Sliding-window crop utility (reference src/image_crop.py parity)."""

import numpy as np

from fusion4landslide_tpu.image.crop import (
    crop_and_save,
    crop_image,
    grid_crop_boxes,
)


def test_boxes_cover_image():
    boxes = grid_crop_boxes((100, 140), (40, 60), (10, 20))
    covered = np.zeros((100, 140), bool)
    for y, x, h, w in boxes:
        assert 0 <= y <= 60 and 0 <= x <= 80
        covered[y : y + h, x : x + w] = True
    assert covered.all()


def test_crop_arrays_roundtrip(rng):
    img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    crops = crop_image(img, (32, 48), (16, 24))
    for (y, x), c in crops:
        np.testing.assert_array_equal(c, img[y : y + 32, x : x + 48])


def test_crop_and_save(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    p = tmp_path / "epoch1.jpg"
    Image.fromarray(img).save(p)
    written = crop_and_save(str(p), str(tmp_path), (32, 48), (16, 24))
    assert written
    for w in written:
        assert w.endswith(".jpg")
        arr = np.asarray(Image.open(w))
        assert arr.shape == (32, 48, 3)
