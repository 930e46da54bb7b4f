"""PLY read/write round-trips."""

import numpy as np

from fusion4landslide_tpu.io import read_ply, write_ply


def test_binary_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)) * 1e3
    colors = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    write_ply(str(p), pts, colors)
    pc = read_ply(str(p))
    np.testing.assert_allclose(pc.points, pts, atol=1e-9)
    np.testing.assert_array_equal(pc.colors, colors)


def test_ascii_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3))
    p = tmp_path / "cloud_ascii.ply"
    write_ply(str(p), pts, ascii_format=True)
    pc = read_ply(str(p))
    np.testing.assert_allclose(pc.points, pts, rtol=1e-6)
    assert pc.colors is None


def test_float32_coords(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    p = tmp_path / "cloud_f4.ply"
    write_ply(str(p), pts, coord_dtype="f4")
    pc = read_ply(str(p))
    np.testing.assert_allclose(pc.points, pts, atol=1e-6)
