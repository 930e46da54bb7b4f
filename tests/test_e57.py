"""E57 reader/writer round-trip (io/e57.py; the reference's Rockfall
Simulator epochs ship as e57 — README.md:83, demo.yaml multiple_case)."""

import struct

import numpy as np
import pytest

from fusion4landslide_tpu.io.e57 import _PAGE, read_e57, write_e57


def test_e57_roundtrip_points_only(tmp_path, rng):
    pts = rng.uniform(-50, 50, size=(3777, 3))  # odd count: packet chunking
    path = str(tmp_path / "cloud.e57")
    write_e57(path, pts)
    cloud = read_e57(path)
    np.testing.assert_allclose(cloud.points, pts, rtol=0, atol=0)
    assert cloud.colors is None


def test_e57_roundtrip_with_colors(tmp_path, rng):
    pts = rng.uniform(-5, 5, size=(1234, 3))
    cols = rng.integers(0, 256, size=(1234, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud_rgb.e57")
    write_e57(path, pts, cols)
    cloud = read_e57(path)
    np.testing.assert_allclose(cloud.points, pts)
    np.testing.assert_array_equal(cloud.colors, cols)


def test_e57_file_structure(tmp_path, rng):
    """The written file follows the physical page layout: signature, page
    multiple, and a parseable XML section at the header's offset."""
    pts = rng.uniform(0, 1, size=(100, 3))
    path = str(tmp_path / "s.e57")
    write_e57(path, pts)
    raw = open(path, "rb").read()
    assert raw[:8] == b"ASTM-E57"
    assert len(raw) % _PAGE == 0
    (_, _, phys_len, xml_phys, xml_len, page) = struct.unpack_from(
        "<IIQQQQ", raw, 8
    )
    assert phys_len == len(raw)
    assert page == _PAGE


def test_e57_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.e57")
    open(path, "wb").write(b"definitely not an e57 file" * 10)
    with pytest.raises(ValueError, match="not an E57 file"):
        read_e57(path)
