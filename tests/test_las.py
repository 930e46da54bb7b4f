"""LAS reader vs a hand-written LAS 1.2 file."""

import struct

import numpy as np

from fusion4landslide_tpu.io.las import read_las


def write_las12(path, pts, rgb=None, scale=0.001, offset=(100.0, 200.0, 50.0)):
    """Write a minimal LAS 1.2 file (format 2 if rgb, else 0)."""
    fmt_id = 2 if rgb is not None else 0
    rec_len = 26 + (6 if rgb is not None else 0)
    n = len(pts)
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 2
    struct.pack_into("<H", header, 94, 227)  # header size
    struct.pack_into("<I", header, 96, 227)  # offset to points
    header[104] = fmt_id
    struct.pack_into("<H", header, 105, rec_len)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<3d", header, 131, scale, scale, scale)
    struct.pack_into("<3d", header, 155, *offset)
    ints = np.round((pts - np.asarray(offset)) / scale).astype(np.int64)
    with open(path, "wb") as f:
        f.write(header)
        for i in range(n):
            rec = struct.pack("<3i", *ints[i])
            rec += struct.pack("<H", i % 65536)  # intensity
            rec += b"\x00" * (26 - len(rec) - 6)  # fill to byte 20
            rec += struct.pack("<3B3x", 0, 0, 0)[:6]  # classification etc.
            rec = rec[:20]
            if fmt_id == 2:
                rec += struct.pack("<d", 0.0)  # gps? no: fmt2 has rgb at 20
                rec = rec[:20] + struct.pack(
                    "<3H", *(np.asarray(rgb[i], np.uint16) * 257)
                )
            pad = rec_len - len(rec)
            f.write(rec + b"\x00" * pad)


def test_read_las_roundtrip(tmp_path, rng):
    pts = rng.uniform(0, 10, size=(50, 3)) + np.array([100.0, 200.0, 50.0])
    rgb = rng.integers(0, 256, size=(50, 3)).astype(np.uint8)
    p = tmp_path / "cloud.las"
    write_las12(str(p), pts, rgb)
    pc = read_las(str(p))
    assert len(pc) == 50
    np.testing.assert_allclose(pc.points, pts, atol=1e-3)
    np.testing.assert_array_equal(pc.colors, rgb)
    assert pc.extras["intensity"][5] == 5


def test_read_las_no_rgb(tmp_path, rng):
    pts = rng.uniform(-5, 5, size=(20, 3)) + np.array([100.0, 200.0, 50.0])
    p = tmp_path / "plain.las"
    write_las12(str(p), pts, rgb=None)
    pc = read_las(str(p))
    assert pc.colors is None
    np.testing.assert_allclose(pc.points, pts, atol=1e-3)


def test_reject_non_las(tmp_path):
    p = tmp_path / "bad.las"
    p.write_bytes(b"NOPE" + b"\x00" * 400)
    try:
        read_las(str(p))
        assert False
    except ValueError:
        pass
