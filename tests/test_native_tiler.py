"""Native C++ tiler vs the numpy tiler on the same epochs."""

import numpy as np
import pytest

from fusion4landslide_tpu.io import read_ply, write_ply
from fusion4landslide_tpu.tiling import tile_point_clouds
from fusion4landslide_tpu.tiling.native import (
    build_native,
    native_available,
    tile_point_clouds_native,
)

pytestmark = pytest.mark.skipif(
    not (native_available() or build_native()),
    reason="native library unavailable and toolchain missing",
)


def make_pair(rng, n=4000, extent=200.0):
    src = rng.uniform(0, extent, size=(n, 3))
    src[:, 2] *= 0.05
    tgt = src + np.array([0.1, -0.05, 0.02])
    return src, tgt


def test_native_matches_python(tmp_path, rng):
    src, tgt = make_pair(rng)
    write_ply(str(tmp_path / "src.ply"), src)
    write_ply(str(tmp_path / "tgt.ply"), tgt)

    n_py = tile_point_clouds(
        str(tmp_path / "src.ply"), str(tmp_path / "tgt.ply"),
        max_pts=800, min_pts=5, voxel_flag=False, voxel_size=0.0,
        overlap=0.0, proj_dir=-1, save_dir=str(tmp_path / "py"),
    )
    n_cc = tile_point_clouds_native(
        str(tmp_path / "src.ply"), str(tmp_path / "tgt.ply"),
        max_pts=800, min_pts=5, save_dir=str(tmp_path / "cc"),
    )
    assert n_cc == n_py
    # Tile point multisets agree (IDs may be ordered differently; compare
    # the union of all core source tiles).
    def gather(root):
        pts = []
        for i in range(n_py):
            pts.append(read_ply(str(root / f"non_overlap/source_tile_{i}.ply")).points)
        return np.sort(np.vstack(pts).round(6).view("f8,f8,f8"), axis=0)

    np.testing.assert_array_equal(gather(tmp_path / "py"), gather(tmp_path / "cc"))


def test_native_rgb_roundtrip(tmp_path, rng):
    src, tgt = make_pair(rng, n=1000, extent=50.0)
    rgb = rng.integers(0, 256, size=(1000, 3)).astype(np.uint8)
    write_ply(str(tmp_path / "src.ply"), src, rgb)
    write_ply(str(tmp_path / "tgt.ply"), tgt, rgb)
    n = tile_point_clouds_native(
        str(tmp_path / "src.ply"), str(tmp_path / "tgt.ply"),
        max_pts=5000, min_pts=2, save_dir=str(tmp_path / "out"),
    )
    assert n == 1
    pc = read_ply(str(tmp_path / "out/non_overlap/source_tile_0.ply"))
    assert pc.colors is not None
    assert pc.colors.shape[1] == 3


def test_native_error_reporting(tmp_path):
    (tmp_path / "bad.ply").write_bytes(b"garbage")
    with pytest.raises(RuntimeError):
        tile_point_clouds_native(
            str(tmp_path / "bad.ply"), str(tmp_path / "bad.ply"),
            max_pts=100, min_pts=2, save_dir=str(tmp_path / "o"),
        )
