"""Partition txt IO: supervoxel and 15-column superpoint formats."""

import numpy as np

from fusion4landslide_tpu.ops.partition_io import (
    read_superpoint_partition,
    read_supervoxel_txt,
    write_superpoint_partition,
    write_supervoxel_txt,
)


def test_supervoxel_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(80, 3))
    labels = rng.integers(0, 7, size=80)
    p = tmp_path / "svl.txt"
    write_supervoxel_txt(str(p), pts, labels)
    pts2, lab2 = read_supervoxel_txt(str(p))
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_array_equal(lab2, labels)


def test_superpoint_roundtrip_levels(tmp_path, rng):
    pts = rng.normal(size=(60, 3))
    l1 = rng.integers(0, 10, size=60)
    l2 = rng.integers(0, 4, size=60)
    l3 = rng.integers(0, 2, size=60)
    p = tmp_path / "partition_of_input_src_tile_0.txt"
    write_superpoint_partition(str(p), pts, [l1, l2, l3])
    for level, truth in ((1, l1), (2, l2), (3, l3)):
        pts2, lab = read_superpoint_partition(str(p), level)
        np.testing.assert_allclose(pts2, pts, atol=1e-5)
        np.testing.assert_array_equal(lab, truth)


def test_superpoint_level_padding(tmp_path, rng):
    """Fewer than 3 levels: the last level fills the remaining columns."""
    pts = rng.normal(size=(20, 3))
    l1 = rng.integers(0, 5, size=20)
    p = tmp_path / "one_level.txt"
    write_superpoint_partition(str(p), pts, [l1])
    for level in (1, 2, 3):
        _, lab = read_superpoint_partition(str(p), level)
        np.testing.assert_array_equal(lab, l1)


def test_load_or_generate_partition_labels(tmp_path, rng):
    """Shared host/sharded loader: generates + writes the 3-level artifact
    once, re-reads consistently with one parse, rejects levels > 3."""
    import os.path as osp

    import pytest

    from fusion4landslide_tpu.ops.partition_io import (
        load_or_generate_partition_labels,
    )

    pts = rng.uniform(0, 5, size=(300, 3)).astype(np.float32)
    labs = load_or_generate_partition_labels(
        str(tmp_path), "superpoint", 0, "src", pts, [1, 2]
    )
    path = osp.join(
        str(tmp_path), "superpoint_partition",
        "partition_of_input_src_tile_0.txt",
    )
    assert osp.exists(path)
    assert len(labs) == 2 and all(lab.shape == (300,) for lab in labs)
    labs2 = load_or_generate_partition_labels(
        str(tmp_path), "superpoint", 0, "src", pts, [1, 2]
    )
    for a, b in zip(labs, labs2):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="3 levels"):
        load_or_generate_partition_labels(
            str(tmp_path), "superpoint", 0, "src", pts, [1, 4]
        )
