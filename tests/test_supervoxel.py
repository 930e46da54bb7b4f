"""Supervoxel segmentation properties (vs reference semantics, not bytes:
label partitions are only consumed as groups; parity is structural)."""

import numpy as np

from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation


def test_partition_and_compactness(rng):
    pts = rng.uniform(0, 10, size=(2000, 3)).astype(np.float32)
    pts[:, 2] = 0.1 * pts[:, 2]
    res = supervoxel_segmentation(pts, 2.0)
    labels = np.asarray(res.labels)
    k = int(res.n_supervoxels)
    assert labels.min() >= 0 and labels.max() == k - 1
    # roughly one supervoxel per occupied 2m cell of a 10x10 footprint
    assert 15 <= k <= 40
    # spatial coherence: each supervoxel's diameter bounded by a few radii
    for lbl in range(k):
        sel = pts[labels == lbl]
        assert sel.shape[0] > 0
        if sel.shape[0] > 1:
            ext = sel.max(0) - sel.min(0)
            assert np.linalg.norm(ext) < 4 * 2.0


def test_boundary_respects_normals(rng):
    """Two orthogonal planes: supervoxels should rarely straddle the crease."""
    n = 900
    a = np.column_stack(
        [rng.uniform(0, 4, n), rng.uniform(0, 4, n), np.zeros(n)]
    )
    b = np.column_stack(
        [np.full(n, 4.0), rng.uniform(0, 4, n), rng.uniform(0, 4, n)]
    )
    # jitter so normals are well-defined but distinct
    a += rng.normal(scale=0.01, size=a.shape)
    b += rng.normal(scale=0.01, size=b.shape)
    pts = np.vstack([a, b]).astype(np.float32)
    res = supervoxel_segmentation(pts, 1.0)
    labels = np.asarray(res.labels)
    # Count labels that mix plane-a and plane-b points far from the crease.
    far_a = pts[:, 0] < 3.0
    far_b = pts[:, 2] > 1.0
    mixed = 0
    for lbl in range(int(res.n_supervoxels)):
        sel = labels == lbl
        if (sel & far_a).any() and (sel & far_b).any():
            mixed += 1
    assert mixed == 0


def test_masked_points_excluded(rng):
    pts = rng.uniform(0, 5, size=(500, 3)).astype(np.float32)
    mask = np.arange(500) < 400
    res = supervoxel_segmentation(pts, 1.5, mask=mask)
    labels = np.asarray(res.labels)
    assert (labels[400:] == -1).all()
    assert (labels[:400] >= 0).all()


def test_label_members_roundtrip(rng):
    labels = rng.integers(0, 7, size=100).astype(np.int32)
    labels[::13] = -1
    S, P = 8, 64
    idx, mask = label_members(labels, S, P)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for lbl in range(7):
        want = set(np.where(labels == lbl)[0].tolist())
        got = set(idx[lbl][mask[lbl]].tolist())
        assert got == want


def test_bucket_size():
    assert bucket_size(5) == 64
    assert bucket_size(64) == 64
    assert bucket_size(65) == 128
    assert bucket_size(40000) == 65536
