"""Blocked brute-force kNN vs scipy cKDTree."""

import numpy as np
from scipy.spatial import cKDTree

from fusion4landslide_tpu.ops import (
    knn,
    median_nn_distance,
    nn1,
    pairwise_sqdist,
    radius_neighbors,
)


def test_pairwise_sqdist_small_dim(rng):
    a = rng.normal(size=(17, 3)).astype(np.float32)
    b = rng.normal(size=(23, 3)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(a, b))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-5)


def test_pairwise_sqdist_large_dim(rng):
    a = rng.normal(size=(17, 64)).astype(np.float32)
    b = rng.normal(size=(23, 64)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(a, b))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-3)


def test_knn_matches_kdtree(rng):
    q = rng.normal(size=(200, 3)).astype(np.float32)
    r = rng.normal(size=(500, 3)).astype(np.float32)
    d, i = knn(q, r, 5, ref_chunk=64, query_block=37)
    tree = cKDTree(r)
    dist_ref, idx_ref = tree.query(q, k=5)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), dist_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), idx_ref)


def test_knn_feature_space(rng):
    q = rng.normal(size=(100, 64)).astype(np.float32)
    r = rng.normal(size=(300, 64)).astype(np.float32)
    _, i = knn(q, r, 1)
    tree = cKDTree(r)
    _, idx_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], idx_ref)


def test_knn_ref_mask(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    r = rng.normal(size=(80, 3)).astype(np.float32)
    mask = np.arange(80) < 60
    d, i = knn(q, r, 3, ref_mask=mask)
    tree = cKDTree(r[:60])
    dist_ref, idx_ref = tree.query(q, k=3)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), dist_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), idx_ref)
    assert np.asarray(i).max() < 60


def test_knn_k_larger_than_valid(rng):
    q = rng.normal(size=(4, 3)).astype(np.float32)
    r = rng.normal(size=(8, 3)).astype(np.float32)
    mask = np.arange(8) < 2
    d, i = knn(q, r, 5, ref_mask=mask)
    d = np.asarray(d)
    assert np.isfinite(d[:, :2]).all()
    assert np.isinf(d[:, 2:]).all()


def test_nn1_and_exclude_self(rng):
    pts = rng.normal(size=(120, 3)).astype(np.float32)
    d, i = knn(pts, pts, 1, exclude_self=True)
    tree = cKDTree(pts)
    dist_ref, idx_ref = tree.query(pts, k=2)
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d)[:, 0]), dist_ref[:, 1], atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(i)[:, 0], idx_ref[:, 1])
    d1, i1 = nn1(pts, pts)
    assert (np.asarray(i1) == np.arange(120)).all()
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-6)


def test_median_nn_distance_grid():
    # Regular 1.0-spaced grid: every nearest-other distance is exactly 1.
    g = np.stack(np.meshgrid(*[np.arange(5.0)] * 3), -1).reshape(-1, 3)
    med = float(median_nn_distance(g.astype(np.float32)))
    assert abs(med - 1.0) < 1e-5


def test_median_nn_distance_masked(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    pad = np.zeros((16, 3), np.float32)
    mask = np.arange(80) < 64
    a = float(median_nn_distance(pts))
    b = float(median_nn_distance(np.vstack([pts, pad]), mask=mask))
    assert abs(a - b) < 1e-5


def test_radius_neighbors(rng):
    q = rng.normal(size=(30, 3)).astype(np.float32)
    r = rng.normal(size=(200, 3)).astype(np.float32)
    radius = 0.5
    idx, valid, dist = radius_neighbors(q, r, radius, k_max=16)
    tree = cKDTree(r)
    for qi in range(30):
        ref_set = set(tree.query_ball_point(q[qi], radius))
        got = set(np.asarray(idx[qi])[np.asarray(valid[qi])].tolist())
        if len(ref_set) <= 16:
            assert got == ref_set
        else:
            assert got <= ref_set and len(got) == 16


def test_merge_correspondences_by_priority():
    """Reference cross-level dedup merge (coarse_to_fine_matching.py:40-118):
    earlier levels win; later rows within the threshold of any merged source
    point are dropped."""
    from fusion4landslide_tpu.ops.merge import merge_correspondences_by_priority

    l0 = np.array([[0, 0, 0, 1, 1, 1], [1, 0, 0, 2, 0, 0]], np.float32)
    l1 = np.array(
        [
            [0, 0, 0.0005, 9, 9, 9],  # dup of l0 row 0 -> dropped
            [5, 5, 5, 6, 6, 6],  # new -> kept
        ],
        np.float32,
    )
    l2 = np.array(
        [
            [5, 5, 5.0001, 7, 7, 7],  # dup of the row l1 contributed
            [9, 0, 0, 9, 1, 1],  # new
        ],
        np.float32,
    )
    out = merge_correspondences_by_priority([l0, l1, l2], 1e-3)
    assert out.shape == (4, 6)
    np.testing.assert_array_equal(out[:2], l0)
    np.testing.assert_array_equal(out[2], l1[1])
    np.testing.assert_array_equal(out[3], l2[1])
