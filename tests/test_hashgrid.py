"""Hash-grid kNN vs brute-force/scipy within the radius bound."""

import numpy as np
from scipy.spatial import cKDTree

from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn


def test_matches_kdtree_within_radius(rng):
    ref = rng.uniform(0, 10, size=(3000, 3)).astype(np.float32)
    q = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
    radius = 0.7
    grid = build_hash_grid(ref, radius)
    d, i, ov = hash_grid_knn(q, grid, radius, k=4, cap=128)
    assert int(ov) == 0
    d, i = np.asarray(d), np.asarray(i)
    tree = cKDTree(ref)
    dist_ref, idx_ref = tree.query(q, k=4, distance_upper_bound=radius)
    finite = np.isfinite(dist_ref)
    np.testing.assert_allclose(
        np.sqrt(d[finite]), dist_ref[finite], atol=1e-4
    )
    np.testing.assert_array_equal(i[finite], idx_ref[finite])
    assert (~np.isfinite(d[~finite])).all()


def test_ref_mask(rng):
    ref = rng.uniform(0, 5, size=(400, 3)).astype(np.float32)
    q = ref[:100] + 0.01
    mask = np.arange(400) < 300
    grid = build_hash_grid(ref, 0.5, ref_mask=mask)
    d, i, _ = hash_grid_knn(q, grid, 0.5, k=1)
    i = np.asarray(i)
    assert i.max() < 300
    tree = cKDTree(ref[:300])
    _, idx_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(i[:, 0], idx_ref)


def test_exclude_self(rng):
    pts = rng.uniform(0, 5, size=(600, 3)).astype(np.float32)
    grid = build_hash_grid(pts, 1.0)
    d, i, _ = hash_grid_knn(pts, grid, 1.0, k=1, exclude_self=True)
    tree = cKDTree(pts)
    dist_ref, idx_ref = tree.query(pts, k=2)
    sel = np.isfinite(np.asarray(d)[:, 0])
    np.testing.assert_array_equal(np.asarray(i)[sel, 0], idx_ref[sel, 1])
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d)[sel, 0]), dist_ref[sel, 1], atol=1e-4
    )


def test_overflow_detection(rng):
    # 1000 points in one tiny cell with cap 16 -> overflow must be flagged.
    ref = (rng.uniform(0, 0.01, size=(1000, 3))).astype(np.float32)
    grid = build_hash_grid(ref, 1.0)
    _, _, ov = hash_grid_knn(ref[:10], grid, 1.0, k=1, cap=16)
    assert int(ov) > 0
