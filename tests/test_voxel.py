"""Voxel binning / downsampling vs a plain-python reference."""

import numpy as np

from fusion4landslide_tpu.ops import group_by_cells, grid_cells, voxel_downsample


def _py_voxelize(points, voxel, origin):
    cells = np.floor((points - origin) / voxel).astype(np.int64)
    groups = {}
    for i, c in enumerate(map(tuple, cells)):
        groups.setdefault(c, []).append(i)
    return groups


def test_group_by_cells_counts(rng):
    pts = rng.uniform(0, 4, size=(300, 3)).astype(np.float32)
    origin = np.zeros(3, np.float32)
    cells = np.asarray(grid_cells(pts, 1.0, origin))
    p2g, n_groups, _ = group_by_cells(cells)
    ref = _py_voxelize(pts, 1.0, origin)
    assert int(n_groups) == len(ref)
    # Points sharing a cell share a group id and vice versa.
    p2g = np.asarray(p2g)
    for members in ref.values():
        assert len({p2g[i] for i in members}) == 1
    assert len(set(p2g.tolist())) == len(ref)


def test_group_by_cells_mask(rng):
    pts = rng.uniform(0, 4, size=(100, 3)).astype(np.float32)
    mask = np.arange(100) < 70
    cells = np.asarray(grid_cells(pts, 1.0, np.zeros(3, np.float32)))
    p2g, n_groups, _ = group_by_cells(cells, mask)
    ref = _py_voxelize(pts[:70], 1.0, np.zeros(3))
    assert int(n_groups) == len(ref)
    assert (np.asarray(p2g)[~mask] >= int(n_groups)).all()


def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(0, 3, size=(200, 3)).astype(np.float32)
    centroids, p2v, counts, n_vox = voxel_downsample(pts, 0.5)
    ref = _py_voxelize(pts, 0.5, pts.min(0))
    assert int(n_vox) == len(ref)
    centroids, p2v, counts = map(np.asarray, (centroids, p2v, counts))
    for members in ref.values():
        g = p2v[members[0]]
        np.testing.assert_allclose(
            centroids[g], pts[members].mean(0), atol=1e-5
        )
        assert counts[g] == len(members)


def test_voxel_downsample_negative_coords(rng):
    pts = rng.uniform(-5, 5, size=(150, 3)).astype(np.float32)
    origin = np.array([-5.0, -5.0, -5.0], np.float32)
    centroids, p2v, counts, n_vox = voxel_downsample(pts, 1.0, origin=origin)
    ref = _py_voxelize(pts, 1.0, origin)
    assert int(n_vox) == len(ref)
