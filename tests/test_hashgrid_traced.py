"""Fully-traced grid-search utilities (traced radii, lax.while_loop
growth) that power the device-resident tile steps past the old 64k-point
O(N·M) ceiling. Exactness is checked against the brute-force blocked kNN
(ops.knn) on the same inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.ops.hashgrid import (
    build_hash_grid,
    knn_grid_traced,
    median_nn_distance_traced,
    radius_sample_grid,
)
from fusion4landslide_tpu.ops.knn import knn, median_nn_distance


def _cloud(rng, n=1500):
    xy = rng.uniform(0, 12, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.4 + rng.normal(scale=0.02, size=n)
    return np.column_stack([xy, z]).astype(np.float32)


def test_knn_grid_traced_matches_brute(rng):
    pts = _cloud(rng)
    n = pts.shape[0]
    q = pts[:512]
    bd, bi = knn(q, pts, 8, exclude_self=False)
    gd, gi = knn_grid_traced(q, pts, 8)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(bd), rtol=1e-5)
    # Indices may permute among exact ties; distances pin the answer.


def test_knn_grid_traced_exclude_self_and_masks(rng):
    pts = _cloud(rng, 900)
    mask = np.ones(900, bool)
    mask[700:] = False
    bd, _ = knn(pts, pts, 4, mask, exclude_self=True)
    gd, _ = knn_grid_traced(
        pts, pts, 4, ref_mask=mask, query_mask=mask, exclude_self=True
    )
    np.testing.assert_allclose(
        np.asarray(gd)[:700], np.asarray(bd)[:700], rtol=1e-5
    )


def test_knn_grid_traced_r_max_bounds(rng):
    pts = _cloud(rng, 600)
    # Far-away query: bounded search must report inf, not grow past r_max.
    q = np.array([[100.0, 100.0, 100.0]], np.float32)
    gd, _ = knn_grid_traced(q, pts, 1, r0=0.5, r_max=2.0)
    assert not np.isfinite(np.asarray(gd)[0, 0])


def test_knn_grid_traced_under_jit_with_traced_radius(rng):
    pts = _cloud(rng, 800)

    @jax.jit
    def f(pts, r0):
        return knn_grid_traced(pts, pts, 3, r0=r0, exclude_self=True)

    gd, gi = f(pts, jnp.float32(0.2))
    bd, _ = knn(pts, pts, 3, exclude_self=True)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(bd), rtol=1e-5)


def test_median_nn_traced_matches_eager(rng):
    pts = _cloud(rng, 2000)
    mask = np.ones(2000, bool)
    mask[1800:] = False
    a = float(median_nn_distance_traced(jnp.asarray(pts), jnp.asarray(mask)))
    b = float(median_nn_distance(jnp.asarray(pts), jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_radius_sample_grid_in_radius_no_self(rng):
    pts = _cloud(rng, 1200)
    radius = 1.0
    # Pre-shuffle for unbiased per-cell runs (the device steps do this).
    perm = rng.permutation(1200)
    grid = build_hash_grid(jnp.asarray(pts[perm]), radius)
    coords, valid = radius_sample_grid(
        jnp.asarray(pts), grid, radius, 7, num_samples=64
    )
    coords = np.asarray(coords)
    valid = np.asarray(valid)
    d = np.linalg.norm(coords - pts[:, None, :], axis=-1)
    assert np.all(d[valid] <= radius + 1e-5)
    assert np.all(d[valid] > 1e-4)  # self excluded
    # Count parity where the ball is small: valid count == true in-radius
    # count (minus self) when below num_samples.
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    true_counts = np.array(
        [len(tree.query_ball_point(p, radius)) - 1 for p in pts[:200]]
    )
    got = valid[:200].sum(axis=1)
    small = true_counts < 64
    np.testing.assert_array_equal(got[small], true_counts[small])
    assert np.all(got[~small] == 64)
