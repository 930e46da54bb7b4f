"""Point-to-plane ICP, RANSAC registration, metrics."""

import jax
import numpy as np
from scipy.spatial.transform import Rotation

from fusion4landslide_tpu.ops.registration import (
    icp_point2plane,
    ransac_registration,
)
from fusion4landslide_tpu.utils.metrics import (
    compute_inlier_ratio,
    median_displacement_error,
)


def surface(rng, n=1500):
    xy = rng.uniform(0, 10, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5 + np.cos(xy[:, 1] * 0.7) * 0.3
    return np.column_stack([xy, z]).astype(np.float32)


def test_point2plane_recovers_transform(rng):
    src = surface(rng)
    R = Rotation.from_rotvec([0.01, -0.015, 0.02]).as_matrix().astype(np.float32)
    t = np.array([0.04, -0.02, 0.01], np.float32)
    tgt = src @ R.T + t
    res = icp_point2plane(src, tgt, max_dist=0.5)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=2e-2)
    assert float(res.fitness) > 0.95


def test_ransac_vs_outliers(rng):
    n = 400
    src = rng.normal(size=(n, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.1, 0.05, -0.08]).as_matrix().astype(np.float32)
    t = np.array([0.3, -0.1, 0.2], np.float32)
    tgt = src @ R.T + t
    bad = rng.random(n) < 0.4  # 40% gross outliers
    tgt_c = tgt.copy()
    tgt_c[bad] += rng.normal(scale=2.0, size=(bad.sum(), 3)).astype(np.float32)
    res = ransac_registration(
        src, tgt_c, jax.random.PRNGKey(0),
        max_correspondence_distance=0.05, num_hypotheses=256,
    )
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-2)
    assert int(res.n_inliers) > 0.5 * (~bad).sum()


def test_inlier_ratio(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tgt = src.copy()
    tgt[:30] += 1.0  # 30% moved beyond threshold
    ratio = compute_inlier_ratio(src, tgt, np.eye(3, dtype=np.float32),
                                 np.zeros(3, np.float32), 0.1)
    assert abs(float(ratio) - 0.7) < 1e-6


def test_median_displacement_error():
    src = np.zeros((10, 3), np.float32)
    a = np.hstack([src, src + np.array([1.0, 0, 0], np.float32)])
    b = np.hstack([src, src + np.array([1.0, 0.002, 0], np.float32)])
    err = float(median_displacement_error(a, b))
    assert abs(err - 0.002) < 1e-6


def test_icp_generalized_recovers_transform(rng):
    from fusion4landslide_tpu.ops.registration import icp_generalized

    n = 400
    xy = rng.uniform(0, 8, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.8 + np.cos(xy[:, 1] * 1.3) * 0.5
    src = np.column_stack([xy, z]).astype(np.float32)
    ang = 0.03
    R_true = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    t_true = np.array([0.05, -0.04, 0.02], np.float32)
    tgt = src @ R_true.T + t_true
    import jax.numpy as jnp

    res = icp_generalized(jnp.asarray(src), jnp.asarray(tgt), 0.5)
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=2e-3)
    assert float(res.fitness) > 0.95


def test_colored_icp_recovers_inplane_shift(rng):
    """Flat plane with a colour texture, shifted IN the plane: geometry
    alone cannot observe the slide (point-to-plane is unconstrained along
    the plane); the photometric tangent-plane term recovers it (Park et
    al. objective, o3d_tools.py:74-128)."""
    import jax.numpy as jnp

    from fusion4landslide_tpu.ops.registration import colored_icp

    n = 3000
    xy = rng.uniform(0, 4, size=(n, 2))
    pts = np.column_stack([xy, np.zeros(n)]).astype(np.float32)
    gray = (0.5 + 0.4 * np.sin(xy[:, 0] * 4.0) * np.cos(xy[:, 1] * 3.0)).astype(
        np.float32
    )
    colors = np.repeat(gray[:, None], 3, axis=1)
    shift = np.array([0.015, -0.01, 0.0], np.float32)  # in-plane slide
    res = colored_icp(
        jnp.asarray(pts + shift),
        jnp.asarray(pts),
        jnp.asarray(colors),
        jnp.asarray(colors),
        voxel_scales=(0.08, 0.04),
        max_iters=(30, 20),
    )
    np.testing.assert_allclose(np.asarray(res.t), -shift, atol=3e-3)
    np.testing.assert_allclose(np.asarray(res.R), np.eye(3), atol=5e-3)
