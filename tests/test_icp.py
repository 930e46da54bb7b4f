"""ICP vs known transforms and masking semantics."""

import numpy as np
from scipy.spatial.transform import Rotation

from fusion4landslide_tpu.ops.icp import icp_point2point


def surface(rng, n=2000):
    xy = rng.uniform(0, 10, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5 + np.cos(xy[:, 1] * 0.7) * 0.3
    return np.column_stack([xy, z]).astype(np.float32)


def test_icp_recovers_small_transform(rng):
    src = surface(rng)
    R = Rotation.from_rotvec([0.01, -0.02, 0.015]).as_matrix().astype(np.float32)
    t = np.array([0.05, -0.03, 0.02], np.float32)
    tgt = src @ R.T + t
    res = icp_point2point(src, tgt, max_dist=0.5)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=2e-2)
    assert float(res.fitness) > 0.99
    assert float(res.inlier_rmse) < 1e-2


def test_icp_identity_when_aligned(rng):
    src = surface(rng, 500)
    res = icp_point2point(src, src, max_dist=0.1)
    np.testing.assert_allclose(np.asarray(res.R), np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-4)
    assert float(res.fitness) == 1.0


def test_icp_masks(rng):
    src = surface(rng, 300)
    t = np.array([0.02, 0.01, -0.015], np.float32)
    tgt = src + t
    # Pad both sides with garbage under masks.
    srcp = np.vstack([src, np.full((50, 3), 1e3, np.float32)])
    tgtp = np.vstack([tgt, np.full((70, 3), -1e3, np.float32)])
    res = icp_point2point(
        srcp,
        tgtp,
        max_dist=0.3,
        src_mask=np.arange(350) < 300,
        tgt_mask=np.arange(370) < 300,
    )
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)
    assert float(res.fitness) > 0.99
    assert not np.asarray(res.corr_inlier)[300:].any()


def test_icp_no_overlap_degrades_gracefully(rng):
    src = surface(rng, 200)
    tgt = src + 100.0  # far out of the correspondence gate
    res = icp_point2point(src, tgt, max_dist=0.1)
    assert float(res.fitness) == 0.0
    assert int(res.n_inliers) == 0


def test_icp_vmap_over_patches(rng):
    import jax

    B, N = 4, 256
    srcs = np.stack([surface(rng, N) for _ in range(B)])
    ts = rng.normal(scale=0.02, size=(B, 3)).astype(np.float32)
    tgts = srcs + ts[:, None, :]
    fn = jax.vmap(lambda s, g: icp_point2point(s, g, max_dist=0.3))
    res = fn(srcs, tgts)
    np.testing.assert_allclose(np.asarray(res.t), ts, atol=1e-3)
    assert (np.asarray(res.fitness) > 0.99).all()
