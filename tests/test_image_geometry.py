"""Camera geometry: projection/lifting round trips and match chaining."""

import numpy as np
from scipy.spatial.transform import Rotation

from fusion4landslide_tpu.image import (
    chain_2d_matches_to_3d,
    lift_pixels_to_world,
    project_points,
    rasterize_depth,
)

H, W = 480, 640
K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], np.float32)


def camera(rng):
    R = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix()
    t = np.array([0.1, -0.2, 0.5])
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = t
    return E


def cloud(rng, n=2000):
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 6.0, size=n)  # in front of the camera
    return pts


def test_project_lift_roundtrip(rng):
    pts = cloud(rng)
    E = camera(rng)
    uv, depth, valid = project_points(pts, E, K, (H, W))
    uv, depth, valid = map(np.asarray, (uv, depth, valid))
    assert valid.sum() > 1000
    back = np.asarray(
        lift_pixels_to_world(uv[valid], depth[valid], E, K, (H, W))
    )
    np.testing.assert_allclose(back, pts[valid], atol=1e-3)


def test_v_flip_convention(rng):
    # v_flip reflects v about the image height: v_flipped == H - v_raw
    # (base:1365 ``image_size[0] - v``).
    E = np.eye(4, dtype=np.float32)
    p = np.array([[0.0, 0.5, 4.0], [0.0, -0.5, 4.0]], np.float32)
    uv_f, _, valid = project_points(p, E, K, (H, W))
    uv_r, _, _ = project_points(p, E, K, (H, W), v_flip=False)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(
        np.asarray(uv_f)[:, 1], H - np.asarray(uv_r)[:, 1], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(uv_f)[:, 0], np.asarray(uv_r)[:, 0], atol=1e-4
    )


def test_rasterize_depth_zbuffer(rng):
    # Two points projecting to the same pixel: nearest wins.
    E = np.eye(4, dtype=np.float32)
    pts = np.array([[0.0, 0.0, 4.0], [0.0, 0.0, 2.0]], np.float32)
    uv, depth, valid = project_points(pts, E, K, (H, W))
    dmap, imap = rasterize_depth(uv, depth, valid, (H, W))
    dmap, imap = np.asarray(dmap), np.asarray(imap)
    px = np.asarray(uv)[0].astype(int)
    assert dmap[px[1], px[0]] == 2.0
    assert imap[px[1], px[0]] == 1
    assert (dmap == -1).sum() == H * W - 1


def test_chain_2d_matches(rng):
    pts = cloud(rng, 500)
    E = camera(rng)
    shift = np.array([0.05, 0.0, 0.02], np.float32)
    pts_t = pts + shift
    uv_s, _, val_s = project_points(pts, E, K, (H, W))
    uv_t, _, val_t = project_points(pts_t, E, K, (H, W))
    # perfect dense 2D matches between the two projections
    sel = np.asarray(val_s) & np.asarray(val_t)
    corres = np.hstack([np.asarray(uv_s)[sel], np.asarray(uv_t)[sel]]).astype(
        np.float32
    )
    tgt_idx, valid = chain_2d_matches_to_3d(
        corres, uv_s, uv_t, 2.0, src_valid=val_s, tgt_valid=val_t
    )
    tgt_idx, valid = np.asarray(tgt_idx), np.asarray(valid)
    assert valid.sum() > 0.8 * sel.sum()
    # Chained 3D correspondences recover the displacement.
    disp = pts_t[tgt_idx[valid]] - pts[valid]
    np.testing.assert_allclose(np.median(disp, axis=0), shift, atol=0.02)
