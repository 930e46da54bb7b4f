"""RGB-guided pipeline: ZNCC matcher + lifting + supervoxel refinement."""

import numpy as np

from fusion4landslide_tpu.image.matching import match_epoch_images, zncc_grid_match
from fusion4landslide_tpu.pipelines.rgb_guided import run_rgb_guided_tile

H, W = 240, 320
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]])


def textured_image(rng, h=H, w=W):
    # band-limited random texture so ZNCC has something to lock onto
    base = rng.normal(size=(h // 4, w // 4))
    img = np.kron(base, np.ones((4, 4)))
    img += 0.5 * rng.normal(size=(h, w))
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255
    return img.astype(np.float32)


def test_zncc_recovers_known_shift(rng):
    img0 = textured_image(rng)
    shift = (3, -5)  # (dy, dx)
    img1 = np.roll(np.roll(img0, shift[0], axis=0), shift[1], axis=1)
    m = zncc_grid_match(img0, img1, grid_step=16, patch=16, search=12,
                        min_score=0.7)
    assert m.shape[0] > 50
    flow_x = m[:, 2] - m[:, 0]
    flow_y = m[:, 3] - m[:, 1]
    assert abs(np.median(flow_x) - shift[1]) < 0.3
    assert abs(np.median(flow_y) - shift[0]) < 0.3


def test_zncc_flat_image_emits_nothing(rng):
    img = np.full((H, W), 128.0, np.float32)
    m = zncc_grid_match(img, img, grid_step=16, patch=16, search=8)
    assert m.shape[0] == 0


def test_crop_windowed_matching(rng):
    img0 = textured_image(rng)
    img1 = np.roll(img0, 2, axis=1)
    m = match_epoch_images(
        img0, img1, matcher="zncc",
        crop_size=(128, 160), overlap_size=(32, 40),
        grid_step=16, patch=16, search=8, min_score=0.7,
    )
    assert m.shape[0] > 30
    assert abs(np.median(m[:, 2] - m[:, 0]) - 2.0) < 0.3
    # coordinates must cover more than one crop window
    assert m[:, 0].max() > 160


def test_run_rgb_guided_tile_end_to_end(tmp_path, rng):
    """Terrain + camera + texture: right half of the scene slides; the
    pipeline must recover it from imagery alone."""
    n = 4000
    xy = rng.uniform(-4, 4, size=(n, 2))
    z = np.sin(xy[:, 0] * 2) * 0.1 + np.cos(xy[:, 1] * 3) * 0.1
    src = np.column_stack([xy[:, 0], xy[:, 1], z + 8.0]).astype(np.float64)

    shift = np.array([0.15, 0.0, 0.0])
    moving = src[:, 0] > 0
    tgt = src.copy()
    tgt[moving] += shift

    E = np.eye(4)  # camera at origin looking +z; scene at z~8
    img_size = (H, W)

    # Render simple textured images by projecting points with intensity from
    # a fixed per-point random texture (same texture both epochs).
    from fusion4landslide_tpu.image.geometry import project_points, rasterize_depth

    tex = rng.uniform(50, 255, size=n).astype(np.float32)

    def render(pts):
        uv, d, v = project_points(
            pts.astype(np.float32), E.astype(np.float32),
            K.astype(np.float32), img_size, v_flip=False,
        )
        _, imap = rasterize_depth(uv, d, v, img_size)
        imap = np.asarray(imap)
        img = np.zeros(img_size, np.float32)
        hit = imap >= 0
        img[hit] = tex[imap[hit]]
        return img

    img0, img1 = render(src), render(tgt)

    cfg = {
        "image_size": list(img_size),
        "pixel_thres": 4,
        "max_magnitude": 2.0,
        "icp_threshold": 0.2,
        "n_normals": 15,
        "voxel_size": 0.0,
        "img_matching_type": "zncc",
        "crop_size": None,
        "overlap_size": None,
        "dataset": "rockfall_simulator",  # disables v-flip
        "output_dir": str(tmp_path),
        "output_folder": "run",
    }
    # match on the rendered images with test-scale parameters
    corres = match_epoch_images(
        img0, img1, matcher="zncc", grid_step=4, patch=12, search=10,
        min_score=0.5, min_texture=1.0,
    )
    out = run_rgb_guided_tile(
        cfg, src, tgt, img0, img1, K, E, E,
        tile_id=0, corres_2d=corres,
    )
    results = tmp_path / "run" / "results"
    assert (results / "rgb_guided_wo_refinement_dvfms_tile_0.txt").exists()
    assert (results / "rgb_guided_w_refinement_dvfs_src2tgt_tile_0.txt").exists()
    dvfs = out["dvfs"]
    assert out["n_matches"] > 200
    if dvfs.shape[0] > 200:
        disp = dvfs[:, 3:6] - dvfs[:, :3]
        mov = dvfs[:, 0] > 0.5
        stab = dvfs[:, 0] < -0.5
        if mov.sum() > 50 and stab.sum() > 50:
            assert abs(np.median(disp[mov, 0]) - shift[0]) < 0.08
            assert abs(np.median(disp[stab, 0])) < 0.05
