"""Full RGB+3D fusion: 2D coarse voting + end-to-end tile with a synthetic
camera and injected pixel matches (the img_matching_result_dir path)."""

import jax
import numpy as np

from fusion4landslide_tpu.image.geometry import project_points
from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.pipelines.fusion import (
    coarse_match_2d_votes,
    run_fusion_tile,
)


def test_coarse_match_2d_votes(rng):
    # 3 src superpoints; votes route to distinct tgt superpoints.
    lab_s = np.repeat([0, 1, 2], 20)
    lab_t = np.repeat([2, 0, 1], 20)
    c2d_idx = np.concatenate(
        [
            rng.integers(20, 40, 20),  # src spt 0 -> tgt voxels of label 0
            rng.integers(40, 60, 20),  # src spt 1 -> label 1
            rng.integers(0, 20, 20),  # src spt 2 -> label 2
        ]
    ).astype(np.int32)
    c2d_valid = np.ones(60, bool)
    c2d_valid[55:] = False  # spt 2 keeps 15 votes
    tgt_of, ok = coarse_match_2d_votes(lab_s, lab_t, c2d_idx, c2d_valid, 3, 3)
    np.testing.assert_array_equal(tgt_of, [0, 1, 2])
    assert ok.all()
    # no votes at all -> invalid
    _, ok0 = coarse_match_2d_votes(
        lab_s, lab_t, c2d_idx, np.zeros(60, bool), 3, 3
    )
    assert not ok0.any()


def _look_down_camera(center_xy, height=40.0, f=500.0, img=(480, 640)):
    """Pinhole camera straight above the scene looking -z."""
    h, w = img
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    # world->cam: x->x, y->-y, z->-z (look down), then translate
    R = np.diag([1.0, -1.0, -1.0])
    t = -R @ np.array([center_xy[0], center_xy[1], height])
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = t
    return K, E


def test_run_fusion_tile_end_to_end(tmp_path, rng):
    dips = PointNetFeature()
    dips_params = dips.init(jax.random.PRNGKey(0), np.zeros((2, 64, 3), np.float32))
    agg = ClusterFeatureNet()
    agg_params = agg.init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )

    n = 1500
    xy = rng.uniform(0, 16, size=(n, 2))
    z = np.sin(xy[:, 0] * 1.3) * 0.8 + np.cos(xy[:, 1] * 1.9) * 0.5
    src = np.column_stack([xy, z]).astype(np.float64)
    shift = np.array([0.12, 0.0, 0.08])
    moving = src[:, 0] > 8.0
    tgt = src.copy()
    tgt[moving] += shift

    img_size = (480, 640)
    K, E = _look_down_camera((8.0, 8.0), img=img_size)

    # Ground-truth 2D matches: project corresponding src/tgt points into the
    # shared camera (rockfall_simulator convention: no v-flip).
    sub = rng.choice(n, 400, replace=False)
    uv_s, _, ok_s = project_points(
        src[sub].astype(np.float32), E.astype(np.float32),
        K.astype(np.float32), img_size, v_flip=False,
    )
    uv_t, _, ok_t = project_points(
        tgt[sub].astype(np.float32), E.astype(np.float32),
        K.astype(np.float32), img_size, v_flip=False,
    )
    keep = np.asarray(ok_s) & np.asarray(ok_t)
    corres_2d = np.hstack([np.asarray(uv_s)[keep], np.asarray(uv_t)[keep]])
    assert len(corres_2d) > 300

    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "level_of_superpoint": [1],
        "num_min_fine_match": 5,
        "num_min_matches_for_quality_check": 10,
        "thres_dist_diff": 0.5,
        "thres_inlier_ratio": 0.15,
        "num_min_matches_for_small_patch": 5,
        "voxel_size_init": 0.1,
        "assign_type": "assign_then_nn",
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "dataset": "rockfall_simulator",
        "image_size": list(img_size),
        "pixel_thres": 5,
        "weighting_svd": True,
        "feat_k_max": 128,
        "feat_patch_points": 64,
        "feat_chunk": 512,
    }
    dummy = np.zeros((*img_size, 3), np.uint8)
    out = run_fusion_tile(
        cfg,
        dips_params,
        agg_params,
        src,
        tgt,
        dummy,
        dummy,
        K,
        E,
        E,
        corres_2d=corres_2d,
        tile_id=0,
    )
    results = tmp_path / "run" / "results"
    assert (results / "c2f_dvfs_src2tgt_tile_0.txt").exists()
    # 2D interim artifact written
    assert (
        results
        / "c2f_dvfms_from_global_2d_src2tgt_wo_pruning_visualize_tile_0.txt"
    ).exists()
    assert out["assigned_fraction"] > 0.3
    dvfs = out["dvfs"]
    disp = dvfs[:, 3:6] - dvfs[:, :3]
    mov = dvfs[:, 0] > 9.0
    stab = dvfs[:, 0] < 7.0
    assert mov.sum() > 50 and stab.sum() > 50
    assert np.linalg.norm(np.median(disp[mov], axis=0) - shift) < 0.1
    assert np.linalg.norm(np.median(disp[stab], axis=0)) < 0.05
