"""Headless visual-debugging exports (utils/visualization.py): the file
equivalents of the reference's o3d windows + make_matching_figure JPGs."""

import os.path as osp

import jax
import numpy as np
import pytest

from fusion4landslide_tpu.utils.visualization import (
    patch_visualization_requests,
    save_matches_within_patch_figure,
    save_matching_figure,
    save_patch_match_figure,
)


def test_save_matching_figure(rng, tmp_path):
    img0 = rng.integers(0, 255, (64, 96), np.uint8)
    img1 = rng.integers(0, 255, (64, 96), np.uint8)
    m = np.column_stack(
        [
            rng.uniform(0, 96, 40),
            rng.uniform(0, 64, 40),
            rng.uniform(0, 96, 40),
            rng.uniform(0, 64, 40),
        ]
    ).astype(np.float32)
    path = save_matching_figure(
        img0, img1, m, str(tmp_path / "v" / "match.jpg"), text="t"
    )
    assert osp.getsize(path) > 1000
    # empty matches still writes a figure
    path2 = save_matching_figure(
        img0, img1, np.zeros((0, 4)), str(tmp_path / "v" / "none.jpg")
    )
    assert osp.getsize(path2) > 1000


def test_save_patch_figures(rng, tmp_path):
    src = rng.uniform(0, 10, (500, 3))
    tgt = src + [0.1, 0, 0]
    p_s = src[:40]
    p_t = tgt[:40]
    path = save_patch_match_figure(
        src, tgt, p_s, p_t, str(tmp_path / "patch.png"),
        offset=(75, 75, 75), small_region=50.0,
    )
    assert osp.getsize(path) > 1000
    path2 = save_matches_within_patch_figure(
        p_s, p_t, p_s[:10], p_t[:10], str(tmp_path / "within.png")
    )
    assert osp.getsize(path2) > 1000


def test_patch_visualization_requests():
    assert len(patch_visualization_requests({}, 100)) == 0
    cfg = {"visualize_patch": True, "num_of_visualize_samples": 5}
    got = patch_visualization_requests(cfg, 100)
    np.testing.assert_array_equal(got, np.arange(5))
    # random choice, capped at n_pairs, sorted + unique
    cfg = {
        "visualize_patch": True,
        "num_of_visualize_samples": 10,
        "random_choice": True,
    }
    got = patch_visualization_requests(cfg, 4)
    assert len(got) == 4 and len(np.unique(got)) == 4
    assert patch_visualization_requests(cfg, 0).size == 0


@pytest.mark.slow
def test_fusion_tile_writes_visualizations(rng, tmp_path):
    """run_fusion3d_tile with the reference ``visualization:`` keys writes
    patch + within-patch PNGs under <run>/visualization/."""
    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    dips = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    agg = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    n = 400
    xy = rng.uniform(0, 10, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5
    src = np.column_stack([xy, z]).astype(np.float32)
    tgt = src + np.array([0.05, 0.0, 0.02], np.float32)
    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "level_of_superpoint": [1],
        "num_min_fine_match": 5,
        "num_min_matches_for_small_patch": 3,
        "voxel_size_init": 0.1,
        "assign_type": "assign",
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "dataset": "brienz_tls",
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 64,
        # reference visualization keys (fusion_brienz.yaml:103-114)
        "visualize_patch": True,
        "visualize_matches_within_patch": True,
        "num_of_visualize_samples": 2,
        "offset": [75, 75, 75],
        "small_region": 50,
    }
    run_fusion3d_tile(cfg, dips, agg, src, tgt, tile_id=0)
    vis = tmp_path / "run" / "visualization"
    patches = list(vis.glob("patch_match_tile_0_*.png"))
    assert patches, "no patch figures written"
    assert all(p.stat().st_size > 1000 for p in patches)
    assert list(vis.glob("matches_within_patch_tile_0_*.png"))
