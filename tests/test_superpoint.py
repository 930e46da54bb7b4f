"""Native superpoint partition (ops/superpoint.py — the SPT bridge's role,
reference src/superpoint_partition.py:37-162)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fusion4landslide_tpu.ops.superpoint import (
    generate_superpoint_partition,
    geometric_features,
    superpoint_hierarchy,
)


def test_geometric_features_canonical_shapes(rng):
    line = np.column_stack(
        [np.linspace(0, 5, 300), np.zeros(300), np.zeros(300)]
    ) + rng.normal(scale=0.002, size=(300, 3))
    plane = np.column_stack(
        [rng.uniform(0, 3, 400), rng.uniform(0, 3, 400), np.zeros(400)]
    ) + rng.normal(scale=0.002, size=(400, 3))
    blob = rng.normal(scale=0.5, size=(400, 3))

    f_line = np.asarray(geometric_features(jnp.asarray(line, jnp.float32), 20))
    f_plane = np.asarray(geometric_features(jnp.asarray(plane, jnp.float32), 20))
    f_blob = np.asarray(geometric_features(jnp.asarray(blob, jnp.float32), 20))
    assert np.median(f_line[:, 0]) > 0.9  # linearity
    # Small-sample PCA anisotropy keeps (l2-l3)/l1 around 0.5 even on a
    # perfect plane; the discriminative statement is relative dominance.
    assert np.median(f_plane[:, 1]) > 0.4  # planarity
    assert np.median(f_plane[:, 1]) > np.median(f_plane[:, 2])
    assert np.median(f_plane[:, 1]) > np.median(f_line[:, 1])
    assert np.median(f_blob[:, 2]) > 0.2  # scattering
    assert np.median(f_blob[:, 2]) > np.median(f_plane[:, 2])
    # features sum to <= 1 + eps by construction
    assert np.all(f_blob.sum(1) < 1.01)


def test_hierarchy_nests_and_coarsens(rng):
    xy = rng.uniform(0, 12, size=(2500, 2))
    z = np.where(xy[:, 0] < 6, 0.0, 0.8 * (xy[:, 0] - 6))
    pts = np.column_stack([xy, z]).astype(np.float32)
    levels = superpoint_hierarchy(
        pts, levels=3, base_resolution=1.5, coarsening=3.0
    )
    counts = [int(l.max()) + 1 for l in levels]
    assert counts[0] > counts[1] > counts[2] >= 1
    # Nesting: every level-1 region maps into exactly one level-2 region.
    for fine, coarse in ((0, 1), (1, 2)):
        for lbl in range(counts[fine]):
            sel = levels[fine] == lbl
            assert len(np.unique(levels[coarse][sel])) == 1


def test_partition_file_roundtrip(tmp_path, rng):
    from fusion4landslide_tpu.ops.partition_io import read_superpoint_partition

    pts = rng.uniform(0, 8, size=(1200, 3)).astype(np.float32)
    pts[:, 2] *= 0.1
    path = str(tmp_path / "partition_of_input_src_tile_0.txt")
    levels = generate_superpoint_partition(
        pts, path, levels=3, base_resolution=1.5
    )
    for lv in (1, 2, 3):
        rp, lab = read_superpoint_partition(path, lv)
        np.testing.assert_allclose(rp, pts, atol=1e-5)
        np.testing.assert_array_equal(lab, levels[lv - 1])


@pytest.mark.slow  # r5 fast-suite trim: full fusion tile with native
# partition generation; the artifact contract is covered fast above
def test_fusion_generates_superpoint_partition(tmp_path, rng):
    """partition_type=superpoint with no files: the fusion tile generates
    the native hierarchy, persists the reference artifact, and runs."""
    import jax

    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    dips_params = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    agg_params = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    n = 800
    xy = rng.uniform(0, 10, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5
    src = np.column_stack([xy, z])
    shift = np.array([0.03, -0.02, 0.01])
    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "partition_type": "superpoint",
        "level_of_superpoint": [1, 2],
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
    }
    out = run_fusion3d_tile(
        cfg, dips_params, agg_params, src, src + shift, tile_id=0
    )
    assert (
        tmp_path / "run" / "superpoint_partition"
        / "partition_of_input_src_tile_0.txt"
    ).exists()
    assert out["assigned_fraction"] > 0.3
    dv = out["dvfs"]
    np.testing.assert_allclose(
        np.median(dv[:, 3:6] - dv[:, :3], axis=0), shift, atol=1e-3
    )
