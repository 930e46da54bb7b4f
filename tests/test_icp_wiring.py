"""Config-selected ICP variants + cross-level output merge wiring.

The reference exposes point2point / point2plane / generalized_icp in its
o3d toolbox (utils/o3d_tools.py:33-56) and dedups multi-level output tables
by priority with a distance threshold for superpoint partitions
(src/coarse_to_fine_matching.py:40-118, applied at :282-287). These tests
pin the TPU pipelines' wiring of both: ``icp_type`` reaches the fine
matcher / refiner, and the sharded runner refuses the silently-divergent
superpoint downgrade.
"""

import numpy as np
import pytest

from fusion4landslide_tpu.ops.registration import icp_by_type
from fusion4landslide_tpu.pipelines.fusion import fine_match_pairs


@pytest.mark.parametrize(
    "icp_type", ["point2point", "point2plane", "generalized_icp"]
)
def test_fine_match_pairs_icp_type_recovers_shift(rng, icp_type):
    P = 64
    vox_s = rng.uniform(0, 4, size=(P, 3)).astype(np.float32)
    # Flatten z so point2plane/generalized normals are well-defined.
    vox_s[:, 2] *= 0.05
    shift = np.array([0.2, -0.1, 0.05], np.float32)
    vox_t = (vox_s + shift).astype(np.float32)
    res = fine_match_pairs(
        np.arange(P, dtype=np.int32)[None, :],
        np.ones((1, P), bool),
        np.zeros(1, np.int32),
        np.arange(P, dtype=np.int32),
        np.ones(P, bool),
        np.zeros(P, np.int32),
        vox_s,
        vox_t,
        icp_threshold=0.3,
        num_min_fine=10,
        icp_type=icp_type,
    )
    assert bool(np.asarray(res.valid)[0])
    np.testing.assert_allclose(np.asarray(res.t)[0], shift, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.R)[0], np.eye(3), atol=2e-3)


def test_icp_by_type_rejects_unknown():
    pts = np.zeros((4, 3), np.float32)
    with pytest.raises(ValueError, match="unknown icp_type"):
        icp_by_type("fancy_icp", pts, pts, 0.1)


def test_icp_by_type_variants_converge(rng):
    # Direct dispatch: each solver aligns a planar cloud under a small
    # rigid motion (seeded from identity).
    n = 256
    src = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    src[:, 2] = 0.05 * np.sin(src[:, 0]) + 0.03 * src[:, 1]
    ang = 0.02
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0.0],
            [np.sin(ang), np.cos(ang), 0.0],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    t = np.array([0.03, -0.02, 0.01], np.float32)
    tgt = src @ R.T + t
    for icp_type in ("point2point", "point2plane", "generalized_icp"):
        res = icp_by_type(icp_type, src, tgt, 0.5, max_iter=30)
        np.testing.assert_allclose(
            np.asarray(res.R), R, atol=5e-3, err_msg=icp_type
        )
        np.testing.assert_allclose(
            np.asarray(res.t), t, atol=5e-3, err_msg=icp_type
        )


def test_sharded_fusion_accepts_superpoint_partition():
    """partition_type=superpoint no longer refuses the mesh path: the
    sharded runner consumes host-generated per-point labels as sharded
    step inputs (full mesh-path coverage in
    tests/test_parallel.py::test_sharded_fusion3d_superpoint_partition_inputs)."""
    from fusion4landslide_tpu.parallel.pipeline import (
        run_fusion3d_tiles_sharded,
    )

    cfg = {"partition_type": "superpoint"}
    assert run_fusion3d_tiles_sharded(cfg, None, None, []) == {}


def test_icp_refine_false_returns_svd_transform(rng):
    """icp_refine: False (reference base:3346) skips the post-SVD ICP:
    fine matching with icp_max_iter=0 still recovers a rigid shift from
    the correspondences alone (the SVD estimate with its metrics)."""
    import numpy as np

    from fusion4landslide_tpu.pipelines.fusion import fine_match_pairs

    P = 64
    vox_s = rng.uniform(0, 4, size=(P, 3)).astype(np.float32)
    shift = np.array([0.2, -0.1, 0.05], np.float32)
    vox_t = (vox_s + shift).astype(np.float32)
    res = fine_match_pairs(
        np.arange(P)[None].astype(np.int32),
        np.ones((1, P), bool),
        np.array([0], np.int32),
        np.arange(P).astype(np.int32),
        np.ones(P, bool),
        np.zeros(P, np.int32),
        vox_s,
        vox_t,
        icp_threshold=0.3,
        num_min_fine=10,
        icp_max_iter=0,
    )
    assert np.asarray(res.valid)[0]
    np.testing.assert_allclose(np.asarray(res.t)[0], shift, atol=1e-3)
