"""fusion_3d pipeline: coarse/fine device cores + end-to-end tile run."""

import jax
import numpy as np
import pytest

from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.pipelines.fusion import (
    coarse_match_superpoints,
    fine_match_pairs,
    global_matches_3d,
    run_fusion3d_tile,
)


def test_global_matches_3d_gating(rng):
    n, m = 50, 60
    feat_s = rng.normal(size=(n, 64)).astype(np.float32)
    feat_t = np.vstack([feat_s[:40], rng.normal(size=(m - 40, 64))]).astype(
        np.float32
    )
    pos_s = rng.uniform(0, 10, size=(n, 3)).astype(np.float32)
    pos_t = np.vstack(
        [pos_s[:30] + 0.1, pos_s[30:40] + 50.0, rng.uniform(0, 10, (m - 40, 3))]
    ).astype(np.float32)
    idx, valid = global_matches_3d(feat_s, feat_t, pos_s, pos_t, 5.0)
    idx, valid = np.asarray(idx), np.asarray(valid)
    # identical features within magnitude -> matched to the right row
    assert (idx[:30] == np.arange(30)).all()
    assert valid[:30].all()
    # identical features but 50 m away -> gated out
    assert not valid[30:40].any()


def test_coarse_match_mutual(rng):
    S = 20
    feat_s = rng.normal(size=(S, 64)).astype(np.float32)
    feat_t = feat_s[::-1].copy()  # reversed order, exact matches
    coord = rng.uniform(0, 5, size=(S, 3)).astype(np.float32)
    tgt_idx, valid = coarse_match_superpoints(
        feat_s, coord, np.ones(S, bool),
        feat_t, coord[::-1].copy(), np.ones(S, bool),
        10.0,
    )
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(tgt_idx), S - 1 - np.arange(S))


def test_fine_match_pairs_recovers_shift(rng):
    # Two patches: one rigidly shifted with correct correspondences, one
    # with scrambled correspondences that must fail the isometry gate.
    P = 64
    vox_s = rng.uniform(0, 4, size=(2 * P, 3)).astype(np.float32)
    shift = np.array([0.2, -0.1, 0.05], np.float32)
    vox_t = np.vstack([vox_s[:P] + shift, rng.uniform(0, 4, (P, 3))]).astype(
        np.float32
    )
    lab_t = np.concatenate([np.zeros(P), np.ones(P)]).astype(np.int32)
    # patch 0: correct matches; patch 1: random (non-isometric) matches
    corres = np.concatenate([np.arange(P), rng.integers(P, 2 * P, P)]).astype(
        np.int32
    )
    members = np.stack([np.arange(P), np.arange(P, 2 * P)]).astype(np.int32)
    mask = np.ones((2, P), bool)
    res = fine_match_pairs(
        members,
        mask,
        np.array([0, 1], np.int32),
        corres,
        np.ones(2 * P, bool),
        lab_t,
        vox_s,
        np.vstack([vox_s[:P] + shift, vox_t[P:]]).astype(np.float32),
        icp_threshold=0.3,
        num_min_fine=10,
    )
    valid = np.asarray(res.valid)
    assert valid[0] and not valid[1]
    np.testing.assert_allclose(np.asarray(res.t)[0], shift, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.R)[0], np.eye(3), atol=1e-3)


@pytest.mark.slow
def test_run_fusion3d_tile_end_to_end(tmp_path, rng):
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
    src = np.column_stack([xy, z]).astype(np.float32)
    shift = np.array([0.12, 0.0, 0.08], np.float32)
    moving = src[:, 0] > 8.0
    tgt = src.copy()
    tgt[moving] += shift

    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "level_of_superpoint": [1, 2],
        "num_min_fine_match": 5,
        "num_min_matches_for_quality_check": 10,
        "thres_dist_diff": 0.5,
        "thres_inlier_ratio": 0.15,
        "num_min_matches_for_small_patch": 5,
        "voxel_size_init": 0.1,
        "assign_type": "assign_then_nn",
        "output_tgt2src": True,
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "dataset": "brienz_tls",
        "feat_k_max": 128,
        "feat_patch_points": 64,
        "feat_chunk": 512,
    }
    out = run_fusion3d_tile(
        cfg,
        dips_params,
        agg_params,
        src.astype(np.float64) + 300.0,
        tgt.astype(np.float64) + 300.0,
        tile_id=0,
    )
    results = tmp_path / "run" / "results"
    assert (results / "c2f_dvfs_src2tgt_tile_0.txt").exists()
    assert (results / "c2f_dvfms_src2tgt_tile_0.txt").exists()
    assert out["assigned_fraction"] > 0.3
    dvfs = out["dvfs"]
    disp = dvfs[:, 3:6] - dvfs[:, :3]
    src_back = dvfs[:, :3] - 300.0
    mov = src_back[:, 0] > 9.0
    stab = src_back[:, 0] < 7.0
    if mov.sum() > 50 and stab.sum() > 50:
        # moving-region estimated displacement close to truth, stable ~0
        assert np.linalg.norm(np.median(disp[mov], axis=0) - shift) < 0.1
        assert np.linalg.norm(np.median(disp[stab], axis=0)) < 0.05

    # tgt2src (exact per-pair inverse semantics, base:3386-3393): every
    # matched target patch point carries its pair's inverse magnitude.
    t2s = np.loadtxt(results / "c2f_dvfms_tgt2src_tile_0.txt")
    assert t2s.shape[0] > 100
    tx = t2s[:, 0] - 300.0
    mov_t = tx > 9.0
    stab_t = tx < 7.0
    if mov_t.sum() > 50:
        assert abs(np.median(t2s[mov_t, 3]) - np.linalg.norm(shift)) < 0.05
    if stab_t.sum() > 50:
        assert np.median(t2s[stab_t, 3]) < 0.05


def test_fine_match_pairs_compaction_large_patch(rng):
    """fine_max_matches compaction: a patch far larger than the cap still
    recovers the rigid shift from its (bounded) matched subset."""
    P = 256
    vox_s = rng.uniform(0, 6, size=(P, 3)).astype(np.float32)
    shift = np.array([0.15, -0.05, 0.1], np.float32)
    vox_t = (vox_s + shift).astype(np.float32)
    corres = np.arange(P, dtype=np.int32)
    members = np.arange(P, dtype=np.int32)[None, :]
    mask = np.ones((1, P), bool)
    res = fine_match_pairs(
        members,
        mask,
        np.zeros(1, np.int32),
        corres,
        np.ones(P, bool),
        np.zeros(P, np.int32),
        vox_s,
        vox_t,
        icp_threshold=0.3,
        num_min_fine=10,
        fine_max_matches=64,  # cap far below the 256 matched members
    )
    assert bool(np.asarray(res.valid)[0])
    # n_matches reports the true matched count; the solve used <= 64.
    assert int(np.asarray(res.n_matches)[0]) == 256
    np.testing.assert_allclose(np.asarray(res.t)[0], shift, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.R)[0], np.eye(3), atol=1e-3)


@pytest.mark.slow
def test_debug_subsetting_limits_superpoints(tmp_path, rng):
    """use_debugging truncates each level to the first num_spt superpoints
    (reference start_debugging 'reduce_num_spt',
    coarse_to_fine_matching.py:292-308): the debug run completes and
    assigns no more points than the full run."""
    dips_params = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    agg_params = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    n = 500
    xy = rng.uniform(0, 10, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5
    src = np.column_stack([xy, z]).astype(np.float64)
    tgt = src + np.array([0.05, 0.0, 0.02])
    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "level_of_superpoint": [1],
        "num_min_fine_match": 5,
        "num_min_matches_for_small_patch": 3,
        "voxel_size_init": 0.1,
        "assign_type": "assign",
        "output_dir": str(tmp_path),
        "output_folder": "dbg",
        "dataset": "brienz_tls",
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 64,
        "use_debugging": True,
        "num_spt": 1,
    }
    out = run_fusion3d_tile(
        cfg, dips_params, agg_params, src, tgt, tile_id=0
    )
    full = run_fusion3d_tile(
        dict(cfg, use_debugging=False, output_folder="full"),
        dips_params, agg_params, src, tgt, tile_id=0,
    )
    assert out["assigned_fraction"] <= full["assigned_fraction"] + 1e-9
    assert (tmp_path / "dbg" / "results").exists()


def test_coarse_refinement_only_max_mag_skips_mutual(rng):
    """coarse_refinement_3d_type='only_max_mag' (base:2991-2993): every
    in-magnitude NN survives, no mutual check."""
    S = 12
    feat_s = rng.normal(size=(S, 64)).astype(np.float32)
    # Two source superpoints share one target NN: under the mutual check
    # one of them loses; with only_max_mag both keep their NN.
    feat_t = feat_s.copy()
    feat_s[1] = feat_s[0] + 1e-3
    coord = rng.uniform(0, 5, size=(S, 3)).astype(np.float32)
    _, v_mut = coarse_match_superpoints(
        feat_s, coord, np.ones(S, bool),
        feat_t, coord, np.ones(S, bool), 10.0, mutual=True,
    )
    _, v_all = coarse_match_superpoints(
        feat_s, coord, np.ones(S, bool),
        feat_t, coord, np.ones(S, bool), 10.0, mutual=False,
    )
    assert np.asarray(v_all).sum() > np.asarray(v_mut).sum()
    assert np.asarray(v_all).all()


def test_quality_gate_disabled_passes_non_isometric_patch(rng):
    """remove_low_quality_patch_matches=False maps to a zero isometry
    threshold (base:3299): a scrambled patch that fails the gate at 0.15
    passes with the gate off."""
    P = 64
    vox_s = rng.uniform(0, 4, size=(2 * P, 3)).astype(np.float32)
    vox_t = rng.uniform(0, 4, size=(2 * P, 3)).astype(np.float32)
    lab_t = np.zeros(2 * P, np.int32)
    corres = rng.integers(0, 2 * P, 2 * P).astype(np.int32)
    members = np.arange(P)[None].astype(np.int32)
    mask = np.ones((1, P), bool)
    kw = dict(icp_threshold=0.3, num_min_fine=5, num_min_quality=5)
    gated = fine_match_pairs(
        members, mask, np.array([0], np.int32), corres,
        np.ones(2 * P, bool), lab_t, vox_s, vox_t,
        thres_inlier_ratio=0.15, **kw,
    )
    open_ = fine_match_pairs(
        members, mask, np.array([0], np.int32), corres,
        np.ones(2 * P, bool), lab_t, vox_s, vox_t,
        thres_inlier_ratio=0.0, thres_dist_diff=np.inf, **kw,
    )
    assert not np.asarray(gated.valid)[0]
    assert np.asarray(open_.valid)[0]


def test_iso_gate_samples_across_whole_patch(rng):
    """A patch that is rigid only in its low-index (spatially clustered)
    corner must FAIL the isometry gate even when iso_cap is far below the
    match count: the gate samples with an even stride across the matched
    set, not the first iso_cap indices (which would all land in the rigid
    corner — compaction preserves voxel/grid-cell = spatial order)."""
    P = 256
    vox_s = rng.uniform(0, 4, size=(P, 3)).astype(np.float32)
    shift = np.array([0.2, -0.1, 0.05], np.float32)
    # Members 0..63 map rigidly; 64.. map to unrelated random targets.
    vox_t = np.vstack(
        [vox_s[:64] + shift, rng.uniform(0, 4, (P - 64, 3))]
    ).astype(np.float32)
    lab_t = np.zeros(P, np.int32)
    corres = np.arange(P).astype(np.int32)
    members = np.arange(P)[None].astype(np.int32)
    res = fine_match_pairs(
        members,
        np.ones((1, P), bool),
        np.array([0], np.int32),
        corres,
        np.ones(P, bool),
        lab_t,
        vox_s,
        vox_t,
        icp_threshold=0.3,
        num_min_fine=10,
        iso_cap=32,
        fine_max_matches=P,
    )
    assert not np.asarray(res.valid)[0]
