"""Multi-device tile sharding on the 8-device virtual CPU mesh.

The sharded step is the REAL F2S3 per-tile pipeline
(``pipelines.f2s3_device.f2s3_tile_step``: median resolution → DIPs →
supervoxels → feature 1-NN → learned pruning → gates), not a demo kernel.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.models.filtering import FilteringNetwork

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

STATICS = dict(
    k_max=16,
    patch_points=16,
    chunk=32,
    k_neighbors=8,
    sv_cap=64,
    member_cap=64,
    num_layers=2,
    with_c2c=True,
)


def _params(rng_key=0, num_layers=2):
    dips = PointNetFeature().init(
        jax.random.PRNGKey(rng_key), np.zeros((2, 16, 3), np.float32)
    )
    filt = FilteringNetwork(num_layers=num_layers).init(
        jax.random.PRNGKey(rng_key + 1),
        np.zeros((8, 6), np.float32),
        np.ones((8,), bool),
    )
    return dips, filt


def _tiles(rng, tiles=8, n_pts=96):
    src = rng.normal(size=(tiles, n_pts, 3)).astype(np.float32)
    tgt = src + np.float32(0.05)
    smask = np.ones((tiles, n_pts), bool)
    smask[:, -7:] = False  # exercise padding
    tmask = np.ones((tiles, n_pts), bool)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(tiles, dtype=jnp.uint32))
    md = np.full((tiles,), 0.0, np.float32)
    vs = np.full((tiles,), 0.0, np.float32)
    return src, smask, tgt, tmask, keys, md, vs


@needs_mesh
@pytest.mark.slow  # the driver runs dryrun_multichip itself every round
def test_dryrun_multichip_entrypoint():
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")


@needs_mesh
@pytest.mark.slow  # r5 fast-suite trim: slow host-pipeline parity +
# dryrun_multichip cover the sharded f2s3 path
def test_sharded_f2s3_matches_single_device(rng):
    from fusion4landslide_tpu.parallel import make_sharded_f2s3_step, tile_mesh

    dips, filt = _params()
    args = _tiles(rng)
    out8 = make_sharded_f2s3_step(tile_mesh(8), dips, filt, **STATICS)(*args)
    out1 = make_sharded_f2s3_step(tile_mesh(1), dips, filt, **STATICS)(*args)
    np.testing.assert_allclose(
        np.asarray(out8.new_tgt), np.asarray(out1.new_tgt), atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(out8.keep), np.asarray(out1.keep))
    np.testing.assert_allclose(
        np.asarray(out8.mag), np.asarray(out1.mag), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out8.labels), np.asarray(out1.labels)
    )


@pytest.mark.slow
@needs_mesh
def test_sharded_f2s3_matches_host_pipeline(rng, tmp_path):
    """The sharded device step and the serial host path agree on the DVF
    output files for the same tiles (rigid shift recovered both ways)."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import run_f2s3_tiles_sharded, tile_mesh
    from fusion4landslide_tpu.pipelines.f2s3 import run_f2s3_tile

    dips, filt = _params()
    n = 80
    base = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    shift = np.asarray([0.03, -0.02, 0.01], np.float32)
    tiles = [
        (i, base + i * 0.001, base + i * 0.001 + shift) for i in range(8)
    ]

    cfg_sh = Config(
        {
            "output_dir": str(tmp_path / "sharded"),
            "output_folder": "run",
            "feat_k_max": 16,
            "feat_patch_points": 16,
            "feat_chunk": 32,
            "n_normals": 8,
            "sv_cap": 64,
            "member_cap": 64,
            "max_disp_magnitude": 0,
            "voxel_size": 0.0,
        }
    )
    run_f2s3_tiles_sharded(
        cfg_sh, dips, filt, tiles, mesh=tile_mesh(8), rng_seed=0
    )
    got = np.loadtxt(
        tmp_path / "sharded" / "run" / "results" / "f2s3_dvfs_of_tile_3.txt"
    )
    assert got.shape[1] == 6
    # The learned filter has random weights here; whatever survives must
    # still carry the rigid shift (target = source + shift exactly).
    if got.shape[0]:
        np.testing.assert_allclose(
            got[:, 3:6] - got[:, :3],
            np.tile(shift, (got.shape[0], 1)),
            atol=5e-4,
        )

    cfg_host = Config(
        {
            "output_dir": str(tmp_path / "host"),
            "output_folder": "run",
            "max_disp_magnitude": 0,
            "voxel_size": 0.0,
            "n_normals": 8,
        }
    )
    run_f2s3_tile(cfg_host, dips, filt, tiles[3][1], tiles[3][2], tile_id=3)
    host = np.loadtxt(
        tmp_path / "host" / "run" / "results" / "f2s3_dvfs_of_tile_3.txt"
    )
    if host.shape[0] and got.shape[0]:
        np.testing.assert_allclose(
            np.median(host[:, 3:6] - host[:, :3], axis=0),
            np.median(got[:, 3:6] - got[:, :3], axis=0),
            atol=5e-4,
        )


def _fusion_params(rng_key=0):
    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet

    dips = PointNetFeature().init(
        jax.random.PRNGKey(rng_key), np.zeros((2, 16, 3), np.float32)
    )
    agg = ClusterFeatureNet().init(
        jax.random.PRNGKey(rng_key + 1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    return dips, agg

FUSION_STATICS = dict(
    levels=(1,),
    k_max=16,
    patch_points=16,
    chunk=32,
    k_neighbors=8,
    sv_cap=64,
    member_cap=64,
    agg_max_points=32,
    small_patch=3,
    icp_max_iter=8,
    fine_max_matches=64,
    with_sparse=True,
    with_tgt2src=True,
)


@needs_mesh
def test_sharded_fusion3d_matches_single_device(rng):
    from fusion4landslide_tpu.parallel import (
        make_sharded_fusion3d_step,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    tiles, n_pts = 8, 96
    src = rng.uniform(-1, 1, size=(tiles, n_pts, 3)).astype(np.float32)
    tgt = src + np.float32(0.02)
    smask = np.ones((tiles, n_pts), bool)
    smask[:, -5:] = False
    tmask = np.ones((tiles, n_pts), bool)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(tiles, dtype=jnp.uint32))
    scal = lambda v, dt=np.float32: np.full((tiles,), v, dt)
    args = (
        src, smask, tgt, tmask, keys, scal(10.0), scal(0.1), scal(0.0),
        scal(10, np.int32), scal(10, np.int32), scal(0.5), scal(0.15),
    )

    out8 = make_sharded_fusion3d_step(tile_mesh(8), dips, agg, **FUSION_STATICS)(*args)
    out1 = make_sharded_fusion3d_step(tile_mesh(1), dips, agg, **FUSION_STATICS)(*args)
    np.testing.assert_allclose(
        np.asarray(out8.moved), np.asarray(out1.moved), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out8.valid), np.asarray(out1.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out8.t2s_src_est), np.asarray(out1.t2s_src_est), atol=2e-5
    )


@needs_mesh
@pytest.mark.slow  # r5 fast-suite trim: recovery is asserted every bench
# run; matches_single_device keeps the fast-lane mesh parity
def test_sharded_fusion3d_recovers_rigid_shift(rng, tmp_path):
    """End-to-end: 8 tiles through run_fusion3d_tiles_sharded on the virtual
    mesh; assigned source points recover the synthetic rigid shift and the
    tgt2src table recovers its inverse (exact per-pair semantics)."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    n = 200
    base = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    shift = np.asarray([0.02, -0.015, 0.01], np.float32)
    tiles = [(i, base + i * 0.001, base + i * 0.001 + shift) for i in range(8)]

    cfg = Config(
        {
            "output_dir": str(tmp_path),
            "output_folder": "run",
            "feat_k_max": 16,
            "feat_patch_points": 16,
            "feat_chunk": 32,
            "sv_cap": 64,
            "member_cap": 64,
            "agg_max_points": 32,
            "num_min_matches_for_small_patch": 3,
            "level_of_superpoint": [1],
            "max_magnitude": 10.0,
            "icp_threshold": 0.1,
            "output_tgt2src": True,
        }
    )
    res = run_fusion3d_tiles_sharded(
        cfg, dips, agg, tiles, mesh=tile_mesh(8), rng_seed=0
    )
    assert set(res) == set(range(8))
    got = np.loadtxt(tmp_path / "run" / "results" / "c2f_dvfs_src2tgt_tile_5.txt")
    assert got.shape[0] > 50  # most points assigned
    np.testing.assert_allclose(
        got[:, 3:6] - got[:, :3],
        np.tile(shift, (got.shape[0], 1)),
        atol=1e-3,
    )
    t2s = np.loadtxt(
        tmp_path / "run" / "results" / "c2f_dvfms_tgt2src_tile_5.txt"
    )
    assert t2s.shape[0] > 50
    np.testing.assert_allclose(
        t2s[:, 3], np.linalg.norm(shift), atol=1e-3
    )


@pytest.mark.slow
@needs_mesh
def test_sharded_fusion3d_superpoint_partition_inputs(rng, tmp_path):
    """partition_type=superpoint on the mesh: the sharded step consumes
    host-generated per-point partition labels (no silent supervoxel
    downgrade), produces the same artifacts as the host path run from the
    SAME partition files, and both recover the planted shift."""
    import shutil

    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    dips, agg = _fusion_params()
    n = 200
    base = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    shift = np.asarray([0.02, -0.015, 0.01], np.float32)
    tiles = [(i, base + i * 0.001, base + i * 0.001 + shift) for i in range(8)]

    opts = {
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 32,
        "sv_cap": 64,
        "member_cap": 64,
        "agg_max_points": 32,
        "num_min_matches_for_small_patch": 3,
        "level_of_superpoint": [1, 2],
        "partition_type": "superpoint",
        "max_magnitude": 10.0,
        "icp_threshold": 0.1,
        "output_tgt2src": False,
    }
    cfg = Config(
        {"output_dir": str(tmp_path / "mesh"), "output_folder": "run", **opts}
    )
    res = run_fusion3d_tiles_sharded(
        cfg, dips, agg, tiles, mesh=tile_mesh(8), rng_seed=0
    )
    assert set(res) == set(range(8))
    # The sharded run generated the host-format partition artifacts.
    part = tmp_path / "mesh" / "run" / "superpoint_partition"
    assert (part / "partition_of_input_src_tile_5.txt").exists()
    got = np.loadtxt(
        tmp_path / "mesh" / "run" / "results" / "c2f_dvfs_src2tgt_tile_5.txt"
    )
    assert got.shape[0] > 50
    np.testing.assert_allclose(
        got[:, 3:6] - got[:, :3], np.tile(shift, (got.shape[0], 1)),
        atol=1e-3,
    )

    # Host path from the SAME partition files -> same partition source.
    cfg_h = Config(
        {"output_dir": str(tmp_path / "host"), "output_folder": "run", **opts}
    )
    shutil.copytree(part, tmp_path / "host" / "run" / "superpoint_partition")
    run_fusion3d_tile(
        cfg_h, dips, agg, tiles[5][1], tiles[5][2], tile_id=5
    )
    host = np.loadtxt(
        tmp_path / "host" / "run" / "results" / "c2f_dvfs_src2tgt_tile_5.txt"
    )
    assert host.shape[0] > 50
    np.testing.assert_allclose(
        np.median(host[:, 3:6] - host[:, :3], axis=0),
        np.median(got[:, 3:6] - got[:, :3], axis=0),
        atol=1e-3,
    )


@needs_mesh
def test_sharded_piecewise_matches_serial(rng, tmp_path):
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import run_piecewise_tiles_sharded, tile_mesh
    from fusion4landslide_tpu.pipelines.piecewise_icp import run_piecewise_icp

    n = 4000
    xy = rng.uniform(0, 20, size=(n, 2))
    z = np.sin(xy[:, 0]) * 0.5
    src = np.column_stack([xy, z])
    tgt = src.copy()
    tgt[src[:, 0] > 15, 2] += 0.3  # 25% moving
    tiles = [(i, src + i * 0.001, tgt + i * 0.001) for i in range(8)]

    cfg = Config(
        {
            "output_dir": str(tmp_path), "output_folder": "run",
            "smax": 2.0, "number_points_min": 10,
        }
    )
    run_piecewise_tiles_sharded(cfg, tiles, mesh=tile_mesh(8))
    got = np.loadtxt(tmp_path / "run" / "results" / "piecewise_icp_dvfs_of_tile_2.txt")

    serial = run_piecewise_icp(
        tiles[2][1], tiles[2][2], smax=2.0, number_points_min=10,
        output_dir=None, tile_id=2,
    )
    assert got.shape == serial.shape
    np.testing.assert_allclose(got, serial, atol=1e-4)


@pytest.mark.slow
@needs_mesh
def test_sharded_rgb_guided_matches_serial(rng, tmp_path):
    """The device-resident RGB-guided tile step on the 8-dev mesh agrees
    with the serial host path on a rendered-texture scene."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.image.geometry import (
        project_points,
        rasterize_depth,
    )
    from fusion4landslide_tpu.image.matching import match_epoch_images
    from fusion4landslide_tpu.parallel import (
        run_rgb_guided_tiles_sharded,
        tile_mesh,
    )
    from fusion4landslide_tpu.pipelines.rgb_guided import run_rgb_guided_tile

    H, W = 128, 160
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]])
    n = 3000
    xy = rng.uniform(-4, 4, size=(n, 2))
    z = np.sin(xy[:, 0] * 2) * 0.1 + np.cos(xy[:, 1] * 3) * 0.1
    src = np.column_stack([xy[:, 0], xy[:, 1], z + 8.0])
    shift = np.array([0.15, 0.0, 0.0])
    tgt = src.copy()
    tgt[src[:, 0] > 0] += shift
    E = np.eye(4)
    tex = rng.uniform(50, 255, size=n).astype(np.float32)

    def render(pts):
        uv, d, v = project_points(
            pts.astype(np.float32), E.astype(np.float32),
            K.astype(np.float32), (H, W), v_flip=False,
        )
        _, imap = rasterize_depth(uv, d, v, (H, W))
        imap = np.asarray(imap)
        img = np.zeros((H, W), np.float32)
        img[imap >= 0] = tex[imap[imap >= 0]]
        return img

    img0, img1 = render(src), render(tgt)
    corres = match_epoch_images(
        img0, img1, matcher="zncc", grid_step=4, patch=12, search=10,
        min_score=0.5, min_texture=1.0,
    )
    cfg = Config(
        {
            "image_size": [H, W], "pixel_thres": 4, "max_magnitude": 2.0,
            "icp_threshold": 0.2, "n_normals": 15, "voxel_size": 0.0,
            "dataset": "rockfall_simulator", "output_dir": str(tmp_path),
            "output_folder": "run", "sv_cap": 256, "member_cap": 1024,
        }
    )
    tiles = [(i, src, tgt) for i in range(8)]
    res = run_rgb_guided_tiles_sharded(
        cfg, tiles, img0, img1, K, E, E, corres_2d=corres,
        mesh=tile_mesh(8),
    )
    got = res[3]["dvfs"]
    assert res[3]["n_matches"] > 200

    serial = run_rgb_guided_tile(
        cfg, src, tgt, img0, img1, K, E, E, tile_id="s", corres_2d=corres
    )
    sv = serial["dvfs"]
    assert got.shape[0] > 200 and sv.shape[0] > 200
    # Same physics: moving region recovers the shift in both paths.
    for dv in (got, sv):
        disp = dv[:, 3:6] - dv[:, :3]
        mov = dv[:, 0] > 0.5
        if mov.sum() > 100:
            np.testing.assert_allclose(
                np.median(disp[mov], axis=0), shift, atol=0.05
            )
    assert abs(got.shape[0] - sv.shape[0]) < 0.2 * sv.shape[0]
