"""Piecewise-ICP pipeline: device core + end-to-end CLI driver.

Test data note: centroid matching cannot detect uniform sliding of a
*homogeneous* random cloud (cell contents are statistically identical after
the shift — true of the reference method too). The tests therefore use the
method's intended regime: geometry that is distinct per cell (Gaussian blobs
centred in cells), where an unstable cell's centroid deviation equals the
true displacement.
"""

import os
import subprocess
import sys

import numpy as np


def blob_pair(rng, grid=10, spacing=4.0, pts_per_blob=30, moved_frac=0.25,
              shift=(0.5, 0.8, 0.3)):
    """Blobs at cell centres of a grid with extent forced to 128 so the
    octree cell size is exactly ``spacing``. Returns src, tgt, moving mask."""
    centers = []
    for i in range(grid):
        for j in range(grid):
            centers.append([spacing * i + 2.0, spacing * j + 2.0, 1.0])
    centers = np.asarray(centers)
    pts = (
        centers[:, None, :]
        + rng.normal(scale=0.25, size=(len(centers), pts_per_blob, 3))
    ).reshape(-1, 3)
    # Anchors pin the merged bbox to [0, 128] in x so extent/2^depth == 4
    # when smax=4 (their singleton cells fall below n_min and are dropped).
    anchors = np.array([[0.0, 0.0, 1.0], [128.0, 0.0, 1.0]])
    moving_blob = rng.random(len(centers)) < moved_frac
    moving = np.repeat(moving_blob, pts_per_blob)
    tgt = pts.copy()
    tgt[moving] += np.asarray(shift)
    src = np.vstack([pts, anchors]).astype(np.float32)
    tgt = np.vstack([tgt, anchors]).astype(np.float32)
    moving = np.concatenate([moving, [False, False]])
    return src, tgt, moving


def test_core_detects_stable_and_moving(rng):
    import jax.numpy as jnp

    from fusion4landslide_tpu.pipelines.piecewise_icp import piecewise_icp_core

    shift = np.array([0.5, 0.8, 0.3])
    src, tgt, moving = blob_pair(rng, shift=shift)
    res = piecewise_icp_core(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(len(src), bool),
        jnp.ones(len(tgt), bool),
        4.0,
        5,
    )
    disp = np.asarray(res.displacement)
    keep = np.asarray(res.out_mask)
    mag = np.linalg.norm(disp, axis=1)
    stable_sel = keep & ~moving
    moving_sel = keep & moving
    assert stable_sel.sum() > 500 and moving_sel.sum() > 200
    # Stable cells: zero displacement. Moving cells: centroid deviation equals
    # the true shift up to blob sampling noise.
    assert np.median(mag[stable_sel]) < 1e-6
    err = np.abs(disp[moving_sel] - shift).max(axis=1)
    assert np.median(err) < 0.2
    # At least 80% of moving points correctly flagged unstable.
    assert (mag[moving_sel] > 0.5).mean() > 0.8


def test_core_masks_padding(rng):
    import jax.numpy as jnp

    from fusion4landslide_tpu.pipelines.piecewise_icp import piecewise_icp_core

    src, tgt, _ = blob_pair(rng, grid=5)
    pad = 200
    srcp = np.vstack([src, np.zeros((pad, 3), np.float32)])
    tgtp = np.vstack([tgt, np.zeros((pad, 3), np.float32)])
    smask = np.arange(len(srcp)) < len(src)
    tmask = np.arange(len(tgtp)) < len(tgt)
    res = piecewise_icp_core(
        jnp.asarray(srcp), jnp.asarray(tgtp), smask, tmask, 4.0, 5
    )
    assert not np.asarray(res.out_mask)[len(src):].any()


def test_run_writes_outputs(tmp_path, rng):
    from fusion4landslide_tpu.pipelines.piecewise_icp import run_piecewise_icp

    src, tgt, _ = blob_pair(rng, grid=6)
    dvfs = run_piecewise_icp(
        src.astype(np.float64) + 1000.0,  # georeferenced-style offset
        tgt.astype(np.float64) + 1000.0,
        smax=4.0,
        number_points_min=5,
        output_dir=str(tmp_path),
        tile_id=0,
        dataset="brienz_tls",
    )
    assert dvfs.shape[1] == 6
    out = np.loadtxt(tmp_path / "results" / "piecewise_icp_dvfms_of_tile_0.txt")
    assert out.shape[0] == dvfs.shape[0]
    vis = np.loadtxt(
        tmp_path / "results" / "piecewise_dvfms_visualize_of_tile_0.txt"
    )
    assert vis[0, 3] == 0.0 and vis[1, 3] == 5.0
    # coordinates written back in the original (offset) frame
    assert 1000.0 < out[:, 0].mean() < 1130.0


def test_cli_end_to_end(tmp_path, rng):
    """Full driver: synthetic PLY pair + YAML -> results on disk."""
    from fusion4landslide_tpu.io import write_ply

    src, tgt, moving = blob_pair(rng, grid=12, pts_per_blob=40)
    data = tmp_path / "data"
    data.mkdir()
    write_ply(str(data / "epoch1.ply"), src)
    write_ply(str(data / "epoch2.ply"), tgt)
    cfg = f"""
misc:
  verbose: True
path_name:
  input_root: {data}
  output_dir: {tmp_path}/out
  output_folder: run
data:
  dataset: brienz_tls
  src_pcd: epoch1.ply
  tgt_pcd: epoch2.ply
method:
  tiling_type: xy_tiling
  max_pts_per_tile: 3000
  min_pts_per_tile: 10
  voxel_size: 0
  smax: 4
  number_points_min: 5
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ, F4L_PLATFORM="cpu", PYTHONPATH=os.getcwd())
    proc = subprocess.run(
        [sys.executable, "main_piecewise_icp.py", "--config", str(cfg_path)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    results = tmp_path / "out" / "run" / "results"
    files = sorted(results.glob("piecewise_icp_dvfms_of_tile_*.txt"))
    assert len(files) >= 2  # 5760 pts / 3000 per tile -> >= 2 tiles
    total = sum(np.loadtxt(f).shape[0] for f in files)
    assert total > 0.8 * len(src)
