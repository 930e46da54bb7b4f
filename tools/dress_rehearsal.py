#!/usr/bin/env python
"""Timed multi-tile CLI dress rehearsal of the flagship fusion method.

Builds a synthetic multi-tile RGB+3D dataset on disk (procedural terrain
epoch pair with a planted displacement + rendered epoch imagery through a
calibrated nadir camera, tools/synth_scene.py), generates reference-layout
model checkpoints, writes a ``fusion_brienz``-schema config, then drives the
REAL ``main_fusion.py`` CLI as a subprocess — tiling, PLY IO, online image
matching, prewarm, the sharded device step, and result writes all included —
and reports:

- wall-clock start→finish seconds and Mpts/min on the current backend;
- the extrapolated 50M-pt epoch-pair minutes on v5e-8
  (wall * (50e6 / n) / 8 / 60), directly comparable with bench.py's
  step-only extrapolation — the gap between the two is the measured
  host-orchestration overhead;
- planted-displacement recovery (median error, moving + static) from the
  written ``c2f_dvfs_src2tgt_tile_*.txt`` tables.

Usage::

    python tools/dress_rehearsal.py [--n 2500000] [--max-pts 131072]
        [--workdir /tmp/f4l_dress] [--no-2d] [--keep]

Prints one JSON line with the measurements (progress on stderr).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))
sys.path.insert(0, REPO)

PLANTED_SHIFT = (0.05, -0.02, 0.01)


def make_dips_checkpoint(path: str) -> None:
    """Reference-layout DIPs checkpoint (the real
    ``local_feature_descriptor_best.pth`` is a download per the reference
    README; runtime cost is weight-agnostic, so a seeded random init in the
    reference's exact state-dict layout stands in)."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        import types

        for name in (
            "cpp_core",
            "cpp_core.pcd_tiling",
            "cpp_core.pcd_tiling.build",
            "cpp_core.pcd_tiling.build.pcd_tiling",
        ):
            sys.modules.setdefault(name, types.ModuleType(name))
        from src.models.local_feature_descriptor import PointNetFeature

        torch.manual_seed(0)
        model = PointNetFeature(dim=64, l2norm=True, tnet=True)
        torch.save(model.state_dict(), path)
    finally:
        sys.path.remove("/root/reference")


def build_dataset(workdir: str, n: int, use_2d: bool, image_size) -> dict:
    from synth_scene import (
        make_epoch_pair,
        nadir_camera,
        render_image,
    )

    from fusion4landslide_tpu.io import write_ply

    input_root = osp.join(workdir, "input")
    os.makedirs(osp.join(input_root, "raw_pcd"), exist_ok=True)
    t0 = time.perf_counter()
    src, tgt, extent, moving = make_epoch_pair(n, shift=PLANTED_SHIFT)
    write_ply(osp.join(input_root, "raw_pcd", "epoch1.ply"), src)
    write_ply(osp.join(input_root, "raw_pcd", "epoch2.ply"), tgt)
    info = {
        "extent_m": round(extent, 1),
        "synth_seconds": round(time.perf_counter() - t0, 1),
    }
    if use_2d:
        from PIL import Image

        K, E, _ = nadir_camera(extent, image_size)
        img_dir = osp.join(input_root, "image")
        os.makedirs(osp.join(img_dir, "raw_images"), exist_ok=True)
        os.makedirs(osp.join(img_dir, "transformations"), exist_ok=True)
        np.savetxt(osp.join(img_dir, "camera_intrinsic.txt"), K, delimiter=" ")
        pose = np.linalg.inv(E)
        for name in ("pose_epoch1.txt", "pose_epoch2.txt"):
            np.savetxt(
                osp.join(img_dir, "transformations", name), pose, delimiter=" "
            )
        t0 = time.perf_counter()
        img0 = render_image(image_size, K, E, extent)
        img1 = render_image(image_size, K, E, extent, shift=PLANTED_SHIFT)
        Image.fromarray(img0).save(osp.join(img_dir, "raw_images", "epoch1.png"))
        Image.fromarray(img1).save(osp.join(img_dir, "raw_images", "epoch2.png"))
        info["render_seconds"] = round(time.perf_counter() - t0, 1)
    return info


CONFIG_TMPL = """\
misc:
  verbose: True
  save_interim: False

path_name:
  input_root: {input_root}
  output_dir: {output_dir}
  output_folder: run
  weight_dir: {weight_dir}
  pretrained_feature_aggregation_weight: feat_aggregation_3d.pth

data:
  dataset: brienz_tls
  src_pcd: epoch1.ply
  tgt_pcd: epoch2.ply
  src_image: epoch1.png
  tgt_image: epoch2.png
  src_pose: pose_epoch1.txt
  tgt_pose: pose_epoch2.txt
  multiple_case: True

method:
  tiling_type: xy_tiling
  max_pts_per_tile: {max_pts}
  min_pts_per_tile: {min_pts}
  tile_halo: {halo}
  voxel_size_init: 0.1
  use_2d_matches: {use_2d}
  img_matching_type: eloftr
  num_sub_img: 1
  image_size: [{ih}, {iw}]
  crop_size: [960, 1280]
  overlap_size: [480, 640]
  pixel_thres: 5
  lifting_type: nn_search
  matches_from_2d_type: nn_src_only
  partition: True
  partition_type: supervoxel
  level_of_superpoint: [1, 2, 3]
  small_patch_removal: True
  num_min_matches_for_small_patch: 10
  point_feat_compute: True
  feat_type: DIPs
  feat_dim: 64
  feat_dtype: bfloat16
  global_matching_from_3d_type: blocked_knn
  coarse_matching_fusion: True
  fine_matching_fusion: True
  feat_aggregate_type: 'learning_based'
  use_normal_3d_aggregation: True
  remove_low_quality_patch_matches: True
  num_min_matches_for_quality_check: 10
  thres_dist_diff: 0.5
  thres_inlier_ratio: 0.15
  coarse_refinement_3d_type: 'nn_mutual'
  num_min_fine_match: 10
  weighting_svd: False
  icp_refine: True
  icp_register_type: only_matches
  output_tgt2src: False
  assign_type: assign_then_nn
  use_mesh: True
  prewarm: True

parameter_setting:
  batch_size: 1
  num_workers: 8
  points_per_batch: 1000
  n_normals: 30
  icp_threshold: 0.1
  max_magnitude: 5

visualization:
  visualize_patch: False

debugging:
  use_debugging: False
  num_spt: 200
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_500_000)
    ap.add_argument("--max-pts", type=int, default=131072)
    ap.add_argument("--halo", type=float, default=20.0)
    ap.add_argument("--workdir", default="/tmp/f4l_dress")
    ap.add_argument("--no-2d", action="store_true")
    ap.add_argument("--image-size", type=int, nargs=2, default=[1920, 2560])
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    use_2d = not args.no_2d

    workdir = args.workdir
    if osp.isdir(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    print(f"# building dataset ({args.n} pts) ...", file=sys.stderr)
    info = build_dataset(workdir, args.n, use_2d, tuple(args.image_size))
    print(f"# dataset: {info}", file=sys.stderr)

    wdir = osp.join(workdir, "weights")
    os.makedirs(wdir)
    make_dips_checkpoint(osp.join(wdir, "local_feature_descriptor_best.pth"))
    shutil.copy(
        "/root/reference/weights/feat_aggregation_3d.pth",
        osp.join(wdir, "feat_aggregation_3d.pth"),
    )
    # The learned image matcher's in-environment-trained weights.
    for w in glob.glob(osp.join(REPO, "weights", "*.npz")):
        shutil.copy(w, osp.join(wdir, osp.basename(w)))

    cfg_path = osp.join(workdir, "fusion_dress.yaml")
    with open(cfg_path, "w") as fh:
        fh.write(
            CONFIG_TMPL.format(
                input_root=osp.join(workdir, "input"),
                output_dir=osp.join(workdir, "output"),
                weight_dir=wdir,
                max_pts=args.max_pts,
                min_pts=min(5000, max(2, args.max_pts // 4)),
                halo=args.halo,
                use_2d=use_2d,
                ih=args.image_size[0],
                iw=args.image_size[1],
            )
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("# running main_fusion.py ...", file=sys.stderr)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "main_fusion.py"), "--config", cfg_path],
        env=env,
        cwd=REPO,
        stdout=sys.stderr,
        stderr=subprocess.STDOUT,
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(json.dumps({"ok": False, "rc": proc.returncode}))
        sys.exit(1)

    # ---- recovery check from the written DVF tables
    out_root = osp.join(workdir, "output", "run")
    dvf_files = sorted(glob.glob(osp.join(out_root, "*", "c2f_dvfs_src2tgt_tile_*.txt"))) or sorted(
        glob.glob(osp.join(out_root, "**", "c2f_dvfs_src2tgt_tile_*.txt"), recursive=True)
    )
    shift = np.asarray(PLANTED_SHIFT)
    errs_mov, errs_sta, n_rows = [], [], 0
    from synth_scene import make_epoch_pair  # extent for the moving rule

    _, _, extent, _ = make_epoch_pair(16, shift=PLANTED_SHIFT)
    extent = float(np.sqrt(args.n / 100.0))
    for f in dvf_files:
        d = np.loadtxt(f, ndmin=2)
        if not d.size:
            continue
        n_rows += len(d)
        disp = d[:, 3:6] - d[:, 0:3]
        moving = d[:, 0] > extent / 2
        errs_mov.append(np.linalg.norm(disp[moving] - shift, axis=1))
        errs_sta.append(np.linalg.norm(disp[~moving], axis=1))
    med_mov = float(np.median(np.concatenate(errs_mov))) if errs_mov else None
    med_sta = float(np.median(np.concatenate(errs_sta))) if errs_sta else None

    minutes_50m = wall * (50e6 / args.n) / 8 / 60.0
    result = {
        "ok": True,
        "n_points": args.n,
        "n_tiles": len(dvf_files),
        "wall_seconds": round(wall, 1),
        "mpts_per_min_1chip": round(args.n / 1e6 / (wall / 60.0), 3),
        "extrapolated_50M_v5e8_minutes": round(minutes_50m, 2),
        "dvf_rows": n_rows,
        "median_err_moving_m": med_mov,
        "median_err_static_m": med_sta,
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
