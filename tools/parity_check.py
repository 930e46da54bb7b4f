#!/usr/bin/env python
"""Mesh-vs-host DVF parity at PRODUCTION shape on the current backend.

Runs ONE production-shaped fusion_3d tile — a core of ``--n-core`` points
plus its fixed ±20 m halo ring at 100 pts/m², the overlap cloud
``main_fusion.py`` feeds per tile — through BOTH execution paths with the
production config (3 nested levels, feat_k_max=512, 256-pt patches,
fine_max_matches=256 / iso_cap=128 step defaults):

- host: ``pipelines.fusion.run_fusion3d_tile`` (per-stage dispatches,
  host orchestration between stages);
- mesh: ``parallel.run_fusion3d_tiles_sharded`` on a 1-device mesh (the
  single fully-traced device step ``make_sharded_fusion3d_step`` that the
  v5e-8 ``tiles`` mesh runs data-parallel).

Joins the written ``c2f_dvfs_src2tgt_tile_*.txt`` tables on exact source
coordinates and reports the assignment-set overlap and the median / p95 /
max |Δdisplacement| between the two paths — the measured backing for
ARCHITECTURE.md's "mesh on/off <1 mm" claim.

Usage::

    python tools/parity_check.py [--n-core 100000] [--halo 20] [--no-halo]

Prints one JSON line (progress on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def _join_disp(path_a: str, path_b: str, truth_fn=None):
    """Join two (x y z x' y' z') DVF tables on exact source coords.

    ``truth_fn(xyz) -> (n, 3)`` analytic displacement truth; when given,
    each path's field error vs truth is returned alongside the pairwise
    gap (pairwise agreement alone conflates 'the two paths disagree on an
    ambiguous match' with 'one path degrades the field')."""
    a = np.loadtxt(path_a, ndmin=2, dtype=np.float64)
    b = np.loadtxt(path_b, ndmin=2, dtype=np.float64)
    ka = {r[:3].astype(np.float32).tobytes(): i for i, r in enumerate(a)}
    kb = {r[:3].astype(np.float32).tobytes(): i for i, r in enumerate(b)}
    common = [k for k in ka if k in kb]
    ia = np.asarray([ka[k] for k in common])
    ib = np.asarray([kb[k] for k in common])
    da = a[ia, 3:6] - a[ia, 0:3]
    db = b[ib, 3:6] - b[ib, 0:3]
    gap = np.linalg.norm(da - db, axis=1)
    errs = {}
    if truth_fn is not None:
        for name, tbl in (("host", a), ("mesh", b)):
            disp = tbl[:, 3:6] - tbl[:, 0:3]
            err = np.linalg.norm(disp - truth_fn(tbl[:, 0:3]), axis=1)
            errs[f"{name}_median_err_vs_truth_m"] = float(np.median(err))
            errs[f"{name}_frac_err_lt_10mm"] = float((err < 0.01).mean())
    return len(a), len(b), len(common), gap, errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-core", type=int, default=100_000)
    ap.add_argument("--halo", type=float, default=20.0)
    ap.add_argument("--no-halo", action="store_true")
    ap.add_argument("--workdir", default="/tmp/f4l_parity")
    args = ap.parse_args()

    from fusion4landslide_tpu.utils.platform import (
        apply_platform_from_env,
        enable_compile_cache,
    )

    apply_platform_from_env()
    enable_compile_cache()

    import bench  # tile construction + model init shared with the headline

    halo = 0.0 if args.no_halo else args.halo
    src, tgt, core, moving = bench.synth_overlap_tile(
        args.n_core, halo=halo
    )
    print(
        f"# tile: core {args.n_core}, halo ±{halo} m -> {len(src)} pts",
        file=sys.stderr,
    )
    dips_params, agg_params = bench._models()

    workdir = args.workdir
    if osp.isdir(workdir):
        shutil.rmtree(workdir)
    base_cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.1,
        "level_of_superpoint": [1, 2, 3],
        "num_min_fine_match": 10,
        "num_min_matches_for_quality_check": 10,
        "thres_dist_diff": 0.5,
        "thres_inlier_ratio": 0.15,
        "num_min_matches_for_small_patch": 10,
        "voxel_size_init": 0.1,
        "assign_type": "assign_then_nn",
        "output_tgt2src": False,
        "save_interim": False,
        "feat_dtype": "bfloat16",
        "output_folder": "run",
        "dataset": "brienz_tls",
    }

    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )
    from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile

    t0 = time.perf_counter()
    run_fusion3d_tile(
        Config({**base_cfg, "output_dir": osp.join(workdir, "host")}),
        dips_params,
        agg_params,
        src,
        tgt,
        tile_id=0,
        rng_seed=0,
    )
    t_host = time.perf_counter() - t0
    print(f"# host path: {t_host:.1f} s", file=sys.stderr)

    t0 = time.perf_counter()
    run_fusion3d_tiles_sharded(
        Config({**base_cfg, "output_dir": osp.join(workdir, "mesh")}),
        dips_params,
        agg_params,
        [(0, src, tgt)],
        mesh=tile_mesh(1),
        rng_seed=0,
    )
    t_mesh = time.perf_counter() - t0
    print(f"# mesh path: {t_mesh:.1f} s (cold, incl. compile)", file=sys.stderr)

    # Analytic truth of the synthetic tile: the half-plane x > full/2 is
    # shifted by bench.PLANTED_SHIFT, the rest is static (synth_overlap_tile).
    side = float(np.sqrt(args.n_core / 100.0))
    full = side + 2.0 * halo

    def truth_fn(xyz):
        mov = xyz[:, 0] > full / 2
        return mov[:, None] * bench.PLANTED_SHIFT.astype(np.float64)

    n_h, n_m, n_common, gap, errs = _join_disp(
        osp.join(workdir, "host", "run", "results", "c2f_dvfs_src2tgt_tile_0.txt"),
        osp.join(workdir, "mesh", "run", "results", "c2f_dvfs_src2tgt_tile_0.txt"),
        truth_fn=truth_fn,
    )
    result = {
        "n_core": args.n_core,
        "halo_m": halo,
        "tile_points": int(len(src)),
        "host_assigned": n_h,
        "mesh_assigned": n_m,
        "common": n_common,
        "overlap_frac": round(n_common / max(min(n_h, n_m), 1), 4),
        "median_delta_disp_m": float(np.median(gap)) if len(gap) else None,
        "p95_delta_disp_m": float(np.quantile(gap, 0.95)) if len(gap) else None,
        "max_delta_disp_m": float(gap.max()) if len(gap) else None,
        "disagree_frac_gt_10mm": (
            round(float((gap > 0.01).mean()), 4) if len(gap) else None
        ),
        **{k: round(v, 5) for k, v in errs.items()},
        "host_seconds": round(t_host, 1),
        "mesh_seconds_cold": round(t_mesh, 1),
    }
    print(json.dumps(result))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
