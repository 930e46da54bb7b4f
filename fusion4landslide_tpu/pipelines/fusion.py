"""Coarse-to-fine fusion pipeline (3D path): superpoint partition + learned
coarse patch matching + fine per-patch SVD/ICP refinement.

Capability parity with the reference ``Coarse2Fine`` flagship
(src/coarse_to_fine_matching.py:195-308 + src/coarse_to_fine_matching_base.py,
driven by main_fusion.py) in its shippable 3D configuration
(``fusion_3d``: use_2d_matches=False, use_normal_3d_aggregation, supervoxel
partition — fusion_3d_brienz.yaml). Stage map:

1. adaptive voxel subsampling, voxel<->point maps (base:1012-1057),
2. DIPs descriptors on the voxel cloud (base:1965-2049),
3. global 3D voxel matches: feature-space 1-NN with the max-magnitude gate,
   unmatched = -1 (base:2756-2889),
4. multi-level partition: supervoxels at geometrically spaced radii — the
   TPU stand-in for the superpoint hierarchy levels 1..3
   (coarse_to_fine_matching.py:215-287; partition_type='supervoxel' is a
   reference-supported configuration, base:2663-2694),
5. superpoint feature aggregation (ClusterFeatureNet) + coarse matching:
   feature cdist with coordinate-distance mask, mutual NN
   (base:2947-2999),
6. fine matching per matched patch pair: member correspondences restricted
   to both patches, isometry quality gate (pairwise-distance-difference
   inlier ratio, base:3310-3323), weighted SVD, point-to-point ICP seeded
   with it (base:3341-3368), dense ``R p + t`` assignment for every source
   point of the patch plus ``assign_then_nn`` re-association with the
   adaptive threshold max(2·rmse, median_res) (base:3371-3436),
7. multi-level merge by priority (coarse_to_fine_matching.py:40-118) —
   levels assign to the *same* source points here, so the reference's
   spatial dedup reduces to per-point priority selection,
8. ``c2f_*`` result tables (base:3459-3560).

TPU re-design: partitions, features and matches all live on the voxel cloud;
original points inherit their voxel's label and their patch's rigid motion.
The per-patch Python loop (base:3254, one SVD+o3d-ICP each) becomes one
vmapped fixed-shape kernel over padded patch buckets.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.ops.icp import icp_point2point
from fusion4landslide_tpu.ops.kabsch import transform_points, weighted_kabsch
from fusion4landslide_tpu.ops.knn import knn, median_nn_distance, nn1
from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation
from fusion4landslide_tpu.ops.voxel import voxel_downsample
from fusion4landslide_tpu.pipelines.f2s3 import compute_dips_features

__all__ = [
    "global_matches_3d",
    "coarse_match_superpoints",
    "fine_match_pairs",
    "run_fusion3d_tile",
]


@functools.partial(jax.jit, static_argnames=())
def global_matches_3d(
    src_vox_feat: jax.Array,
    tgt_vox_feat: jax.Array,
    src_vox: jax.Array,
    tgt_vox: jax.Array,
    max_magnitude: jax.Array | float,
    src_valid: jax.Array | None = None,
    tgt_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Feature-space 1-NN voxel matches gated by displacement magnitude.

    Returns (tgt_idx (Vs,), valid (Vs,)) — the reference keeps -1 for
    unmatched (base:2879-2885); here a boolean mask.
    """
    sqd, idx = knn(src_vox_feat, tgt_vox_feat, 1, tgt_valid)
    idx = idx[:, 0]
    matched_tgt = jnp.take(tgt_vox, idx, axis=0)
    mag = jnp.linalg.norm(src_vox - matched_tgt, axis=-1)
    valid = jnp.isfinite(sqd[:, 0]) & (mag <= max_magnitude)
    if src_valid is not None:
        valid = valid & src_valid.astype(bool)
    return idx, valid


@functools.partial(jax.jit, static_argnames=("mutual",))
def coarse_match_superpoints(
    spt_feat_src: jax.Array,
    spt_coord_src: jax.Array,
    spt_valid_src: jax.Array,
    spt_feat_tgt: jax.Array,
    spt_coord_tgt: jax.Array,
    spt_valid_tgt: jax.Array,
    max_magnitude: jax.Array | float,
    *,
    mutual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Superpoint-level matching: feature distances, with pairs whose
    centroids are farther than ``max_magnitude`` masked to +inf, then NN
    (+ mutual check for 'nn_mutual', base:2966-2999).

    Returns (tgt_idx (Ss,), valid (Ss,)).
    """
    hp = jax.lax.Precision.HIGHEST
    feat2 = (
        jnp.sum(spt_feat_src**2, -1)[:, None]
        - 2.0
        * jnp.matmul(
            spt_feat_src,
            spt_feat_tgt.T,
            precision=hp,
            preferred_element_type=jnp.float32,
        )
        + jnp.sum(spt_feat_tgt**2, -1)[None, :]
    )
    coord2 = None
    for d in range(3):
        cd = spt_coord_src[:, None, d] - spt_coord_tgt[None, :, d]
        coord2 = cd * cd if coord2 is None else coord2 + cd * cd
    bad = (
        (coord2 > max_magnitude**2)
        | ~spt_valid_src.astype(bool)[:, None]
        | ~spt_valid_tgt.astype(bool)[None, :]
    )
    dist = jnp.where(bad, jnp.inf, feat2)
    tgt_of_src = jnp.argmin(dist, axis=1)
    best_s = jnp.take_along_axis(dist, tgt_of_src[:, None], axis=1)[:, 0]
    valid = jnp.isfinite(best_s)
    if mutual:
        src_of_tgt = jnp.argmin(dist, axis=0)
        valid = valid & (
            jnp.take(src_of_tgt, tgt_of_src) == jnp.arange(dist.shape[0])
        )
    return tgt_of_src, valid


class FinePairResult(NamedTuple):
    R: jax.Array  # (Pairs, 3, 3)
    t: jax.Array  # (Pairs, 3)
    rmse: jax.Array  # (Pairs,)
    valid: jax.Array  # (Pairs,)
    n_matches: jax.Array  # (Pairs,)


@functools.partial(
    jax.jit,
    static_argnames=("pair_chunk", "icp_max_iter"),
)
def fine_match_pairs(
    src_members: jax.Array,  # (Pairs, P) src voxel indices per patch
    src_member_mask: jax.Array,  # (Pairs, P)
    pair_tgt_label: jax.Array,  # (Pairs,)
    corres_tgt_idx: jax.Array,  # (Vs,) matched tgt voxel per src voxel
    corres_valid: jax.Array,  # (Vs,)
    tgt_vox_label: jax.Array,  # (Vt,)
    src_vox: jax.Array,  # (Vs, 3)
    tgt_vox: jax.Array,  # (Vt, 3)
    *,
    num_min_quality: int | jax.Array = 10,
    thres_dist_diff: float | jax.Array = 0.5,
    thres_inlier_ratio: float | jax.Array = 0.15,
    num_min_fine: int | jax.Array = 10,
    icp_threshold: float | jax.Array = 0.1,
    icp_max_iter: int = 30,
    pair_chunk: int = 32,
) -> FinePairResult:
    """Per matched patch pair: quality gate + SVD + ICP (base:3254-3436)."""
    Pairs, P = src_members.shape

    def one_pair(members, mmask, tgt_label):
        w = jnp.take(corres_tgt_idx, members)
        mv = (
            mmask
            & jnp.take(corres_valid, members)
            & (jnp.take(tgt_vox_label, w) == tgt_label)
        )
        src_m = jnp.take(src_vox, members, axis=0)
        tgt_m = jnp.take(tgt_vox, w, axis=0)
        n_match = jnp.sum(mv)

        # Isometry quality gate (base:3310-3323): mean and inlier ratio of
        # |pairwise-dist(src) - pairwise-dist(tgt)| over matched pairs.
        def pd2(x):
            out = None
            for d in range(3):
                cd = x[:, None, d] - x[None, :, d]
                out = cd * cd if out is None else out + cd * cd
            return jnp.sqrt(jnp.maximum(out, 0.0))

        diff = jnp.abs(pd2(src_m) - pd2(tgt_m))
        pair_ok = mv[:, None] & mv[None, :]
        off_diag = ~jnp.eye(P, dtype=bool)
        wgt = (pair_ok & off_diag).astype(src_m.dtype)
        n_off = jnp.maximum(jnp.sum(wgt), 1.0)
        dist_mean = jnp.sum(diff * wgt) / n_off
        ratio_inlier = jnp.sum((diff <= thres_dist_diff) * wgt) / n_off
        gated = n_match >= num_min_quality
        quality_ok = jnp.where(
            gated,
            (ratio_inlier > thres_inlier_ratio) & (dist_mean < thres_dist_diff),
            True,
        )

        # SVD fit then ICP seeded with it (base:3341-3360).
        R0, t0, _, _ = weighted_kabsch(src_m, tgt_m, mv.astype(src_m.dtype))
        icp = icp_point2point(
            src_m,
            tgt_m,
            icp_threshold,
            src_mask=mv,
            tgt_mask=mv,
            max_iter=icp_max_iter,
            R_init=R0,
            t_init=t0,
        )
        valid = quality_ok & (n_match >= num_min_fine)
        return icp.R, icp.t, icp.inlier_rmse, valid, n_match

    def chunk_fn(args):
        return jax.vmap(one_pair)(*args)

    pad = (-Pairs) % pair_chunk
    sm = jnp.pad(src_members, ((0, pad), (0, 0)))
    mm = jnp.pad(src_member_mask, ((0, pad), (0, 0)))
    pl = jnp.pad(pair_tgt_label, (0, pad), constant_values=-1)
    nc = sm.shape[0] // pair_chunk
    R, t, rmse, valid, n_match = jax.lax.map(
        chunk_fn,
        (
            sm.reshape(nc, pair_chunk, P),
            mm.reshape(nc, pair_chunk, P),
            pl.reshape(nc, pair_chunk),
        ),
    )
    return FinePairResult(
        R=R.reshape(-1, 3, 3)[:Pairs],
        t=t.reshape(-1, 3)[:Pairs],
        rmse=rmse.reshape(-1)[:Pairs],
        valid=valid.reshape(-1)[:Pairs],
        n_matches=n_match.reshape(-1)[:Pairs],
    )


def _compact_labels(labels: np.ndarray, min_count: int) -> tuple[np.ndarray, int]:
    """Drop labels with <= min_count members, compact ids to 0..K-1
    (small-patch removal, base:1309-1321)."""
    labels = np.asarray(labels)
    if labels.max() < 0:
        return np.full_like(labels, -1), 0
    counts = np.bincount(labels[labels >= 0])
    keep = counts > min_count
    remap = np.full(counts.size, -1)
    remap[keep] = np.arange(keep.sum())
    out = np.where(labels >= 0, remap[np.clip(labels, 0, None)], -1)
    return out, int(keep.sum())


def run_fusion3d_tile(
    cfg,
    dips_params,
    agg_params,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    *,
    src_halo: np.ndarray | None = None,
    tgt_halo: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    rng_seed: int = 0,
) -> dict:
    """One tile of the fusion_3d pipeline. ``cfg`` keys follow the reference
    fusion YAML schema (max_magnitude, icp_threshold, level_of_superpoint,
    num_min_fine_match, num_min_matches_for_quality_check, thres_dist_diff,
    thres_inlier_ratio, num_min_matches_for_small_patch, voxel_size_init,
    output_dir/output_folder, dataset, assign_type, output_tgt2src)."""
    from fusion4landslide_tpu.io.results import (
        dvf_magnitudes,
        save_dvfms,
        visual_clamp_magnitude,
    )
    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn

    if src_halo is None:
        src_halo = src_core
    if tgt_halo is None:
        tgt_halo = tgt_core

    center = src_core.mean(axis=0)
    s = (src_core - center).astype(np.float32)
    t = (tgt_core - center).astype(np.float32)
    sh = (src_halo - center).astype(np.float32)
    th = (tgt_halo - center).astype(np.float32)

    max_mag = float(cfg.get("max_magnitude", 10.0))
    icp_thr = float(cfg.get("icp_threshold", 0.1))
    levels = list(cfg.get("level_of_superpoint", [1, 2, 3]) or [1])
    num_min_fine = int(cfg.get("num_min_fine_match", 10))
    num_min_quality = int(cfg.get("num_min_matches_for_quality_check", 10))
    thres_dd = float(cfg.get("thres_dist_diff", 0.5))
    thres_ir = float(cfg.get("thres_inlier_ratio", 0.15))
    small_patch = int(cfg.get("num_min_matches_for_small_patch", 10))
    assign_type = str(cfg.get("assign_type", "assign_then_nn"))
    out_tgt2src = bool(cfg.get("output_tgt2src", False))

    key = jax.random.PRNGKey(rng_seed)
    k_s, k_t = jax.random.split(key)

    # --- 1. median resolution + adaptive voxel subsampling (base:1012-1030).
    res_s = float(median_nn_distance(jnp.asarray(s)))
    res_t = float(median_nn_distance(jnp.asarray(t)))
    median_res = max(res_s, res_t)
    s_cent, s_p2v, s_cnt, s_nv = voxel_downsample(jnp.asarray(s), median_res)
    t_cent, t_p2v, t_cnt, t_nv = voxel_downsample(jnp.asarray(t), median_res)
    s_nv, t_nv = int(s_nv), int(t_nv)
    src_vox = np.asarray(s_cent)[:s_nv]
    tgt_vox = np.asarray(t_cent)[:t_nv]
    s_p2v = np.asarray(s_p2v)
    t_p2v = np.asarray(t_p2v)
    if logger:
        logger.info(
            "tile %s: median_res=%.4f, voxels src=%d tgt=%d",
            tile_id, median_res, s_nv, t_nv,
        )

    # --- 2. DIPs descriptors on the voxel clouds (base:1965-2049).
    radius = float(np.sqrt(3) * 10.0 * median_res)
    feat_kw = dict(
        k_max=int(cfg.get("feat_k_max", 512)),
        patch_points=int(cfg.get("feat_patch_points", 256)),
        chunk=int(cfg.get("feat_chunk", 2048)),
    )
    src_feat = np.asarray(
        compute_dips_features(
            dips_params, jnp.asarray(src_vox), jnp.asarray(sh), radius, k_s, **feat_kw
        )
    )
    tgt_feat = np.asarray(
        compute_dips_features(
            dips_params, jnp.asarray(tgt_vox), jnp.asarray(th), radius, k_t, **feat_kw
        )
    )

    # --- 3. Global 3D voxel matches (base:2756-2889).
    g_idx, g_valid = global_matches_3d(
        jnp.asarray(src_feat), jnp.asarray(tgt_feat),
        jnp.asarray(src_vox), jnp.asarray(tgt_vox), max_mag,
    )
    g_idx = np.asarray(g_idx)
    g_valid = np.asarray(g_valid)

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)
    # Interim artifact: global-3D dvfms pre-pruning (base:2908-2920).
    interim = np.hstack(
        [
            src_vox[g_valid] + center,
            np.linalg.norm(
                tgt_vox[g_idx[g_valid]] - src_vox[g_valid], axis=1
            )[:, None],
        ]
    )
    vis = visual_clamp_magnitude(interim, cfg.get("dataset"))
    np.savetxt(
        osp.join(
            results_dir,
            f"c2f_dvfms_from_global_3d_src2tgt_wo_pruning_visualize_tile_{tile_id}.txt",
        ),
        vis,
    )

    agg_model = ClusterFeatureNet()
    base_svl_radius = max(radius, float(cfg.get("voxel_size_init", 0.0) or 0.0))

    n_src_pts = s.shape[0]
    # Per-level, per-point transforms; merged by priority (level list order).
    merged_R = np.tile(np.eye(3, dtype=np.float32), (n_src_pts, 1, 1))
    merged_t = np.zeros((n_src_pts, 3), np.float32)
    merged_valid = np.zeros(n_src_pts, bool)
    merged_rmse = np.zeros(n_src_pts, np.float32)
    per_level_stats = []

    # Precomputed superpoint partitions (reference partition_type=
    # 'superpoint', files written by the SPT bridge or any external tool in
    # the 15-column format — base:1241-1276): labels are defined on the tile
    # points and transferred to voxels via each voxel's first member point.
    partition_type = str(cfg.get("partition_type", "supervoxel"))
    spt_src_path = osp.join(
        out_root, f"{partition_type}_partition",
        f"partition_of_input_src_tile_{tile_id}.txt",
    )
    spt_tgt_path = osp.join(
        out_root, f"{partition_type}_partition",
        f"partition_of_input_tgt_tile_{tile_id}.txt",
    )
    use_spt_files = (
        partition_type == "superpoint"
        and osp.exists(spt_src_path)
        and osp.exists(spt_tgt_path)
    )
    if partition_type == "superpoint" and not use_spt_files and logger:
        logger.warning(
            "partition_type=superpoint but %s not found — falling back to "
            "supervoxel partitioning", spt_src_path,
        )
    if use_spt_files:
        from fusion4landslide_tpu.ops.partition_io import read_superpoint_partition

        # Representative (first) point per voxel carries its labels.
        first_pt_of_vox_s = np.zeros(s_nv, np.int64)
        first_pt_of_vox_s[s_p2v[::-1][s_p2v[::-1] < s_nv]] = np.arange(
            len(s_p2v)
        )[::-1][s_p2v[::-1] < s_nv]
        first_pt_of_vox_t = np.zeros(t_nv, np.int64)
        first_pt_of_vox_t[t_p2v[::-1][t_p2v[::-1] < t_nv]] = np.arange(
            len(t_p2v)
        )[::-1][t_p2v[::-1] < t_nv]

    for level in levels:
        if use_spt_files:
            _, pt_lab_s = read_superpoint_partition(spt_src_path, int(level))
            _, pt_lab_t = read_superpoint_partition(spt_tgt_path, int(level))
            raw_s = pt_lab_s[first_pt_of_vox_s]
            raw_t = pt_lab_t[first_pt_of_vox_t]
        else:
            svl_radius = base_svl_radius * (2.0 ** (int(level) - 1))
            seg_s = supervoxel_segmentation(jnp.asarray(src_vox), svl_radius)
            seg_t = supervoxel_segmentation(jnp.asarray(tgt_vox), svl_radius)
            raw_s = np.asarray(seg_s.labels)
            raw_t = np.asarray(seg_t.labels)
        lab_s, n_s = _compact_labels(raw_s, small_patch)
        lab_t, n_t = _compact_labels(raw_t, small_patch)
        if n_s == 0 or n_t == 0:
            per_level_stats.append((level, 0, 0))
            continue

        S_s, S_t = bucket_size(n_s), bucket_size(n_t)
        cnt_s = np.bincount(lab_s[lab_s >= 0], minlength=n_s)
        cnt_t = np.bincount(lab_t[lab_t >= 0], minlength=n_t)
        P_s = bucket_size(int(cnt_s.max()))
        P_t = bucket_size(int(cnt_t.max()))
        mem_s, memmask_s = label_members(jnp.asarray(lab_s), S_s, P_s)
        mem_t, memmask_t = label_members(jnp.asarray(lab_t), S_t, P_t)

        # --- 5. Superpoint aggregation (base:2561-2656) + coarse matching.
        feats_s = jnp.take(jnp.asarray(src_feat), mem_s, axis=0) * memmask_s[..., None]
        feats_t = jnp.take(jnp.asarray(tgt_feat), mem_t, axis=0) * memmask_t[..., None]
        spt_feat_s = agg_model.apply(agg_params, feats_s, memmask_s)
        spt_feat_t = agg_model.apply(agg_params, feats_t, memmask_t)
        w_s = memmask_s.astype(jnp.float32)[..., None]
        spt_coord_s = jnp.sum(
            jnp.take(jnp.asarray(src_vox), mem_s, axis=0) * w_s, axis=1
        ) / jnp.maximum(jnp.sum(w_s, axis=1), 1.0)
        w_t = memmask_t.astype(jnp.float32)[..., None]
        spt_coord_t = jnp.sum(
            jnp.take(jnp.asarray(tgt_vox), mem_t, axis=0) * w_t, axis=1
        ) / jnp.maximum(jnp.sum(w_t, axis=1), 1.0)
        valid_s = jnp.arange(S_s) < n_s
        valid_t = jnp.arange(S_t) < n_t
        tgt_of_src, pair_valid = coarse_match_superpoints(
            spt_feat_s, spt_coord_s, valid_s,
            spt_feat_t, spt_coord_t, valid_t,
            max_mag,
        )
        tgt_of_src = np.asarray(tgt_of_src)
        pair_valid = np.asarray(pair_valid)

        # --- 6. Fine matching over valid pairs.
        pair_src = np.where(pair_valid[:n_s])[0]
        if pair_src.size == 0:
            per_level_stats.append((level, n_s, 0))
            continue
        pair_tgt = tgt_of_src[pair_src]
        fine = fine_match_pairs(
            jnp.take(mem_s, jnp.asarray(pair_src), axis=0),
            jnp.take(memmask_s, jnp.asarray(pair_src), axis=0),
            jnp.asarray(pair_tgt, jnp.int32),
            jnp.asarray(g_idx, jnp.int32),
            jnp.asarray(g_valid),
            jnp.asarray(lab_t, jnp.int32),
            jnp.asarray(src_vox),
            jnp.asarray(tgt_vox),
            num_min_quality=num_min_quality,
            thres_dist_diff=thres_dd,
            thres_inlier_ratio=thres_ir,
            num_min_fine=num_min_fine,
            icp_threshold=icp_thr,
        )
        fR = np.asarray(fine.R)
        ft = np.asarray(fine.t)
        frmse = np.asarray(fine.rmse)
        fvalid = np.asarray(fine.valid)

        # Map per-pair transforms to per-src-label slots.
        lab_R = np.tile(np.eye(3, dtype=np.float32), (n_s, 1, 1))
        lab_t_arr = np.zeros((n_s, 3), np.float32)
        lab_rmse = np.zeros(n_s, np.float32)
        lab_ok = np.zeros(n_s, bool)
        lab_R[pair_src] = fR
        lab_t_arr[pair_src] = ft
        lab_rmse[pair_src] = frmse
        lab_ok[pair_src] = fvalid

        # --- 7. Dense per-point assignment, merged by level priority.
        pt_label = np.where(
            (s_p2v < s_nv), lab_s[np.clip(s_p2v, 0, max(s_nv - 1, 0))], -1
        )
        pt_has = (pt_label >= 0) & lab_ok[np.clip(pt_label, 0, None)]
        take = pt_has & ~merged_valid
        lbl = np.clip(pt_label, 0, None)
        merged_R[take] = lab_R[lbl[take]]
        merged_t[take] = lab_t_arr[lbl[take]]
        merged_rmse[take] = lab_rmse[lbl[take]]
        merged_valid |= take
        per_level_stats.append((level, n_s, int(fvalid.sum())))
        if logger:
            logger.info(
                "tile %s level %s: %d src spts, %d matched pairs, %d fine-valid",
                tile_id, level, n_s, pair_src.size, int(fvalid.sum()),
            )

    # Dense output: R p + t for every assigned source point (base:3371-3380).
    src_pts_j = jnp.asarray(s)
    moved = np.asarray(
        jax.vmap(lambda p, R, tt: R @ p + tt)(
            src_pts_j, jnp.asarray(merged_R), jnp.asarray(merged_t)
        )
    )
    dense_src = src_core[merged_valid]
    dense_tgt = moved[merged_valid] + center
    dvfs_dense = np.hstack([dense_src, dense_tgt])

    np.savetxt(
        osp.join(results_dir, f"c2f_dvfs_src2tgt_tile_{tile_id}.txt"), dvfs_dense
    )
    dvfms = save_dvfms(
        osp.join(results_dir, f"c2f_dvfms_src2tgt_tile_{tile_id}.txt"), dvfs_dense
    )
    if dvfms.shape[0] > 2:
        np.savetxt(
            osp.join(
                results_dir, f"c2f_dvfms_src2tgt_visualize_tile_{tile_id}.txt"
            ),
            visual_clamp_magnitude(dvfms, cfg.get("dataset")),
        )

    # Sparse 'assign_then_nn' output: re-associate moved points with actual
    # target points within the adaptive threshold (base:3414-3436).
    dvfs_sparse = None
    if assign_type == "assign_then_nn" and merged_valid.any():
        adaptive = np.maximum(2.0 * merged_rmse[merged_valid], median_res)
        radius_nn = float(np.maximum(adaptive.max(), median_res))
        grid = build_hash_grid(jnp.asarray(t), radius_nn)
        d2, nn_idx, _ = hash_grid_knn(
            jnp.asarray(moved[merged_valid]), grid, radius_nn, k=1
        )
        d = np.sqrt(np.asarray(d2)[:, 0])
        ok = np.isfinite(d) & (d < adaptive)
        nn_idx = np.asarray(nn_idx)[:, 0]
        dvfs_sparse = np.hstack(
            [dense_src[ok], t[nn_idx[ok]] + center]
        )
        sparse_ms = np.hstack(
            [dvfs_sparse[:, :3], dvf_magnitudes(dvfs_sparse)[:, None]]
        )
        np.savetxt(
            osp.join(
                results_dir,
                f"c2f_dvfms_src2tgt_discrete_visualize_tile_{tile_id}.txt",
            ),
            visual_clamp_magnitude(sparse_ms, cfg.get("dataset")),
        )

    # tgt -> src output (base:3386-3393): inverse transform per target point.
    if out_tgt2src and merged_valid.any():
        # Assign each tgt point the transform of its matched src patch is the
        # reference behaviour per pair; here invert the per-point transform
        # of the nearest assigned source point.
        _, near_src = nn1(jnp.asarray(t), jnp.asarray(s[merged_valid]))
        near_src = np.asarray(near_src)
        idx_assigned = np.where(merged_valid)[0][near_src]
        Rm = merged_R[idx_assigned]
        tm = merged_t[idx_assigned]
        src_est = np.einsum("nij,nj->ni", Rm.transpose(0, 2, 1), t - tm)
        dvfs_t2s = np.hstack([src_est + center, tgt_core])
        np.savetxt(
            osp.join(results_dir, f"c2f_dvfms_tgt2src_tile_{tile_id}.txt"),
            np.hstack(
                [
                    dvfs_t2s[:, 3:6],
                    dvf_magnitudes(dvfs_t2s)[:, None],
                ]
            ),
        )

    return {
        "dvfs": dvfs_dense,
        "dvfs_sparse": dvfs_sparse,
        "assigned_fraction": float(merged_valid.mean()),
        "per_level": per_level_stats,
        "R": merged_R,
        "t": merged_t,
        "valid": merged_valid,
    }
