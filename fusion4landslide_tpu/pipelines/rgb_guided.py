"""RGB-guided displacement estimation: dense image matching lifted to 3D
with supervoxel-wise rigid refinement.

Capability parity with the reference ``Image_DVFs`` pipeline
(src/rgb_guided.py:845-1639, driven by main_rgb_guided.py:39):

1. project both epochs into their camera images
   (``pcd2img_with_different_types``, rgb_guided.py:2284),
2. dense 2D matching per sliding-window crop pair (the reference runs
   EfficientLoFTR/RoMa, rgb_guided.py:2063; here any registered matcher —
   see fusion4landslide_tpu.image.matching),
3. 2D→3D lifting by pixel-NN chaining within ``pixel_thres``
   (rgb_guided.py:1096-1100) and max-magnitude pruning (tail :324-329),
4. supervoxel segmentation of the source; keep supervoxels with > 10
   matched points (rgb_guided.py:868-950),
5. per-supervoxel rigid refinement (rgb_guided.py:981-1047): weighted-SVD
   fit, residual prune at 2.5x the median residual with a quality flag at
   >= 70% inliers (the pipeline's own ``refine_local_rigid_correspondences``
   variant, rgb_guided.py:99-133), point-to-point ICP, then re-assignment
   of *all* source points of the supervoxel,
6. outputs: ``rgb_guided_wo_refinement_dvfms_tile_N.txt`` and
   ``rgb_guided_w_refinement_dvf(m)s_src2tgt_tile_N.txt``
   (rgb_guided.py:1582-1639).

TPU re-design: the per-supervoxel Python loop becomes a vmapped fixed-shape
kernel over padded supervoxel buckets (shared pattern with the fusion fine
matcher); all pixel searches are blocked 2-d kNN.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.image.geometry import chain_2d_matches_to_3d, project_points
from fusion4landslide_tpu.ops.icp import icp_point2point  # noqa: F401
from fusion4landslide_tpu.ops.registration import icp_by_type
from fusion4landslide_tpu.ops.kabsch import weighted_kabsch
from fusion4landslide_tpu.ops.knn import median_nn_distance
from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation

__all__ = ["refine_supervoxels_rigid", "run_rgb_guided_tile"]


class SupervoxelRefineResult(NamedTuple):
    R: jax.Array  # (S, 3, 3)
    t: jax.Array  # (S, 3)
    quality: jax.Array  # (S,) inlier fraction >= 0.70
    n_matches: jax.Array  # (S,)


@functools.partial(
    jax.jit,
    static_argnames=("s_chunk", "icp_max_iter", "icp_type", "max_matches"),
)
def refine_supervoxels_rigid(
    members: jax.Array,  # (S, P) src point indices per supervoxel
    member_mask: jax.Array,  # (S, P)
    matched: jax.Array,  # (n,) per-point has-a-2D-match flag
    src_pts: jax.Array,  # (n, 3)
    tgt_match_pts: jax.Array,  # (n, 3) lifted 3D match per src point
    *,
    icp_threshold: float | jax.Array = 0.1,
    icp_max_iter: int = 30,
    icp_type: str = "point2point",
    s_chunk: int = 64,
    max_matches: int = 1024,
) -> SupervoxelRefineResult:
    """Per-supervoxel SVD + residual prune + ICP (rgb_guided.py:981-1047).

    The rigid solve uses at most ``max_matches`` matched members per
    supervoxel (matched-first compaction) — ICP's correspondence search is
    quadratic in the member count and a rigid fit saturates statistically
    long before 1024 matches.
    """
    S, P = members.shape

    def one(mem, mm):
        mv = mm & jnp.take(matched, mem)
        if P > max_matches:
            _, sel = jax.lax.top_k(
                mv.astype(jnp.float32)
                - jnp.arange(P, dtype=jnp.float32) * 1e-9,
                max_matches,
            )
            mem = jnp.take(mem, sel)
            mv = jnp.take(mv, sel)
        src_m = jnp.take(src_pts, mem, axis=0)
        tgt_m = jnp.take(tgt_match_pts, mem, axis=0)
        n_match = jnp.sum(mv)
        R0, t0, res, _ = weighted_kabsch(src_m, tgt_m, mv.astype(src_m.dtype))
        # Residual prune at 2.5x median (rgb_guided.py:99-133) feeds the
        # quality flag only; the reference runs ICP over ALL matched rows
        # ("but now do it for all pts", rgb_guided.py:1016-1021) and lets
        # the ICP distance threshold reject outliers per iteration.
        big = jnp.asarray(jnp.inf, res.dtype)
        rs = jnp.sort(jnp.where(mv, res, big))
        med = rs[jnp.maximum((jnp.sum(mv) - 1) // 2, 0)]
        inlier = mv & (res < 2.5 * med)
        quality = (jnp.sum(inlier) / jnp.maximum(n_match, 1)) >= 0.70
        icp = icp_by_type(
            icp_type,
            src_m,
            tgt_m,
            icp_threshold,
            src_mask=mv,
            tgt_mask=mv,
            max_iter=icp_max_iter,
            R_init=R0,
            t_init=t0,
        )
        return icp.R, icp.t, quality, n_match

    def chunk(args):
        return jax.vmap(one)(*args)

    pad = (-S) % s_chunk
    mem = jnp.pad(members, ((0, pad), (0, 0)))
    mm = jnp.pad(member_mask, ((0, pad), (0, 0)))
    nc = mem.shape[0] // s_chunk
    R, t, q, n = jax.lax.map(
        chunk, (mem.reshape(nc, s_chunk, P), mm.reshape(nc, s_chunk, P))
    )
    return SupervoxelRefineResult(
        R=R.reshape(-1, 3, 3)[:S],
        t=t.reshape(-1, 3)[:S],
        quality=q.reshape(-1)[:S],
        n_matches=n.reshape(-1)[:S],
    )


def run_rgb_guided_tile(
    cfg,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    src_image: np.ndarray,
    tgt_image: np.ndarray,
    intrinsic: np.ndarray,
    src_extrinsic: np.ndarray,
    tgt_extrinsic: np.ndarray,
    *,
    tgt_intrinsic: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    corres_2d: np.ndarray | None = None,
) -> dict:
    """One tile of the RGB-guided pipeline.

    ``cfg`` keys (reference rgb_guided_brienz.yaml schema): image_size,
    crop_size, overlap_size, pixel_thres, max_magnitude, icp_threshold,
    n_normals, img_matching_type, clustering_type (supervoxel | hdbscan,
    rgb_guided.py:868-931), output_dir/output_folder, dataset.
    ``corres_2d`` may inject precomputed (M, 4) matches (the reference's
    offline img_matching_result_dir path). ``tgt_intrinsic`` supports
    separate per-epoch cameras (reference rgb_guided.py:1928-1935 loads
    camera_intrinsic_{src,tgt}.txt when present).

    Projection note: the tile is projected with the *original* coordinates
    (cameras are georeferenced); the 3D solve runs mean-centred.
    """
    from fusion4landslide_tpu.image.matching import match_epoch_images
    from fusion4landslide_tpu.io.results import (
        save_txt,
        save_dvfms,
        save_dvfs,
        visual_clamp_magnitude,
    )

    image_size = tuple(cfg.get("image_size") or src_image.shape[:2])
    pixel_thres = float(cfg.get("pixel_thres", 5))
    max_mag = float(cfg.get("max_magnitude", 10.0))
    v_flip = str(cfg.get("dataset", "")).lower() != "rockfall_simulator"

    # --- 1. Projection (rgb_guided.py:2284; dataset-conditional v-flip).
    uv_s, _, val_s = project_points(
        src_core.astype(np.float32), src_extrinsic.astype(np.float32),
        intrinsic.astype(np.float32), image_size, v_flip=v_flip,
    )
    uv_t, _, val_t = project_points(
        tgt_core.astype(np.float32), tgt_extrinsic.astype(np.float32),
        (intrinsic if tgt_intrinsic is None else tgt_intrinsic).astype(
            np.float32
        ),
        image_size, v_flip=v_flip,
    )
    if logger:
        logger.info(
            "tile %s: %d/%d src and %d/%d tgt points project in-image",
            tile_id, int(np.asarray(val_s).sum()), len(src_core),
            int(np.asarray(val_t).sum()), len(tgt_core),
        )

    # --- 2. Dense 2D matching (rgb_guided.py:2063).
    if corres_2d is None:
        corres_2d = match_epoch_images(
            src_image,
            tgt_image,
            matcher=str(cfg.get("img_matching_type", "zncc")).lower(),
            crop_size=tuple(cfg["crop_size"]) if cfg.get("crop_size") else None,
            overlap_size=tuple(cfg["overlap_size"]) if cfg.get("overlap_size") else None,
            cross_crops=bool(cfg.get("img_matching_cross_crops", False)),
            max_flow_px=cfg.get("max_flow_px"),
            logger=logger,
            weights=cfg.get("img_matcher_weights"),
        )
    if logger:
        logger.info("tile %s: %d 2D matches", tile_id, len(corres_2d))

    if bool(cfg.get("save_img_matching_visualization", False)) and len(
        corres_2d
    ):
        # Reference rgb_guided.py:2269-2279 (make_matching_figure JPG).
        from fusion4landslide_tpu.utils.visualization import (
            save_matching_figure,
        )

        save_matching_figure(
            src_image,
            tgt_image,
            np.asarray(corres_2d),
            osp.join(
                str(cfg.get("output_dir", ".")),
                str(cfg.get("output_folder", "run")),
                "img_matching_results",
                "visualization",
                f"tile_{tile_id}.jpg",
            ),
            text=f"tile {tile_id}",
        )

    center = src_core.mean(axis=0)
    s = (src_core - center).astype(np.float32)
    t = (tgt_core - center).astype(np.float32)

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)

    if len(corres_2d) == 0:
        if logger:
            logger.warning("tile %s: no 2D matches — emitting empty results", tile_id)
        save_txt(
            osp.join(results_dir, f"rgb_guided_wo_refinement_dvfms_tile_{tile_id}.txt"),
            np.zeros((0, 4)),
        )
        return {"dvfs": np.zeros((0, 6)), "n_matches": 0}

    # --- 3. 2D→3D lifting by pixel-NN chaining + magnitude prune.
    tgt_idx, valid = chain_2d_matches_to_3d(
        jnp.asarray(corres_2d, jnp.float32), uv_s, uv_t, pixel_thres,
        src_valid=val_s, tgt_valid=val_t,
    )
    tgt_idx = np.asarray(tgt_idx)
    valid = np.asarray(valid)
    tgt_match = t[tgt_idx]
    mag = np.linalg.norm(tgt_match - s, axis=1)
    matched = valid & (mag <= max_mag)
    if logger:
        logger.info(
            "tile %s: %d/%d points lifted to 3D matches",
            tile_id, int(matched.sum()), len(s),
        )

    # Pre-refinement output (rgb_guided.py:1594-1607).
    wo = np.hstack([src_core[matched], mag[matched][:, None]])
    save_txt(
        osp.join(results_dir, f"rgb_guided_wo_refinement_dvfms_tile_{tile_id}.txt"),
        wo,
    )

    # --- 4. Segmentation (supervoxel or hdbscan, rgb_guided.py:868-931);
    # keep segments with > 10 matches (rgb_guided.py:950).
    median_res = float(median_nn_distance(jnp.asarray(s)))
    clustering = str(cfg.get("clustering_type", "supervoxel")).lower()
    if clustering == "hdbscan":
        from fusion4landslide_tpu.ops.clustering import hdbscan_labels

        labels = hdbscan_labels(
            s,
            min_cluster_size=int(cfg.get("hdbscan_min_cluster_size", 10)),
            min_samples=int(cfg.get("hdbscan_min_samples", 1000)),
        )
        n_lab = int(labels.max()) + 1 if labels.max() >= 0 else 0
    else:
        svl_radius = max(
            float(np.sqrt(3) * 10.0 * median_res),
            float(cfg.get("voxel_size", 0.0) or 0.0),
        )
        seg = supervoxel_segmentation(
            jnp.asarray(s), svl_radius,
            k_neighbors=int(cfg.get("n_normals", 30)),
        )
        labels = np.asarray(seg.labels)
        n_lab = int(seg.n_supervoxels)
    match_counts = np.bincount(
        labels[(labels >= 0) & matched], minlength=max(n_lab, 1)
    )
    keep_lab = match_counts > 10
    remap = np.full(max(n_lab, 1), -1)
    remap[keep_lab] = np.arange(keep_lab.sum())
    labels = np.where(labels >= 0, remap[np.clip(labels, 0, None)], -1)
    n_kept = int(keep_lab.sum())
    if logger:
        logger.info(
            "tile %s: %d/%d supervoxels with >10 matches", tile_id, n_kept, n_lab
        )

    dvfs = np.zeros((0, 6))
    if n_kept > 0:
        S = bucket_size(n_kept)
        counts = np.bincount(labels[labels >= 0], minlength=n_kept)
        P = bucket_size(int(counts.max()))
        members, member_mask = label_members(jnp.asarray(labels, jnp.int32), S, P)
        ref = refine_supervoxels_rigid(
            members,
            member_mask,
            jnp.asarray(matched),
            jnp.asarray(s),
            jnp.asarray(tgt_match),
            icp_threshold=float(cfg.get("icp_threshold", cfg.get("threshold", 0.1))),
            icp_type=str(cfg.get("icp_type", "point2point")),
            icp_max_iter=30 if bool(cfg.get("icp_refine", True)) else 0,
        )
        Rs = np.asarray(ref.R)
        ts = np.asarray(ref.t)
        quality = np.asarray(ref.quality)

        # --- 5. Re-assign all source points of quality supervoxels.
        pt_lab = labels
        has = (pt_lab >= 0) & quality[np.clip(pt_lab, 0, None)]
        lbl = np.clip(pt_lab, 0, None)
        moved = np.einsum("nij,nj->ni", Rs[lbl], s) + ts[lbl]
        dvfs = np.hstack([src_core[has], moved[has] + center])

    save_dvfs(
        osp.join(results_dir, f"rgb_guided_w_refinement_dvfs_src2tgt_tile_{tile_id}.txt"),
        dvfs,
    )
    dvfms = save_dvfms(
        osp.join(results_dir, f"rgb_guided_w_refinement_dvfms_src2tgt_tile_{tile_id}.txt"),
        dvfs,
    )
    if dvfms.shape[0] > 2:
        save_txt(
            osp.join(
                results_dir,
                f"rgb_guided_w_refinement_dvfms_src2tgt_visualize_tile_{tile_id}.txt",
            ),
            visual_clamp_magnitude(dvfms, cfg.get("dataset")),
        )
    return {
        "dvfs": dvfs,
        "n_matches": int(matched.sum()),
        "n_supervoxels": n_kept,
        "corres_2d": corres_2d,
    }
