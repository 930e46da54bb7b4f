"""Device-resident RGB-guided tile step for multi-chip execution.

The RGB-guided method's 2D matching runs ONCE per epoch pair (the images
are global, not per-tile — reference rgb_guided.py:2063); everything after
it is per-tile work: projection, 2D→3D chaining, magnitude pruning,
supervoxel segmentation, per-supervoxel rigid refinement, re-assignment
(reference stage map in ``pipelines.rgb_guided``). This module traces that
per-tile program as one fixed-shape jittable function so padded tile
batches shard over the device mesh (``parallel.pipeline.
run_rgb_guided_tiles_sharded``), with the pixel-match table computed on the
host once and replicated.

Same fixed-shape conventions as the other device pipelines: static
supervoxel caps with overflow counting, traced per-tile radii, portable
kNN kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.image.geometry import (
    chain_2d_matches_to_3d,
    project_points,
)
from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.ops.segments import label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation
from fusion4landslide_tpu.pipelines.f2s3_device import masked_median
from fusion4landslide_tpu.pipelines.rgb_guided import refine_supervoxels_rigid

__all__ = ["RGBGuidedTileResult", "rgb_guided_tile_step"]


class RGBGuidedTileResult(NamedTuple):
    moved: jax.Array  # (N, 3) refined target position per src point
    valid: jax.Array  # (N,) belongs to a quality supervoxel
    matched: jax.Array  # (N,) has a lifted 2D match (pre-refinement)
    tgt_match: jax.Array  # (N, 3) lifted match target (pre-refinement)
    median_res: jax.Array  # ()
    n_dropped: jax.Array  # () points lost to the static supervoxel caps


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size",
        "v_flip",
        "k_neighbors",
        "sv_cap",
        "member_cap",
        "mode",
        "icp_type",
        "icp_max_iter",
    ),
)
def rgb_guided_tile_step(
    src: jax.Array,  # (N, 3) centred, padded
    smask: jax.Array,  # (N,)
    tgt: jax.Array,  # (M, 3) centred, padded
    tmask: jax.Array,  # (M,)
    center: jax.Array,  # (3,) tile centring offset (cameras are global)
    corres_2d: jax.Array,  # (C, 4) pixel matches, padded
    cmask: jax.Array,  # (C,)
    src_extrinsic: jax.Array,  # (4, 4)
    tgt_extrinsic: jax.Array,
    intrinsic: jax.Array,  # (3, 3)
    tgt_intrinsic: jax.Array,  # (3, 3)
    pixel_thres: jax.Array | float = 5.0,
    max_magnitude: jax.Array | float = 10.0,
    icp_threshold: jax.Array | float = 0.1,
    voxel_size: jax.Array | float = 0.0,
    *,
    image_size: tuple[int, int],
    v_flip: bool = True,
    k_neighbors: int = 30,
    sv_cap: int = 1024,
    member_cap: int = 512,
    mode: str = "nn_src_only",
    icp_type: str = "point2point",
    icp_max_iter: int = 30,
) -> RGBGuidedTileResult:
    """One RGB-guided tile, entirely on device (reference
    ``implement_rgb_guided_estimation``, rgb_guided.py:1064-1639)."""
    f32 = src.dtype
    smask = smask.astype(bool)
    tmask = tmask.astype(bool)
    N = src.shape[0]

    # 1. Projection with the original (georeferenced) coordinates
    # (rgb_guided.py:2284).
    uv_s, _, val_s = project_points(
        src + center, src_extrinsic, intrinsic, image_size,
        mask=smask, v_flip=v_flip,
    )
    uv_t, _, val_t = project_points(
        tgt + center, tgt_extrinsic, tgt_intrinsic, image_size,
        mask=tmask, v_flip=v_flip,
    )

    # 2. 2D->3D lifting by pixel-NN chaining (rgb_guided.py:1096-1100).
    tgt_idx, valid2d = chain_2d_matches_to_3d(
        corres_2d, uv_s, uv_t, pixel_thres,
        corres_mask=cmask, src_valid=val_s, tgt_valid=val_t, mode=mode,
    )
    tgt_match = jnp.take(tgt, tgt_idx, axis=0)
    mag = jnp.linalg.norm(tgt_match - src, axis=-1)
    matched = valid2d & (mag <= jnp.asarray(max_magnitude, f32)) & smask

    # 3. Median resolution + supervoxel segmentation of the source
    # (rgb_guided.py:868-950).
    sq_s, _ = knn(src, src, 1, smask, exclude_self=True)
    d_s = jnp.sqrt(sq_s[:, 0])
    median_res = masked_median(d_s, smask & jnp.isfinite(d_s))
    svl_radius = jnp.maximum(
        jnp.sqrt(3.0) * 10.0 * median_res, jnp.asarray(voxel_size, f32)
    )
    seg = supervoxel_segmentation(
        src, svl_radius, smask, k_neighbors=k_neighbors
    )

    # Keep supervoxels with > 10 MATCHED points (rgb_guided.py:950),
    # compacted on device.
    labels = seg.labels
    has = smask & (labels >= 0)
    lab0 = jnp.where(has, labels, 0)
    match_counts = jax.ops.segment_sum(
        (has & matched).astype(jnp.int32), lab0, num_segments=N
    )
    ok = has & (jnp.take(match_counts, lab0) > 10)
    used = jnp.zeros((N,), jnp.int32).at[lab0].max(
        ok.astype(jnp.int32), mode="drop"
    )
    remap = jnp.cumsum(used) - 1
    labels = jnp.where(ok, jnp.take(remap, lab0), -1).astype(jnp.int32)

    # 4. Per-supervoxel rigid refinement (rgb_guided.py:981-1047).
    members, member_mask = label_members(labels, sv_cap, member_cap)
    in_table = (
        jnp.zeros((N,), bool)
        .at[jnp.where(member_mask, members, N)]
        .set(member_mask, mode="drop")
    )
    n_dropped = jnp.sum(ok & ~in_table)
    ref = refine_supervoxels_rigid(
        members,
        member_mask,
        matched,
        src,
        tgt_match,
        icp_threshold=icp_threshold,
        icp_type=icp_type,
        icp_max_iter=icp_max_iter,
    )

    # 5. Re-assign ALL source points of quality supervoxels.
    pl = jnp.clip(labels, 0, sv_cap - 1)
    valid = (labels >= 0) & jnp.take(ref.quality, pl)
    moved = (
        jnp.einsum("nij,nj->ni", jnp.take(ref.R, pl, axis=0), src)
        + jnp.take(ref.t, pl, axis=0)
    )
    moved = jnp.where(valid[:, None], moved, src)

    return RGBGuidedTileResult(
        moved=moved,
        valid=valid,
        matched=matched,
        tgt_match=tgt_match,
        median_res=median_res,
        n_dropped=n_dropped,
    )
