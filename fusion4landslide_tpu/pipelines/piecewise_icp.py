"""Piecewise-ICP deformation baseline (octree-cell centroid matching).

Capability parity with the reference reproduction of
"Identification of stable surfaces within point clouds for areal deformation
monitoring" (JISDM 2016) — reference: src/piecewise_icp.py:17-235,
main_piecewise_icp.py:20 — re-designed for TPU:

- the Open3D octree traversal becomes a uniform grid at the leaf resolution
  (an octree of depth D over a cubic root box *is* that grid;
  depth = ceil(log2(max_extent / smax)), piecewise_icp.py:107-109),
- per-cell centroids via segment reductions instead of a Python traversal
  callback (piecewise_icp.py:46-73),
- the per-centroid Python KDTree loop (piecewise_icp.py:143-148) becomes one
  blocked kNN call,
- stable/unstable classification at mean+std of centroid distances
  (piecewise_icp.py:151-161), stable cells emit zero displacement, unstable
  cells a constant per-cell offset (piecewise_icp.py:167-199).

Grid alignment note: the reference appends the merged bbox corner points to
*both* clouds so both octrees share a root box (piecewise_icp.py:101-105).
Here the grid is defined by an explicit shared origin and cell size, so the
clouds stay untouched (the corner points also perturbed 8 cell centroids in
the reference — a reproduction artifact, not the method).

The whole per-tile computation is one jit-compiled function of fixed-shape
padded arrays; multiple tiles run via vmap/shard_map over the device mesh.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.ops.voxel import grid_cells, group_by_cells

__all__ = [
    "piecewise_icp_core",
    "run_piecewise_icp",
    "suggest_max_cells",
    "PiecewiseResult",
]


def suggest_max_cells(
    extent: float, smax: float, n: int, n_min: int = 1
) -> int:
    """Static occupied-leaf bound for ``piecewise_icp_core``: the octree at
    depth ceil(log2(extent/smax)) has (2^depth)^3 leaves, of which at most
    n/n_min hold >= n_min points."""
    depth = max(int(np.ceil(np.log2(max(extent / max(smax, 1e-9), 1.0)))), 0)
    bound = min(int(min(8.0**depth, float(n))), n // max(n_min, 1) + 1)
    return max(1 << max(bound - 1, 1).bit_length(), 1024)


class PiecewiseResult(NamedTuple):
    displacement: jax.Array  # (n, 3) per source point
    out_mask: jax.Array  # (n,) point belongs to a kept cell
    stable_point: jax.Array  # (n,) point's cell classified stable
    n_cells_src: jax.Array  # ()
    n_stable: jax.Array  # () stable matched-cell count


def _cell_stats(points, mask, cell_size, origin, n_min):
    """Grid cells -> per-cell centroid/count/validity (all padded to n)."""
    n = points.shape[0]
    cells = grid_cells(points, cell_size, origin)
    p2c, n_cells, _ = group_by_cells(cells, mask)
    w = mask.astype(points.dtype)
    counts = jax.ops.segment_sum(w, p2c, num_segments=n)
    sums = jax.ops.segment_sum(points * w[:, None], p2c, num_segments=n)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    cell_ids = jnp.arange(n)
    cell_valid = (cell_ids < n_cells) & (counts >= n_min)
    return p2c, centroids, counts, cell_valid, n_cells


@functools.partial(jax.jit, static_argnames=("max_cells",))
def piecewise_icp_core(
    src: jax.Array,
    tgt: jax.Array,
    src_mask: jax.Array,
    tgt_mask: jax.Array,
    smax: jax.Array | float,
    n_min: jax.Array | int,
    *,
    max_cells: int = 1 << 17,
) -> PiecewiseResult:
    """Per-tile piecewise displacement estimation on padded arrays.

    ``max_cells`` is the static bound on occupied octree leaves per epoch —
    the centroid tables are compacted to it before matching, so the
    centroid NN costs O(max_cells^2), not O(n^2). With the reference's
    n_min >= 10 a 1M-point tile has at most ~100k occupied leaves.
    """
    n = src.shape[0]
    max_cells = min(max_cells, n)
    big = jnp.asarray(jnp.inf, src.dtype)
    s_lo = jnp.min(jnp.where(src_mask[:, None], src, big), axis=0)
    s_hi = jnp.max(jnp.where(src_mask[:, None], src, -big), axis=0)
    t_lo = jnp.min(jnp.where(tgt_mask[:, None], tgt, big), axis=0)
    t_hi = jnp.max(jnp.where(tgt_mask[:, None], tgt, -big), axis=0)
    lo = jnp.minimum(s_lo, t_lo)
    hi = jnp.maximum(s_hi, t_hi)

    # Octree leaf size: cube root box of side max_extent split to depth
    # ceil(log2(extent / smax)) (piecewise_icp.py:107-109).
    extent = jnp.max(hi - lo)
    depth = jnp.ceil(jnp.log2(jnp.maximum(extent / smax, 1.0)))
    cell = extent / jnp.exp2(depth)

    sp2c, s_cent, s_cnt, s_valid, s_ncells = _cell_stats(
        src, src_mask, cell, lo, n_min
    )
    tp2c, t_cent, t_cnt, t_valid, t_ncells = _cell_stats(
        tgt, tgt_mask, cell, lo, n_min
    )
    # Compact to the static cell bound (cell ids are contiguous from 0).
    s_cent = s_cent[:max_cells]
    t_cent = t_cent[:max_cells]
    s_valid = s_valid[:max_cells]
    t_valid = t_valid[:max_cells]

    # Match each source-cell centroid to its nearest target-cell centroid.
    sqd, match = knn(s_cent, t_cent, 1, t_valid)
    dist = jnp.sqrt(sqd[:, 0])
    match = match[:, 0]
    matched = s_valid & jnp.isfinite(dist)

    # Stable threshold = mean + std over matched centroid distances
    # (piecewise_icp.py:151-156).
    w = matched.astype(src.dtype)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(jnp.where(matched, dist, 0.0)) / cnt
    var = jnp.sum(jnp.where(matched, (dist - mean) ** 2, 0.0)) / cnt
    thresh = mean + jnp.sqrt(var)
    stable_cell = matched & (dist <= thresh)

    # Per-cell displacement: 0 if stable, centroid deviation if unstable.
    cell_disp = jnp.take(t_cent, match, axis=0) - s_cent
    cell_disp = jnp.where(stable_cell[:, None], 0.0, cell_disp)
    cell_disp = jnp.where(matched[:, None], cell_disp, 0.0)

    # Scatter to points.
    point_cell = jnp.clip(sp2c, 0, max_cells - 1)
    disp = jnp.take(cell_disp, point_cell, axis=0)
    out_mask = src_mask & (sp2c < max_cells) & jnp.take(matched, point_cell)
    stable_point = out_mask & jnp.take(stable_cell, point_cell)
    return PiecewiseResult(
        displacement=disp,
        out_mask=out_mask,
        stable_point=stable_point,
        n_cells_src=jnp.sum(s_valid.astype(jnp.int32)),
        n_stable=jnp.sum(stable_cell.astype(jnp.int32)),
    )


def run_piecewise_icp(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    *,
    smax: float,
    number_points_min: int,
    output_dir: str | None = None,
    tile_id: int | str = 0,
    dataset: str | None = None,
    logger=None,
) -> np.ndarray:
    """Host wrapper for one tile: centre, run the device core, write results.

    Returns the (n_kept, 6) dvfs table in the original coordinate frame and,
    when ``output_dir`` is given, writes
    ``piecewise_icp_dvf(m)s_of_tile_{id}.txt`` plus the visual-clamped
    variant (piecewise_icp.py:201-216).
    """
    from fusion4landslide_tpu.io.results import (
        save_txt,
        save_dvfms,
        save_dvfs,
        visual_clamp_magnitude,
    )

    center = src_points.mean(axis=0)
    src = (src_points - center).astype(np.float32)
    tgt = (tgt_points - center).astype(np.float32)
    lo = np.minimum(src.min(axis=0), tgt.min(axis=0))
    hi = np.maximum(src.max(axis=0), tgt.max(axis=0))
    res = piecewise_icp_core(
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.ones(src.shape[0], bool),
        jnp.ones(tgt.shape[0], bool),
        float(smax),
        int(number_points_min),
        max_cells=suggest_max_cells(
            float((hi - lo).max()), float(smax),
            src.shape[0], int(number_points_min),
        ),
    )
    disp = np.asarray(res.displacement)
    keep = np.asarray(res.out_mask)
    src_kept = src_points[keep]
    dvfs = np.hstack([src_kept, src_kept + disp[keep]])
    if logger is not None:
        n_stab = int(np.asarray(res.stable_point)[keep].sum())
        logger.info(
            "piecewise_icp tile %s: %d cells, %d/%d points stable",
            tile_id,
            int(res.n_cells_src),
            n_stab,
            int(keep.sum()),
        )
    if output_dir is not None:
        results = os.path.join(output_dir, "results")
        save_dvfs(
            os.path.join(results, f"piecewise_icp_dvfs_of_tile_{tile_id}.txt"),
            dvfs,
        )
        dvfms = save_dvfms(
            os.path.join(results, f"piecewise_icp_dvfms_of_tile_{tile_id}.txt"),
            dvfs,
        )
        vis = visual_clamp_magnitude(dvfms, dataset)
        save_txt(
            os.path.join(
                results, f"piecewise_dvfms_visualize_of_tile_{tile_id}.txt"
            ),
            vis,
        )
    return dvfs
