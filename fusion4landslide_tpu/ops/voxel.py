"""Grid binning, voxel-grid downsampling and segment reductions.

Replaces three reference mechanisms with one sort-based primitive:
- PCL VoxelGrid downsample incl. its recursive 8-way split to dodge int32
  voxel-count overflow (cpp_core/pcd_tiling/pcd_tiling.cpp:118-227) — here
  cells are grouped by lexicographic sort of integer cell coords, so there is
  no linearised key to overflow and no recursion,
- Open3D ``voxel_down_sample`` + the cKDTree voxel<->point index maps
  (src/coarse_to_fine_matching_base.py:1012-1057),
- Open3D octree leaf-cell collection for piecewise ICP
  (src/piecewise_icp.py:89-132) — an octree at depth D over a cubic root box
  is exactly a uniform grid with cell = extent / 2^D.

Everything is fixed-shape: with N input points there are at most N occupied
cells, so outputs are padded to N and accompanied by an occupancy count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "grid_cells",
    "group_by_cells",
    "segment_mean",
    "voxel_downsample",
]


def grid_cells(
    points: jax.Array, cell_size: jax.Array | float, origin: jax.Array
) -> jax.Array:
    """Integer grid coordinates floor((p - origin) / cell) of each point."""
    return jnp.floor((points - origin) / cell_size).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def group_by_cells(
    cells: jax.Array, mask: jax.Array | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Group points by identical integer cell coordinates.

    Args:
        cells: (n, 3) int32 grid coordinates.
        mask: (n,) validity; invalid points are grouped into trailing padding
            groups and never share a group with valid points.

    Returns:
        point2group: (n,) group id per point (valid groups are contiguous ids
            0..n_groups-1 ordered lexicographically by cell; invalid points
            get ids >= n_groups).
        n_groups: () int32 — number of occupied (valid) cells.
        order: (n,) permutation sorting points by group id.
    """
    n = cells.shape[0]
    if mask is not None:
        # Send invalid points to a sentinel cell that sorts last.
        big = jnp.iinfo(jnp.int32).max
        cells = jnp.where(mask.astype(bool)[:, None], cells, big)
    order = jnp.lexsort((cells[:, 2], cells[:, 1], cells[:, 0]))
    sc = cells[order]
    new_group = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            jnp.any(sc[1:] != sc[:-1], axis=-1),
        ]
    )
    gid_sorted = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    point2group = jnp.zeros((n,), jnp.int32).at[order].set(gid_sorted)
    if mask is not None:
        valid_sorted = mask.astype(bool)[order]
        n_groups = jnp.max(jnp.where(valid_sorted, gid_sorted + 1, 0))
    else:
        n_groups = gid_sorted[-1] + 1
    return point2group, n_groups, order


def segment_mean(
    values: jax.Array, seg_id: jax.Array, num_segments: int
) -> tuple[jax.Array, jax.Array]:
    """Mean of ``values`` rows per segment; returns (means, counts)."""
    ones = jnp.ones(values.shape[:1], values.dtype)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=num_segments)
    sums = jax.ops.segment_sum(values, seg_id, num_segments=num_segments)
    means = sums / jnp.maximum(counts, 1.0)[..., None]
    return means, counts


@functools.partial(jax.jit, static_argnames=())
def voxel_downsample(
    points: jax.Array,
    voxel_size: jax.Array | float,
    mask: jax.Array | None = None,
    origin: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Voxel-grid downsample to per-voxel centroids with full index maps.

    Args:
        points: (n, 3).
        voxel_size: scalar voxel edge (the reference adapts this to the median
            point resolution, base:1012-1030).
        mask: (n,) validity of input rows.
        origin: (3,) grid origin; defaults to the (masked) min corner.

    Returns:
        centroids: (n, 3) padded voxel centroids (first ``n_voxels`` valid).
        point2voxel: (n,) voxel id of each input point (>= n_voxels for
            invalid inputs).
        counts: (n,) points per voxel (0 in padding).
        n_voxels: () int32 occupied-voxel count.
    """
    valid = None if mask is None else mask.astype(bool)
    if origin is None:
        p = points if valid is None else jnp.where(valid[:, None], points, jnp.inf)
        origin = jnp.min(p, axis=0)
    cells = grid_cells(points, voxel_size, origin)
    point2voxel, n_voxels, _ = group_by_cells(cells, mask)
    n = points.shape[0]
    w = jnp.ones((n,), points.dtype) if valid is None else valid.astype(points.dtype)
    counts = jax.ops.segment_sum(w, point2voxel, num_segments=n)
    sums = jax.ops.segment_sum(points * w[:, None], point2voxel, num_segments=n)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return centroids, point2voxel, counts, n_voxels
