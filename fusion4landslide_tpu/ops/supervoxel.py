"""Boundary-preserving supervoxel segmentation (VCCS metric) on TPU.

Capability parity with the native core the reference calls per tile
(cpp_core/supervoxel_segmentation/supervoxel.cpp:83-143 +
codelibrary/geometry/point_cloud/supervoxel_segmentation.h:66-265, the method
of Lin et al. 2018 "Toward better boundary preserved supervoxel segmentation
for 3D point clouds"):

- VCCS metric d(p, q) = 1 - |n_p · n_q| + 0.4 * ||p - q|| / R
  (supervoxel.cpp:27-40),
- expected supervoxel count = number of occupied grid cells at resolution R
  (supervoxel_segmentation.h:254-264),
- the reference then greedily fuses a disjoint-set with doubling lambda
  (sequential, supervoxel_segmentation.h:113-175) and finishes with
  queue-based boundary refinement — points swap to a neighbouring label when
  the VCCS distance to that label's representative is smaller
  (supervoxel_segmentation.h:209-237).

TPU re-design: the greedy fusion is inherently sequential, but its *fixed
point* is characterised by the refinement rule. So we seed one supervoxel per
occupied grid cell (the point nearest the cell centroid) and run the
refinement rule itself as data-parallel label propagation over the kNN graph
for a fixed number of sweeps: every point adopts the neighbouring label whose
seed is VCCS-closest. Each sweep is a batched gather + reduction; quality is
governed by the same rule that dominates the reference's final labels.
Partitions match up to relabelling/boundary tolerance (the downstream
pipelines only consume label *groups*).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.ops.normals import pca_normals
from fusion4landslide_tpu.ops.voxel import grid_cells, group_by_cells

__all__ = [
    "supervoxel_segmentation_pair",
    "supervoxel_segmentation",
    "supervoxel_graph",
    "SupervoxelResult",
]


class SupervoxelResult(NamedTuple):
    labels: jax.Array  # (n,) supervoxel id per point (0..n_supervoxels-1)
    n_supervoxels: jax.Array  # ()
    seed_idx: jax.Array  # (n,) padded: point index of each seed
    normals: jax.Array  # (n, 3)


def _vccs(p, n_p, q, n_q, resolution):
    """VCCS distance between point/normal pairs (supervoxel.cpp:32-36)."""
    d = jnp.linalg.norm(p - q, axis=-1)
    return 1.0 - jnp.abs(jnp.sum(n_p * n_q, axis=-1)) + d / resolution * 0.4


def supervoxel_graph(
    points: jax.Array,
    resolution: jax.Array | float,
    mask: jax.Array | None = None,
    *,
    k_neighbors: int = 15,
) -> tuple[jax.Array, jax.Array]:
    """kNN graph (neigh_idx, neigh_mask) for supervoxel label propagation.

    Exposed separately so multi-level partitions (fusion's superpoint levels
    1..3, coarse_to_fine_matching.py:215-287) build the graph — the dominant
    cost — ONCE and reuse it across levels: the k nearest neighbours do not
    depend on the level radius, which only scales the VCCS metric.
    """
    n = points.shape[0]
    valid = (
        jnp.ones((n,), bool) if mask is None else jnp.asarray(mask).astype(bool)
    )
    from fusion4landslide_tpu.ops.knn_pallas import pallas_available

    if n <= 8192:
        # Small clouds (nested-level centroid sets): exact brute-force kNN
        # is cheaper than any grid machinery and fully traceable.
        sqd, neigh_idx = knn(
            points, points, k_neighbors, valid,
            exclude_self=True, use_pallas=False,
        )
        r2 = jnp.asarray(resolution, points.dtype) ** 2
        neigh_mask = jnp.isfinite(sqd) & (sqd <= r2)
        return jnp.where(neigh_mask, neigh_idx, 0), neigh_mask
    if pallas_available():
        from fusion4landslide_tpu.ops.hashgrid import build_hash_grid
        from fusion4landslide_tpu.ops.hashgrid_pallas import (
            radius_sample_window,
        )
        from fusion4landslide_tpu.ops.segments import bucket_size

        # Bucket the point count (the window kernel compiles per shape).
        # The radius is a runtime kernel payload — traced per-tile radii
        # (device tile steps) share the one compilation.
        nb = bucket_size(n)
        pts_p = jnp.pad(points, ((0, nb - n), (0, 0)))
        valid_p = jnp.pad(valid, (0, nb - n))
        res_q = jnp.asarray(resolution, points.dtype)
        grid = build_hash_grid(pts_p, res_q, valid_p)
        cand_i, cand_v, cand_x, _ = radius_sample_window(
            pts_p, grid, res_q, 128, priority="distance"
        )
        cand_i = cand_i[:n]
        cand_v = cand_v[:n]
        cand_x = cand_x[:n]
        d2 = jnp.sum((cand_x - points[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_v, d2, jnp.inf)
        neg, sel = jax.lax.top_k(-d2, k_neighbors)
        neigh_idx = jnp.take_along_axis(cand_i, sel, axis=1)
        neigh_mask = jnp.isfinite(-neg)
        neigh_idx = jnp.where(neigh_mask, neigh_idx, 0)
    elif isinstance(resolution, jax.core.Tracer) or isinstance(
        points, jax.core.Tracer
    ):
        # Device-resident tile steps (traced inputs): radius-growing grid
        # kNN bounded at the VCCS radius, like the Pallas path above — the
        # brute-force O(n^2) fallback capped sharded tiles at ~64k points.
        from fusion4landslide_tpu.ops.hashgrid import knn_grid_traced

        sqd, neigh_idx = knn_grid_traced(
            points, points, k_neighbors,
            ref_mask=valid, query_mask=valid,
            r_max=jnp.asarray(resolution, points.dtype),
            exclude_self=True,
        )
        neigh_mask = jnp.isfinite(sqd)
        neigh_idx = jnp.where(neigh_mask, neigh_idx, 0)
    else:
        sqd, neigh_idx = knn(points, points, k_neighbors, valid)
        neigh_mask = jnp.isfinite(sqd)
    return neigh_idx, neigh_mask


def supervoxel_segmentation(
    points: jax.Array,
    resolution: jax.Array | float,
    mask: jax.Array | None = None,
    *,
    k_neighbors: int = 15,
    num_sweeps: int = 24,
    neigh_idx: jax.Array | None = None,
    neigh_mask: jax.Array | None = None,
    normals: jax.Array | None = None,
) -> SupervoxelResult:
    """Segment a point cloud into supervoxels of roughly ``resolution`` size.

    Args:
        points: (n, 3), mean-centred float32.
        resolution: target supervoxel radius R (the reference uses
            max(sqrt(3)*10*median_res, voxel), f2s3.py:183-186).
        mask: (n,) validity of padded rows.
        k_neighbors: kNN graph degree (reference default 15 in
            supervoxel.cpp:150; the pipelines pass ``n_normals``=30).
        num_sweeps: label-propagation sweeps (bounded-iteration replacement
            for the reference's convergence queue).

    Returns:
        :class:`SupervoxelResult` — labels are compacted to 0..K-1; masked
        points get label n-1 (by convention they sort to padding groups).

    On TPU the kNN graph comes from the grid-window sampler
    (radius-bounded at R — VCCS candidates farther than the supervoxel
    radius can essentially never win the 0.4·d/R metric) instead of the
    O(n^2) brute-force search.
    """
    n = points.shape[0]
    valid = (
        jnp.ones((n,), bool) if mask is None else jnp.asarray(mask).astype(bool)
    )
    if neigh_idx is None or neigh_mask is None:
        neigh_idx, neigh_mask = supervoxel_graph(
            points, resolution, valid, k_neighbors=k_neighbors
        )
    return _supervoxel_core(
        points,
        jnp.asarray(resolution, points.dtype),
        valid,
        neigh_idx,
        neigh_mask,
        num_sweeps=num_sweeps,
        normals=normals,
    )


def supervoxel_segmentation_pair(
    points: jax.Array,  # (B, n, 3)
    resolution: jax.Array,
    valid: jax.Array,  # (B, n)
    neigh_idx: jax.Array,  # (B, n, k)
    neigh_mask: jax.Array,  # (B, n, k)
    normals: jax.Array,  # (B, n, 3)
    *,
    num_sweeps: int = 24,
) -> SupervoxelResult:
    """Segment B same-shape clouds (src/tgt of a tile) in ONE batched
    propagation: the vmapped while_loop sweeps until the LAST cloud
    converges, so the stage costs max() instead of sum() of the clouds'
    sweep counts. Extra sweeps past a cloud's fixed point are no-ops, so
    results equal the per-cloud calls exactly.

    NOTE: measured SLOWER than two sequential calls on TPU v5e (3.74 s vs
    0.60 s at the 131k bucket) — the vmapped argsort/scatter seeding
    dominates. Kept as a correct reference implementation; the device tile
    step intentionally does not use it."""
    return jax.vmap(
        functools.partial(_supervoxel_core, num_sweeps=num_sweeps),
        in_axes=(0, None, 0, 0, 0, 0),
    )(points, jnp.asarray(resolution, points.dtype), valid,
      neigh_idx, neigh_mask, normals)


@functools.partial(jax.jit, static_argnames=("num_sweeps",))
def _supervoxel_core(
    points: jax.Array,
    resolution: jax.Array,
    valid: jax.Array,
    neigh_idx: jax.Array,
    neigh_mask: jax.Array,
    normals: jax.Array | None = None,
    *,
    num_sweeps: int = 24,
) -> SupervoxelResult:
    """Seeding + VCCS label propagation over a precomputed kNN graph.

    ``normals`` may be precomputed (they depend only on the graph, not the
    level radius — multi-level partitions reuse them)."""
    n = points.shape[0]
    if normals is None:
        normals = pca_normals(
            points,
            neigh_idx.shape[1],
            valid,
            neigh_idx=neigh_idx,
            neigh_mask=neigh_mask,
        )

    # --- Seeds: one per occupied grid cell at the target resolution
    # (supervoxel_segmentation.h:254-264). Seed point = nearest to centroid.
    big = jnp.asarray(jnp.inf, points.dtype)
    origin = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    cells = grid_cells(points, resolution, origin)
    p2cell, n_cells, _ = group_by_cells(cells, valid)
    w = valid.astype(points.dtype)
    counts = jax.ops.segment_sum(w, p2cell, num_segments=n)
    sums = jax.ops.segment_sum(points * w[:, None], p2cell, num_segments=n)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # Per-cell argmin distance-to-centroid via segment_min over encoded keys.
    d2c = jnp.linalg.norm(points - jnp.take(centroids, p2cell, axis=0), axis=-1)
    d2c = jnp.where(valid, d2c, jnp.inf)
    order = jnp.argsort(d2c)  # nearest-to-centroid first
    # seed_idx[cell] = first point (in d2c order) belonging to that cell.
    seed_of_cell = jnp.full((n,), n - 1, jnp.int32)
    # Reverse iteration ensures the *smallest* d2c wins the scatter.
    seed_of_cell = seed_of_cell.at[p2cell[order[::-1]]].set(
        order[::-1].astype(jnp.int32)
    )

    # Pack each seed's (position, normal) into one row so every sweep pays
    # ONE row gather per candidate instead of two — the sweeps are
    # gather-bound (bit-exact: same f32 values, different layout).
    seed_pn = jnp.concatenate(
        [
            jnp.take(points, seed_of_cell, axis=0),
            jnp.take(normals, seed_of_cell, axis=0),
        ],
        axis=1,
    )  # (n, 6) padded

    # --- Initial labels: VCCS-nearest seed among {own cell, neighbours' cells}
    # is reached by propagation itself; start from own cell.
    labels = p2cell.astype(jnp.int32)
    labels = jnp.where(valid, labels, n - 1)

    def sweep(labels):
        # Candidate labels: own + each neighbour's current label.
        neigh_labels = jnp.take(labels, neigh_idx, axis=0)  # (n, k)
        cand = jnp.concatenate([labels[:, None], neigh_labels], axis=1)
        cand_pn = jnp.take(seed_pn, cand, axis=0)  # (n, k+1, 6)
        cand_seed_pos = cand_pn[..., :3]
        cand_seed_nrm = cand_pn[..., 3:]
        cost = _vccs(
            points[:, None, :],
            normals[:, None, :],
            cand_seed_pos,
            cand_seed_nrm,
            resolution,
        )
        cand_ok = jnp.concatenate(
            [jnp.ones((n, 1), bool), neigh_mask], axis=1
        ) & (cand < n_cells)[..., 0:].reshape(n, -1)
        cost = jnp.where(cand_ok, cost, jnp.inf)
        best = jnp.argmin(cost, axis=1)
        new_labels = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        return jnp.where(valid, new_labels, n - 1)

    # Device-side early exit: propagation is a fixed-point iteration (the
    # reference's refinement queue drains when no point swaps,
    # supervoxel_segmentation.h:209-237); typical convergence is well under
    # the num_sweeps bound, and each skipped sweep is a full (n, k+1)
    # gather+reduce pass.
    def w_cond(carry):
        _, changed, it = carry
        return changed & (it < num_sweeps)

    def w_body(carry):
        labels, _, it = carry
        new_labels = sweep(labels)
        return new_labels, jnp.any(new_labels != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        w_cond, w_body, (labels, jnp.asarray(True), jnp.asarray(0))
    )

    # --- Compact labels to 0..K-1 (supervoxel_segmentation.h:239-247).
    used = jnp.zeros((n,), jnp.int32).at[labels].max(
        valid.astype(jnp.int32), mode="drop"
    )
    remap = jnp.cumsum(used) - 1
    labels = jnp.where(valid, jnp.take(remap, labels), -1)
    n_spv = jnp.sum(used)
    return SupervoxelResult(
        labels=labels,
        n_supervoxels=n_spv,
        seed_idx=seed_of_cell,
        normals=normals,
    )
