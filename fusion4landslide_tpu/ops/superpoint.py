"""Native superpoint partition: geometric features + hierarchical regions.

Fills the role of the reference's SuperPoint-Transformer bridge
(src/superpoint_partition.py:37-162), which drives an external submodule
(hydra + FRNN + cut-pursuit; empty in the reference checkout) to produce a
3-level partition hierarchy written as the 15-column table consumed by
``load_partition`` (base:1241-1276). This module generates the same
artifact natively:

- per-point handcrafted partition features — linearity, planarity,
  scattering — from the kNN PCA eigenvalues (the SPT partition_hf set,
  superpoint_partition.py:57-64; intensity/colour joins when available),
  computed on device,
- level 1 = VCCS supervoxels (geometry-adaptive regions),
- levels 2..L = energy-minimising region merging: regions are nodes of the
  adjacency graph induced by the point kNN graph; the cheapest edges by
  (feature distance + size-balanced spatial term) merge via a disjoint set
  until the target coarsening ratio — the same piecewise-constant-partition
  coarsening cut pursuit performs in SPT's NAG, as a deterministic greedy
  contraction (host-side; runs once over <= ~10k regions per tile).

The hierarchy NESTS by construction (every level-l region is a union of
level-(l-1) regions), like SPT's NAG.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.ops.eig3 import eigvals_sym3x3
from fusion4landslide_tpu.ops.normals import neighborhood_covariance

__all__ = [
    "geometric_features",
    "superpoint_hierarchy",
    "generate_superpoint_partition",
]

import functools


@functools.partial(jax.jit, static_argnames=("k",))
def geometric_features(
    points: jax.Array, k: int = 30, mask: jax.Array | None = None
) -> jax.Array:
    """(n, 3) [linearity, planarity, scattering] from kNN PCA eigenvalues
    (lambda1 >= lambda2 >= lambda3): (l1-l2)/l1, (l2-l3)/l1, l3/l1 — the
    standard dimensionality features SPT partitions on."""
    sqd, idx = knn(points, points, k, mask)
    nmask = jnp.isfinite(sqd)
    cov = neighborhood_covariance(points, idx, nmask)
    evals = eigvals_sym3x3(cov)  # ascending; closed form (ops/eig3.py)
    l3, l2, l1 = evals[..., 0], evals[..., 1], evals[..., 2]
    l1 = jnp.maximum(l1, 1e-12)
    feats = jnp.stack(
        [(l1 - l2) / l1, (l2 - l3) / l1, l3 / l1], axis=-1
    )
    if mask is not None:
        feats = jnp.where(mask.astype(bool)[:, None], feats, 0.0)
    return feats


def _region_merge(
    labels: np.ndarray,  # (n,) current region per point, compact 0..K-1
    neigh: np.ndarray,  # (n, k) point kNN graph
    feats: np.ndarray,  # (n, F) per-point features
    points: np.ndarray,  # (n, 3)
    target: int,
    spatial_weight: float,
) -> np.ndarray:
    """Greedy edge contraction to ``target`` regions. Returns the map
    old-region-id -> new-region-id (compact)."""
    K = int(labels.max()) + 1
    if K <= target:
        return np.arange(K)

    # Region descriptors.
    sums_f = np.zeros((K, feats.shape[1]))
    sums_p = np.zeros((K, 3))
    counts = np.zeros(K)
    np.add.at(sums_f, labels, feats)
    np.add.at(sums_p, labels, points)
    np.add.at(counts, labels, 1)
    mean_f = sums_f / counts[:, None]
    mean_p = sums_p / counts[:, None]

    # Region adjacency from cross-label kNN edges.
    a = np.repeat(labels, neigh.shape[1])
    b = labels[neigh.reshape(-1)]
    sel = a != b
    pairs = np.stack([np.minimum(a[sel], b[sel]), np.maximum(a[sel], b[sel])], 1)
    pairs = np.unique(pairs, axis=0)

    def edge_cost(p):
        df = np.linalg.norm(mean_f[p[:, 0]] - mean_f[p[:, 1]], axis=1)
        dp = np.linalg.norm(mean_p[p[:, 0]] - mean_p[p[:, 1]], axis=1)
        return df + spatial_weight * dp

    order = np.argsort(edge_cost(pairs))
    parent = np.arange(K)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    remaining = K
    for e in order:
        if remaining <= target:
            break
        ra, rb = find(pairs[e, 0]), find(pairs[e, 1])
        if ra == rb:
            continue
        # Merge smaller into larger; update running descriptors so later
        # decisions see the merged region.
        if counts[ra] < counts[rb]:
            ra, rb = rb, ra
        parent[rb] = ra
        tot = counts[ra] + counts[rb]
        mean_f[ra] = (mean_f[ra] * counts[ra] + mean_f[rb] * counts[rb]) / tot
        mean_p[ra] = (mean_p[ra] * counts[ra] + mean_p[rb] * counts[rb]) / tot
        counts[ra] = tot
        remaining -= 1

    roots = np.array([find(i) for i in range(K)])
    uniq, remap = np.unique(roots, return_inverse=True)
    return remap


def superpoint_hierarchy(
    points: np.ndarray,
    *,
    levels: int = 3,
    base_resolution: float | None = None,
    k_neighbors: int = 30,
    coarsening: float = 4.0,
    spatial_weight: float = 0.02,
    intensity: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Per-point labels for partition levels 1..``levels`` (nested).

    ``base_resolution`` defaults to sqrt(3)·10·median_resolution like the
    supervoxel stage. ``intensity`` (n,) joins the partition features when
    given (the reference's 'xyzrgb' partition_type adds intensity,
    superpoint_partition.py:57-64).
    """
    from fusion4landslide_tpu.ops.knn import median_nn_distance
    from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation

    pts = np.asarray(points, np.float32)
    center = pts.mean(axis=0)
    p = pts - center
    if base_resolution is None:
        base_resolution = float(
            np.sqrt(3) * 10.0 * float(median_nn_distance(jnp.asarray(p)))
        )

    seg = supervoxel_segmentation(
        jnp.asarray(p), float(base_resolution), k_neighbors=min(k_neighbors, 15)
    )
    lab = np.asarray(seg.labels)
    # Compact (no negatives for unmasked input, but be safe).
    uniq, lab = np.unique(lab, return_inverse=True)

    feats = np.asarray(geometric_features(jnp.asarray(p), k=k_neighbors))
    if intensity is not None:
        inten = np.asarray(intensity, np.float32).reshape(-1, 1)
        inten = inten / max(float(np.abs(inten).max()), 1e-9)
        feats = np.concatenate([feats, inten], axis=1)
    sqd, nidx = knn(jnp.asarray(p), jnp.asarray(p), min(k_neighbors, 15))
    neigh = np.asarray(nidx)

    out = [lab]
    cur = lab
    # Spatial term scaled to the data extent so features dominate shape
    # decisions but ties break spatially.
    extent = float((p.max(0) - p.min(0)).max())
    sw = spatial_weight / max(extent, 1e-9)
    for _ in range(1, levels):
        K = int(cur.max()) + 1
        target = max(int(np.ceil(K / coarsening)), 1)
        remap = _region_merge(cur, neigh, feats, p, target, sw)
        cur = remap[cur]
        out.append(cur.copy())
    return out


def generate_superpoint_partition(
    points: np.ndarray,
    path: str | None = None,
    *,
    levels: int = 3,
    base_resolution: float | None = None,
    k_neighbors: int = 30,
    coarsening: float = 4.0,
    intensity: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Produce (and optionally write) the reference-format partition table
    (``partition_of_input_{src,tgt}_tile_N.txt``, 15 columns)."""
    level_labels = superpoint_hierarchy(
        points,
        levels=levels,
        base_resolution=base_resolution,
        k_neighbors=k_neighbors,
        coarsening=coarsening,
        intensity=intensity,
    )
    if path is not None:
        from fusion4landslide_tpu.ops.partition_io import (
            write_superpoint_partition,
        )

        write_superpoint_partition(path, np.asarray(points), level_labels)
    return level_labels
