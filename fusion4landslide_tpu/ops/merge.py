"""Priority merge of multi-level correspondence sets.

Reference: ``merge_correspondences_by_priority_with_distance_threshold``
(src/coarse_to_fine_matching.py:40-118) — level-0 correspondences have
priority; later levels only contribute rows whose source point is farther
than ``distance_threshold`` from every already-merged source point. The
reference offers faiss/kdtree/cdist engines; here the duplicate test is the
exact blocked 1-NN on device.

The shipped fusion pipeline merges per-point transform fields where every
level assigns to the same point slots, so priority selection is a direct
per-point mask (pipelines/fusion.py). This utility covers the general
sparse-correspondence form (different levels proposing different source
points), matching the reference component.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.ops.knn import nn1

__all__ = ["merge_correspondences_by_priority"]


def merge_correspondences_by_priority(
    corres_list: list[np.ndarray],
    distance_threshold: float = 1e-3,
) -> np.ndarray:
    """Merge (N_i, 6) correspondence tables, earlier lists winning.

    A row of a later level is kept only when its source point (cols 0:3) is
    at least ``distance_threshold`` away from every source point already
    merged. Returns the concatenated (M, 6) table.
    """
    merged: list[np.ndarray] = []
    pool: np.ndarray | None = None
    for level, corres in enumerate(corres_list):
        corres = np.asarray(corres)
        if corres.size == 0:
            continue
        if pool is None or pool.shape[0] == 0:
            merged.append(corres)
            pool = corres[:, :3].astype(np.float32)
            continue
        d2, _ = nn1(
            jnp.asarray(corres[:, :3], jnp.float32),
            jnp.asarray(pool, jnp.float32),
        )
        keep = ~(np.asarray(d2) < distance_threshold**2)
        if keep.any():
            merged.append(corres[keep])
            pool = np.concatenate([pool, corres[keep][:, :3].astype(np.float32)])
    if not merged:
        return np.zeros((0, 6), np.float32)
    return np.concatenate(merged, axis=0)
