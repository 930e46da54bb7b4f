"""PCA normal estimation over kNN neighbourhoods.

Capability parity with the reference's per-point loop
(cpp_core/supervoxel_segmentation/supervoxel.cpp:96-114, which calls
codelibrary PCAEstimateNormal per point): the normal is the eigenvector of
the neighbourhood covariance with the smallest eigenvalue. Here the whole
cloud is one batched ``eigh`` over 3x3 covariances (vmapped, MXU-friendly
gathers) instead of n sequential solves.

Normals are unoriented (the VCCS metric uses |n1·n2|, supervoxel.cpp:34).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.eig3 import smallest_eigenvector_sym3x3

from fusion4landslide_tpu.ops.knn import knn

__all__ = ["pca_normals", "neighborhood_covariance"]


def neighborhood_covariance(
    points: jax.Array, neigh_idx: jax.Array, neigh_mask: jax.Array
) -> jax.Array:
    """(n, 3, 3) covariance of each point's neighbours about their mean."""
    neigh = jnp.take(points, neigh_idx, axis=0)  # (n, k, 3)
    w = neigh_mask.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(neigh * w, axis=1, keepdims=True) / cnt
    d = (neigh - mean) * w
    cov = jnp.einsum(
        "nki,nkj->nij", d, d, precision=jax.lax.Precision.HIGHEST
    ) / cnt[..., 0][..., None]
    return cov


@functools.partial(jax.jit, static_argnames=("k",))
def pca_normals(
    points: jax.Array,
    k: int = 30,
    mask: jax.Array | None = None,
    neigh_idx: jax.Array | None = None,
    neigh_mask: jax.Array | None = None,
) -> jax.Array:
    """Unit normals from the k-nearest-neighbour covariance.

    Args:
        points: (n, 3).
        k: neighbourhood size (the reference's ``n_normals``, default 30,
           f2s3_brienz.yaml:31).
        mask: (n,) validity of points.
        neigh_idx/neigh_mask: optional precomputed (n, k) neighbour graph to
            reuse across stages (the supervoxel stage needs the same graph).

    Returns:
        (n, 3) unit normals (arbitrary sign; arbitrary fixed axis for
        degenerate neighbourhoods, zero rows for masked points).
    """
    if neigh_idx is None:
        sqd, neigh_idx = knn(points, points, k, mask)
        neigh_mask = jnp.isfinite(sqd)
    cov = neighborhood_covariance(points, neigh_idx, neigh_mask)
    # Closed-form smallest eigenvector (ops/eig3.py) — eigh's iterative
    # TPU lowering was the dominant cost of normal estimation.
    normals = smallest_eigenvector_sym3x3(cov)
    if mask is not None:
        normals = jnp.where(mask[:, None], normals, 0.0)
    return normals
