"""Local-reference-frame (LRF) patch extraction for DIPs descriptors.

Capability parity with the reference ``Preprocess_Dataset.extract_patch``
(src/data_loader.py:42-106, the DIP LRF of Poiesi & Boscaini):

per query point p with in-radius neighbours {q_i}:
- covariance of (q_i - p) (excluding the nearest / self point, eq. 3),
- z axis = smallest-eigenvalue eigenvector, sign-disambiguated so that it
  points against the mean neighbour direction (eq. 4),
- x axis = normalised weighted in-plane projection with weights
  alpha = (R - d_i)^2, beta = ((q_i - p)·z)^2 (eq. 5),
- y = z × x; patch = Rᵀ (q - p) / R, padded/subsampled to 256 points.

TPU re-design: the reference extracts patches on CPU DataLoader workers, one
Python loop per point (8 workers, base:1993-1996). Here the whole cloud is
processed as fixed-shape batched tensor ops: a blocked radius-kNN produces
(n, k_max) neighbourhoods, covariance/eigh/axis math is vmapped, and the
random 256-subsample uses a counter-based PRNG key per point. Patches whose
neighbourhood is capped at ``k_max`` use the k_max *nearest* in-radius points
for the covariance (the reference uses all; the tail of a ball's points
contributes O(1/k) to the covariance).

Sparse patches (<= 10 in-radius points) skip the LRF and are only scaled by
1/R, exactly like the reference fallback (data_loader.py:94-98 — which does
not centre them either; parity preserved, see test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.eig3 import smallest_eigenvector_sym3x3

from fusion4landslide_tpu.ops.knn import knn

__all__ = [
    "extract_lrf_patches",
    "lrf_patches_from_samples",
    "lrf_patches_from_knn",
]

_EPS = 1e-6


@functools.partial(jax.jit, static_argnames=("k_max", "num_points"))
def extract_lrf_patches(
    query: jax.Array,
    support: jax.Array,
    radius: jax.Array | float,
    key: jax.Array,
    *,
    k_max: int = 512,
    num_points: int = 256,
    support_mask: jax.Array | None = None,
) -> jax.Array:
    """LRF-normalised patches for every query point.

    Args:
        query: (n, 3) points to describe (tile core).
        support: (m, 3) neighbourhood source (tile core + halo; the reference
            passes the overlap cloud, f2s3.py:111-114).
        radius: patch radius (reference: sqrt(3)·10·median_res, f2s3.py:106).
        key: PRNG key for the random 256-point subsample
            (data_loader.py:104).
        k_max: neighbourhood cap (nearest-in-radius kept).
        num_points: output patch size (256, data_loader.py:17).
        support_mask: (m,) validity.

    Returns:
        (n, num_points, 3) patches in each point's LRF, scaled by 1/radius.
    """
    sqd, idx = knn(query, support, k_max, support_mask)
    return lrf_patches_from_knn(
        query, support, sqd, idx, radius, key, num_points=num_points
    )


@functools.partial(jax.jit, static_argnames=("num_points",))
def lrf_patches_from_knn(
    query: jax.Array,
    support: jax.Array,
    sqd: jax.Array,  # (n, k_max) ascending squared distances (+inf pad)
    idx: jax.Array,  # (n, k_max)
    radius: jax.Array | float,
    key: jax.Array,
    *,
    num_points: int = 256,
) -> jax.Array:
    """LRF patches from a precomputed ascending kNN table — shared tail of
    :func:`extract_lrf_patches`, also fed by the traced grid kNN
    (``ops.hashgrid.knn_grid_traced``) in the device tile steps."""
    n = query.shape[0]
    k_max = sqd.shape[1]
    radius = jnp.asarray(radius, query.dtype)
    dist = jnp.sqrt(sqd)
    valid = jnp.isfinite(dist) & (dist <= radius)  # (n, k)

    neigh = jnp.take(support, idx, axis=0)  # (n, k, 3) absolute

    # Covariance excludes the nearest neighbour (the query itself when the
    # query cloud is a subset of the support cloud, data_loader.py:46).
    cov_mask = valid.at[:, 0].set(False)
    patch, valid = _lrf_normalize(query, neigh, valid, cov_mask, radius)

    # Random subsample / permutation to num_points without replacement:
    # valid slots get random priorities, invalid slots -inf; top num_points
    # picks a uniform random subset of the valid slots, padded with zeros.
    pri = jax.random.uniform(key, (n, k_max))
    pri = jnp.where(valid, pri, -jnp.inf)
    _, sel = jax.lax.top_k(pri, num_points)
    picked = jnp.take_along_axis(patch, sel[..., None], axis=1)
    sel_valid = jnp.take_along_axis(valid, sel, axis=1)
    return jnp.where(sel_valid[..., None], picked, 0.0)


@jax.jit
def lrf_patches_from_samples(
    query: jax.Array,
    support: jax.Array,
    idx: jax.Array,
    valid: jax.Array,
    radius: jax.Array | float,
) -> jax.Array:
    """LRF patches from pre-sampled neighbourhood *indices* (gathers the
    coordinates from ``support``; prefer ``lrf_patches_from_neighbors`` when
    the sampler already returned coordinates)."""
    neigh = jnp.take(support, idx, axis=0)
    return lrf_patches_from_neighbors(query, neigh, valid, radius)


@jax.jit
def lrf_patches_from_neighbors(
    query: jax.Array,
    neigh: jax.Array,
    valid: jax.Array,
    radius: jax.Array | float,
) -> jax.Array:
    """LRF patches from pre-sampled neighbourhood coordinates.

    ``neigh``/``valid`` come from a radius sampler (e.g.
    ``ops.hashgrid_pallas.radius_sample_window``) that already excludes the
    query point itself, so every valid sample enters the covariance.

    Returns (n, neigh.shape[1], 3) patches in each query's LRF.
    """
    radius = jnp.asarray(radius, query.dtype)
    patch, v = _lrf_normalize(query, neigh, valid, valid, radius)
    return jnp.where(v[..., None], patch, 0.0)


def _lrf_normalize(query, neigh, valid, cov_mask, radius):
    """Shared LRF math: covariance z-axis, weighted in-plane x-axis, rotate
    + scale by 1/R, sparse (<=10 points) raw fallback. Returns
    (patch (n, k, 3), valid)."""
    diff = neigh - query[:, None, :]  # (n, k, 3)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    w = cov_mask.astype(query.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (n, 1)
    hp = jax.lax.Precision.HIGHEST
    cov = jnp.einsum("nki,nkj->nij", diff * w, diff * w, precision=hp)
    cov = cov / cnt[..., None]

    np_hat = smallest_eigenvector_sym3x3(cov)  # closed form: ~10x
    # faster than eigh's iterative TPU lowering (ops/eig3.py)

    # eq. 4 sign disambiguation: zp points so that sum(np_hat · -diff) > 0.
    s = jnp.einsum("ni,nki->n", np_hat, -diff * w, precision=hp)
    zp = jnp.where((s > 0)[:, None], np_hat, -np_hat)

    # eq. 5: weighted in-plane direction.
    proj = jnp.einsum("nki,ni->nk", diff, zp, precision=hp)  # (q-p)·z
    v = diff - proj[..., None] * zp[:, None, :]
    alpha = jnp.where(cov_mask, (radius - dist) ** 2, 0.0)
    beta = proj**2 * cov_mask
    xp = jnp.einsum("nki,nk->ni", v, alpha * beta, precision=hp)
    xp_norm = jnp.linalg.norm(xp, axis=-1, keepdims=True)
    xp = xp / (xp_norm + _EPS)
    yp = jnp.cross(zp, xp)

    # Rotate into the LRF: rows of R^T are x, y, z.
    lrf = jnp.stack([xp, yp, zp], axis=1)  # (n, 3, 3) = R^T
    local = jnp.einsum("nij,nkj->nki", lrf, diff, precision=hp) / radius

    # Sparse fallback (<= 10 in-radius points): no LRF, no centring — only
    # the 1/R scale, matching data_loader.py:94-98.
    n_in = jnp.sum(valid, axis=1)
    sparse = n_in <= 10
    raw = neigh / radius
    patch = jnp.where(sparse[:, None, None], raw, local)
    patch = jnp.where(valid[..., None], patch, 0.0)
    return patch, valid
