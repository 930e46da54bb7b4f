"""Batched, masked, weighted Kabsch / Procrustes rigid-fit.

Capability parity with the reference math core
(reference: src/functions.py:12-85 ``kabsch_transformation_estimation`` and
scripts/weighted_svd.py:58-129 ``weighted_procrustes``), re-designed for TPU:

- pure function of fixed-shape arrays — jit/vmap/shard_map friendly,
- padding handled by an explicit ``mask`` (padded rows get weight 0),
- no try/except SVD fallback: degenerate covariances are detected from the
  singular values and replaced by the identity transform with ``lax.select``
  (the reference falls back to identity when ``torch.svd`` raises,
  functions.py:62-71).

All solvers here operate on (..., N, 3) stacks; wrap with ``jax.vmap`` freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "weighted_kabsch",
    "transformation_residuals",
    "transform_points",
    "rt_to_transform",
]


def transform_points(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply a rigid transform to points.

    Args:
        points: (..., N, 3)
        R: (..., 3, 3)
        t: (..., 3)

    Returns:
        (..., N, 3) transformed points (reference: src/functions.py:107-124).
    """
    return (
        jnp.einsum("...ij,...nj->...ni", R, points, precision=jax.lax.Precision.HIGHEST)
        + t[..., None, :]
    )


def transformation_residuals(
    x1: jax.Array, x2: jax.Array, R: jax.Array, t: jax.Array
) -> jax.Array:
    """Pointwise Euclidean residuals ||R x1 + t - x2||.

    (reference: src/functions.py:88-104)
    """
    return jnp.linalg.norm(transform_points(x1, R, t) - x2, axis=-1)


def rt_to_transform(R: jax.Array, t: jax.Array) -> jax.Array:
    """Stack (R, t) into a 4x4 homogeneous transform (batched)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def weighted_kabsch(
    x1: jax.Array,
    x2: jax.Array,
    weights: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    normalize_w: bool = True,
    weight_thresh: float = 0.0,
    eps: float = 1e-7,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Weighted Kabsch rigid-fit, solving min ||R x1 + t - x2|| in RMSD sense.

    Args:
        x1: (..., N, 3) source correspondences.
        x2: (..., N, 3) target correspondences.
        weights: (..., N) soft inlier weights, default all-ones.
        mask: (..., N) bool/float validity mask for padded rows; a masked row
            contributes zero weight.
        normalize_w: normalize weights to sum to one (matches reference
            functions.py:35-37).
        weight_thresh: zero out weights below this (weighted_svd.py:96).
        eps: numerical floor.

    Returns:
        R: (..., 3, 3) rotation.
        t: (..., 3) translation.
        res: (..., N) per-point residuals (masked rows included — mask them
            downstream).
        valid: (...,) bool — False where the covariance was degenerate and the
            identity transform was returned instead.
    """
    dtype = jax.dtypes.canonicalize_dtype(jnp.promote_types(x1.dtype, jnp.float32))
    x1 = x1.astype(dtype)
    x2 = x2.astype(dtype)
    n = x1.shape[-2]
    if weights is None:
        weights = jnp.ones(x1.shape[:-1], dtype)
    else:
        weights = weights.astype(dtype)
    if weight_thresh > 0.0:
        weights = jnp.where(weights < weight_thresh, 0.0, weights)
    if mask is not None:
        weights = weights * mask.astype(dtype)
    if normalize_w:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)

    w = weights[..., None]  # (..., N, 1)
    wsum = jnp.sum(w, axis=-2, keepdims=True) + eps  # (..., 1, 1)
    mu1 = jnp.sum(w * x1, axis=-2, keepdims=True) / wsum  # (..., 1, 3)
    mu2 = jnp.sum(w * x2, axis=-2, keepdims=True) / wsum

    x1c = x1 - mu1
    x2c = x2 - mu2

    # Weighted 3x3 cross-covariance: H = x1c^T diag(w) x2c. Accumulated at
    # HIGHEST precision — the default TPU f32 matmul runs through bf16 passes
    # and loses ~1e-3, which is fatal for sub-mm displacement fields.
    hp = jax.lax.Precision.HIGHEST
    H = jnp.einsum("...ni,...nj->...ij", x1c * w, x2c, precision=hp)

    with jax.default_matmul_precision("highest"):
        U, S, Vt = jnp.linalg.svd(H)
        V = jnp.swapaxes(Vt, -1, -2)
        Ut = jnp.swapaxes(U, -1, -2)

        # Reflection fix: R = V diag(1, 1, det(V U^T)) U^T.
        det = jnp.linalg.det(V @ Ut)
        D = jnp.zeros_like(H)
        D = D.at[..., 0, 0].set(1.0)
        D = D.at[..., 1, 1].set(1.0)
        D = D.at[..., 2, 2].set(jnp.sign(det) + (det == 0.0))
        R = V @ D @ Ut

    t = mu2[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", R, mu1[..., 0, :], precision=hp
    )

    # Degeneracy: fewer than 3 effective points or a (numerically) rank-<2
    # covariance makes the rotation meaningless — return identity (the
    # reference returns identity when torch.svd throws, functions.py:62-71).
    eff_pts = jnp.sum((weights > 0).astype(dtype), axis=-1)
    finite = jnp.all(jnp.isfinite(S), axis=-1) & jnp.all(jnp.isfinite(R), axis=(-1, -2))
    valid = finite & (eff_pts >= 3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)
    R = jnp.where(valid[..., None, None], R, eye)
    t = jnp.where(valid[..., None], t, jnp.zeros_like(t))

    res = transformation_residuals(x1, x2, R, t)
    if mask is not None:
        res = jnp.where(mask.astype(bool), res, 0.0)
    del n
    return R, t, res, valid
