"""Quantitative registration metrics (reference: utils/metrics.py:14-26)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.kabsch import transform_points

__all__ = ["compute_inlier_ratio", "median_displacement_error"]


def compute_inlier_ratio(
    src: jax.Array,
    tgt: jax.Array,
    R: jax.Array,
    t: jax.Array,
    inlier_threshold: float | jax.Array = 0.1,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Fraction of correspondences whose post-transform residual is below
    the threshold (utils/metrics.py:14-26)."""
    res = jnp.linalg.norm(transform_points(src, R, t) - tgt, axis=-1)
    ok = res < inlier_threshold
    if mask is not None:
        m = mask.astype(bool)
        return jnp.sum(ok & m) / jnp.maximum(jnp.sum(m), 1)
    return jnp.mean(ok.astype(jnp.float32))


def median_displacement_error(
    dvfs_a: jax.Array, dvfs_b: jax.Array
) -> jax.Array:
    """Median |d_a - d_b| between two (n, 6) DVF tables on the same source
    points — the cross-implementation comparison metric (BASELINE.md:
    median displacement error < 1 mm vs reference)."""
    da = dvfs_a[:, 3:6] - dvfs_a[:, :3]
    db = dvfs_b[:, 3:6] - dvfs_b[:, :3]
    return jnp.median(jnp.linalg.norm(da - db, axis=-1))
