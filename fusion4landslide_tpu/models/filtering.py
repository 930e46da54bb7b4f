"""Learned correspondence outlier filter (F2S3's FilteringNetwork).

Capability parity with the reference (src/models/outlier_classifier.py:10-105):
12 residual ``PointCN`` blocks of pointwise-Dense + InstanceNorm + stat-free
BatchNorm + ReLU over 6-d correspondences, output weight = relu(tanh(·)); then
``filter_input``: weighted Kabsch from the inferred weights, residual-median
inlier re-fit (coeff 2.5 for the rockfall dataset, else 1.0) when >= 5 inliers
and median residual < 0.5.

TPU re-design: the reference processes one supervoxel at a time with shape
(1, 1, n, 6); here the network is a pure function over (n, 6) with a validity
mask — normalisations reduce over *valid* rows only — so whole batches of
supervoxels run via vmap on padded buckets.

torch-semantics note: with batch size 1 (always, in the reference),
``InstanceNorm2d`` and ``BatchNorm2d(track_running_stats=False)`` both
normalise over the point axis per channel; we apply both, with their eps
values (1e-3), to match the checkpoint's training-time function exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.kabsch import weighted_kabsch

__all__ = ["FilteringNetwork", "filter_correspondences"]

_EPS = 1e-3


def _masked_norm(x: jax.Array, mask: jax.Array, eps: float) -> jax.Array:
    """Normalise per channel over valid rows: (x - mean) / sqrt(var + eps)."""
    w = mask.astype(x.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * w, axis=-2, keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * w, axis=-2, keepdims=True) / cnt
    return (x - mean) * jax.lax.rsqrt(var + eps)


class PointCN(nn.Module):
    """Residual context-normalisation block (outlier_classifier.py:10-29)."""

    channels: int = 128
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        h = nn.Dense(precision=self.precision, features=self.channels, name="conv0")(x)
        h = _masked_norm(h, mask, _EPS)  # InstanceNorm2d(eps=1e-3)
        h = _masked_norm(h, mask, _EPS)  # BatchNorm2d(eps=1e-3, no stats)
        h = nn.relu(h)
        h = nn.Dense(precision=self.precision, features=self.channels, name="conv1")(h)
        h = _masked_norm(h, mask, _EPS)
        h = _masked_norm(h, mask, _EPS)
        h = nn.relu(h)
        return h + x


class FilteringNetwork(nn.Module):
    """Per-correspondence inlier weights in [0, 1)
    (outlier_classifier.py:32-63)."""

    num_layers: int = 12
    channels: int = 128
    precision: str = "highest"

    @nn.compact
    def __call__(self, corr: jax.Array, mask: jax.Array) -> jax.Array:
        # corr: (..., n, 6) scaled correspondences; mask: (..., n).
        x = nn.Dense(precision=self.precision, features=self.channels, name="l1")(corr)
        for i in range(self.num_layers):
            x = PointCN(self.channels, self.precision, name=f"block{i}")(x, mask)
        out = nn.Dense(precision=self.precision, features=1, name="output")(x)[..., 0]
        w = nn.relu(jnp.tanh(out))
        return jnp.where(mask.astype(bool), w, 0.0)


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over valid entries (upper median, matching torch.median's
    lower-median only up to ties — the downstream threshold is coarse)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    cnt = jnp.sum(mask, axis=-1)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    return jnp.take_along_axis(xs, lo[..., None], axis=-1)[..., 0]


def filter_correspondences(
    params,
    corr: jax.Array,
    mask: jax.Array,
    *,
    rockfall: bool = False,
    model: FilteringNetwork | None = None,
):
    """The reference's ``filter_input`` (outlier_classifier.py:65-105) as a
    pure function over one padded supervoxel.

    Args:
        params: FilteringNetwork parameters.
        corr: (n, 6) raw correspondences (src xyz | tgt xyz).
        mask: (n,) validity.
        rockfall: dataset switch for the inlier coefficient
            (outlier_classifier.py:76-79).

    Returns:
        dict with 'scores' (n,), 'R' (3,3), 't' (3,), 'robust_estimate' ().
    """
    model = model or FilteringNetwork()
    scale = jnp.maximum(
        jnp.max(jnp.where(mask[:, None], jnp.abs(corr), 0.0)), 1e-12
    )
    scores = model.apply(params, corr / scale, mask)

    x1, x2 = corr[:, :3], corr[:, 3:6]
    R, t, res, _ = weighted_kabsch(x1, x2, scores, mask=mask)

    coeff = 2.5 if rockfall else 1.0
    med = _masked_median(res, mask.astype(bool))
    inlier = mask.astype(bool) & (res < coeff * med)
    n_inl = jnp.sum(inlier)
    robust = (n_inl >= 5) & (med < 0.5)

    R2, t2, _, _ = weighted_kabsch(x1, x2, inlier.astype(corr.dtype), mask=mask)
    R = jnp.where(robust, R2, R)
    t = jnp.where(robust, t2, t)
    return {"scores": scores, "R": R, "t": t, "robust_estimate": robust}
