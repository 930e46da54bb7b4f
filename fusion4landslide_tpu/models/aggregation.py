"""Superpoint feature aggregation with self-attention.

Capability parity with ``ClusterFeatureNetWithAttention``
(src/feature_aggregation/cluster_feature_net_self_attention.py:5-103):
per superpoint, a single-head self-attention over the member-point DIPs
features, mean over points, then a 2-layer MLP → one 64-d superpoint feature
plus the centroid coordinate.

TPU re-design: the reference loops superpoints in Python, one variable-length
attention each (…:72-103). Here superpoints are gathered into padded buckets
(S, P, 64) with a mask and the whole batch is one masked-attention matmul —
the quadratic P×P scores ride the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ClusterFeatureNet", "aggregate_superpoints", "gather_superpoint_buckets"]


class ClusterFeatureNet(nn.Module):
    """Masked self-attention + mean + MLP over one bucket of superpoints."""

    hidden_dim: int = 64
    output_dim: int = 64
    precision: str = "highest"

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array) -> jax.Array:
        # feats: (S, P, D); mask: (S, P).
        q = nn.Dense(precision=self.precision, features=self.hidden_dim, name="query")(feats)
        k = nn.Dense(precision=self.precision, features=self.hidden_dim, name="key")(feats)
        v = nn.Dense(precision=self.precision, features=self.hidden_dim, name="value")(feats)
        scores = jnp.einsum("spd,sqd->spq", q, k, precision=self.precision) / jnp.sqrt(
            jnp.asarray(self.hidden_dim, feats.dtype)
        )
        # Invalid keys can never be attended to.
        scores = jnp.where(mask[:, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(mask[:, :, None], attn, 0.0)  # zero invalid queries
        attended = jnp.einsum("spq,sqd->spd", attn, v, precision=self.precision)
        attended = nn.Dense(precision=self.precision, features=self.output_dim, name="fc")(attended)
        # Mean over valid points (reference: torch.mean over all points of
        # the superpoint, …:89).
        w = mask.astype(feats.dtype)[..., None]
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        pooled = jnp.sum(attended * w, axis=1) / cnt
        h = nn.relu(nn.Dense(precision=self.precision, features=self.hidden_dim, name="mlp0")(pooled))
        return nn.Dense(precision=self.precision, features=self.output_dim, name="mlp1")(h)


def gather_superpoint_buckets(
    point_feats: jax.Array,
    point_coords: jax.Array,
    spt_member_idx: jax.Array,
    spt_member_mask: jax.Array,
):
    """Gather per-point features/coords into (S, P, ·) superpoint buckets.

    ``spt_member_idx`` (S, P) holds point indices per superpoint, padded;
    ``spt_member_mask`` (S, P) marks real members.
    """
    feats = jnp.take(point_feats, spt_member_idx, axis=0)
    coords = jnp.take(point_coords, spt_member_idx, axis=0)
    m = spt_member_mask.astype(point_feats.dtype)[..., None]
    feats = feats * m
    w = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    centroids = jnp.sum(coords * m, axis=1) / w
    return feats, coords, centroids


def aggregate_superpoints(
    params,
    point_feats: jax.Array,
    point_coords: jax.Array,
    spt_member_idx: jax.Array,
    spt_member_mask: jax.Array,
    *,
    model: ClusterFeatureNet | None = None,
):
    """Superpoint features + centroids from per-point descriptors.

    Replaces the per-superpoint Python loop in the reference ``aggregation``
    (cluster_feature_net_self_attention.py:72-103).

    Returns:
        spt_feats: (S, output_dim)
        spt_centroids: (S, 3)
    """
    model = model or ClusterFeatureNet()
    feats, _, centroids = gather_superpoint_buckets(
        point_feats, point_coords, spt_member_idx, spt_member_mask
    )
    spt_feats = model.apply(params, feats, spt_member_mask)
    return spt_feats, centroids
