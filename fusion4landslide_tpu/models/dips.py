"""DIPs local feature descriptor (PointNet + T-net), inference-only.

Capability parity with the reference ``PointNetFeature``/``STN3d``
(src/models/local_feature_descriptor.py:5-113): per-patch PointNet —
pointwise MLP 3→256→512→1024, global max-pool, FC 1024→512→256→64,
L2-normalised 64-d descriptor; a 3x3 T-net spatially aligns the patch first.

TPU re-design notes:
- torch's ``Conv1d(k=1)`` over (B, C, N) is a pointwise Dense here over
  (B, N, C) — batched matmuls that tile straight onto the MXU,
- BatchNorm runs in eval mode (running stats are parameters); Dropout is
  inference-identity and omitted,
- input layout is (B, N, 3) points-last (the host side transposes once,
  instead of the reference's per-batch (B, 3, N) tensors).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PointNetFeature", "STN3d"]


class EvalBatchNorm(nn.Module):
    """BatchNorm1d in eval mode: y = g * (x - mean) / sqrt(var + eps) + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


class _MLPStack(nn.Module):
    """Shared trunk: pointwise 3→256→512→1024, max-pool, FC 1024→512→256."""

    precision: str = "highest"
    dtype: str | None = None  # matmul compute dtype; None = float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, 3)
        def dense(feats, name):
            return nn.Dense(
                precision=self.precision,
                dtype=jnp.dtype(self.dtype) if self.dtype else None,
                features=feats,
                name=name,
            )

        x = nn.relu(EvalBatchNorm(256, name="bn1")(dense(256, "conv1")(x)))
        x = nn.relu(EvalBatchNorm(512, name="bn2")(dense(512, "conv2")(x)))
        x = EvalBatchNorm(1024, name="bn3")(dense(1024, "conv3")(x))
        x = jnp.max(x, axis=-2)  # global max pool over points -> (B, 1024)
        x = nn.relu(EvalBatchNorm(512, name="bn4")(dense(512, "fc1")(x)))
        x = nn.relu(EvalBatchNorm(256, name="bn5")(dense(256, "fc2")(x)))
        return x


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 alignment
    (local_feature_descriptor.py:5-53)."""

    precision: str = "highest"
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _MLPStack(self.precision, self.dtype, name="trunk")(x)
        m = nn.Dense(precision=self.precision, features=9, name="fc3")(h)
        m = m.astype(jnp.float32)
        return m.reshape(*m.shape[:-1], 3, 3) + jnp.eye(3, dtype=m.dtype)


class PointNetFeature(nn.Module):
    """64-d L2-normalised patch descriptor
    (local_feature_descriptor.py:56-113)."""

    dim: int = 64
    l2norm: bool = True
    tnet: bool = True
    precision: str = "highest"
    dtype: str | None = None  # 'bfloat16' for MXU-rate inference
                              # (descriptors are L2-normalised; matching is
                              # robust to bf16 — see test_models)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, 3) LRF-normalised patches.
        if self.tnet:
            trans = STN3d(self.precision, self.dtype, name="stn3d")(x)
            # torch: bmm(trans, x_c_first) with x (B, 3, N) ==> per-point
            # p' = trans @ p; points-last: x @ trans^T.
            x = jnp.einsum(
                "...ij,...nj->...ni",
                trans,
                x,
                precision=jax.lax.Precision.HIGHEST,
            )
        h = _MLPStack(self.precision, self.dtype, name="trunk")(x)
        out = nn.Dense(precision=self.precision, features=self.dim, name="fc3")(h)
        out = out.astype(jnp.float32)
        if self.l2norm:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out
