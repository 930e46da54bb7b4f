"""Segment (label-group) utilities for fixed-shape batching.

The reference iterates Python lists of per-supervoxel index arrays
(e.g. f2s3.py:233-237, cluster_feature_net_self_attention.py:75). On TPU,
variable-length groups become a dense (S, P) member-index matrix with a mask,
built entirely on device from a sort + searchsorted — one gather feeds every
per-supervoxel batched computation (attention, filtering nets, SVD).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["label_members", "label_counts", "bucket_size"]


def label_counts(labels: jax.Array, num_labels: int) -> jax.Array:
    """(num_labels,) count of points per label (label < 0 ignored)."""
    valid = labels >= 0
    return jax.ops.segment_sum(
        valid.astype(jnp.int32),
        jnp.where(valid, labels, 0),
        num_segments=num_labels,
    )


@functools.partial(jax.jit, static_argnames=("num_labels", "members_cap"))
def label_members(
    labels: jax.Array, num_labels: int, members_cap: int
) -> tuple[jax.Array, jax.Array]:
    """Dense member table for label groups.

    Args:
        labels: (n,) int labels in [0, num_labels) (negative = ignore).
        num_labels: static S — number of groups (pad bound).
        members_cap: static P — max members per group kept (the *first* P in
            point order; callers size this to the true max count).

    Returns:
        member_idx: (S, P) point indices per label, padded with 0.
        member_mask: (S, P) validity.
    """
    n = labels.shape[0]
    valid = labels >= 0
    sort_key = jnp.where(valid, labels, num_labels)  # invalid sort last
    order = jnp.argsort(sort_key, stable=True)
    sorted_labels = sort_key[order]
    starts = jnp.searchsorted(sorted_labels, jnp.arange(num_labels))
    counts = jnp.searchsorted(
        sorted_labels, jnp.arange(num_labels), side="right"
    ) - starts
    offsets = jnp.arange(members_cap)[None, :]  # (1, P)
    gather_pos = starts[:, None] + offsets  # (S, P)
    member_mask = offsets < counts[:, None]
    gather_pos = jnp.clip(gather_pos, 0, n - 1)
    member_idx = jnp.take(order, gather_pos)
    member_idx = jnp.where(member_mask, member_idx, 0)
    return member_idx.astype(jnp.int32), member_mask


_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def bucket_size(n: int, buckets: tuple[int, ...] = _BUCKETS) -> int:
    """Round up to a standard bucket to bound jit recompilations.

    Above the largest listed bucket the ladder continues at quarter-octave
    steps ({1, 1.25, 1.5, 1.75} x 2^k), not full powers of two: production
    overlap tiles land anywhere (e.g. a 512k-pt core tile's +-20 m overlap
    cloud is ~1.24M points, which a power-of-two ladder would pad 69% to
    2M), and the sharded runner compiles ONE bucket per run (the max tile
    size), so the finer ladder costs no extra Mosaic compiles. Every rung
    is a multiple of 2^13, comfortably above the window kernels' 512-pt
    block granularity, the device step's 2048-pt DIPs chunk, and the f32
    (8, 128) tile constraint.
    """
    n = int(n)
    for b in buckets:
        if n <= b:
            return b
    k = int(np.ceil(np.log2(max(n, 1))))  # 2^(k-1) < n <= 2^k
    base = 2 ** (k - 1)
    for num in (5, 6, 7, 8):  # 1.25, 1.5, 1.75, 2.0 x 2^(k-1)
        b = base * num // 4
        if n <= b:
            return b
    return 2**k
