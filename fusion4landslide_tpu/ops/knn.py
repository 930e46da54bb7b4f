"""Blocked brute-force k-nearest-neighbour search.

This single primitive replaces every neighbour-search engine in the reference
(hnswlib: src/f2s3.py:273-281; faiss / chunked torch.cdist:
src/coarse_to_fine_matching_base.py:2762-2864; scipy cKDTree:
base:1038-1057; Open3D KDTree: src/data_loader.py:44; sklearn:
src/functions.py:127-144). On TPU, exact brute-force distances ride the
MXU/VPU at full throughput and beat approximate CPU graph indices at the
reference's tile scale (≤1M points, 3-d or 64-d), so no index structure is
built at all.

Design:
- fixed shapes; padded reference rows are masked to +inf distance,
- reference side is scanned in chunks with a running top-k merge, so the
  full (N, M) distance matrix is never materialised in HBM,
- query side is processed in blocks via ``lax.map`` for bounded VMEM,
- for dims <= 8 distances use the exact diff-form (VPU); for larger dims the
  matmul expansion ||a||² - 2a·b + ||b||² (MXU).

Inputs are expected to be mean-centred float32 (the IO layer centres tiles;
georeferenced UTM-scale coordinates lose precision squared in fp32).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "pairwise_sqdist",
    "knn",
    "nn1",
    "median_nn_distance",
    "radius_neighbors",
]

_DIFF_DIM_MAX = 8  # use exact diff-form distances up to this many dims


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared Euclidean distances between rows of a (n,d) and b (m,d)."""
    if a.shape[-1] <= _DIFF_DIM_MAX:
        # Accumulate per coordinate over (n, m) planes. Keeping the tiny
        # d-axis out of the minor dimensions matters on TPU: an (n, m, 3)
        # intermediate would pad 3 -> 128 lanes (42x waste).
        out = None
        for d in range(a.shape[-1]):
            diff = a[..., :, None, d] - b[..., None, :, d]
            out = diff * diff if out is None else out + diff * diff
        return out
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (n, 1)
    b2 = jnp.sum(b * b, axis=-1)  # (m,)
    # HIGHEST precision: the default TPU f32 matmul loses ~1e-3 relative,
    # which flips near-tie neighbour selections.
    ab = jnp.matmul(
        a,
        b.swapaxes(-1, -2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 - 2.0 * ab + b2[..., None, :], 0.0)


def _merge_topk(
    best_d: jax.Array, best_i: jax.Array, d: jax.Array, idx: jax.Array, k: int
):
    """Merge running (n,k) best with new candidates (n,c) -> new (n,k)."""
    cat_d = jnp.concatenate([best_d, d], axis=1)
    cat_i = jnp.concatenate([best_i, idx], axis=1)
    neg_d, pos = jax.lax.top_k(-cat_d, k)
    return -neg_d, jnp.take_along_axis(cat_i, pos, axis=1)


def knn(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    ref_mask: jax.Array | None = None,
    *,
    ref_chunk: int = 4096,
    query_block: int = 8192,
    exclude_self: bool = False,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest neighbours of each query row among reference rows.

    Args:
        query: (n, d) query points/features.
        ref: (m, d) reference points/features (padded rows allowed).
        k: number of neighbours.
        ref_mask: (m,) validity of reference rows; invalid rows never match.
        ref_chunk: reference rows per scan step.
        query_block: query rows per ``lax.map`` block.
        exclude_self: mask candidate j for query i when i == j (self-search).
        use_pallas: force (True) or forbid (False) the Pallas TPU kernel;
            None auto-selects it for feature-dim inputs on a TPU backend.

    Returns:
        sqdist: (n, k) squared distances, ascending.
        idx: (n, k) reference indices (into ``ref``); masked/padded slots have
            distance +inf and index 0 — gate on ``isfinite(sqdist)``.
    """
    if use_pallas is None:
        import os

        # Escape hatch for backend debugging: the Mosaic kNN kernel is the
        # fastest feature-space path, but a faulty lowering can crash the
        # whole TPU worker; disabling falls back to the exact XLA search.
        use_pallas = (
            query.shape[-1] > _DIFF_DIM_MAX
            and k <= 128
            and not os.environ.get("F4L_DISABLE_PALLAS_KNN")
        )
    if use_pallas:
        from fusion4landslide_tpu.ops.knn_pallas import (
            knn_pallas,
            pallas_available,
        )

        if pallas_available():
            return knn_pallas(
                query, ref, k, ref_mask, exclude_self=exclude_self
            )
    return _knn_xla(
        query,
        ref,
        k,
        ref_mask,
        ref_chunk=ref_chunk,
        query_block=query_block,
        exclude_self=exclude_self,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "ref_chunk", "query_block", "exclude_self")
)
def _knn_xla(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    ref_mask: jax.Array | None = None,
    *,
    ref_chunk: int = 4096,
    query_block: int = 8192,
    exclude_self: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pure-XLA blocked kNN (CPU fallback + small-dim spatial path)."""
    n, d = query.shape
    m = ref.shape[0]
    ref_chunk = min(ref_chunk, max(m, 1))
    n_chunks = -(-m // ref_chunk)
    m_pad = n_chunks * ref_chunk

    mask = jnp.ones((m,), bool) if ref_mask is None else ref_mask.astype(bool)
    if m_pad != m:
        ref = jnp.pad(ref, ((0, m_pad - m), (0, 0)))
        mask = jnp.pad(mask, (0, m_pad - m))
    ref_c = ref.reshape(n_chunks, ref_chunk, d)
    mask_c = mask.reshape(n_chunks, ref_chunk)

    query_block = min(query_block, max(n, 1))
    nq_blocks = -(-n // query_block)
    n_pad = nq_blocks * query_block
    qpad = jnp.pad(query, ((0, n_pad - n), (0, 0))) if n_pad != n else query
    q_blocks = qpad.reshape(nq_blocks, query_block, d)
    q_rows = jnp.arange(n_pad).reshape(nq_blocks, query_block)

    def one_block(args):
        q, rows = args  # (B, d), (B,)

        def step(carry, chunk):
            best_d, best_i = carry
            rc, mc, base = chunk
            dist = pairwise_sqdist(q, rc)  # (B, C)
            cols = base + jnp.arange(ref_chunk)[None, :]
            bad = ~mc[None, :]
            if exclude_self:
                bad = bad | (cols == rows[:, None])
            dist = jnp.where(bad, jnp.inf, dist)
            if ref_chunk > k:
                neg_d, pos = jax.lax.top_k(-dist, k)
                dist, cols = -neg_d, jnp.take_along_axis(
                    jnp.broadcast_to(cols, dist.shape), pos, axis=1
                )
            else:
                cols = jnp.broadcast_to(cols, dist.shape)
            return _merge_topk(best_d, best_i, dist, cols, k), None

        init = (
            jnp.full((q.shape[0], k), jnp.inf, q.dtype),
            jnp.zeros((q.shape[0], k), jnp.int32),
        )
        bases = jnp.arange(n_chunks) * ref_chunk
        (best_d, best_i), _ = jax.lax.scan(step, init, (ref_c, mask_c, bases))
        return best_d, best_i

    if nq_blocks == 1:
        best_d, best_i = one_block((q_blocks[0], q_rows[0]))
    else:
        best_d, best_i = jax.lax.map(one_block, (q_blocks, q_rows))
        best_d = best_d.reshape(n_pad, k)
        best_i = best_i.reshape(n_pad, k)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, 0)
    return best_d[:n], best_i[:n]


def nn1(
    query: jax.Array, ref: jax.Array, ref_mask: jax.Array | None = None, **kw
) -> tuple[jax.Array, jax.Array]:
    """1-NN convenience wrapper: returns ((n,) sqdist, (n,) idx)."""
    d, i = knn(query, ref, 1, ref_mask, **kw)
    return d[:, 0], i[:, 0]


@jax.jit
def _bbox_stats(points, valid):
    lo = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -jnp.inf), axis=0)
    return hi - lo, jnp.sum(valid.astype(jnp.int32))


@jax.jit
def _median_attempt(points, valid, radius, cnt_valid):
    """One radius attempt — grid build + bounded 1-NN + masked median —
    as a single dispatch (the eager composite cost ~10 device round trips
    per attempt per cloud on the tunnelled TPU)."""
    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn

    grid = build_hash_grid(points, radius, valid)
    sqd, _, _ = hash_grid_knn(points, grid, radius, 1, exclude_self=True)
    d = jnp.sqrt(sqd[:, 0])
    found = valid & jnp.isfinite(d)
    d_sorted = jnp.sort(jnp.where(found, d, jnp.inf))
    lo_i = jnp.maximum((cnt_valid - 1) // 2, 0)
    hi_i = jnp.maximum(cnt_valid // 2, 0)
    med = 0.5 * (jnp.take(d_sorted, lo_i) + jnp.take(d_sorted, hi_i))
    return med, jnp.sum(found.astype(jnp.int32))


def median_nn_distance(
    points: jax.Array, mask: jax.Array | None = None, **kw
) -> jax.Array:
    """Median distance to the closest *other* point — the point-cloud
    "resolution" used throughout the reference
    (src/f2s3.py:481-507 ``_compute_median_resolution``).

    On TPU this runs radius-bounded through the grid-window kernel: the
    initial radius comes from the bounding-box density and doubles until
    at least half the points have an in-radius neighbour (the median is
    then exact — every distance below it has been found exactly).
    """
    from fusion4landslide_tpu.ops.knn_pallas import pallas_available

    n = points.shape[0]
    if pallas_available() and n > 4096:
        valid = (
            jnp.ones((n,), bool)
            if mask is None
            else jnp.asarray(mask).astype(bool)
        )
        from fusion4landslide_tpu.ops.segments import bucket_size

        ext, cnt_valid = jax.device_get(_bbox_stats(points, valid))
        cnt_valid = int(cnt_valid)
        area = float(max(ext[0], 1e-9) * max(ext[1], 1e-9))
        radius = 4.0 * float(np.sqrt(area / max(cnt_valid, 1)))
        nb = bucket_size(n)
        pts_b = jnp.pad(points, ((0, nb - n), (0, 0)))
        valid_b = jnp.pad(valid, (0, nb - n))
        for _ in range(8):
            med, n_found = _median_attempt(
                pts_b, valid_b, jnp.asarray(radius, points.dtype),
                jnp.asarray(cnt_valid, jnp.int32),
            )
            if 2 * int(jax.device_get(n_found)) > cnt_valid:
                return med
            radius *= 2.0
        # Fall through to brute force if density estimation failed.
    sqd, _ = knn(points, points, 1, mask, exclude_self=True, **kw)
    d = jnp.sqrt(sqd[:, 0])
    if mask is not None:
        valid = mask.astype(bool) & jnp.isfinite(d)
        d_sorted = jnp.sort(jnp.where(valid, d, jnp.inf))
        cnt = jnp.sum(valid)
        lo = jnp.maximum((cnt - 1) // 2, 0)
        hi = cnt // 2
        return 0.5 * (d_sorted[lo] + d_sorted[hi])
    return jnp.median(d)


@functools.partial(jax.jit, static_argnames=("k_max",))
def radius_neighbors(
    query: jax.Array,
    ref: jax.Array,
    radius: jax.Array | float,
    k_max: int,
    ref_mask: jax.Array | None = None,
    **kw,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Up to ``k_max`` nearest neighbours within ``radius``.

    Replaces Open3D ``search_radius_vector_3d`` (src/data_loader.py:44) with a
    fixed-shape truncation: the k_max *nearest* in-radius points are kept.

    Returns:
        idx: (n, k_max) reference indices.
        valid: (n, k_max) bool — in radius and not padding.
        dist: (n, k_max) Euclidean distances (inf where invalid).
    """
    sqd, idx = knn(query, ref, k_max, ref_mask, **kw)
    dist = jnp.sqrt(sqd)
    valid = jnp.isfinite(dist) & (dist <= radius)
    return idx, valid, jnp.where(valid, dist, jnp.inf)
