"""Grid-bucketed spatial nearest-neighbour search (radius-bounded, exact).

The brute-force blocked kNN in :mod:`fusion4landslide_tpu.ops.knn` is exact
but O(N·M) — fine for feature space (64-d rides the MXU) and for small sets,
but minutes for 1M×1M 3-d coordinate searches. Every *spatial* neighbour
query in the reference is radius-bounded (ICP correspondence gate
utils/o3d_tools.py:49, LRF patch radius src/data_loader.py:44, displacement
magnitude gates base:2899-2906), which admits the classic uniform-grid
decomposition — re-designed here for TPU's fixed-shape model:

- reference points are binned into grid cells of edge >= radius and sorted
  by *linearised* cell id; a dense ``starts`` table (exclusive prefix sum of
  cell counts, padded to a static cell capacity) gives each cell's run with
  a single gather — no per-query binary search,
- queries are sorted by their own cell id before the join, so consecutive
  queries touch the same 27 neighbour cells and the candidate gathers hit
  coherent memory; results are scattered back through the sort permutation,
- each query scores up to ``cap`` candidates from each of its 27 neighbour
  cells (a ball of radius r is covered by the 3x3x3 block at cell edge r)
  and reduces top-k by true distance — gathers + top_k over fixed
  (B, 27·cap) tables, no data-dependent shapes,
- the grid's cell edge is automatically grown when the bounding box would
  exceed the static cell capacity, preserving the 27-cell covering
  invariant (cell >= radius always holds).

Exactness: truncated cell runs (occupancy > cap) are counted in
``overflow`` so callers can re-run with a bigger cap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "HashGrid",
    "build_hash_grid",
    "hash_grid_knn",
    "nn1_spatial",
    "knn_grid_traced",
    "median_nn_distance_traced",
    "radius_sample_grid",
]

#: Static bound on the dense cell table (int32 entries).
_MAX_CELLS = 1 << 21


class HashGrid(NamedTuple):
    points: jax.Array  # (m, 3) reference points sorted by cell id
    index: jax.Array  # (m,) original indices, same order
    starts: jax.Array  # (_MAX_CELLS + 1,) exclusive-prefix cell starts
    dims: jax.Array  # (3,) int32 grid dimensions
    cell: jax.Array  # () effective cell edge (>= requested)
    origin: jax.Array  # (3,)
    m_valid: jax.Array  # () number of valid (unmasked) reference points


@functools.partial(jax.jit, static_argnames=("max_cells",))
def build_hash_grid(
    ref: jax.Array,
    cell: jax.Array | float,
    ref_mask: jax.Array | None = None,
    *,
    max_cells: int = _MAX_CELLS,
) -> HashGrid:
    """Bin reference points into a dense-start uniform grid."""
    m = ref.shape[0]
    dtype = ref.dtype
    cell = jnp.asarray(cell, dtype)
    if ref_mask is not None:
        mask = ref_mask.astype(bool)
    else:
        mask = jnp.ones((m,), bool)
    # Bucket the reference count: the grid arrays feed the Pallas window
    # kernels, which compile per shape; per-tile cloud sizes would
    # otherwise recompile them per tile. Padded rows are masked into the
    # dump cell and never sampled.
    from fusion4landslide_tpu.ops.segments import bucket_size

    mb = bucket_size(m)
    if mb != m:
        ref = jnp.pad(ref, ((0, mb - m), (0, 0)))
        mask = jnp.pad(mask, (0, mb - m))
        m = mb
    big = jnp.asarray(3e38, dtype)
    pts = jnp.where(mask[:, None], ref, big)
    origin = jnp.min(jnp.where(mask[:, None], ref, big), axis=0)
    extent = jnp.max(jnp.where(mask[:, None], ref, -big), axis=0) - origin
    extent = jnp.maximum(extent, 0.0)
    # Grow the cell edge until the grid fits the static table. Real cells
    # stay strictly below max_cells - 1 so the masked-point dump cell
    # (max_cells - 1) sorts after every valid point — the Pallas window
    # kernel relies on the valid points forming the array prefix.
    target = jnp.asarray(float(max_cells - 1), dtype)

    def grow(c):
        # Float product: tiny cells over a large extent overflow an int32
        # cell count long before the loop converges.
        dims = jnp.floor(extent / c) + 1.0
        return dims[0] * dims[1] * dims[2] > target

    cell_eff = jax.lax.while_loop(grow, lambda c: c * 1.5, cell)
    dims = (jnp.floor(extent / cell_eff) + 1).astype(jnp.int32)

    cells = jnp.clip(
        jnp.floor((pts - origin) / cell_eff).astype(jnp.int32),
        0,
        dims - 1,
    )
    linear = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]
    linear = jnp.where(mask, linear, max_cells - 1)  # masked points sort last
    order = jnp.argsort(linear)
    sorted_linear = linear[order]
    counts = jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), sorted_linear, num_segments=max_cells
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return HashGrid(
        points=jnp.take(ref, order, axis=0),
        index=order.astype(jnp.int32),
        starts=starts,
        dims=dims,
        cell=cell_eff,
        origin=origin,
        m_valid=jnp.sum(mask.astype(jnp.int32)),
    )


def _neighbor_offsets() -> jax.Array:
    r = jnp.arange(-1, 2)
    return jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), -1).reshape(27, 3)


def hash_grid_knn(
    query: jax.Array,
    grid: HashGrid,
    radius: jax.Array | float,
    k: int = 1,
    *,
    cap: int = 32,
    query_block: int = 8192,
    exclude_self: bool = False,
    use_pallas: bool | None = None,
    window: int = 32768,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """k nearest reference points within ``radius`` of each query.

    Requires ``grid.cell >= radius`` (guaranteed when the grid was built
    with ``cell=radius``; the builder only ever grows the edge).

    On TPU the window-DMA Pallas kernel
    (:mod:`fusion4landslide_tpu.ops.hashgrid_pallas`) runs by default; when
    any query block's candidate window exceeds ``window`` the call falls
    back to the gather-based XLA path, which is exact for any density.

    Returns:
        sqdist: (n, k) ascending squared distances (+inf past radius/cap).
        idx: (n, k) original reference indices (0 where invalid).
        overflow: () int32 — number of truncated cell runs observed.
    """
    if use_pallas is None:
        from fusion4landslide_tpu.ops.knn_pallas import pallas_available

        use_pallas = k <= 32 and pallas_available()
    if use_pallas:
        from fusion4landslide_tpu.ops.hashgrid_pallas import (
            hash_grid_knn_window,
        )
        from fusion4landslide_tpu.ops.segments import bucket_size

        # Bucket the query count: the window kernel compiles per padded
        # query shape, and call sites pass wildly varying counts (per-tile
        # clouds, per-tile assigned subsets). Padded queries ride along and
        # are sliced off.
        n = query.shape[0]
        nb = bucket_size(n)
        qp = jnp.pad(query, ((0, nb - n), (0, 0))) if nb != n else query
        d, i, ov = hash_grid_knn_window(
            qp, grid, radius, k, window=window, exclude_self=exclude_self
        )
        d = d[:n]
        i = i[:n]
        if isinstance(ov, jax.core.Tracer):
            # Under an outer jit the overflow count can't gate a Python
            # branch — trust the configured window (callers can check ov).
            return d, i, ov
        if int(ov) == 0:
            return d, i, ov
    return _hash_grid_knn_xla(
        query,
        grid,
        radius,
        k,
        cap=cap,
        query_block=query_block,
        exclude_self=exclude_self,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "cap", "query_block", "exclude_self")
)
def _hash_grid_knn_xla(
    query: jax.Array,
    grid: HashGrid,
    radius: jax.Array | float,
    k: int = 1,
    *,
    cap: int = 32,
    query_block: int = 8192,
    exclude_self: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gather-based XLA grid join (CPU path + overflow fallback)."""
    n = query.shape[0]
    m = grid.points.shape[0]
    radius = jnp.asarray(radius, query.dtype)
    offsets = _neighbor_offsets()  # (27, 3)
    dims = grid.dims

    # Sort queries by cell id for coherent candidate access.
    qcell_all = jnp.clip(
        jnp.floor((query - grid.origin) / grid.cell).astype(jnp.int32),
        0,
        dims - 1,
    )
    qlin = (qcell_all[:, 0] * dims[1] + qcell_all[:, 1]) * dims[2] + qcell_all[:, 2]
    qorder = jnp.argsort(qlin)
    q_sorted = jnp.take(query, qorder, axis=0)
    qcell_sorted = jnp.take(qcell_all, qorder, axis=0)
    qrows_sorted = qorder.astype(jnp.int32)

    nb = -(-n // query_block)
    n_pad = nb * query_block
    qp = jnp.pad(q_sorted, ((0, n_pad - n), (0, 0)))
    qc = jnp.pad(qcell_sorted, ((0, n_pad - n), (0, 0)))
    qr = jnp.pad(qrows_sorted, (0, n_pad - n))

    def one_block(args):
        q, qcell, rows = args  # (B, 3), (B, 3), (B,)
        B = q.shape[0]
        nc = qcell[:, None, :] + offsets[None, :, :]  # (B, 27, 3)
        in_grid = jnp.all((nc >= 0) & (nc < dims[None, None, :]), axis=-1)
        ncl = jnp.clip(nc, 0, dims - 1)
        nlin = (ncl[..., 0] * dims[1] + ncl[..., 1]) * dims[2] + ncl[..., 2]
        start = jnp.take(grid.starts, nlin)  # (B, 27)
        end = jnp.take(grid.starts, nlin + 1)
        start = jnp.where(in_grid, start, 0)
        end = jnp.where(in_grid, end, 0)
        run_over = jnp.sum((end - start > cap).astype(jnp.int32))

        lane = jnp.arange(cap)
        pos = (start[..., None] + lane).reshape(B, 27 * cap)
        valid = pos < jnp.repeat(end, cap, axis=1)
        pos_c = jnp.clip(pos, 0, m - 1)
        # Per-coordinate distance planes (no (...,3) minor axis).
        d2 = None
        for d in range(3):
            cd = jnp.take(grid.points[:, d], pos_c) - q[:, None, d]
            d2 = cd * cd if d2 is None else d2 + cd * cd
        cand_idx = jnp.take(grid.index, pos_c)
        bad = ~valid | (d2 > radius * radius)
        if exclude_self:
            bad = bad | (cand_idx == rows[:, None])
        d2 = jnp.where(bad, jnp.inf, d2)
        if k == 1:
            best = jnp.argmin(d2, axis=1)
            best_d = jnp.take_along_axis(d2, best[:, None], axis=1)
            best_i = jnp.take_along_axis(cand_idx, best[:, None], axis=1)
        else:
            neg, sel = jax.lax.top_k(-d2, k)
            best_d = -neg
            best_i = jnp.take_along_axis(cand_idx, sel, axis=1)
        best_i = jnp.where(jnp.isfinite(best_d), best_i, 0)
        return best_d, best_i, run_over

    if nb == 1:
        d, i, ov = one_block((qp, qc, qr))
    else:
        d, i, ov = jax.lax.map(
            one_block,
            (
                qp.reshape(nb, query_block, 3),
                qc.reshape(nb, query_block, 3),
                qr.reshape(nb, query_block),
            ),
        )
        d = d.reshape(n_pad, k)
        i = i.reshape(n_pad, k)
        ov = jnp.sum(ov)
    # Scatter back to original query order.
    d_out = jnp.zeros((n, k), d.dtype).at[qorder].set(d[:n])
    i_out = jnp.zeros((n, k), i.dtype).at[qorder].set(i[:n])
    return d_out, i_out, ov


# ---------------------------------------------------------------------------
# Fully-traced variants (traced radii, no host round trips): these power the
# device-resident tile steps (pipelines.*_device) where every per-tile scalar
# — median resolution, patch radius, search bounds — is a tracer, so the
# eager doubling loops and the Pallas kernels (concrete cell sizes) above are
# unavailable. The grid build + join are already pure XLA; what follows wraps
# them in lax.while_loop radius growth and a hash-priority sampler, replacing
# the O(N·M) blocked brute-force fallbacks that capped sharded fusion tiles
# at ~64k points.
# ---------------------------------------------------------------------------


def _masked_median(vals: jax.Array, valid: jax.Array) -> jax.Array:
    s = jnp.sort(jnp.where(valid, vals, jnp.inf))
    cnt = jnp.sum(valid)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = jnp.maximum(cnt // 2, 0)
    return 0.5 * (jnp.take(s, lo) + jnp.take(s, hi))


def _density_radius(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Initial search radius from the horizontal bounding-box density
    (matches the eager paths' 4*sqrt(area/n) heuristic)."""
    big = jnp.asarray(3e38, points.dtype)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    ext = jnp.maximum(hi - lo, 0.0)
    area = jnp.maximum(ext[0], 1e-9) * jnp.maximum(ext[1], 1e-9)
    cnt = jnp.maximum(jnp.sum(valid), 1)
    return 4.0 * jnp.sqrt(area / cnt)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "cap", "query_block", "exclude_self", "max_doublings"
    ),
)
def knn_grid_traced(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    r0: jax.Array | float | None = None,
    ref_mask: jax.Array | None = None,
    query_mask: jax.Array | None = None,
    *,
    r_max: jax.Array | float | None = None,
    cap: int = 48,
    query_block: int = 4096,
    exclude_self: bool = False,
    max_doublings: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Radius-growing grid kNN, fully traceable (traced ``r0``/``r_max``).

    Doubles the search radius from ``r0`` (default: bounding-box density
    estimate) until every unmasked query has k in-radius neighbours, the
    radius exceeds ``r_max``, or ``max_doublings`` attempts ran. Queries
    finished in an earlier (smaller-radius, finer-grid) attempt keep that
    attempt's result. Neighbours are exact within the attempt radius while
    cell occupancy stays within ``cap``.

    Returns (sqdist (n, k), idx (n, k)); unfound slots are +inf / 0.
    """
    n = query.shape[0]
    qv = (
        jnp.ones((n,), bool)
        if query_mask is None
        else jnp.asarray(query_mask).astype(bool)
    )
    rv = (
        jnp.ones((ref.shape[0],), bool)
        if ref_mask is None
        else jnp.asarray(ref_mask).astype(bool)
    )
    if r0 is None:
        r0 = _density_radius(ref, rv)
    r0 = jnp.asarray(r0, query.dtype)
    rmaxv = (
        jnp.asarray(jnp.inf, query.dtype)
        if r_max is None
        else jnp.asarray(r_max, query.dtype)
    )
    # Guarantee the first attempt runs even when the density estimate
    # exceeds the caller's bound.
    r0 = jnp.minimum(r0, rmaxv)

    def cond(state):
        radius, best_d, best_i, it = state
        unfinished = qv & ~jnp.isfinite(best_d[:, k - 1])
        return jnp.any(unfinished) & (it < max_doublings) & (radius <= rmaxv)

    def body(state):
        radius, best_d, best_i, it = state
        grid = build_hash_grid(ref, radius, rv)
        # hash_grid_knn auto-selects the Pallas window kernel on TPU
        # (runtime radius; under trace the overflow check is deferred and
        # the configured window is trusted) and the XLA join elsewhere.
        d, i, _ = hash_grid_knn(
            query, grid, radius, k,
            cap=cap, query_block=query_block, exclude_self=exclude_self,
        )
        done = jnp.isfinite(best_d[:, k - 1])
        best_d = jnp.where(done[:, None], best_d, d)
        best_i = jnp.where(done[:, None], best_i, i)
        return (radius * 2.0, best_d, best_i, it + 1)

    init = (
        r0,
        jnp.full((n, k), jnp.inf, query.dtype),
        jnp.zeros((n, k), jnp.int32),
        jnp.int32(0),
    )
    _, best_d, best_i, _ = jax.lax.while_loop(cond, body, init)
    return best_d, best_i


@functools.partial(
    jax.jit, static_argnames=("cap", "query_block", "max_doublings")
)
def median_nn_distance_traced(
    points: jax.Array,
    mask: jax.Array | None = None,
    *,
    cap: int = 48,
    query_block: int = 8192,
    max_doublings: int = 8,
) -> jax.Array:
    """Median nearest-other-point distance, fully traceable.

    Same exactness argument as :func:`ops.knn.median_nn_distance`: the
    radius doubles until over half the points found an in-radius
    neighbour; every distance below the median has then been found
    exactly, so the masked median is exact.
    """
    n = points.shape[0]
    valid = (
        jnp.ones((n,), bool)
        if mask is None
        else jnp.asarray(mask).astype(bool)
    )
    cnt = jnp.maximum(jnp.sum(valid), 1)
    r0 = _density_radius(points, valid)

    def cond(state):
        radius, med, found, it = state
        return (2 * found <= cnt) & (it < max_doublings)

    def body(state):
        radius, med, found, it = state
        grid = build_hash_grid(points, radius, valid)
        d, _, _ = hash_grid_knn(
            points, grid, radius, 1,
            cap=cap, query_block=query_block, exclude_self=True,
        )
        dd = jnp.sqrt(d[:, 0])
        ok = valid & jnp.isfinite(dd)
        med = _masked_median(dd, ok)
        return (radius * 2.0, med, jnp.sum(ok), it + 1)

    init = (r0, jnp.asarray(jnp.inf, points.dtype), jnp.int32(0), jnp.int32(0))
    _, med, _, _ = jax.lax.while_loop(cond, body, init)
    return med


@functools.partial(
    jax.jit, static_argnames=("num_samples", "cap", "query_block", "priority")
)
def radius_sample_grid(
    query: jax.Array,
    grid: HashGrid,
    radius: jax.Array | float,
    seed: jax.Array | int,
    *,
    num_samples: int = 256,
    cap: int = 64,
    query_block: int = 2048,
    priority: str = "random",
) -> tuple[jax.Array, jax.Array]:
    """In-radius sample per query, fully traceable.

    Traced counterpart of the Pallas window sampler
    (:func:`ops.hashgrid_pallas.radius_sample_window`) with the same
    semantics: ``priority='random'`` draws uniform priorities from an
    integer hash of (point index, seed); ``priority='distance'`` keeps the
    nearest candidates. The query point itself is excluded by the
    ``d² > r²·1e-6`` test and the ``num_samples`` smallest priorities are
    kept. Each of the 27 neighbour cells contributes at most ``cap`` run
    entries; pre-shuffle the reference cloud for unbiased samples where
    occupancy exceeds ``cap``.

    Returns:
        coords: (n, num_samples, 3) sampled reference coordinates (0 pad).
        valid: (n, num_samples) bool.
    """
    n = query.shape[0]
    m = grid.points.shape[0]
    radius = jnp.asarray(radius, query.dtype)
    r2 = radius * radius
    seed = jnp.asarray(seed, jnp.uint32)
    offsets = _neighbor_offsets()
    dims = grid.dims

    qcell_all = jnp.clip(
        jnp.floor((query - grid.origin) / grid.cell).astype(jnp.int32),
        0,
        dims - 1,
    )
    qlin = (
        qcell_all[:, 0] * dims[1] + qcell_all[:, 1]
    ) * dims[2] + qcell_all[:, 2]
    qorder = jnp.argsort(qlin)
    q_sorted = jnp.take(query, qorder, axis=0)
    qcell_sorted = jnp.take(qcell_all, qorder, axis=0)

    nb = -(-n // query_block)
    n_pad = nb * query_block
    qp = jnp.pad(q_sorted, ((0, n_pad - n), (0, 0)))
    qc = jnp.pad(qcell_sorted, ((0, n_pad - n), (0, 0)))

    def one_block(args):
        q, qcell = args  # (B, 3), (B, 3)
        B = q.shape[0]
        nc = qcell[:, None, :] + offsets[None, :, :]
        in_grid = jnp.all((nc >= 0) & (nc < dims[None, None, :]), axis=-1)
        ncl = jnp.clip(nc, 0, dims - 1)
        nlin = (ncl[..., 0] * dims[1] + ncl[..., 1]) * dims[2] + ncl[..., 2]
        start = jnp.where(in_grid, jnp.take(grid.starts, nlin), 0)
        end = jnp.where(in_grid, jnp.take(grid.starts, nlin + 1), 0)
        lane = jnp.arange(cap)
        pos = (start[..., None] + lane).reshape(B, 27 * cap)
        in_run = pos < jnp.repeat(end, cap, axis=1)
        pos_c = jnp.clip(pos, 0, m - 1)
        d2 = None
        for d in range(3):
            cd = jnp.take(grid.points[:, d], pos_c) - q[:, None, d]
            d2 = cd * cd if d2 is None else d2 + cd * cd
        if priority == "distance":
            pri = d2
        else:
            # Uniform [0,1) priority per candidate point (same integer hash
            # as the Pallas sampler, backend-independent and reproducible).
            cand_idx = jnp.take(grid.index, pos_c)
            x = cand_idx.astype(jnp.uint32) * jnp.uint32(2654435761) + seed
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x45D9F3B)
            x = x ^ (x >> 16)
            pri = (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        keep = in_run & (d2 <= r2) & (d2 > r2 * 1e-6)
        keyed = jnp.where(keep, pri, jnp.inf)
        neg, sel = jax.lax.top_k(-keyed, num_samples)
        sel_valid = jnp.isfinite(neg)
        coords = jnp.stack(
            [
                jnp.take_along_axis(
                    jnp.take(grid.points[:, d], pos_c), sel, axis=1
                )
                for d in range(3)
            ],
            axis=-1,
        )
        return jnp.where(sel_valid[..., None], coords, 0.0), sel_valid

    if nb == 1:
        coords, valid = one_block((qp, qc))
    else:
        coords, valid = jax.lax.map(
            one_block,
            (qp.reshape(nb, query_block, 3), qc.reshape(nb, query_block, 3)),
        )
        coords = coords.reshape(n_pad, num_samples, 3)
        valid = valid.reshape(n_pad, num_samples)
    out_c = jnp.zeros((n, num_samples, 3), coords.dtype).at[qorder].set(
        coords[:n]
    )
    out_v = jnp.zeros((n, num_samples), bool).at[qorder].set(valid[:n])
    return out_c, out_v


def nn1_spatial(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array | None = None,
    *,
    max_doublings: int = 12,
) -> tuple[jax.Array, jax.Array]:
    """Unbounded spatial 1-NN via the grid join with radius growth.

    Drop-in for ``ops.knn.nn1`` on 3-d coordinates (O(n^2) brute force at
    tile scale): starts from the bounding-box density radius and doubles
    until every query found a neighbour. Returns ((n,) sqdist, (n,) idx);
    queries left unmatched after ``max_doublings`` (only possible for an
    empty/masked reference) get +inf / 0.
    """
    import numpy as np

    n = query.shape[0]
    valid = (
        jnp.ones((ref.shape[0],), bool)
        if ref_mask is None
        else jnp.asarray(ref_mask).astype(bool)
    )
    lo = jnp.min(jnp.where(valid[:, None], ref, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], ref, -jnp.inf), axis=0)
    ext, m_valid = jax.device_get((hi - lo, jnp.sum(valid.astype(jnp.int32))))
    m_valid = int(m_valid)
    if m_valid == 0:
        return jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32)
    area = float(max(ext[0], 1e-9) * max(ext[1], 1e-9))
    radius = 4.0 * float(np.sqrt(area / m_valid))

    best_d = jnp.full((n,), jnp.inf, jnp.float32)
    best_i = jnp.zeros((n,), jnp.int32)
    for _ in range(max_doublings):
        grid = build_hash_grid(ref, radius, ref_mask)
        d, i, _ = hash_grid_knn(query, grid, radius, 1)
        found_new = jnp.isfinite(d[:, 0]) & ~jnp.isfinite(best_d)
        best_d = jnp.where(found_new, d[:, 0], best_d)
        best_i = jnp.where(found_new, i[:, 0], best_i)
        n_missing = int(jax.device_get(jnp.sum(~jnp.isfinite(best_d))))
        if n_missing == 0:
            break
        radius *= 2.0
    return best_d, best_i
