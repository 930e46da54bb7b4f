"""Pallas TPU kernel: grid-join spatial kNN by contiguous window DMA.

The XLA ``hash_grid_knn`` path expresses the cell join as random gathers of
up to 27·cap candidates per query — correct, but TPU random-gather
throughput makes it ~50x slower than the arithmetic it feeds. This kernel
re-designs the join around the machine:

- queries are sorted by grid cell (as in the XLA path), so each block of
  ``B`` consecutive queries touches a *contiguous* run of the cell-sorted
  reference array: ``[starts[linear(cmin-1)], starts[linear(cmax+1)+1])``
  (the linear cell id is monotone under componentwise cell order),
- that window is DMA'd into VMEM as one contiguous copy — no gathers,
- candidates are scored against the whole block with ONE ``(B, 8) x (8, W)``
  MXU matmul: the reference array is packed as rows ``[x, y, z, |r|^2]``
  and each query as ``[-2qx, -2qy, -2qz, 1]``, so the product is directly
  ``|r|^2 - 2 q.r`` (rank-preserving partial distance; ``|q|^2`` is added
  at extraction),
- per-lane bubble top-k + cross-lane extraction as in
  :mod:`fusion4landslide_tpu.ops.knn_pallas`.

Exactness: the window is a superset of the 27-cell neighbourhood, and the
ball of ``radius <= cell`` lies inside those 27 cells, so after the radius
filter the result is exactly "k nearest within radius". Masked/padded
reference rows carry ``|r|^2 = +inf`` and can never win. Blocks whose true
window exceeds the static ``W`` are counted in ``overflow`` (the public
wrapper falls back to the XLA path when that happens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hash_grid_knn_window", "radius_sample_window"]

_LANES = 128


def _grid_knn_kernel(
    wmeta_ref,  # scalar prefetch: (2, nb) i32 [start (aligned); len] —
    # transposed so SMEM stores 2 lane-padded rows, not nb (Mosaic pads
    # every SMEM row to 128 lanes: (nb, 2) would burn 512 B per block and
    # overflow the 1 MB SMEM past ~2k grid steps; a 2M-pt bucket has 4096)
    qmat_ref,  # (B, 8) f32: [-2x, -2y, -2z, 1, row_id, 0, 0, 0]
    refpack_ref,  # (8, m_pad) f32 in HBM: rows [x, y, z, |r|^2, 0...]
    idx_ref,  # (1, m_pad) i32 original ref indices, cell-sorted order
    out_d_ref,  # (B, k) f32
    out_i_ref,  # (B, k) i32
    refw,  # scratch (8, W) f32
    idxw,  # scratch (1, W) i32
    sems,  # DMA semaphores (2,)
    *,
    k: int,
    w_size: int,
    chunk: int,
    exclude_self: bool,
):
    i = pl.program_id(0)
    B = qmat_ref.shape[0]
    w_lo = pl.multiple_of(wmeta_ref[0, i], _LANES)
    w_len = wmeta_ref[1, i]

    cp1 = pltpu.make_async_copy(
        refpack_ref.at[:, pl.ds(w_lo, w_size)], refw, sems.at[0]
    )
    cp2 = pltpu.make_async_copy(
        idx_ref.at[:, pl.ds(w_lo, w_size)], idxw, sems.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    qmat = qmat_ref[:, :]
    # Row ids ride the qmat payload as exact-in-f32 integers (row 4).
    qrow = qmat[:, 4].astype(jnp.int32)  # (B,)

    sd0 = tuple(jnp.full((B, _LANES), jnp.inf, jnp.float32) for _ in range(k))
    si0 = tuple(jnp.zeros((B, _LANES), jnp.int32) for _ in range(k))

    def do_chunk(c, state):
        sd = list(state[:k])
        si = list(state[k:])
        score = jax.lax.dot_general(
            qmat,
            refw[:, c * chunk : (c + 1) * chunk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, chunk)
        for g in range(chunk // _LANES):
            sl = slice(c * chunk + g * _LANES, c * chunk + (g + 1) * _LANES)
            v_i = jnp.broadcast_to(idxw[0, sl][None, :], (B, _LANES))
            v_d = score[:, g * _LANES : (g + 1) * _LANES]
            if exclude_self:
                v_d = jnp.where(v_i == qrow[:, None], jnp.inf, v_d)
            for layer in range(k):
                old_d, old_i = sd[layer], si[layer]
                take = v_d < old_d
                sd[layer] = jnp.where(take, v_d, old_d)
                si[layer] = jnp.where(take, v_i, old_i)
                v_d = jnp.where(take, old_d, v_d)
                v_i = jnp.where(take, old_i, v_i)
        return tuple(sd) + tuple(si)

    state = sd0 + si0
    # Chunks past the block's true window hold points of farther cells that
    # can never be within radius — skip their compute entirely.
    for c in range(w_size // chunk):
        state = jax.lax.cond(
            c * chunk < w_len,
            functools.partial(do_chunk, c),
            lambda s: s,
            state,
        )
    sd, si = state[:k], state[k:]

    flat_d = jnp.concatenate([sd[layer] for layer in range(k)], axis=1)
    flat_i = jnp.concatenate([si[layer] for layer in range(k)], axis=1)
    q2 = 0.25 * jnp.sum(qmat[:, :3] * qmat[:, :3], axis=1, keepdims=True)
    cols_d, cols_i = [], []
    for _ in range(k):
        m = jnp.min(flat_d, axis=1, keepdims=True)
        cand = jnp.where(flat_d == m, flat_i, jnp.iinfo(jnp.int32).max)
        sel = jnp.min(cand, axis=1, keepdims=True)
        cols_d.append(jnp.maximum(m + q2, 0.0))
        cols_i.append(sel)
        flat_d = jnp.where((flat_d == m) & (flat_i == sel), jnp.inf, flat_d)
    out_d_ref[:, :] = jnp.concatenate(cols_d, axis=1)
    out_i_ref[:, :] = jnp.concatenate(cols_i, axis=1)


def _window_prologue(query, grid, block: int, window: int):
    """Shared window construction: sort queries by linear cell id, derive
    per-block contiguous candidate windows from componentwise cell bounds
    (the linear id is monotone under componentwise order), and pack the
    cell-sorted reference as matmul-ready rows ``[x, y, z, |r|^2, 0...]``
    with ``+inf |r|^2`` on the masked/padded tail."""
    n = query.shape[0]
    m = grid.points.shape[0]
    dims = grid.dims

    qcell = jnp.clip(
        jnp.floor((query - grid.origin) / grid.cell).astype(jnp.int32),
        0,
        dims - 1,
    )
    qlin = (qcell[:, 0] * dims[1] + qcell[:, 1]) * dims[2] + qcell[:, 2]
    qorder = jnp.argsort(qlin)
    q_sorted = jnp.take(query, qorder, axis=0).astype(jnp.float32)
    qcell_sorted = jnp.take(qcell, qorder, axis=0)

    nb = -(-max(n, 1) // block)
    n_pad = nb * block
    pad = n_pad - n
    # Pad with the last real query so padded rows share its (valid) window.
    if pad:
        q_sorted = jnp.concatenate(
            [q_sorted, jnp.broadcast_to(q_sorted[-1:], (pad, 3))]
        )
        qcell_sorted = jnp.concatenate(
            [qcell_sorted, jnp.broadcast_to(qcell_sorted[-1:], (pad, 3))]
        )

    cblk = qcell_sorted.reshape(nb, block, 3)
    cmin = jnp.clip(jnp.min(cblk, axis=1) - 1, 0, dims - 1)
    cmax = jnp.clip(jnp.max(cblk, axis=1) + 1, 0, dims - 1)
    lin_lo = (cmin[:, 0] * dims[1] + cmin[:, 1]) * dims[2] + cmin[:, 2]
    lin_hi = (cmax[:, 0] * dims[1] + cmax[:, 1]) * dims[2] + cmax[:, 2]
    w_lo = jnp.take(grid.starts, lin_lo)
    w_hi = jnp.take(grid.starts, lin_hi + 1)
    w_lo_al = (w_lo // _LANES) * _LANES
    w_len = w_hi - w_lo_al
    overflow = jnp.sum((w_len > window).astype(jnp.int32))

    m_pad = (-(-max(m, 1) // _LANES)) * _LANES + window
    r2 = jnp.sum(grid.points * grid.points, axis=1)
    r2 = jnp.where(jnp.arange(m) < grid.m_valid, r2, jnp.inf)
    refpack = jnp.zeros((8, m_pad), jnp.float32)
    refpack = refpack.at[0:3, :m].set(grid.points.T.astype(jnp.float32))
    refpack = refpack.at[3, :m].set(r2)
    refpack = refpack.at[3, m:].set(jnp.inf)
    idxarr = jnp.zeros((1, m_pad), jnp.int32).at[0, :m].set(grid.index)
    # (2, nb): row 0 = aligned window starts, row 1 = lengths. Transposed
    # on purpose — Mosaic pads every SMEM row to 128 lanes, so the
    # prefetched array must keep nb in the LANE dimension.
    w_lo_al = jnp.minimum(w_lo_al, m_pad - window)
    wmeta = jnp.stack([w_lo_al, jnp.minimum(w_len, window)], axis=0)

    qrows = jnp.pad(qorder.astype(jnp.int32), (0, pad), constant_values=-1)
    qmat = jnp.concatenate(
        [
            -2.0 * q_sorted,
            jnp.ones((n_pad, 1), jnp.float32),
            qrows[:, None].astype(jnp.float32),
            jnp.zeros((n_pad, 3), jnp.float32),
        ],
        axis=1,
    )
    return qorder, qmat, wmeta, refpack, idxarr, overflow, nb, n_pad


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "window", "chunk", "exclude_self", "interpret"),
)
def hash_grid_knn_window(
    query: jax.Array,
    grid,  # HashGrid (ops.hashgrid)
    radius: jax.Array | float,
    k: int = 1,
    *,
    block: int = 512,
    window: int = 32768,
    chunk: int = 2048,
    exclude_self: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas window-DMA grid kNN. Same contract as ``hash_grid_knn``:
    ((n, k) sq-distances ascending, +inf past radius; (n, k) ref indices,
    0 where invalid; overflow count — results are only exact for blocks
    whose candidate window fit, so retry with a larger ``window`` or the
    XLA path when overflow > 0)."""
    n = query.shape[0]
    radius = jnp.asarray(radius, jnp.float32)
    (qorder, qmat, wmeta, refpack, idxarr, overflow, nb, n_pad) = (
        _window_prologue(query, grid, block, window)
    )

    kern = functools.partial(
        _grid_knn_kernel,
        k=k,
        w_size=window,
        chunk=chunk,
        exclude_self=exclude_self,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((block, k), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.VMEM((1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * window * 8,
            bytes_accessed=4 * (nb * window * 9 + n_pad * (8 + 2 * k)),
            transcendentals=0,
        ),
    )(
        wmeta,
        qmat,
        refpack,
        idxarr,
    )

    # Radius filter + unsort.
    bad = out_d > radius * radius
    out_d = jnp.where(bad, jnp.inf, out_d)
    out_i = jnp.where(bad | ~jnp.isfinite(out_d), 0, out_i)
    d_out = jnp.zeros((n, k), jnp.float32).at[qorder].set(out_d[:n])
    i_out = jnp.zeros((n, k), jnp.int32).at[qorder].set(out_i[:n])
    return d_out, i_out, overflow


def _radius_sample_kernel(
    wmeta_ref,  # scalar prefetch: (2, nb) i32 (see _grid_knn_kernel)
    qmat_ref,  # (B, 8) f32: [-2x, -2y, -2z, 1, row_id, r^2, 0, 0]
    refpack_ref,  # (8, m_pad) f32 in HBM
    idx_ref,  # (1, m_pad) i32
    out_i_ref,  # (B, num_points) i32
    out_v_ref,  # (B, num_points) i32 (1 = valid)
    out_x_ref,  # (B, 3, num_points) f32 sampled coordinates
    refw,
    idxw,
    sems,
    *,
    layers: int,
    w_size: int,
    chunk: int,
    seed: int,
    priority: str,
):
    i = pl.program_id(0)
    B = qmat_ref.shape[0]
    w_lo = pl.multiple_of(wmeta_ref[0, i], _LANES)
    w_len = wmeta_ref[1, i]

    cp1 = pltpu.make_async_copy(
        refpack_ref.at[:, pl.ds(w_lo, w_size)], refw, sems.at[0]
    )
    cp2 = pltpu.make_async_copy(
        idx_ref.at[:, pl.ds(w_lo, w_size)], idxw, sems.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    qmat = qmat_ref[:, :]
    # Per-query r^2 rides the qmat payload (column 5) so the radius is a
    # RUNTIME value — one compiled kernel serves every tile radius (the
    # old compile-time r2_thresh forced radius quantization and a Mosaic
    # recompile per radius bucket).
    r2q = qmat[:, 5:6]  # (B, 1)
    # Recover raw query coordinates (qmat rows are -2x,-2y,-2z) and centre
    # the whole block locally: squared-distance cancellation error then
    # scales with the window extent (a few cells), not the cloud extent —
    # this keeps the radius test and the self-exclusion test sharp.
    qpos = -0.5 * qmat[:, :3]  # (B, 3)
    cen = jnp.mean(qpos, axis=0, keepdims=True)  # (1, 3)
    qc = qpos - cen
    qcm2 = -2.0 * qc  # (B, 3)
    qc2 = jnp.sum(qc * qc, axis=1, keepdims=True)  # (B, 1)

    sk0 = tuple(jnp.full((B, _LANES), jnp.inf, jnp.float32) for _ in range(layers))
    si0 = tuple(jnp.zeros((B, _LANES), jnp.int32) for _ in range(layers))
    sx0 = tuple(
        jnp.zeros((B, _LANES), jnp.float32) for _ in range(3 * layers)
    )

    def do_chunk(c, state):
        sk = list(state[:layers])
        si = list(state[layers : 2 * layers])
        sx = list(state[2 * layers :])
        refc = refw[0:3, c * chunk : (c + 1) * chunk] - cen.T  # (3, chunk)
        r2w = jnp.sum(refc * refc, axis=0, keepdims=True)  # (1, chunk)
        finite = refw[3:4, c * chunk : (c + 1) * chunk] < jnp.inf
        score = (
            jax.lax.dot_general(
                qcm2,
                refc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + r2w
        )
        dist2 = score + qc2  # (B, chunk) true squared distance
        if priority == "distance":
            # Nearest-per-lane mode: keeps the `layers` closest candidates
            # in each lane stratum (consecutive window positions map to
            # distinct lanes, so a contiguous run of near points — the
            # common case after cell sorting — is captured exactly).
            pri = dist2
        else:
            # Uniform [0, 1) random priority per candidate point: keeping
            # the `layers` smallest priorities per lane draws a
            # (lane-stratified) uniform random subset of the in-radius
            # candidates. An integer hash of (point index, seed) is
            # backend-independent (the TPU PRNG has no interpret-mode
            # lowering) and reproducible.
            cand = idxw[0, c * chunk : (c + 1) * chunk][None, :]  # (1, chunk)
            x = cand.astype(jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(
                seed & 0xFFFFFFFF
            )
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x45D9F3B)
            x = x ^ (x >> 16)
            # uint32 -> f32 casts are unsupported on Mosaic; the top-24-bit
            # value fits int32, which casts fine.
            x24 = pltpu.bitcast(x >> 8, jnp.int32)
            pri = jnp.broadcast_to(
                x24.astype(jnp.float32) * (1.0 / (1 << 24)), score.shape
            )
        # Exclude the query point itself (distance ~ 0), matching the
        # reference's drop of the self index (src/data_loader.py:46-53);
        # the locally-centred dist2 resolves ~1e-3 radii cleanly.
        keyed = jnp.where(
            (dist2 <= r2q) & (dist2 > r2q * 1e-6) & finite,
            pri,
            jnp.inf,
        )
        for g in range(chunk // _LANES):
            sl = slice(c * chunk + g * _LANES, c * chunk + (g + 1) * _LANES)
            v_k = keyed[:, g * _LANES : (g + 1) * _LANES]
            v_i = jnp.broadcast_to(idxw[0, sl][None, :], (B, _LANES))
            # Carry the candidate's (original) coordinates through the
            # bubble so the caller never has to gather them from HBM.
            v_c = [
                jnp.broadcast_to(refw[d, sl][None, :], (B, _LANES))
                for d in range(3)
            ]
            for layer in range(layers):
                old_k, old_i = sk[layer], si[layer]
                take = v_k < old_k
                sk[layer] = jnp.where(take, v_k, old_k)
                si[layer] = jnp.where(take, v_i, old_i)
                v_k = jnp.where(take, old_k, v_k)
                v_i = jnp.where(take, old_i, v_i)
                for d in range(3):
                    old_x = sx[3 * layer + d]
                    sx[3 * layer + d] = jnp.where(take, v_c[d], old_x)
                    v_c[d] = jnp.where(take, old_x, v_c[d])
        return tuple(sk) + tuple(si) + tuple(sx)

    state = sk0 + si0 + sx0
    for c in range(w_size // chunk):
        state = jax.lax.cond(
            c * chunk < w_len,
            functools.partial(do_chunk, c),
            lambda s: s,
            state,
        )
    sk = state[:layers]
    si = state[layers : 2 * layers]
    sx = state[2 * layers :]
    out_i_ref[:, :] = jnp.concatenate(
        [si[layer] for layer in range(layers)], axis=1
    )
    out_v_ref[:, :] = jnp.concatenate(
        [jnp.isfinite(sk[layer]).astype(jnp.int32) for layer in range(layers)],
        axis=1,
    )
    for d in range(3):
        out_x_ref[:, d, :] = jnp.concatenate(
            [sx[3 * layer + d] for layer in range(layers)], axis=1
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_points", "seed", "block", "window", "chunk",
        "priority", "interpret",
    ),
)
def radius_sample_window(
    query: jax.Array,
    grid,  # HashGrid
    radius: jax.Array | float,
    num_points: int = 256,
    seed: int = 0,
    *,
    block: int = 512,
    window: int = 32768,
    chunk: int = 2048,
    priority: str = "random",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Subsample of in-radius neighbours per query.

    ``radius`` is a RUNTIME value (float or traced scalar): it rides the
    per-query kernel payload, so one compiled kernel serves every tile
    radius and the fully-traced device tile steps can call this directly.

    ``priority='random'`` draws a uniform random subset (LRF patches);
    ``priority='distance'`` keeps the lane-stratified *nearest* candidates
    (approximate kNN-graph construction; a contiguous run of near points
    lands in distinct lanes, so local neighbourhoods are captured well).
    The query point itself (distance ~0) is always excluded.

    Replaces the reference's Open3D radius search + np.random.choice
    (src/data_loader.py:44,101-106): each query draws up to ``num_points``
    uniformly random in-radius support points (lane-stratified reservoir
    over the candidate window; the query point itself is excluded).

    Returns:
        idx: (n, num_points) indices into the grid's original ref array.
        valid: (n, num_points) bool.
        xyz: (n, num_points, 3) sampled coordinates (no HBM gather needed).
        overflow: () int32 — blocks whose candidate window was truncated.
    """
    if num_points % _LANES:
        raise ValueError(f"num_points must be a multiple of {_LANES}")
    n = query.shape[0]
    layers = num_points // _LANES
    (qorder, qmat, wmeta, refpack, idxarr, overflow, nb, n_pad) = (
        _window_prologue(query, grid, block, window)
    )
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    qmat = qmat.at[:, 5].set(r2)

    kern = functools.partial(
        _radius_sample_kernel,
        layers=layers,
        w_size=window,
        chunk=chunk,
        seed=seed,
        priority=priority,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block, num_points), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block, num_points), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block, 3, num_points),
                lambda i, s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.VMEM((1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_i, out_v, out_x = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, num_points), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, num_points), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 3, num_points), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * window * 8,
            bytes_accessed=4 * (nb * window * 9 + n_pad * (8 + 5 * num_points)),
            transcendentals=0,
        ),
    )(
        wmeta,
        qmat,
        refpack,
        idxarr,
    )
    i_out = (
        jnp.zeros((n, num_points), jnp.int32).at[qorder].set(out_i[:n])
    )
    v_out = (
        jnp.zeros((n, num_points), jnp.int32).at[qorder].set(out_v[:n])
    )
    x_out = (
        jnp.zeros((n, 3, num_points), jnp.float32)
        .at[qorder]
        .set(out_x[:n])
        .swapaxes(1, 2)  # (n, num_points, 3)
    )
    return i_out, v_out.astype(bool), x_out, overflow


def quantize_radius(radius: float, step: float = 1.02) -> float:
    """Quantize a radius to a geometric grid (2% steps by default).

    OBSOLETE for the window kernels: the sampler now takes the radius as a
    runtime per-query payload value, so one compiled kernel serves every
    tile radius. Kept for callers that want reproducible radius buckets
    for other caching purposes.
    """
    import math

    r = float(radius)
    if r <= 0:
        return r
    return float(step ** round(math.log(r) / math.log(step)))
