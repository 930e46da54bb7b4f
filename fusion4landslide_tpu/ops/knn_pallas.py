"""Pallas TPU kernel: blocked brute-force k-NN in feature space.

The single hottest op of the framework — every pipeline's correspondence
search is a kNN (reference engines: hnswlib src/f2s3.py:273-281, faiss /
chunked torch.cdist src/coarse_to_fine_matching_base.py:2762-2864). This
kernel keeps the whole search on the MXU:

- grid (query_blocks, ref_blocks); the ref axis is innermost so a running
  top-k for the current query block lives in VMEM scratch across steps,
- per step one ``(TQ, D) x (D, TR)`` matmul on the MXU produces the partial
  score ``-2 q.r + |r|^2`` (the per-query ``|q|^2`` offset is rank-
  preserving and added once at the end),
- the score block is folded 128 lanes at a time into a per-lane sorted
  top-k (k "layers" in scratch, bubble insertion — pure VPU, no cross-lane
  traffic),
- at the last ref block the ``k x 128`` lane-local candidates are reduced
  to the exact global top-k by k min/extract passes and written out.

Masked (padded) reference rows are encoded as ``+inf`` in the precomputed
``|r|^2`` vector, so they can never win. Exact, no index structure —
at tile scale (<=1M pts, 64-d) brute force on the MXU beats the
reference's approximate CPU graph indices.

The public ``ops.knn`` wrapper dispatches here automatically for
feature-dim inputs on TPU; interpret mode makes the kernel testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_pallas", "pallas_available"]

_LANES = 128


def pallas_available() -> bool:
    """True when the default JAX backend can run Mosaic TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _knn_kernel(
    q_ref,
    r_ref,
    r2_ref,
    out_d_ref,
    out_i_ref,
    sd_ref,
    si_ref,
    *,
    k: int,
    tile_r: int,
    exclude_self: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_r = pl.num_programs(1)
    tq = q_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        sd_ref[...] = jnp.full(sd_ref.shape, jnp.inf, jnp.float32)
        si_ref[...] = jnp.zeros(si_ref.shape, jnp.int32)

    qb = q_ref[:, :]
    rb = r_ref[:, :]
    # (TQ, TR) partial score on the MXU. HIGHEST precision: default f32
    # matmul accuracy (~1e-3 rel) flips near-tie neighbour selections.
    ab = jax.lax.dot_general(
        qb,
        rb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    score = r2_ref[:, :] - 2.0 * ab  # (1, TR) broadcast over rows

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, _LANES), 1)
    if exclude_self:
        grow = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, _LANES), 0)

    for g in range(tile_r // _LANES):
        v_d = score[:, g * _LANES : (g + 1) * _LANES]
        v_i = j * tile_r + g * _LANES + lane
        if exclude_self:
            v_d = jnp.where(v_i == grow, jnp.inf, v_d)
        # Bubble-insert the candidate column set into the per-lane sorted
        # top-k layers: after the loop layer l holds the (l+1)-th smallest
        # score seen in this lane.
        for layer in range(k):
            old_d = sd_ref[layer]
            old_i = si_ref[layer]
            take = v_d < old_d
            sd_ref[layer] = jnp.where(take, v_d, old_d)
            si_ref[layer] = jnp.where(take, v_i, old_i)
            v_d = jnp.where(take, old_d, v_d)
            v_i = jnp.where(take, old_i, v_i)

    @pl.when(j == n_r - 1)
    def _finalize():
        flat_d = jnp.concatenate([sd_ref[layer] for layer in range(k)], axis=1)
        flat_i = jnp.concatenate([si_ref[layer] for layer in range(k)], axis=1)
        q2 = jnp.sum(qb * qb, axis=1, keepdims=True)  # (TQ, 1)
        cols_d = []
        cols_i = []
        for _ in range(k):
            m = jnp.min(flat_d, axis=1, keepdims=True)  # (TQ, 1)
            cand = jnp.where(flat_d == m, flat_i, jnp.iinfo(jnp.int32).max)
            sel = jnp.min(cand, axis=1, keepdims=True)
            cols_d.append(jnp.maximum(m + q2, 0.0))
            cols_i.append(sel)
            flat_d = jnp.where(
                (flat_d == m) & (flat_i == sel), jnp.inf, flat_d
            )
        out_d_ref[:, :] = jnp.concatenate(cols_d, axis=1)
        out_i_ref[:, :] = jnp.concatenate(cols_i, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "tile_r", "exclude_self", "interpret"),
)
def knn_pallas(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    ref_mask: jax.Array | None = None,
    *,
    tile_q: int = 512,
    tile_r: int = 2048,
    exclude_self: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN via the Pallas TPU kernel. Same contract as ``ops.knn``:
    returns ((n, k) ascending squared distances, (n, k) ref indices);
    masked/exhausted slots have distance ``+inf`` and index 0."""
    n, d = query.shape
    m = ref.shape[0]
    if k > _LANES:
        raise ValueError(f"knn_pallas supports k <= {_LANES}, got {k}")

    mask = jnp.ones((m,), bool) if ref_mask is None else ref_mask.astype(bool)
    r2 = jnp.where(mask, jnp.sum(ref * ref, axis=-1), jnp.inf)

    n_pad = -(-max(n, 1) // tile_q) * tile_q
    m_pad = -(-max(m, 1) // tile_r) * tile_r
    q = jnp.pad(query.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    r = jnp.pad(ref.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    r2 = jnp.pad(r2.astype(jnp.float32), (0, m_pad - m), constant_values=jnp.inf)[
        None, :
    ]

    grid = (n_pad // tile_q, m_pad // tile_r)
    kern = functools.partial(
        _knn_kernel, k=k, tile_r=tile_r, exclude_self=exclude_self
    )
    out_d, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, tile_q, _LANES), jnp.float32),
            pltpu.VMEM((k, tile_q, _LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d,
            bytes_accessed=4 * (n_pad * d + m_pad * d + 2 * n_pad * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, r, r2)

    out_i = jnp.where(jnp.isfinite(out_d), out_i, 0)
    return out_d[:n], out_i[:n]
