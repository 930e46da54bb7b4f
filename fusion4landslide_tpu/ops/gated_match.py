"""Magnitude-gated feature-space 1-NN with spatial banding.

The fusion pipeline's global 3D matching stage (reference
``global_matches_from_3d``, src/coarse_to_fine_matching_base.py:2756-2889)
finds each source voxel's nearest neighbour in 64-d descriptor space and
then discards matches whose 3D displacement exceeds ``max_magnitude``
(base:2872-2885). A brute-force feature search is O(N·M·D) — quadratic in
tile size — although the gate makes everything farther than
``max_magnitude`` irrelevant.

This module searches ONLY the spatially admissible candidates: both clouds
are sorted by a (y-band, x) lexicographic key with band height ≥
``max_magnitude``, so each query block's admissible targets form ONE
contiguous range of the sorted target array (band above, own band, band
below — adjacent bands are adjacent in sort order, and the first/last bands
are tightened by the block's x-window). The range is streamed through the
MXU in fixed-size chunks with a running min; chunks beyond the block's
range are skipped via ``lax.cond`` inside the sequential block loop, so the
compute cost is proportional to the TRUE candidate count (~2 bands per
block) while the static trip count stays shape-stable.

Semantics: gate-then-search. This differs from the reference's
search-then-gate exactly on voxels whose GLOBAL feature-NN is farther than
``max_magnitude`` (the reference marks them unmatched; this search returns
their best in-gate candidate instead — strictly more matches, same
matches everywhere the global NN is already in-gate). The pipeline exposes
the choice as ``global_matching_gated`` with the brute reference semantics
selectable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["gated_feature_nn1"]


@functools.partial(
    jax.jit, static_argnames=("query_block", "chunk", "n_bands")
)
def gated_feature_nn1(
    query_feat: jax.Array,  # (N, D)
    ref_feat: jax.Array,  # (M, D)
    query_xyz: jax.Array,  # (N, 3)
    ref_xyz: jax.Array,  # (M, 3)
    max_magnitude: jax.Array | float,
    query_valid: jax.Array | None = None,
    ref_valid: jax.Array | None = None,
    *,
    query_block: int = 1024,
    chunk: int = 8192,
    n_bands: int = 48,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Feature-space 1-NN among targets within ``max_magnitude``.

    Returns (sqdist (N,), idx (N,), valid (N,)) — ``valid`` is False where
    no in-gate target exists (or the query is masked). Exact (up to
    distance ties, which may resolve to a different equally-near index than
    a brute search): banding only excludes targets already outside the
    gate.
    """
    f32 = query_xyz.dtype
    N, D = query_feat.shape
    M = ref_feat.shape[0]
    qv = (
        jnp.ones((N,), bool)
        if query_valid is None
        else jnp.asarray(query_valid).astype(bool)
    )
    rv = (
        jnp.ones((M,), bool)
        if ref_valid is None
        else jnp.asarray(ref_valid).astype(bool)
    )
    mm = jnp.asarray(max_magnitude, f32)
    mm2 = mm * mm
    chunk = min(chunk, M)
    query_block = min(query_block, N)

    # --- (band, x) lexicographic float key. Band height >= max_magnitude so
    # the admissible bands for any query are its own +-1.
    big = jnp.asarray(3e38, f32)

    def _masked_min(v, ok):
        return jnp.min(jnp.where(ok, v, big))

    def _masked_max(v, ok):
        return jnp.max(jnp.where(ok, v, -big))

    anyv = qv.any() | rv.any()
    ylo = jnp.minimum(
        _masked_min(query_xyz[:, 1], qv), _masked_min(ref_xyz[:, 1], rv)
    )
    yhi = jnp.maximum(
        _masked_max(query_xyz[:, 1], qv), _masked_max(ref_xyz[:, 1], rv)
    )
    xlo = jnp.minimum(
        _masked_min(query_xyz[:, 0], qv), _masked_min(ref_xyz[:, 0], rv)
    )
    xhi = jnp.maximum(
        _masked_max(query_xyz[:, 0], qv), _masked_max(ref_xyz[:, 0], rv)
    )
    band_h = jnp.maximum(mm, (yhi - ylo) / float(n_bands))
    band_h = jnp.maximum(band_h, jnp.asarray(1e-6, f32))
    x_span = (xhi - xlo) + 2.0 * mm + 2.0  # strictly > any in-band x term

    def band_of(y):
        return jnp.floor((y - ylo) / band_h)

    def key_of(x, y, valid):
        # x term strictly inside (0, x_span) for valid points.
        return jnp.where(
            valid, band_of(y) * x_span + (x - xlo + mm + 1.0), big
        )

    kr = key_of(ref_xyz[:, 0], ref_xyz[:, 1], rv)
    rord = jnp.argsort(kr).astype(jnp.int32)
    kr_s = jnp.take(kr, rord)
    rf_s = jnp.take(ref_feat, rord, axis=0)
    rx_s = jnp.take(ref_xyz, rord, axis=0)
    rv_s = jnp.take(rv, rord)

    kq = key_of(query_xyz[:, 0], query_xyz[:, 1], qv)
    qord = jnp.argsort(kq).astype(jnp.int32)
    qf_s = jnp.take(query_feat, qord, axis=0)
    qx_s = jnp.take(query_xyz, qord, axis=0)
    qv_s = jnp.take(qv, qord)

    pad = (-N) % query_block
    if pad:
        qf_s = jnp.pad(qf_s, ((0, pad), (0, 0)))
        qx_s = jnp.pad(qx_s, ((0, pad), (0, 0)))
        qv_s = jnp.pad(qv_s, (0, pad))
    nb = qf_s.shape[0] // query_block
    T = -(-M // chunk)
    hp = jax.lax.Precision.HIGHEST

    def one_block(args):
        qfb, qxb, qvb = args  # (B, D), (B, 3), (B,)
        B = qfb.shape[0]
        has = qvb.any()
        bmin = band_of(_masked_min(qxb[:, 1], qvb)) - 1.0
        bmax = band_of(_masked_max(qxb[:, 1], qvb)) + 1.0
        x_min = _masked_min(qxb[:, 0], qvb) - mm
        x_max = _masked_max(qxb[:, 0], qvb) + mm
        # First band tightened from x_min, last band up to x_max; bands in
        # between are covered whole (contiguity of the sorted order).
        k_lo = bmin * x_span + (x_min - xlo + mm + 1.0)
        k_hi = bmax * x_span + (x_max - xlo + mm + 1.0)
        start = jnp.searchsorted(kr_s, jnp.where(has, k_lo, big))
        end = jnp.searchsorted(kr_s, jnp.where(has, k_hi, -big), side="right")
        start = start.astype(jnp.int32)
        end = end.astype(jnp.int32)
        q2 = jnp.sum(qfb * qfb, axis=-1)

        def substep(carry, t):
            best_d, best_i = carry
            off = start + t * chunk

            def live(c):
                bd, bi = c
                o = jnp.clip(off, 0, M - chunk)
                rfc = jax.lax.dynamic_slice(rf_s, (o, 0), (chunk, D))
                rxc = jax.lax.dynamic_slice(rx_s, (o, 0), (chunk, 3))
                rvc = jax.lax.dynamic_slice(rv_s, (o,), (chunk,))
                pos = o + jnp.arange(chunk, dtype=jnp.int32)
                ok = rvc & (pos >= start) & (pos < end)
                f2 = (
                    q2[:, None]
                    - 2.0
                    * jnp.matmul(
                        qfb, rfc.T, precision=hp,
                        preferred_element_type=jnp.float32,
                    )
                    + jnp.sum(rfc * rfc, axis=-1)[None, :]
                )
                c2 = None
                for d_ in range(3):
                    cd = qxb[:, None, d_] - rxc[None, :, d_]
                    c2 = cd * cd if c2 is None else c2 + cd * cd
                bad = ~ok[None, :] | (c2 > mm2) | ~qvb[:, None]
                dist = jnp.where(bad, jnp.inf, jnp.maximum(f2, 0.0))
                mnew = jnp.min(dist, axis=1)
                anew = jnp.take(pos, jnp.argmin(dist, axis=1))
                upd = mnew < bd
                return jnp.where(upd, mnew, bd), jnp.where(upd, anew, bi)

            return (
                jax.lax.cond(off < end, live, lambda c: c, (best_d, best_i)),
                None,
            )

        init = (
            jnp.full((B,), jnp.inf, f32),
            jnp.zeros((B,), jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(
            substep, init, jnp.arange(T, dtype=jnp.int32)
        )
        return bd, bi

    qfb_all = qf_s.reshape(nb, query_block, D)
    qxb_all = qx_s.reshape(nb, query_block, 3)
    qvb_all = qv_s.reshape(nb, query_block)
    if nb == 1:
        bd, bi = one_block((qfb_all[0], qxb_all[0], qvb_all[0]))
        bd = bd[None]
        bi = bi[None]
    else:
        bd, bi = jax.lax.map(one_block, (qfb_all, qxb_all, qvb_all))
    bd = bd.reshape(-1)[: N + pad][:N] if pad else bd.reshape(-1)[:N]
    bi = bi.reshape(-1)[:N] if not pad else bi.reshape(-1)[: N + pad][:N]

    found = jnp.isfinite(bd)
    idx_sorted_order = jnp.take(rord, jnp.clip(bi, 0, M - 1))
    # Unsort back to the original query order.
    sqd = jnp.full((N,), jnp.inf, f32).at[qord].set(bd)
    idx = jnp.zeros((N,), jnp.int32).at[qord].set(
        jnp.where(found, idx_sorted_order, 0)
    )
    valid = jnp.zeros((N,), bool).at[qord].set(found & jnp.take(qv, qord))
    return sqd, idx, valid
