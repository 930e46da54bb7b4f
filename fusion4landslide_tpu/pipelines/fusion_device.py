"""Device-resident fusion_3d tile step: the full coarse-to-fine pipeline
(median resolution → adaptive voxel subsampling → DIPs descriptors → global
3D matches → multi-level supervoxel partition → attention aggregation →
coarse mutual matching → fine per-patch SVD+ICP → priority merge → dense /
sparse / tgt2src outputs) as ONE pure, fixed-shape, jittable function.

This is the multi-chip execution path for the flagship 3D method (reference
``Coarse2Fine.implement_c2f_matching``, src/coarse_to_fine_matching.py:201-290
with use_2d_matches=False; per-stage citations in ``pipelines.fusion``). The
host path (``pipelines.fusion.run_fusion3d_tile``) keeps the Pallas grid
kernels and artifact caching for single-chip runs; this module trades those
for full traceability so a batch of padded tiles ``(T, N, 3)`` shards over a
device mesh (``parallel.pipeline.make_sharded_fusion3d_step``).

Fixed-shape conventions:
- voxel clouds are padded to the input point count N (there are at most N
  occupied voxels); validity = ``arange(N) < n_voxels``,
- supervoxels use static caps ``(sv_cap, member_cap)``; labels past sv_cap
  or members past member_cap drop out of matching for that level (counted in
  ``n_dropped``). Aggregation additionally strides members down to
  ``agg_max_points`` like the host path,
- the superpoint-level coarse matcher is chunked over target superpoints so
  the (S_s, S_t) distance matrix never fully materialises,
- the tgt2src output uses the EXACT reference semantics (base:3386-3393):
  every target point of a matched patch pair gets that pair's inverse
  transform (not the transform of the nearest assigned source point).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.image.geometry import project_points
from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.ops.segments import label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation
from fusion4landslide_tpu.ops.voxel import voxel_downsample
from fusion4landslide_tpu.pipelines.f2s3_device import (
    dips_features_device,
    drop_small_and_compact,
    masked_median,
)
from fusion4landslide_tpu.pipelines.fusion import (
    fine_match_pairs,
    global_matches_3d,
)

__all__ = [
    "Fusion3DTileResult",
    "fusion3d_tile_step",
    "coarse_match_superpoints_chunked",
]


@functools.partial(jax.jit, static_argnames=("chunk", "mutual"))
def coarse_match_superpoints_chunked(
    feat_s: jax.Array,  # (S, D)
    coord_s: jax.Array,  # (S, 3)
    valid_s: jax.Array,  # (S,)
    feat_t: jax.Array,  # (Q, D)
    coord_t: jax.Array,  # (Q, 3)
    valid_t: jax.Array,  # (Q,)
    max_magnitude: jax.Array | float,
    *,
    chunk: int = 2048,
    mutual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Memory-bounded superpoint matching (base:2966-2999): feature cdist
    with centroid pairs farther than ``max_magnitude`` masked to +inf,
    argmin per source superpoint, optional mutual check — scanned over
    target chunks so only an (S, chunk) slab is live.

    Returns (tgt_idx (S,), valid (S,)).
    """
    S = feat_s.shape[0]
    Q = feat_t.shape[0]
    chunk = min(chunk, max(Q, 1))
    pad = (-Q) % chunk
    ft = jnp.pad(feat_t, ((0, pad), (0, 0)))
    ct = jnp.pad(coord_t, ((0, pad), (0, 0)))
    vt = jnp.pad(valid_t.astype(bool), (0, pad))
    nq = ft.shape[0] // chunk
    hp = jax.lax.Precision.HIGHEST
    s2 = jnp.sum(feat_s**2, -1)
    vs = valid_s.astype(bool)
    mm2 = jnp.asarray(max_magnitude, feat_s.dtype) ** 2

    def dist_block(ftc, ctc, vtc):
        f2 = (
            s2[:, None]
            - 2.0
            * jnp.matmul(
                feat_s, ftc.T, precision=hp,
                preferred_element_type=jnp.float32,
            )
            + jnp.sum(ftc**2, -1)[None, :]
        )
        c2 = None
        for d in range(3):
            cd = coord_s[:, None, d] - ctc[None, :, d]
            c2 = cd * cd if c2 is None else c2 + cd * cd
        bad = (c2 > mm2) | ~vs[:, None] | ~vtc[None, :]
        return jnp.where(bad, jnp.inf, f2)

    def step(carry, inp):
        best_d, best_i = carry
        ftc, ctc, vtc, base = inp
        d = dist_block(ftc, ctc, vtc)  # (S, chunk)
        # per-source running min
        m = jnp.min(d, axis=1)
        a = jnp.argmin(d, axis=1) + base
        upd = m < best_d
        best_d = jnp.where(upd, m, best_d)
        best_i = jnp.where(upd, a, best_i)
        # per-target argmin over ALL sources (chunk-local, emitted)
        src_of_t = jnp.argmin(d, axis=0)
        return (best_d, best_i), src_of_t

    init = (jnp.full((S,), jnp.inf, feat_s.dtype), jnp.zeros((S,), jnp.int32))
    bases = (jnp.arange(nq) * chunk).astype(jnp.int32)
    (best_d, best_i), src_of_tgt = jax.lax.scan(
        step,
        init,
        (
            ft.reshape(nq, chunk, -1),
            ct.reshape(nq, chunk, 3),
            vt.reshape(nq, chunk),
            bases,
        ),
    )
    src_of_tgt = src_of_tgt.reshape(-1)  # (Q_padded,)
    valid = jnp.isfinite(best_d)
    if mutual:
        valid = valid & (
            jnp.take(src_of_tgt, best_i) == jnp.arange(S)
        )
    return best_i, valid


def _aggregate_chunked(
    agg_params,
    feat_arr: jax.Array,  # (V, D) per-voxel descriptors
    coords: jax.Array,  # (V, 3)
    member_idx: jax.Array,  # (S, P)
    member_mask: jax.Array,  # (S, P)
    *,
    agg_max_points: int,
    s_chunk: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """ClusterFeatureNet over supervoxel buckets, chunked over S with a
    strided member subsample bounding the quadratic attention
    (reference aggregates over voxel-subsampled patches,
    feature_aggregation/...:80-83)."""
    model = ClusterFeatureNet()
    S, P = member_idx.shape
    if P > agg_max_points:
        stride = -(-P // agg_max_points)
        member_idx_a = member_idx[:, ::stride][:, :agg_max_points]
        member_mask_a = member_mask[:, ::stride][:, :agg_max_points]
    else:
        member_idx_a, member_mask_a = member_idx, member_mask

    pad = (-S) % s_chunk
    mi = jnp.pad(member_idx_a, ((0, pad), (0, 0)))
    mm = jnp.pad(member_mask_a, ((0, pad), (0, 0)))
    nc = mi.shape[0] // s_chunk

    def one(args):
        mic, mmc = args
        feats = jnp.take(feat_arr, mic, axis=0) * mmc[..., None]
        return model.apply(agg_params, feats, mmc)

    mic_all = mi.reshape(nc, s_chunk, -1)
    mmc_all = mm.reshape(nc, s_chunk, -1)
    # Slots past the compacted label count have all-false member masks and
    # their features are never consumed (the coarse matcher masks them to
    # +inf) — skip whole groups of empty chunks like the fine matcher does
    # (one lax.cond per group; pattern from pipelines/f2s3.py:94-121).
    probe = jax.eval_shape(
        one,
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype),
            (mic_all, mmc_all),
        ),
    )
    chunk_live = jnp.any(mmc_all, axis=(1, 2))
    # 16 cond groups (was 4): live labels are prefix-compacted, so the
    # real supervoxel count (~4-10x below the cap at production shapes)
    # occupies the first slots and finer groups skip more dead work —
    # measured fine 10.4 s -> see BASELINE r5. 32 groups were measured to
    # push the headline program 414 MB past HBM at the 1M-core buckets
    # (per-group cond branch buffers); 16 is the fitting optimum.
    gsize = -(-nc // min(16, nc))
    outs = []
    start = 0
    while start < nc:
        end = min(nc, start + gsize)
        g = end - start
        outs.append(
            jax.lax.cond(
                jnp.any(chunk_live[start:end]),
                lambda s: jax.lax.map(one, s),
                lambda s, g=g: jnp.zeros((g,) + probe.shape, probe.dtype),
                (mic_all[start:end], mmc_all[start:end]),
            )
        )
        start = end
    spt_feat = jnp.concatenate(outs, axis=0).reshape(-1, 64)[:S]

    # Centroid over the FULL member set (not the strided subsample).
    w = member_mask.astype(coords.dtype)[..., None]
    cent = jnp.sum(jnp.take(coords, member_idx, axis=0) * w, axis=1)
    cent = cent / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return spt_feat, cent


def _segment_centroids(
    coords: jax.Array,  # (V, 3) voxel centroids
    prev_lab: jax.Array,  # (V,) previous level's compacted labels
    prev_cap: int,
    prev_n: jax.Array,
    svl_radius: jax.Array,
    k_neighbors: int,
) -> jax.Array:
    """Nested partition level: VCCS-segment the PREVIOUS level's cluster
    centroids (a few thousand points) and compose back onto the voxels.

    The reference re-runs its C++ segmentation over the full cloud per
    level (coarse_to_fine_matching.py:215-287); segmenting the previous
    level's centroids instead produces a strictly nested hierarchy — the
    same structure its superpoint levels have by construction — at ~1/50
    of the cost at production tile sizes.
    """
    has = (prev_lab >= 0) & (prev_lab < prev_cap)
    lab0 = jnp.where(has, prev_lab, prev_cap)
    w = has.astype(coords.dtype)
    sums = jax.ops.segment_sum(
        coords * w[:, None], lab0, num_segments=prev_cap + 1
    )[:prev_cap]
    cnts = jax.ops.segment_sum(w, lab0, num_segments=prev_cap + 1)[:prev_cap]
    cent = sums / jnp.maximum(cnts[:, None], 1.0)
    cvalid = jnp.arange(prev_cap) < prev_n
    seg = supervoxel_segmentation(
        cent, svl_radius, cvalid, k_neighbors=min(k_neighbors, 15)
    )
    return jnp.where(
        has, jnp.take(seg.labels, jnp.clip(prev_lab, 0, prev_cap - 1)), -1
    )


def _pixel_nn1(query_uv, query_valid, ref_uv, ref_valid, thr):
    """Radius-bounded 1-NN in pixel space, fully traced.

    2D pixels ride the 3D hash-grid kernels with a zero z column. Within
    ``thr`` the result matches the host path's exact kNN chain
    (image.geometry.chain_2d_matches_to_3d) wherever the per-cell
    occupancy cap holds; beyond ``thr`` both paths mark the query invalid.

    Returns (idx (n,), ok (n,)).
    """
    from fusion4landslide_tpu.ops.hashgrid import knn_grid_traced

    thr = jnp.asarray(thr, query_uv.dtype)
    q3 = jnp.concatenate(
        [query_uv, jnp.zeros_like(query_uv[:, :1])], axis=1
    )
    r3 = jnp.concatenate([ref_uv, jnp.zeros_like(ref_uv[:, :1])], axis=1)
    sq, idx = knn_grid_traced(
        q3, r3, 1, r0=thr, ref_mask=ref_valid, query_mask=query_valid,
        r_max=thr, max_doublings=1,
    )
    ok = query_valid & jnp.isfinite(sq[:, 0]) & (sq[:, 0] < thr * thr)
    return idx[:, 0], ok


def _chain_2d_device(uv_s, pv_s, uv_t, pv_t, pix, pmask, thr, mode):
    """3D voxel correspondences from 2D pixel matches (base:387-470), the
    traced equivalent of ``image.geometry.chain_2d_matches_to_3d``: per
    source voxel, nearest match src endpoint within ``thr`` px → that
    match's tgt endpoint → nearest projected target voxel within ``thr``.
    ``mode`` follows the reference's ``matches_from_2d_type``
    (base:1599-1620): nn_src_only / nn_mutual / nn_union.
    """
    m_idx, hop1 = _pixel_nn1(uv_s, pv_s, pix[:, 0:2], pmask, thr)
    tgt_px = jnp.take(pix[:, 2:4], m_idx, axis=0)
    t_idx, mask_src = _pixel_nn1(tgt_px, hop1, uv_t, pv_t, thr)
    if mode == "nn_src_only":
        return t_idx, mask_src
    # Reverse chain (base:431-470) for the mutual/union modes.
    m_idx_r, hop1r = _pixel_nn1(uv_t, pv_t, pix[:, 2:4], pmask, thr)
    src_px = jnp.take(pix[:, 0:2], m_idx_r, axis=0)
    s_idx, mask_tgt = _pixel_nn1(src_px, hop1r, uv_s, pv_s, thr)
    back = jnp.take(s_idx, t_idx) == jnp.arange(uv_s.shape[0])
    mask_tgt_at_i = jnp.take(mask_tgt, t_idx)
    if mode == "nn_mutual":
        return t_idx, mask_src & mask_tgt_at_i & back
    if mode == "nn_union":
        return t_idx, (mask_src | mask_tgt_at_i) & back
    raise ValueError(
        f"unknown matches_from_2d_type mode '{mode}' "
        "(nn_src_only | nn_mutual | nn_union)"
    )


def _lift_2d_device(
    s_cent, vvalid_s, t_cent, vvalid_t,
    uv_s, dep_s, pv_s, uv_t, dep_t, pv_t,
    pix, pmask, sext, text, K, ctr, median_res,
    image_size, v_flip,
):
    """Depth-map interpolation lifting (``lifting_type: interpolation``)
    on device: rasterize the projected voxel clouds into per-pair
    z-buffers (base:1436-1443), look up depth at each pixel-match
    endpoint (base:320-384, the executed 'single_closest' path),
    back-project through K^-1 + the inverse extrinsic (base:664-728),
    then associate each lifted endpoint to its nearest voxel within
    ``2 * median_res`` — the same association the host path applies
    (pipelines/fusion.py). Duplicate source voxels keep the LAST valid
    match row (the host path's numpy fancy-assignment semantics).

    Returns (t2d (N,), ok (N,)).
    """
    from fusion4landslide_tpu.image.geometry import (
        bilinear_depth,
        lift_pixels_to_world,
        rasterize_depth,
    )
    from fusion4landslide_tpu.ops.hashgrid import knn_grid_traced

    dmap_s, _ = rasterize_depth(uv_s, dep_s, pv_s, image_size)
    dmap_t, _ = rasterize_depth(uv_t, dep_t, pv_t, image_size)
    d_s, ok_s = bilinear_depth(dmap_s, pix[:, 0:2])
    d_t, ok_t = bilinear_depth(dmap_t, pix[:, 2:4])
    ok3 = pmask & ok_s & ok_t
    p_s = lift_pixels_to_world(
        pix[:, 0:2], d_s, sext, K, image_size, v_flip=v_flip
    ) - ctr
    p_t = lift_pixels_to_world(
        pix[:, 2:4], d_t, text, K, image_size, v_flip=v_flip
    ) - ctr
    thr3 = 2.0 * jnp.maximum(median_res, 1e-6)
    ds2, i_s = knn_grid_traced(
        p_s, s_cent, 1, r0=thr3, ref_mask=vvalid_s, query_mask=ok3,
        r_max=thr3 * 1.001, max_doublings=1,
    )
    dt2, i_t = knn_grid_traced(
        p_t, t_cent, 1, r0=thr3, ref_mask=vvalid_t, query_mask=ok3,
        r_max=thr3 * 1.001, max_doublings=1,
    )
    thr3_sq = thr3 * thr3
    ok = (
        ok3
        & jnp.isfinite(ds2[:, 0]) & (ds2[:, 0] < thr3_sq)
        & jnp.isfinite(dt2[:, 0]) & (dt2[:, 0] < thr3_sq)
    )
    N = s_cent.shape[0]
    P = pix.shape[0]
    rows = jnp.arange(P, dtype=jnp.int32)
    win = (
        jnp.full((N,), -1, jnp.int32)
        .at[jnp.where(ok, i_s[:, 0], N)]
        .max(rows, mode="drop")
    )
    t2d = jnp.take(i_t[:, 0].astype(jnp.int32), jnp.clip(win, 0, P - 1))
    return t2d, win >= 0


def _vote_2d_device(
    lab_s, lab_t, c2d_idx, c2d_valid, n_lab_s: int, n_lab_t: int
):
    """Majority vote of per-voxel 2D matches into target superpoints
    (base:3019-3070), the traced equivalent of
    ``pipelines.fusion.coarse_match_2d_votes``: each src voxel with a valid
    2D match votes its matched tgt voxel's superpoint; each src superpoint
    takes the most-voted target (ties → smallest target label, matching
    numpy argmax). Sort-based — no (S_s, S_t) vote matrix materialises; the
    two-key lexicographic sort keeps the run keys in int32 whatever the cap
    product is (the src/tgt caps differ under the core/halo query split).

    Returns (vote_tgt (n_lab_s,), vote_count (n_lab_s,)).
    """
    V = lab_s.shape[0]
    tlab = jnp.take(lab_t, jnp.clip(c2d_idx, 0, lab_t.shape[0] - 1))
    ok = c2d_valid & (lab_s >= 0) & (tlab >= 0)
    k1 = jnp.where(ok, lab_s.astype(jnp.int32), jnp.int32(n_lab_s))
    k2 = jnp.where(ok, tlab.astype(jnp.int32), jnp.int32(n_lab_t))
    k1, k2 = jax.lax.sort((k1, k2), num_keys=2)
    idxs = jnp.arange(V, dtype=jnp.int32)
    same = (k1[1:] == k1[:-1]) & (k2[1:] == k2[:-1])
    first = jnp.concatenate([jnp.ones((1,), bool), ~same])
    last = jnp.concatenate([~same, jnp.ones((1,), bool)])
    start = jax.lax.cummax(jnp.where(first, idxs, 0))
    count = idxs - start + 1  # run length, valid at each run's last slot
    emit = last & (k1 < n_lab_s)
    cnt_max = (
        jnp.zeros((n_lab_s,), jnp.int32)
        .at[jnp.where(emit, k1, n_lab_s)]
        .max(jnp.where(emit, count, 0), mode="drop")
    )
    is_best = emit & (
        count == jnp.take(cnt_max, jnp.clip(k1, 0, n_lab_s - 1))
    )
    vote_tgt = (
        jnp.full((n_lab_s,), n_lab_t, jnp.int32)
        .at[jnp.where(is_best, k1, n_lab_s)]
        .min(k2, mode="drop")
    )
    # Zero-vote rows keep the sentinel; clamp so gathers stay in range
    # (callers must mask by vote_count >= min_votes).
    return jnp.minimum(vote_tgt, n_lab_t - 1), cnt_max


class Fusion3DTileResult(NamedTuple):
    moved: jax.Array  # (N, 3) R p + t per src point (p where unassigned)
    valid: jax.Array  # (N,) src point got a fine transform
    rmse: jax.Array  # (N,) its pair's ICP inlier RMSE
    sparse_tgt: jax.Array  # (N, 3) assign_then_nn re-associated target
    sparse_ok: jax.Array  # (N,)
    t2s_src_est: jax.Array  # (M, 3) per-target estimated source position
    t2s_valid: jax.Array  # (M,)
    median_res: jax.Array  # ()
    n_vox_src: jax.Array  # ()
    n_vox_tgt: jax.Array  # ()
    n_dropped: jax.Array  # () voxels lost to the static supervoxel caps
    n_c2d: jax.Array  # () src voxels with a lifted 2D match (0 if no RGB)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels",
        "k_max",
        "patch_points",
        "chunk",
        "k_neighbors",
        "sv_cap",
        "sv_cap_tgt",
        "member_cap",
        "agg_max_points",
        "small_patch",
        "icp_max_iter",
        "icp_type",
        "fine_max_matches",
        "nested_levels",
        "coarse_mutual",
        "global_gated",
        "with_sparse",
        "with_tgt2src",
        "precision",
        "feat_dtype",
        "sample_cap",
        "sample_priority",
        "image_size",
        "v_flip",
        "lifting",
        "matches_2d_mode",
        "coarse_2d_mode",
        "fine_2d_mode",
        "extra_pair_cap",
        "weighting_svd",
    ),
)
def fusion3d_tile_step(
    dips_params,
    agg_params,
    src: jax.Array,  # (N, 3) centred, padded
    smask: jax.Array,  # (N,)
    tgt: jax.Array,  # (M, 3) centred, padded
    tmask: jax.Array,  # (M,)
    key: jax.Array,
    max_magnitude: jax.Array | float = 10.0,
    icp_threshold: jax.Array | float = 0.1,
    voxel_size_init: jax.Array | float = 0.0,
    num_min_fine: jax.Array | int = 10,
    num_min_quality: jax.Array | int = 10,
    thres_dist_diff: jax.Array | float = 0.5,
    thres_inlier_ratio: jax.Array | float = 0.15,
    sp_lab_src: jax.Array | None = None,  # (L, N) per-point labels, -1=none
    sp_lab_tgt: jax.Array | None = None,  # (L, M)
    pix_matches: jax.Array | None = None,  # (IP, Pc, 4) [su, sv, tu, tv]
    pix_count: jax.Array | None = None,  # (IP,) valid rows per image pair
    intrinsic: jax.Array | None = None,  # (3, 3) K
    src_extrinsics: jax.Array | None = None,  # (IP, 4, 4) world→cam
    tgt_extrinsics: jax.Array | None = None,  # (IP, 4, 4)
    center: jax.Array | None = None,  # (3,) world offset of the centred tile
    pixel_thres: jax.Array | float = 5.0,
    *,
    levels: tuple[int, ...] = (1, 2, 3),
    k_max: int = 512,
    patch_points: int = 256,
    chunk: int = 2048,
    k_neighbors: int = 15,
    sv_cap: int | tuple[int, ...] = 1024,
    sv_cap_tgt: int | tuple[int, ...] | None = None,
    member_cap: int = 512,
    agg_max_points: int = 512,
    small_patch: int = 10,
    icp_max_iter: int = 30,
    icp_type: str = "point2point",
    fine_max_matches: int = 256,
    nested_levels: bool = True,
    coarse_mutual: bool = True,
    global_gated: bool = True,
    with_sparse: bool = True,
    with_tgt2src: bool = True,
    precision: str = "default",
    feat_dtype: str | None = None,
    sample_cap: int = 48,
    sample_priority: str = "knn",
    image_size: tuple[int, int] | None = None,
    v_flip: bool = True,
    lifting: str = "nn_search",
    matches_2d_mode: str = "nn_src_only",
    coarse_2d_mode: str = "fusion",
    fine_2d_mode: str = "fusion",
    extra_pair_cap: int = 0,
    weighting_svd: bool = False,
) -> Fusion3DTileResult:
    """One fusion tile, entirely on device. Stage citations in
    ``pipelines.fusion`` (host path); this function reproduces the same
    math over padded fixed-shape tensors.

    With ``image_size`` set and the ``pix_matches``/``pix_count``/
    ``intrinsic``/``src_extrinsics``/``tgt_extrinsics``/``center`` inputs
    provided, the step additionally runs the RGB 2D-match channel of the
    flagship fusion method (use_2d_matches=True): per image pair, project
    the voxel clouds (base:1353-1449), lift the dense pixel matches to 3D
    voxel correspondences — ``lifting='nn_search'`` chains them through
    pixel-space 1-NN (base:387-470), ``lifting='interpolation'`` lifts
    through rasterized depth maps + K^-1 (base:664-728) — then
    fill-in-merge across pairs
    (base:1940-1953) and magnitude-gate (base:1640-1646); then fuse at the
    coarse stage as superpoint majority votes unioned with the 3D mutual
    matches (base:3019-3146) and at the fine stage as a second
    correspondence channel inside each patch pair (base:3258-3296).

    ``coarse_2d_mode``/``fine_2d_mode``: 'fusion' (default), 'only_2d', or
    'off' — the reference's coarse_matching_fusion/only_2d and
    fine_matching_fusion/only_2d switches. ``extra_pair_cap`` bounds the
    per-level table of 2D-vote pairs that a 3D coarse match didn't already
    propose (0 → sv_cap_l // 4, min 64); overflow counts into
    ``n_dropped``. Where the host path resolves a src superpoint with BOTH
    a 3D pair and a differing 2D-vote pair by numpy write order, this step
    deterministically prefers the 3D pair and lets the 2D pair claim only
    points the 3D pair left unassigned."""
    f32 = src.dtype
    smask = smask.astype(bool)
    tmask = tmask.astype(bool)
    N = src.shape[0]
    M = tgt.shape[0]
    k_s, k_t = jax.random.split(key)

    # 1. median resolution (base:2716-2754) + adaptive voxel subsampling
    # (base:1012-1057) — traced grid search (the blocked O(N·M) kNN capped
    # sharded tiles at ~64k points).
    from fusion4landslide_tpu.ops.hashgrid import (
        knn_grid_traced,
        median_nn_distance_traced,
    )

    res_s = median_nn_distance_traced(src, smask)
    res_t = median_nn_distance_traced(tgt, tmask)
    median_res = jnp.maximum(res_s, res_t)
    radius = jnp.sqrt(3.0) * 10.0 * median_res

    # Shared grid origin = the union min corner of both clouds: the two
    # voxel grids share their phase whatever the cloud extents are. The
    # per-cloud min-corner default (o3d voxel_down_sample semantics,
    # base:1024) shifts the grids against each other whenever the src/tgt
    # extents differ — e.g. under the core/halo query split's asymmetric
    # margins — which de-correlates static-region centroids (and with them
    # the exact-geometry descriptor matches) by up to a voxel. The union
    # min (not a fixed constant) keeps the origin translation-covariant,
    # so differently-centred callers (host vs mesh paths) voxelise
    # identically.
    big = jnp.asarray(jnp.inf, f32)
    grid0 = jnp.minimum(
        jnp.min(jnp.where(smask[:, None], src, big), axis=0),
        jnp.min(jnp.where(tmask[:, None], tgt, big), axis=0),
    )
    s_cent, s_p2v, _, s_nv = voxel_downsample(
        src, median_res, smask, origin=grid0
    )
    t_cent, t_p2v, _, t_nv = voxel_downsample(
        tgt, median_res, tmask, origin=grid0
    )
    vvalid_s = jnp.arange(N) < s_nv
    vvalid_t = jnp.arange(M) < t_nv

    # 2. DIPs descriptors on the voxel clouds (base:1965-2049); support =
    # the full point clouds.
    feat_kw = dict(
        k_max=k_max, patch_points=patch_points, chunk=chunk,
        precision=precision, dtype=feat_dtype,
        sample_cap=sample_cap, sample_priority=sample_priority,
    )
    # Voxel clouds are prefix-compacted: descriptors past n_vox skip the
    # network (20-60% of the bucket rows at production tile sizes).
    src_feat = dips_features_device(
        dips_params, s_cent, src, smask, radius, k_s,
        query_count=s_nv, **feat_kw
    )
    tgt_feat = dips_features_device(
        dips_params, t_cent, tgt, tmask, radius, k_t,
        query_count=t_nv, **feat_kw
    )

    # 3. Global 3D voxel matches (base:2756-2889). Default: the banded
    # magnitude-gated search (ops.gated_match) — O(candidates-in-gate)
    # instead of O(N·M) feature brute force; identical wherever the global
    # feature-NN is in-gate (reference marks the rest unmatched, the gated
    # search returns their best in-gate candidate). global_matching_gated:
    # false restores the reference's search-then-gate brute force.
    if global_gated:
        from fusion4landslide_tpu.ops.gated_match import gated_feature_nn1

        _, g_idx, g_valid = gated_feature_nn1(
            src_feat, tgt_feat, s_cent, t_cent,
            jnp.asarray(max_magnitude, f32), vvalid_s, vvalid_t,
        )
    else:
        g_idx, g_valid = global_matches_3d(
            src_feat, tgt_feat, s_cent, t_cent,
            jnp.asarray(max_magnitude, f32), vvalid_s, vvalid_t,
        )

    # 3b. Global voxel matches lifted from 2D pixel matches
    # (base:1480-1675): project the voxel clouds into each image pair,
    # chain pixels → voxels, fill-in-merge across pairs, magnitude-gate.
    with_2d = image_size is not None and pix_matches is not None
    if with_2d:
        if lifting not in ("nn_search", "interpolation"):
            raise ValueError(
                f"unknown lifting_type '{lifting}' "
                "(nn_search | interpolation)"
            )
        ip_count = pix_matches.shape[0]
        ctr = jnp.zeros((3,), f32) if center is None else center.astype(f32)
        thr_px = jnp.asarray(pixel_thres, f32)
        mm2 = jnp.asarray(max_magnitude, f32) ** 2
        c2d_idx = jnp.zeros((N,), jnp.int32)
        c2d_ok = jnp.zeros((N,), bool)
        for ipair in range(ip_count):
            uv_s, dep_s, pval_s = project_points(
                s_cent + ctr, src_extrinsics[ipair], intrinsic,
                image_size, mask=vvalid_s, v_flip=v_flip,
            )
            uv_t, dep_t, pval_t = project_points(
                t_cent + ctr, tgt_extrinsics[ipair], intrinsic,
                image_size, mask=vvalid_t, v_flip=v_flip,
            )
            pmask = (
                jnp.arange(pix_matches.shape[1]) < pix_count[ipair]
            )
            if lifting == "interpolation":
                t2d, v2d = _lift_2d_device(
                    s_cent, vvalid_s, t_cent, vvalid_t,
                    uv_s, dep_s, pval_s, uv_t, dep_t, pval_t,
                    pix_matches[ipair], pmask,
                    src_extrinsics[ipair], tgt_extrinsics[ipair],
                    intrinsic, ctr, median_res, image_size, v_flip,
                )
            else:
                t2d, v2d = _chain_2d_device(
                    uv_s, pval_s, uv_t, pval_t, pix_matches[ipair], pmask,
                    thr_px, matches_2d_mode,
                )
            t2d = t2d.astype(jnp.int32)
            mag2 = jnp.sum(
                (jnp.take(t_cent, t2d, axis=0) - s_cent) ** 2, axis=1
            )
            v2d = v2d & (mag2 <= mm2)
            fill = ~c2d_ok & v2d
            c2d_idx = jnp.where(fill, t2d, c2d_idx)
            c2d_ok = c2d_ok | fill

    base_svl = jnp.maximum(radius, jnp.asarray(voxel_size_init, f32))

    use_partition_inputs = sp_lab_src is not None
    if use_partition_inputs:
        # Precomputed per-POINT partition labels (reference
        # partition_type='superpoint', base:1241-1276): each voxel takes
        # the label of its FIRST member point — the exact transfer the
        # host path uses (pipelines/fusion.py). No VCCS machinery needed.
        idx_n = jnp.arange(N, dtype=jnp.int32)
        idx_m = jnp.arange(M, dtype=jnp.int32)
        first_s = (
            jnp.full((N,), N, jnp.int32).at[s_p2v].min(idx_n, mode="drop")
        )
        first_t = (
            jnp.full((M,), M, jnp.int32).at[t_p2v].min(idx_m, mode="drop")
        )
    else:
        # The supervoxel kNN graph and PCA normals do not depend on the
        # level radius — build them ONCE per cloud and reuse across all
        # levels (the reference re-runs the C++ segmentation per level,
        # coarse_to_fine_matching.py:215-287).
        from fusion4landslide_tpu.ops.normals import pca_normals
        from fusion4landslide_tpu.ops.supervoxel import supervoxel_graph

        gi_s, gm_s = supervoxel_graph(
            s_cent, base_svl, vvalid_s, k_neighbors=k_neighbors
        )
        nrm_s = pca_normals(
            s_cent, k_neighbors, vvalid_s, neigh_idx=gi_s, neigh_mask=gm_s
        )
        gi_t, gm_t = supervoxel_graph(
            t_cent, base_svl, vvalid_t, k_neighbors=k_neighbors
        )
        nrm_t = pca_normals(
            t_cent, k_neighbors, vvalid_t, neigh_idx=gi_t, neigh_mask=gm_t
        )

    merged_R = jnp.broadcast_to(jnp.eye(3, dtype=f32), (N, 3, 3))
    merged_t = jnp.zeros((N, 3), f32)
    merged_valid = jnp.zeros((N,), bool)
    merged_rmse = jnp.zeros((N,), f32)
    t2s_R = jnp.broadcast_to(jnp.eye(3, dtype=f32), (M, 3, 3))
    t2s_t = jnp.zeros((M, 3), f32)
    t2s_valid = jnp.zeros((M,), bool)
    n_dropped = jnp.zeros((), jnp.int32)

    # Per-level superpoint caps: each VCCS level doubles the radius, so
    # the supervoxel count drops ~4x per level — sizing every level's
    # member tables, aggregation, coarse matcher, and fine solver at the
    # level-1 cap wasted ~2x of the whole tile step. Overflow past a cap
    # is counted in ``n_dropped`` exactly as before. Externally supplied
    # partition labels carry NO such coarsening guarantee, so they keep
    # the flat cap at every level (pass an explicit tuple to size levels
    # from known label counts).
    def _per_level_caps(cap):
        if isinstance(cap, int):
            if use_partition_inputs:
                return (cap,) * len(levels)
            floor = min(256, cap)
            return tuple(
                max(cap >> (2 * li), floor) for li in range(len(levels))
            )
        return tuple(cap)

    sv_caps = _per_level_caps(sv_cap)
    # Under the core/halo query split the target (support) cloud is larger
    # than the source (query) cloud, so its superpoint cap is sized
    # independently; None keeps the symmetric behaviour.
    sv_caps_t = (
        sv_caps if sv_cap_tgt is None else _per_level_caps(sv_cap_tgt)
    )

    lab_s_prev = lab_t_prev = None
    n_s_prev = n_t_prev = None
    for li, level in enumerate(levels):
        sv_cap_l = sv_caps[li]
        sv_cap_tl = sv_caps_t[li]
        svl_radius = base_svl * (2.0 ** (int(level) - 1))
        if use_partition_inputs:
            raw_s = jnp.where(
                vvalid_s & (first_s < N),
                jnp.take(
                    sp_lab_src[li].astype(jnp.int32),
                    jnp.clip(first_s, 0, N - 1),
                ),
                -1,
            )
            raw_t = jnp.where(
                vvalid_t & (first_t < M),
                jnp.take(
                    sp_lab_tgt[li].astype(jnp.int32),
                    jnp.clip(first_t, 0, M - 1),
                ),
                -1,
            )
        elif li == 0 or not nested_levels:
            # Measured dead end (v5e, 131k bucket): batching src+tgt into
            # one vmapped propagation (ops.supervoxel.
            # supervoxel_segmentation_pair) pays max() instead of sum() of
            # sweep counts in theory, but the vmapped argsort/scatter
            # seeding lowers ~6x slower (3.74 s vs 0.60 s) — keep the two
            # sequential calls.
            seg_s = supervoxel_segmentation(
                s_cent, svl_radius, vvalid_s,
                neigh_idx=gi_s, neigh_mask=gm_s, normals=nrm_s,
            )
            seg_t = supervoxel_segmentation(
                t_cent, svl_radius, vvalid_t,
                neigh_idx=gi_t, neigh_mask=gm_t, normals=nrm_t,
            )
            raw_s, raw_t = seg_s.labels, seg_t.labels
        else:
            raw_s = _segment_centroids(
                s_cent, lab_s_prev, sv_caps[li - 1], n_s_prev,
                svl_radius, k_neighbors,
            )
            raw_t = _segment_centroids(
                t_cent, lab_t_prev, sv_caps_t[li - 1], n_t_prev,
                svl_radius, k_neighbors,
            )
        lab_s, n_s = drop_small_and_compact(raw_s, vvalid_s, small_patch)
        lab_t, n_t = drop_small_and_compact(raw_t, vvalid_t, small_patch)
        lab_s_prev, n_s_prev = lab_s, n_s
        lab_t_prev, n_t_prev = lab_t, n_t

        mem_s, memmask_s = label_members(lab_s, sv_cap_l, member_cap)
        mem_t, memmask_t = label_members(lab_t, sv_cap_tl, member_cap)
        in_table = (
            jnp.zeros((N,), bool)
            .at[jnp.where(memmask_s, mem_s, N)]
            .set(memmask_s, mode="drop")
        )
        n_dropped = n_dropped + jnp.sum(
            vvalid_s & (lab_s >= 0) & ~in_table
        )

        svalid_s = jnp.arange(sv_cap_l) < n_s
        svalid_t = jnp.arange(sv_cap_tl) < n_t
        only_2d_coarse = with_2d and coarse_2d_mode == "only_2d"
        if only_2d_coarse:
            # Reference coarse_matching_only_2d: the 2D votes alone propose
            # pairs — the feature aggregation and 3D coarse matcher are
            # skipped entirely.
            vote_tgt, vote_cnt = _vote_2d_device(
                lab_s, lab_t, c2d_idx, c2d_ok, sv_cap_l, sv_cap_tl
            )
            tgt_of_src = vote_tgt
            pair_valid = (vote_cnt >= 1) & svalid_s
        else:
            # 4. Superpoint aggregation (base:2561-2656) + coarse matching
            # (base:2966-2999).
            spt_feat_s, spt_coord_s = _aggregate_chunked(
                agg_params, src_feat, s_cent, mem_s, memmask_s,
                agg_max_points=agg_max_points,
            )
            spt_feat_t, spt_coord_t = _aggregate_chunked(
                agg_params, tgt_feat, t_cent, mem_t, memmask_t,
                agg_max_points=agg_max_points,
            )
            tgt_of_src, pair_valid = coarse_match_superpoints_chunked(
                spt_feat_s, spt_coord_s, svalid_s,
                spt_feat_t, spt_coord_t, svalid_t,
                jnp.asarray(max_magnitude, f32),
                mutual=coarse_mutual,
            )

        # 4b. Coarse fusion (base:3019-3146): 2D majority votes union with
        # the 3D mutual matches. Votes a 3D pair didn't already propose go
        # into a compacted per-level extras table appended to the fine
        # solve.
        fusion_votes = with_2d and coarse_2d_mode == "fusion"
        if fusion_votes:
            E_l = extra_pair_cap or max(sv_cap_l // 4, 64)
            vote_tgt, vote_cnt = _vote_2d_device(
                lab_s, lab_t, c2d_idx, c2d_ok, sv_cap_l, sv_cap_tl
            )
            vote_ok = (vote_cnt >= 1) & svalid_s
            extra_valid = vote_ok & ~(pair_valid & (tgt_of_src == vote_tgt))
            order = jnp.argsort(~extra_valid)  # valid-first, stable
            sel = order[:E_l].astype(jnp.int32)
            sel_ok = jnp.take(extra_valid, sel)
            n_dropped = n_dropped + jnp.sum(extra_valid) - jnp.sum(sel_ok)
            extra_lab = jnp.where(sel_ok, sel, -1)
            tgt_e = jnp.where(sel_ok, jnp.take(vote_tgt, sel), -1)
            mem_f = jnp.concatenate(
                [mem_s, jnp.take(mem_s, sel, axis=0)], axis=0
            )
            memmask_f = jnp.concatenate(
                [
                    memmask_s & pair_valid[:, None],
                    jnp.take(memmask_s, sel, axis=0) & sel_ok[:, None],
                ],
                axis=0,
            )
            tgtlab_f = jnp.concatenate(
                [
                    jnp.where(pair_valid, tgt_of_src, -1).astype(jnp.int32),
                    tgt_e.astype(jnp.int32),
                ],
                axis=0,
            )
        else:
            mem_f = mem_s
            memmask_f = memmask_s & pair_valid[:, None]
            tgtlab_f = jnp.where(pair_valid, tgt_of_src, -1).astype(jnp.int32)

        # 5. Fine matching per matched pair (base:3236-3436): every src
        # superpoint slot is a candidate pair; invalid ones masked out. In
        # fusion mode the 2D channel contributes a second point-match set
        # inside each patch (base:3258-3296).
        if with_2d and fine_2d_mode == "only_2d":
            ch1_idx, ch1_valid = c2d_idx, c2d_ok
        else:
            ch1_idx, ch1_valid = g_idx.astype(jnp.int32), g_valid
        fine_kw = {}
        if with_2d and fine_2d_mode == "fusion":
            fine_kw = dict(
                corres2_tgt_idx=c2d_idx,
                corres2_valid=c2d_ok,
                weighting=weighting_svd,
            )
        fine = fine_match_pairs(
            mem_f,
            memmask_f,
            tgtlab_f,
            ch1_idx,
            ch1_valid,
            lab_t,
            s_cent,
            t_cent,
            num_min_quality=num_min_quality,
            thres_dist_diff=thres_dist_diff,
            thres_inlier_ratio=thres_inlier_ratio,
            num_min_fine=num_min_fine,
            icp_threshold=icp_threshold,
            icp_max_iter=icp_max_iter,
            icp_type=icp_type,
            fine_max_matches=fine_max_matches,
            **fine_kw,
        )
        lab_ok = fine.valid[:sv_cap_l] & pair_valid & svalid_s

        # 6. Dense per-point assignment, merged by level priority
        # (coarse_to_fine_matching.py:215-287).
        pt_vox = jnp.clip(s_p2v, 0, N - 1)
        pt_label = jnp.where(
            smask & (s_p2v < s_nv), jnp.take(lab_s, pt_vox), -1
        )
        pl = jnp.clip(pt_label, 0, sv_cap_l - 1)
        pt_has = (pt_label >= 0) & jnp.take(lab_ok, pl)
        take = pt_has & ~merged_valid
        merged_R = jnp.where(
            take[:, None, None], jnp.take(fine.R, pl, axis=0), merged_R
        )
        merged_t = jnp.where(
            take[:, None], jnp.take(fine.t, pl, axis=0), merged_t
        )
        merged_rmse = jnp.where(take, jnp.take(fine.rmse, pl), merged_rmse)
        merged_valid = merged_valid | take

        if fusion_votes:
            # Extras-table fill-in: a 2D-vote pair claims the points of its
            # src superpoint only where the 3D pair (and earlier levels)
            # left them unassigned — deterministic counterpart of the host
            # path's write-order tie-break.
            e_fine_ok = fine.valid[sv_cap_l:] & sel_ok  # (E_l,)
            row_of_lab = (
                jnp.full((sv_cap_l,), -1, jnp.int32)
                .at[jnp.where(extra_lab >= 0, extra_lab, sv_cap_l)]
                .set(jnp.arange(E_l, dtype=jnp.int32), mode="drop")
            )
            prow = jnp.take(row_of_lab, pl)
            prow_c = jnp.clip(prow, 0, E_l - 1)
            e_has = (
                (pt_label >= 0) & (prow >= 0) & jnp.take(e_fine_ok, prow_c)
            )
            take_e = e_has & ~merged_valid
            erow = sv_cap_l + prow_c
            merged_R = jnp.where(
                take_e[:, None, None],
                jnp.take(fine.R, erow, axis=0),
                merged_R,
            )
            merged_t = jnp.where(
                take_e[:, None], jnp.take(fine.t, erow, axis=0), merged_t
            )
            merged_rmse = jnp.where(
                take_e, jnp.take(fine.rmse, erow), merged_rmse
            )
            merged_valid = merged_valid | take_e

        if with_tgt2src:
            # Exact reference semantics (base:3386-3393): each matched
            # pair's inverse transform applies to the TARGET patch's points.
            pair_R_of_tlab = jnp.broadcast_to(
                jnp.eye(3, dtype=f32), (sv_cap_tl, 3, 3)
            )
            pair_t_of_tlab = jnp.zeros((sv_cap_tl, 3), f32)
            pair_ok_of_tlab = jnp.zeros((sv_cap_tl,), bool)
            if fusion_votes:
                # Scatter the extras first so a 3D pair targeting the same
                # label wins (3D priority, as in the dense merge).
                Rinv_e = jnp.swapaxes(fine.R[sv_cap_l:], -1, -2)
                tinv_e = -jnp.einsum(
                    "sij,sj->si", Rinv_e, fine.t[sv_cap_l:]
                )
                tle = jnp.where(e_fine_ok, tgt_e, sv_cap_tl)
                pair_R_of_tlab = pair_R_of_tlab.at[tle].set(
                    Rinv_e, mode="drop"
                )
                pair_t_of_tlab = pair_t_of_tlab.at[tle].set(
                    tinv_e, mode="drop"
                )
                pair_ok_of_tlab = pair_ok_of_tlab.at[tle].set(
                    e_fine_ok, mode="drop"
                )
            Rinv = jnp.swapaxes(fine.R[:sv_cap_l], -1, -2)
            tinv = -jnp.einsum("sij,sj->si", Rinv, fine.t[:sv_cap_l])
            # Scatter pair inverse onto its TARGET label slot.
            tl = jnp.where(lab_ok, tgt_of_src, sv_cap_tl)
            pair_R_of_tlab = pair_R_of_tlab.at[tl].set(Rinv, mode="drop")
            pair_t_of_tlab = pair_t_of_tlab.at[tl].set(tinv, mode="drop")
            pair_ok_of_tlab = pair_ok_of_tlab.at[tl].set(
                lab_ok, mode="drop"
            )
            tp_vox = jnp.clip(t_p2v, 0, M - 1)
            tp_label = jnp.where(
                tmask & (t_p2v < t_nv), jnp.take(lab_t, tp_vox), -1
            )
            tpl = jnp.clip(tp_label, 0, sv_cap_tl - 1)
            tp_has = (tp_label >= 0) & jnp.take(pair_ok_of_tlab, tpl)
            ttake = tp_has & ~t2s_valid
            t2s_R = jnp.where(
                ttake[:, None, None],
                jnp.take(pair_R_of_tlab, tpl, axis=0),
                t2s_R,
            )
            t2s_t = jnp.where(
                ttake[:, None], jnp.take(pair_t_of_tlab, tpl, axis=0), t2s_t
            )
            t2s_valid = t2s_valid | ttake

    # Dense output: R p + t for every assigned source point (base:3371-3380).
    moved = jnp.einsum("nij,nj->ni", merged_R, src) + merged_t
    moved = jnp.where(merged_valid[:, None], moved, src)

    # Sparse assign_then_nn (base:3414-3436): re-associate moved points with
    # actual target points within max(2·rmse, median_res). Bounded grid
    # search: points with no neighbour inside the largest adaptive
    # threshold are correctly unmatched, so the bounded result is exact.
    if with_sparse:
        adaptive = jnp.maximum(2.0 * merged_rmse, median_res)
        r_need = jnp.max(jnp.where(merged_valid, adaptive, 0.0))
        nn_sq, nn_i = knn_grid_traced(
            moved, tgt, 1, r0=2.0 * median_res, ref_mask=tmask,
            query_mask=merged_valid, r_max=r_need * 1.001,
        )
        nn_d = jnp.sqrt(nn_sq[:, 0])
        nn_i = nn_i[:, 0]
        sparse_ok = merged_valid & jnp.isfinite(nn_d) & (nn_d < adaptive)
        sparse_tgt = jnp.take(tgt, nn_i, axis=0)
    else:
        sparse_ok = jnp.zeros((N,), bool)
        sparse_tgt = jnp.zeros((N, 3), f32)

    if with_tgt2src:
        t2s_src_est = jnp.einsum("mij,mj->mi", t2s_R, tgt) + t2s_t
        t2s_src_est = jnp.where(t2s_valid[:, None], t2s_src_est, tgt)
    else:
        t2s_src_est = jnp.zeros((M, 3), f32)
        t2s_valid = jnp.zeros((M,), bool)

    return Fusion3DTileResult(
        moved=moved,
        valid=merged_valid,
        rmse=merged_rmse,
        sparse_tgt=sparse_tgt,
        sparse_ok=sparse_ok,
        t2s_src_est=t2s_src_est,
        t2s_valid=t2s_valid,
        median_res=median_res,
        n_vox_src=s_nv,
        n_vox_tgt=t_nv,
        n_dropped=n_dropped,
        n_c2d=(
            jnp.sum(c2d_ok & vvalid_s)
            if with_2d
            else jnp.zeros((), jnp.int32)
        ),
    )
