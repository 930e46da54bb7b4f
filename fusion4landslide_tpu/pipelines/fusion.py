"""Coarse-to-fine fusion pipeline: superpoint partition + learned coarse
patch matching + fine per-patch SVD/ICP refinement — RGB+3D fusion
(``run_fusion_tile``) and 3D-only (``run_fusion3d_tile``).

Capability parity with the reference ``Coarse2Fine`` flagship
(src/coarse_to_fine_matching.py:195-308 + src/coarse_to_fine_matching_base.py,
driven by main_fusion.py), in both shippable configurations: the full fusion
method (use_2d_matches=True — dense 2D pixel matches lifted to 3D fuse with
learned 3D matches at the coarse vote and fine SVD stages) and ``fusion_3d``
(use_2d_matches=False, use_normal_3d_aggregation, supervoxel partition —
fusion_3d_brienz.yaml). Stage map:

1. adaptive voxel subsampling, voxel<->point maps (base:1012-1057),
2. DIPs descriptors on the voxel cloud (base:1965-2049),
3. global 3D voxel matches: feature-space 1-NN with the max-magnitude gate,
   unmatched = -1 (base:2756-2889),
4. multi-level partition: supervoxels at geometrically spaced radii — the
   TPU stand-in for the superpoint hierarchy levels 1..3
   (coarse_to_fine_matching.py:215-287; partition_type='supervoxel' is a
   reference-supported configuration, base:2663-2694),
5. superpoint feature aggregation (ClusterFeatureNet) + coarse matching:
   feature cdist with coordinate-distance mask, mutual NN
   (base:2947-2999),
6. fine matching per matched patch pair: member correspondences restricted
   to both patches, isometry quality gate (pairwise-distance-difference
   inlier ratio, base:3310-3323), weighted SVD, point-to-point ICP seeded
   with it (base:3341-3368), dense ``R p + t`` assignment for every source
   point of the patch plus ``assign_then_nn`` re-association with the
   adaptive threshold max(2·rmse, median_res) (base:3371-3436),
7. multi-level merge by priority (coarse_to_fine_matching.py:40-118) —
   levels assign to the *same* source points here, so the reference's
   spatial dedup reduces to per-point priority selection,
8. ``c2f_*`` result tables (base:3459-3560).

TPU re-design: partitions, features and matches all live on the voxel cloud;
original points inherit their voxel's label and their patch's rigid motion.
The per-patch Python loop (base:3254, one SVD+o3d-ICP each) becomes one
vmapped fixed-shape kernel over padded patch buckets.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.ops.icp import icp_point2point  # noqa: F401 (re-export)
from fusion4landslide_tpu.ops.kabsch import transform_points, weighted_kabsch
from fusion4landslide_tpu.ops.registration import icp_by_type
from fusion4landslide_tpu.ops.knn import knn, median_nn_distance, nn1
from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation
from fusion4landslide_tpu.ops.voxel import voxel_downsample
from fusion4landslide_tpu.pipelines.f2s3 import compute_dips_features

__all__ = [
    "global_matches_3d",
    "coarse_match_superpoints",
    "coarse_match_2d_votes",
    "fine_match_pairs",
    "run_fusion3d_tile",
    "run_fusion_tile",
]


@jax.jit
def _global_matches_3d_core(
    src_vox_feat, tgt_vox_feat, src_vox, tgt_vox, max_magnitude,
    src_valid, tgt_valid,
):
    sqd, idx = knn(src_vox_feat, tgt_vox_feat, 1, tgt_valid)
    idx = idx[:, 0]
    matched_tgt = jnp.take(tgt_vox, idx, axis=0)
    mag = jnp.linalg.norm(src_vox - matched_tgt, axis=-1)
    valid = (
        jnp.isfinite(sqd[:, 0])
        & (mag <= max_magnitude)
        & src_valid.astype(bool)
    )
    return idx, valid


def global_matches_3d(
    src_vox_feat: jax.Array,
    tgt_vox_feat: jax.Array,
    src_vox: jax.Array,
    tgt_vox: jax.Array,
    max_magnitude: jax.Array | float,
    src_valid: jax.Array | None = None,
    tgt_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Feature-space 1-NN voxel matches gated by displacement magnitude.

    Returns (tgt_idx (Vs,), valid (Vs,)) — the reference keeps -1 for
    unmatched (base:2879-2885); here a boolean mask. One jitted dispatch;
    inputs are padded to power-of-two buckets so per-tile voxel-count
    variation reuses the compilation.
    """
    from fusion4landslide_tpu.ops.segments import bucket_size

    n, m = src_vox_feat.shape[0], tgt_vox_feat.shape[0]
    nb, mb = bucket_size(n), bucket_size(m)
    sv = (
        jnp.ones((n,), bool) if src_valid is None
        else jnp.asarray(src_valid).astype(bool)
    )
    tv = (
        jnp.ones((m,), bool) if tgt_valid is None
        else jnp.asarray(tgt_valid).astype(bool)
    )
    idx, valid = _global_matches_3d_core(
        jnp.pad(src_vox_feat, ((0, nb - n), (0, 0))),
        jnp.pad(tgt_vox_feat, ((0, mb - m), (0, 0))),
        jnp.pad(src_vox, ((0, nb - n), (0, 0))),
        jnp.pad(tgt_vox, ((0, mb - m), (0, 0))),
        jnp.asarray(max_magnitude, src_vox.dtype),
        jnp.pad(sv, (0, nb - n)),
        jnp.pad(tv, (0, mb - m)),
    )
    return idx[:n], valid[:n]


@functools.partial(jax.jit, static_argnames=("mutual",))
def coarse_match_superpoints(
    spt_feat_src: jax.Array,
    spt_coord_src: jax.Array,
    spt_valid_src: jax.Array,
    spt_feat_tgt: jax.Array,
    spt_coord_tgt: jax.Array,
    spt_valid_tgt: jax.Array,
    max_magnitude: jax.Array | float,
    *,
    mutual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Superpoint-level matching: feature distances, with pairs whose
    centroids are farther than ``max_magnitude`` masked to +inf, then NN
    (+ mutual check for 'nn_mutual', base:2966-2999).

    Returns (tgt_idx (Ss,), valid (Ss,)).
    """
    hp = jax.lax.Precision.HIGHEST
    feat2 = (
        jnp.sum(spt_feat_src**2, -1)[:, None]
        - 2.0
        * jnp.matmul(
            spt_feat_src,
            spt_feat_tgt.T,
            precision=hp,
            preferred_element_type=jnp.float32,
        )
        + jnp.sum(spt_feat_tgt**2, -1)[None, :]
    )
    coord2 = None
    for d in range(3):
        cd = spt_coord_src[:, None, d] - spt_coord_tgt[None, :, d]
        coord2 = cd * cd if coord2 is None else coord2 + cd * cd
    bad = (
        (coord2 > max_magnitude**2)
        | ~spt_valid_src.astype(bool)[:, None]
        | ~spt_valid_tgt.astype(bool)[None, :]
    )
    dist = jnp.where(bad, jnp.inf, feat2)
    tgt_of_src = jnp.argmin(dist, axis=1)
    best_s = jnp.take_along_axis(dist, tgt_of_src[:, None], axis=1)[:, 0]
    valid = jnp.isfinite(best_s)
    if mutual:
        src_of_tgt = jnp.argmin(dist, axis=0)
        valid = valid & (
            jnp.take(src_of_tgt, tgt_of_src) == jnp.arange(dist.shape[0])
        )
    return tgt_of_src, valid


@jax.jit
def _sparse_assign_core(tgt_pts, moved_q, radius_nn):
    """Grid-bounded 1-NN of the moved points among the target cloud in one
    jitted dispatch (the eager grid-build composite cost ~10 device round
    trips per tile)."""
    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn

    grid = build_hash_grid(tgt_pts, radius_nn)
    d2, nn_idx, _ = hash_grid_knn(moved_q, grid, radius_nn, k=1)
    return d2[:, 0], nn_idx[:, 0]


@functools.partial(jax.jit, static_argnames=("P_agg", "s_chunk"))
def aggregate_superpoints(
    agg_params,
    feat_arr: jax.Array,  # (V, D) per-voxel descriptors
    coords: jax.Array,  # (V, 3)
    mem: jax.Array,  # (S, P) member voxel index per superpoint slot
    mmask: jax.Array,  # (S, P)
    *,
    P_agg: int,
    s_chunk: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """ClusterFeatureNet feature + full-member centroid per superpoint in
    ONE jitted dispatch (base:2561-2656).

    Self-attention is quadratic in patch size, so members are strided down
    to ``P_agg`` for the network (the reference bounds this by aggregating
    over voxel-subsampled patches, feature_aggregation/...:80-83) and the
    apply is chunked over superpoints via ``lax.map`` to bound the
    (chunk, P, P) score tensor. The centroid uses the FULL member set.
    """
    P_full = mem.shape[1]
    if P_full > P_agg:
        stride = -(-P_full // P_agg)
        mem_a = mem[:, ::stride][:, :P_agg]
        mmask_a = mmask[:, ::stride][:, :P_agg]
    else:
        mem_a, mmask_a = mem, mmask
    model = ClusterFeatureNet()
    feats = jnp.take(feat_arr, mem_a, axis=0) * mmask_a[..., None]
    S = feats.shape[0]
    c = min(s_chunk, S)
    pad_s = (-S) % c
    fp = jnp.pad(feats, ((0, pad_s), (0, 0), (0, 0)))
    mp = jnp.pad(mmask_a, ((0, pad_s), (0, 0)))
    fpc = fp.reshape(-1, c, *fp.shape[1:])
    mpc = mp.reshape(-1, c, mp.shape[1])
    nc = fpc.shape[0]

    def one(args):
        return model.apply(agg_params, *args)

    # Empty-slot skipping (features of all-false-mask slots are never
    # consumed — the coarse matcher masks them to +inf): one lax.cond per
    # group of chunks, the DIPs padding-skip pattern (f2s3.py:94-121).
    probe = jax.eval_shape(
        one,
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), (fpc, mpc)
        ),
    )
    chunk_live = jnp.any(mpc, axis=(1, 2))
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
                (fpc[start:end], mpc[start:end]),
            )
        )
        start = end
    out = jnp.concatenate(outs, axis=0)
    spt_feat = out.reshape(-1, out.shape[-1])[:S]
    w = mmask.astype(coords.dtype)[..., None]
    cent = jnp.sum(jnp.take(coords, mem, axis=0) * w, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0
    )
    return spt_feat, cent


class FinePairResult(NamedTuple):
    R: jax.Array  # (Pairs, 3, 3)
    t: jax.Array  # (Pairs, 3)
    rmse: jax.Array  # (Pairs,)
    valid: jax.Array  # (Pairs,)
    n_matches: jax.Array  # (Pairs,)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pair_chunk", "icp_max_iter", "weighting", "fine_max_matches",
        "icp_type", "iso_cap",
    ),
)
def fine_match_pairs(
    src_members: jax.Array,  # (Pairs, P) src voxel indices per patch
    src_member_mask: jax.Array,  # (Pairs, P)
    pair_tgt_label: jax.Array,  # (Pairs,)
    corres_tgt_idx: jax.Array,  # (Vs,) matched tgt voxel per src voxel
    corres_valid: jax.Array,  # (Vs,)
    tgt_vox_label: jax.Array,  # (Vt,)
    src_vox: jax.Array,  # (Vs, 3)
    tgt_vox: jax.Array,  # (Vt, 3)
    *,
    corres2_tgt_idx: jax.Array | None = None,  # (Vs,) 2nd channel (2D matches)
    corres2_valid: jax.Array | None = None,
    weighting: bool = False,
    num_min_quality: int | jax.Array = 10,
    thres_dist_diff: float | jax.Array = 0.5,
    thres_inlier_ratio: float | jax.Array = 0.15,
    num_min_fine: int | jax.Array = 10,
    icp_threshold: float | jax.Array = 0.1,
    icp_max_iter: int = 30,
    icp_type: str = "point2point",
    pair_chunk: int = 128,
    fine_max_matches: int = 1024,
    iso_cap: int = 128,
) -> FinePairResult:
    """Per matched patch pair: quality gate + SVD + ICP (base:3254-3436).

    With a second correspondence channel (``corres2_*`` — the fusion
    method's 3D-matches-from-2D-pixels), each patch member contributes up
    to two point matches, concatenated as the reference does
    (base:3273-3275). ``weighting=True`` reproduces ``weighting_svd``:
    3D matches weigh n3d/(n3d+n2d), 2D matches the complement
    (base:3283-3293; the reference's debug override pinning 2D weights to
    0.01 is not replicated).

    ``iso_cap`` bounds the quadratic isometry gate: its mean / inlier-ratio
    statistics are computed over ``iso_cap`` matches sampled with an even
    stride across the matched correspondences — spatially representative,
    since the compacted order is voxel/grid-cell order (the gate is a
    robust statistic — at the production cap of 128 the estimate is within
    a few percent of the full O(F^2) computation, measured ~25% of the
    whole fine stage).

    Dead pairs (label -1 or empty member mask) are skipped in cond-gated
    chunk groups; this is exact provided ``num_min_fine >= 1`` (a zero
    minimum would declare a zero-match pair "valid", which no caller and
    no reference config does).
    """
    Pairs, P = src_members.shape
    fusion2 = corres2_tgt_idx is not None

    def one_pair(members, mmask, tgt_label):
        w = jnp.take(corres_tgt_idx, members)
        mv = (
            mmask
            & jnp.take(corres_valid, members)
            & (jnp.take(tgt_vox_label, w) == tgt_label)
        )
        if fusion2:
            w2 = jnp.take(corres2_tgt_idx, members)
            mv2 = (
                mmask
                & jnp.take(corres2_valid, members)
                & (jnp.take(tgt_vox_label, w2) == tgt_label)
            )
            n3 = jnp.sum(mv)
            n2 = jnp.sum(mv2)
            all_src = jnp.concatenate([members, members])
            all_tgt = jnp.concatenate([w, w2])
            all_mv = jnp.concatenate([mv, mv2])
        else:
            all_src, all_tgt, all_mv = members, w, mv
        n_match = jnp.sum(all_mv)

        # Compact to the matched members (bounded bucket) BEFORE gathering
        # any coordinates: the isometry gate and ICP below are quadratic in
        # the member count, and the reference only ever feeds the *matched*
        # correspondences of a pair (base:3259-3274) — typically a few
        # hundred even for huge patches. Selecting indices first halves the
        # random-gather traffic of the full member tables.
        L = all_src.shape[0]
        F = min(L, int(fine_max_matches))
        _, sel = jax.lax.top_k(
            all_mv.astype(jnp.float32)
            - jnp.arange(L, dtype=jnp.float32) * 1e-9,
            F,
        )
        mv = jnp.take(all_mv, sel)
        src_m = jnp.take(src_vox, jnp.take(all_src, sel), axis=0)
        tgt_m = jnp.take(tgt_vox, jnp.take(all_tgt, sel), axis=0)
        if fusion2 and weighting:
            w3d = n3 / jnp.maximum(n3 + n2, 1)
            is3d = sel < members.shape[0]
            wts = jnp.where(is3d, w3d, 1.0 - w3d) * mv.astype(src_m.dtype)
        else:
            wts = mv.astype(src_m.dtype)

        # Isometry quality gate (base:3310-3323): mean and inlier ratio of
        # |pairwise-dist(src) - pairwise-dist(tgt)| over matched pairs,
        # estimated on ``iso_cap`` matches sampled with an even stride
        # across the matched set (see docstring). The compacted order is
        # voxel-index order = grid-cell order, i.e. spatial order — taking
        # the FIRST iso_cap would evaluate the gate on one spatially
        # clustered corner of the patch and pass patches that are rigid
        # there but deforming elsewhere; the stride spreads the sample
        # over the whole patch at identical cost.
        Fi = min(F, int(iso_cap))
        n_comp = jnp.minimum(n_match, F)  # matched prefix length
        ar = jnp.arange(Fi, dtype=jnp.int32)
        pos = jnp.where(
            n_comp > Fi,
            (ar.astype(jnp.float32)
             * (n_comp.astype(jnp.float32) / Fi)).astype(jnp.int32),
            ar,
        )
        pos = jnp.clip(pos, 0, F - 1)
        s_i = jnp.take(src_m, pos, axis=0)
        t_i = jnp.take(tgt_m, pos, axis=0)
        m_i = jnp.take(mv, pos)

        def pd2(x):
            out = None
            for d in range(3):
                cd = x[:, None, d] - x[None, :, d]
                out = cd * cd if out is None else out + cd * cd
            return jnp.sqrt(jnp.maximum(out, 0.0))

        diff = jnp.abs(pd2(s_i) - pd2(t_i))
        pair_ok = m_i[:, None] & m_i[None, :]
        off_diag = ~jnp.eye(Fi, dtype=bool)
        wgt = (pair_ok & off_diag).astype(src_m.dtype)
        n_off = jnp.maximum(jnp.sum(wgt), 1.0)
        dist_mean = jnp.sum(diff * wgt) / n_off
        ratio_inlier = jnp.sum((diff <= thres_dist_diff) * wgt) / n_off
        gated = n_match >= num_min_quality
        quality_ok = jnp.where(
            gated,
            (ratio_inlier > thres_inlier_ratio) & (dist_mean < thres_dist_diff),
            True,
        )

        # SVD fit then ICP seeded with it (base:3341-3360). The reference
        # hardcodes point2point at this call site but exposes
        # point2plane/generalized_icp in its toolbox (o3d_tools.py:33-56);
        # ``icp_type`` (config key of the same name) selects the variant.
        R0, t0, _, _ = weighted_kabsch(src_m, tgt_m, wts)
        icp = icp_by_type(
            icp_type,
            src_m,
            tgt_m,
            icp_threshold,
            src_mask=mv,
            tgt_mask=mv,
            max_iter=icp_max_iter,
            R_init=R0,
            t_init=t0,
        )
        valid = quality_ok & (n_match >= num_min_fine)
        return icp.R, icp.t, icp.inlier_rmse, valid, n_match

    def chunk_fn(args):
        return jax.vmap(one_pair)(*args)

    pad = (-Pairs) % pair_chunk
    sm = jnp.pad(src_members, ((0, pad), (0, 0)))
    mm = jnp.pad(src_member_mask, ((0, pad), (0, 0)))
    pl = jnp.pad(pair_tgt_label, (0, pad), constant_values=-1)
    nc = sm.shape[0] // pair_chunk
    smc = sm.reshape(nc, pair_chunk, P)
    mmc = mm.reshape(nc, pair_chunk, P)
    plc = pl.reshape(nc, pair_chunk)

    # Dead-pair skipping: a pair with label -1 or an empty member mask
    # solves to exactly (I, 0, rmse 0, valid False, 0 matches) — see the
    # degenerate-Kabsch/ICP fallbacks — and at production caps MOST slots
    # are dead (sv_cap bounds the worst case; real supervoxel counts run
    # ~4x lower, and the mutual coarse matcher invalidates more). Groups
    # of chunks with no live pair skip the solve entirely — one lax.cond
    # per GROUP, not per chunk, the pattern proven by the DIPs
    # padding-skip (pipelines/f2s3.py:94-121; a per-chunk cond inside the
    # nested tile maps blew XLA compile time ~4x there).
    f32 = src_vox.dtype
    chunk_live = jnp.any((plc >= 0) & jnp.any(mmc, axis=-1), axis=-1)
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
        sub = (smc[start:end], mmc[start:end], plc[start:end])

        def _skip(s, g=g):
            return (
                jnp.broadcast_to(
                    jnp.eye(3, dtype=f32), (g, pair_chunk, 3, 3)
                ),
                jnp.zeros((g, pair_chunk, 3), f32),
                jnp.zeros((g, pair_chunk), f32),
                jnp.zeros((g, pair_chunk), bool),
                jnp.zeros((g, pair_chunk), jnp.int32),
            )

        outs.append(
            jax.lax.cond(
                jnp.any(chunk_live[start:end]),
                lambda s: jax.lax.map(chunk_fn, s),
                _skip,
                sub,
            )
        )
        start = end
    R, t, rmse, valid, n_match = (
        jnp.concatenate(parts, axis=0) for parts in zip(*outs)
    )
    return FinePairResult(
        R=R.reshape(-1, 3, 3)[:Pairs],
        t=t.reshape(-1, 3)[:Pairs],
        rmse=rmse.reshape(-1)[:Pairs],
        valid=valid.reshape(-1)[:Pairs],
        n_matches=n_match.reshape(-1)[:Pairs],
    )


def _compact_labels(labels: np.ndarray, min_count: int) -> tuple[np.ndarray, int]:
    """Drop labels with <= min_count members, compact ids to 0..K-1
    (small-patch removal, base:1309-1321)."""
    labels = np.asarray(labels)
    if labels.max() < 0:
        return np.full_like(labels, -1), 0
    counts = np.bincount(labels[labels >= 0])
    keep = counts > min_count
    remap = np.full(counts.size, -1)
    remap[keep] = np.arange(keep.sum())
    out = np.where(labels >= 0, remap[np.clip(labels, 0, None)], -1)
    return out, int(keep.sum())


def coarse_match_2d_votes(
    lab_s: np.ndarray,  # (Vs,) src voxel superpoint labels (-1 = none)
    lab_t: np.ndarray,  # (Vt,) tgt voxel superpoint labels
    c2d_idx: np.ndarray,  # (Vs,) 2D-matched tgt voxel per src voxel
    c2d_valid: np.ndarray,  # (Vs,)
    n_s: int,
    n_t: int,
    min_votes: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Majority vote of per-point 2D matches into target superpoints
    (base:3019-3070): each src voxel with a valid 2D match votes its matched
    tgt voxel's superpoint; each src superpoint takes the most-voted one.

    Returns (tgt_label_of_src_label (n_s,), valid (n_s,)).
    """
    ok = c2d_valid & (lab_s >= 0)
    tlab = lab_t[np.clip(c2d_idx, 0, max(len(lab_t) - 1, 0))]
    ok = ok & (tlab >= 0)
    votes = np.zeros((n_s, n_t), np.int32)
    np.add.at(votes, (lab_s[ok], tlab[ok]), 1)
    best = votes.argmax(axis=1)
    cnt = votes[np.arange(n_s), best]
    return best, cnt >= max(min_votes, 1)


def run_fusion3d_tile(
    cfg,
    dips_params,
    agg_params,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    *,
    src_halo: np.ndarray | None = None,
    tgt_halo: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    rng_seed: int = 0,
) -> dict:
    """One tile of the fusion_3d pipeline (use_2d_matches=False). ``cfg``
    keys follow the reference fusion YAML schema (max_magnitude,
    icp_threshold, level_of_superpoint, num_min_fine_match,
    num_min_matches_for_quality_check, thres_dist_diff, thres_inlier_ratio,
    num_min_matches_for_small_patch, voxel_size_init,
    output_dir/output_folder, dataset, assign_type, output_tgt2src)."""
    return _fusion_tile_core(
        cfg,
        dips_params,
        agg_params,
        src_core,
        tgt_core,
        image_data=None,
        src_halo=src_halo,
        tgt_halo=tgt_halo,
        tile_id=tile_id,
        logger=logger,
        rng_seed=rng_seed,
    )


def run_fusion_tile(
    cfg,
    dips_params,
    agg_params,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    src_image: np.ndarray,
    tgt_image: np.ndarray,
    intrinsic: np.ndarray,
    src_extrinsic: np.ndarray,
    tgt_extrinsic: np.ndarray,
    *,
    corres_2d: np.ndarray | None = None,
    src_images: list | None = None,
    tgt_images: list | None = None,
    src_extrinsics: list | None = None,
    tgt_extrinsics: list | None = None,
    src_halo: np.ndarray | None = None,
    tgt_halo: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    rng_seed: int = 0,
) -> dict:
    """One tile of the full RGB+3D fusion pipeline (use_2d_matches=True,
    main_fusion.py flagship): 3D learned matches fused with 3D matches
    lifted from dense 2D pixel matching, at both the coarse (superpoint
    vote, base:3015-3070) and fine (concatenated point matches,
    base:3258-3296) stages. ``corres_2d`` injects precomputed (M, 4) pixel
    matches (the reference's ``img_matching_result_dir`` path); otherwise
    the configured ``img_matching_type`` matcher runs on the image pair.

    Multi-image (reference ``num_sub_img`` > 1, base:1697-1953): pass
    ``src_images/tgt_images`` + ``src_extrinsics/tgt_extrinsics`` lists
    (best camera first, e.g. from ``image.cameras.select_best_images``);
    every src x tgt pair contributes matches, merged by fill-in."""
    image_data = {
        "src_image": src_image,
        "tgt_image": tgt_image,
        "intrinsic": np.asarray(intrinsic, np.float32),
        "src_extrinsic": np.asarray(src_extrinsic, np.float32),
        "tgt_extrinsic": np.asarray(tgt_extrinsic, np.float32),
        "corres_2d": corres_2d,
        "src_images": src_images,
        "tgt_images": tgt_images,
        "src_extrinsics": [np.asarray(e, np.float32) for e in src_extrinsics]
        if src_extrinsics
        else None,
        "tgt_extrinsics": [np.asarray(e, np.float32) for e in tgt_extrinsics]
        if tgt_extrinsics
        else None,
    }
    return _fusion_tile_core(
        cfg,
        dips_params,
        agg_params,
        src_core,
        tgt_core,
        image_data=image_data,
        src_halo=src_halo,
        tgt_halo=tgt_halo,
        tile_id=tile_id,
        logger=logger,
        rng_seed=rng_seed,
    )


def _fusion_tile_core(
    cfg,
    dips_params,
    agg_params,
    src_core: np.ndarray,
    tgt_core: np.ndarray,
    *,
    image_data: dict | None = None,
    src_halo: np.ndarray | None = None,
    tgt_halo: np.ndarray | None = None,
    tile_id: int | str = 0,
    logger=None,
    rng_seed: int = 0,
) -> dict:
    """Shared coarse-to-fine tile solve; the 2D-match channel is active when
    ``image_data`` is given (fusion) and absent for fusion_3d."""
    from fusion4landslide_tpu.io.results import (
        save_txt,
        dvf_magnitudes,
        save_dvfms,
        visual_clamp_magnitude,
    )
    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn

    if src_halo is None:
        src_halo = src_core
    if tgt_halo is None:
        tgt_halo = tgt_core

    center = src_core.mean(axis=0)
    s = (src_core - center).astype(np.float32)
    t = (tgt_core - center).astype(np.float32)
    sh = (src_halo - center).astype(np.float32)
    th = (tgt_halo - center).astype(np.float32)

    max_mag = float(cfg.get("max_magnitude", 10.0))
    icp_thr = float(cfg.get("icp_threshold", 0.1))
    icp_type = str(cfg.get("icp_type", "point2point"))
    # icp_refine: False skips the post-SVD ICP refinement (reference
    # base:3346; max_iter=0 returns the SVD transform with its metrics).
    icp_iter = 30 if bool(cfg.get("icp_refine", True)) else 0
    levels = list(cfg.get("level_of_superpoint", [1, 2, 3]) or [1])
    num_min_fine = int(cfg.get("num_min_fine_match", 10))
    # Per-pair match subsample for the fine SVD/ICP solve. Default matches
    # the device step's production setting so mesh on/off solve identical
    # match sets (tools/parity_check.py measured the old host default of
    # 1024 vs the mesh's 256 as a ~3 mm pairwise field floor on patches
    # with >256 matches; the reference solves over ALL matches —
    # fine_max_matches: 0 disables the cap for reference-exact sets).
    fine_cap = int(cfg.get("fine_max_matches", 256)) or (1 << 30)
    num_min_quality = int(cfg.get("num_min_matches_for_quality_check", 10))
    thres_dd = float(cfg.get("thres_dist_diff", 0.5))
    thres_ir = float(cfg.get("thres_inlier_ratio", 0.15))
    if not bool(cfg.get("remove_low_quality_patch_matches", True)):
        # Reference base:3299: the isometry quality gate is optional —
        # disable both of its thresholds.
        thres_ir = 0.0
        thres_dd = float("inf")
    # coarse_refinement_3d_type (base:2977-2999): 'nn_mutual' (default)
    # adds the mutual check; 'only_max_mag' keeps every in-magnitude NN.
    mutual_3d = (
        str(cfg.get("coarse_refinement_3d_type", "nn_mutual"))
        != "only_max_mag"
    )
    small_patch = int(cfg.get("num_min_matches_for_small_patch", 10))
    assign_type = str(cfg.get("assign_type", "assign_then_nn"))
    out_tgt2src = bool(cfg.get("output_tgt2src", False))

    from fusion4landslide_tpu.utils.timing import StageTimer

    timer = StageTimer()

    # F4L_SUBSTAGES=1 adds device-synchronised sub-stage timers inside the
    # match stages (a tiny device->host read per boundary; the tunnelled TPU
    # acks dispatch before completion, so only a transfer truly syncs).
    _substages = os.environ.get("F4L_SUBSTAGES") == "1"

    def _sync(x):
        if _substages:
            np.asarray(jax.device_get(jnp.ravel(x)[-1:]))

    def _log(msg):
        if logger:
            logger.info(msg)

    _log(f"tile {tile_id}: stage median_resolution ({s.shape[0]} pts)")
    key = jax.random.PRNGKey(rng_seed)
    k_s, k_t = jax.random.split(key)

    # --- 1. median resolution + adaptive voxel subsampling (base:1012-1030).
    with timer.stage("median_resolution"):
        res_s = float(median_nn_distance(jnp.asarray(s)))
        res_t = float(median_nn_distance(jnp.asarray(t)))
    median_res = max(res_s, res_t)
    _log(f"tile {tile_id}: stage voxel_subsampling (res={median_res:.4f})")
    with timer.stage("voxel_subsampling"):
        # Shared grid origin = union min corner of both clouds: phase-aligns
        # the src and tgt voxel grids, translation-covariantly (identical to
        # the mesh path's origin — pipelines/fusion_device.py voxel note).
        grid0 = np.minimum(s.min(axis=0), t.min(axis=0)).astype(np.float32)
        s_cent, s_p2v, s_cnt, s_nv = voxel_downsample(
            jnp.asarray(s), median_res, origin=jnp.asarray(grid0)
        )
        t_cent, t_p2v, t_cnt, t_nv = voxel_downsample(
            jnp.asarray(t), median_res, origin=jnp.asarray(grid0)
        )
    s_nv, t_nv = int(s_nv), int(t_nv)
    src_vox = np.asarray(s_cent)[:s_nv]
    tgt_vox = np.asarray(t_cent)[:t_nv]
    s_p2v = np.asarray(s_p2v)
    t_p2v = np.asarray(t_p2v)
    if logger:
        logger.info(
            "tile %s: median_res=%.4f, voxels src=%d tgt=%d",
            tile_id, median_res, s_nv, t_nv,
        )

    # --- 2. DIPs descriptors on the voxel clouds (base:1965-2049), cached
    # as features_tile_N.npz (point_feat_compute: False loads the cache —
    # reference base:2039-2049).
    radius = float(np.sqrt(3) * 10.0 * median_res)
    feat_kw = dict(
        k_max=int(cfg.get("feat_k_max", 512)),
        patch_points=int(cfg.get("feat_patch_points", 256)),
        chunk=int(cfg.get("feat_chunk", 2048)),
        dtype=cfg.get("feat_dtype"),  # 'bfloat16' halves descriptor-net
    )                                 # HBM traffic; descriptors re-normed f32

    _log(f"tile {tile_id}: stage dips_features (radius={radius:.3f})")

    def _compute_feats():
        # Device arrays, not numpy: the consumers (global 3D matches, the
        # per-level aggregation) run on device, and np.savez converts lazily
        # — so the ~50MB of descriptors only crosses the device link when
        # save_interim actually persists them.
        return {
            "src_feat": compute_dips_features(
                dips_params, jnp.asarray(src_vox), jnp.asarray(sh),
                radius, k_s, **feat_kw,
            ),
            "tgt_feat": compute_dips_features(
                dips_params, jnp.asarray(tgt_vox), jnp.asarray(th),
                radius, k_t, **feat_kw,
            ),
        }

    from fusion4landslide_tpu.pipelines.driver import load_or_compute_features

    with timer.stage("dips_features"):
        feats = load_or_compute_features(
            cfg, tile_id, "features", _compute_feats, logger
        )
    src_feat = feats["src_feat"]
    tgt_feat = feats["tgt_feat"]
    if src_feat.shape[0] != s_nv or tgt_feat.shape[0] != t_nv:
        if logger:
            logger.warning(
                "cached features shape mismatch (%d/%d vs %d/%d voxels) — "
                "recomputing", src_feat.shape[0], tgt_feat.shape[0], s_nv, t_nv,
            )
        feats = _compute_feats()
        src_feat = feats["src_feat"]
        tgt_feat = feats["tgt_feat"]

    # --- 3. Global 3D voxel matches (base:2756-2889).
    _log(f"tile {tile_id}: stage global_3d_matches")
    with timer.stage("global_3d_matches"):
        # One upload of the big per-tile constants; the level loop and the
        # fine matcher reuse these device handles (re-pushing ~20MB tables
        # over the device link per level dominated the match stages).
        src_feat_d = jnp.asarray(src_feat)
        tgt_feat_d = jnp.asarray(tgt_feat)
        src_vox_d = jnp.asarray(src_vox)
        tgt_vox_d = jnp.asarray(tgt_vox)
        # Banded magnitude-gated search by default (ops.gated_match; see
        # fusion_device for semantics); global_matching_gated: false keeps
        # the reference's search-then-gate brute force (base:2756-2889).
        if bool(cfg.get("global_matching_gated", True)):
            from fusion4landslide_tpu.ops.gated_match import gated_feature_nn1

            # Pad to power-of-two buckets (like global_matches_3d) so
            # per-tile voxel-count variation reuses the compilation.
            nv, mv = src_feat.shape[0], tgt_feat.shape[0]
            nb_, mb_ = bucket_size(nv), bucket_size(mv)
            _, g_idx, g_valid = gated_feature_nn1(
                jnp.pad(src_feat_d, ((0, nb_ - nv), (0, 0))),
                jnp.pad(tgt_feat_d, ((0, mb_ - mv), (0, 0))),
                jnp.pad(src_vox_d, ((0, nb_ - nv), (0, 0))),
                jnp.pad(tgt_vox_d, ((0, mb_ - mv), (0, 0))),
                np.float32(max_mag),
                jnp.arange(nb_) < nv,
                jnp.arange(mb_) < mv,
            )
            g_idx, g_valid = g_idx[:nv], g_valid[:nv]
        else:
            g_idx, g_valid = global_matches_3d(
                src_feat_d, tgt_feat_d, src_vox_d, tgt_vox_d, max_mag,
            )
        g_idx = np.asarray(g_idx)
        g_valid = np.asarray(g_valid)

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)

    # --- 3b. Global 3D voxel matches from 2D pixel matches (fusion only;
    # base:1480-1675): project voxel clouds into the images, run/ingest the
    # dense 2D matcher, chain pixels to 3D point pairs, magnitude-gate.
    c2d_idx = c2d_valid = None
    if image_data is not None:
        from fusion4landslide_tpu.image.geometry import (
            chain_2d_matches_to_3d,
            lift_matches_to_3d,
            project_points,
            rasterize_depth,
        )
        from fusion4landslide_tpu.image.matching import match_epoch_images

        image_size = tuple(
            cfg.get("image_size") or image_data["src_image"].shape[:2]
        )
        pixel_thres = float(cfg.get("pixel_thres", 5))
        v_flip = str(cfg.get("dataset", "")).lower() != "rockfall_simulator"
        lifting = str(cfg.get("lifting_type", "nn_search"))
        mode = str(cfg.get("matches_from_2d_type", "nn_src_only"))
        if mode == "nn_src_with_tgt_for_visualize":
            mode = "nn_src_only"

        # Multi-image (num_sub_img > 1, base:1697-1953): every src x tgt
        # image-pair contributes a correspondence channel; channels merge by
        # fill-in (first pair is primary, later pairs fill unmatched slots).
        src_images = image_data.get("src_images") or [image_data["src_image"]]
        tgt_images = image_data.get("tgt_images") or [image_data["tgt_image"]]
        src_exts = image_data.get("src_extrinsics") or [
            image_data["src_extrinsic"]
        ]
        tgt_exts = image_data.get("tgt_extrinsics") or [
            image_data["tgt_extrinsic"]
        ]
        corres_pre = image_data.get("corres_2d")
        single_pair = len(src_images) == 1 and len(tgt_images) == 1
        K_j = jnp.asarray(image_data["intrinsic"])

        pair_channels = []
        n_px_total = 0
        # Projections depend only on their own image's extrinsic — compute
        # each once, outside the cross-pair loop.
        src_projs = [
            project_points(
                jnp.asarray(src_vox + center.astype(np.float32)),
                jnp.asarray(sext), K_j, image_size, v_flip=v_flip,
            )
            for sext in src_exts
        ]
        tgt_projs = [
            project_points(
                jnp.asarray(tgt_vox + center.astype(np.float32)),
                jnp.asarray(text), K_j, image_size, v_flip=v_flip,
            )
            for text in tgt_exts
        ]
        for a, (simg, sext) in enumerate(zip(src_images, src_exts)):
            for b, (timg, text) in enumerate(zip(tgt_images, tgt_exts)):
                uv_s, dep_s, pval_s = src_projs[a]
                uv_t, dep_t, pval_t = tgt_projs[b]
                if corres_pre is not None and single_pair:
                    corres_2d = corres_pre
                else:
                    corres_2d = match_epoch_images(
                        simg,
                        timg,
                        matcher=str(
                            cfg.get("img_matching_type", "zncc")
                        ).lower(),
                        crop_size=tuple(cfg["crop_size"])
                        if cfg.get("crop_size")
                        else None,
                        overlap_size=tuple(cfg["overlap_size"])
                        if cfg.get("overlap_size")
                        else None,
                        cross_crops=bool(
                            cfg.get("img_matching_cross_crops", False)
                        ),
                        max_flow_px=cfg.get("max_flow_px"),
                        logger=logger,
                        weights=cfg.get("img_matcher_weights"),
                    )
                n_px_total += len(corres_2d)
                if bool(
                    cfg.get("save_img_matching_visualization", False)
                ) and len(corres_2d):
                    # Reference base:1213-1224 (make_matching_figure JPG);
                    # headless matplotlib export, see utils/visualization.
                    from fusion4landslide_tpu.utils.visualization import (
                        save_matching_figure,
                    )

                    save_matching_figure(
                        simg,
                        timg,
                        np.asarray(corres_2d),
                        osp.join(
                            out_root,
                            "img_matching_results",
                            "visualization",
                            f"src_{a}_tgt_{b}_tile_{tile_id}.jpg",
                        ),
                        text=f"tile {tile_id} src img {a} x tgt img {b}",
                    )
                if not len(corres_2d):
                    continue
                c2 = jnp.asarray(np.asarray(corres_2d, np.float32))
                if lifting == "interpolation":
                    # base:664-728: depth-map lookup + K^-1 + inverse
                    # extrinsic per endpoint; lifted positions associate to
                    # the nearest voxel in 3D.
                    dmap_s, _ = rasterize_depth(uv_s, dep_s, pval_s, image_size)
                    dmap_t, _ = rasterize_depth(uv_t, dep_t, pval_t, image_size)
                    p3d, ok3 = lift_matches_to_3d(
                        c2, dmap_s, dmap_t, jnp.asarray(sext),
                        jnp.asarray(text), K_j, image_size, v_flip=v_flip,
                    )
                    ds2, i_s = nn1(
                        p3d[:, 0:3] - jnp.asarray(center, jnp.float32),
                        jnp.asarray(src_vox),
                    )
                    dt2, i_t = nn1(
                        p3d[:, 3:6] - jnp.asarray(center, jnp.float32),
                        jnp.asarray(tgt_vox),
                    )
                    thr3 = 2.0 * max(median_res, 1e-6)
                    ok = (
                        np.asarray(ok3)
                        & (np.sqrt(np.asarray(ds2)) < thr3)
                        & (np.sqrt(np.asarray(dt2)) < thr3)
                    )
                    t2d = np.zeros(s_nv, np.int64)
                    v2dm = np.zeros(s_nv, bool)
                    src_i = np.asarray(i_s)[ok]
                    t2d[src_i] = np.asarray(i_t)[ok]
                    v2dm[src_i] = True
                else:
                    t2d, v2dm = chain_2d_matches_to_3d(
                        c2, uv_s, uv_t, pixel_thres,
                        src_valid=pval_s, tgt_valid=pval_t, mode=mode,
                    )
                    t2d = np.asarray(t2d)
                    v2dm = np.asarray(v2dm)
                # Per-pair max-magnitude gate (base:1640-1646).
                mag2d = np.linalg.norm(
                    tgt_vox[np.clip(t2d, 0, max(t_nv - 1, 0))] - src_vox,
                    axis=1,
                )
                pair_channels.append((t2d, v2dm & (mag2d <= max_mag)))

        if pair_channels:
            # Fill-in merge over image pairs (base:1940-1953).
            c2d_idx, c2d_valid = pair_channels[0]
            c2d_idx = c2d_idx.copy()
            c2d_valid = c2d_valid.copy()
            for t2d, v2dm in pair_channels[1:]:
                fill = ~c2d_valid & v2dm
                c2d_idx[fill] = t2d[fill]
                c2d_valid |= fill
        else:
            c2d_idx = np.zeros(s_nv, np.int64)
            c2d_valid = np.zeros(s_nv, bool)
        if logger:
            logger.info(
                "tile %s: %d 2D pixel matches over %d image pair(s) -> %d "
                "lifted 3D voxel matches",
                tile_id, n_px_total, max(len(pair_channels), 1),
                int(c2d_valid.sum()),
            )
        # Interim artifact: 2D-only dvfms pre-pruning (base:1531-1557).
        if c2d_valid.any():
            interim2d = np.hstack(
                [
                    src_vox[c2d_valid] + center,
                    np.linalg.norm(
                        tgt_vox[c2d_idx[c2d_valid]] - src_vox[c2d_valid],
                        axis=1,
                    )[:, None],
                ]
            )
            save_txt(
                osp.join(
                    results_dir,
                    f"c2f_dvfms_from_global_2d_src2tgt_wo_pruning_visualize_tile_{tile_id}.txt",
                ),
                visual_clamp_magnitude(interim2d, cfg.get("dataset")),
            )
    # Interim artifact: global-3D dvfms pre-pruning (base:2908-2920).
    interim = np.hstack(
        [
            src_vox[g_valid] + center,
            np.linalg.norm(
                tgt_vox[g_idx[g_valid]] - src_vox[g_valid], axis=1
            )[:, None],
        ]
    )
    vis = visual_clamp_magnitude(interim, cfg.get("dataset"))
    save_txt(
        osp.join(
            results_dir,
            f"c2f_dvfms_from_global_3d_src2tgt_wo_pruning_visualize_tile_{tile_id}.txt",
        ),
        vis,
    )

    base_svl_radius = max(radius, float(cfg.get("voxel_size_init", 0.0) or 0.0))

    n_src_pts = s.shape[0]
    # Per-level, per-point transforms; merged by priority (level list order).
    merged_R = np.tile(np.eye(3, dtype=np.float32), (n_src_pts, 1, 1))
    merged_t = np.zeros((n_src_pts, 3), np.float32)
    merged_valid = np.zeros(n_src_pts, bool)
    merged_rmse = np.zeros(n_src_pts, np.float32)
    # Which level (index into ``levels``) claimed each point — feeds the
    # reference's cross-level distance-threshold dedup of the output tables
    # (coarse_to_fine_matching.py:40-118, applied when partition_type is
    # 'superpoint' with a level list, :282-287).
    merged_level = np.full(n_src_pts, -1, np.int8)
    # tgt->src: each matched pair's inverse transform applies to the TARGET
    # patch's points (exact reference semantics, base:3386-3393).
    n_tgt_pts = t.shape[0]
    t2s_R = np.tile(np.eye(3, dtype=np.float32), (n_tgt_pts, 1, 1))
    t2s_t = np.zeros((n_tgt_pts, 3), np.float32)
    t2s_valid = np.zeros(n_tgt_pts, bool)
    t2s_level = np.full(n_tgt_pts, -1, np.int8)
    per_level_stats = []

    # Precomputed superpoint partitions (reference partition_type=
    # 'superpoint', files written by the SPT bridge or any external tool in
    # the 15-column format — base:1241-1276): labels are defined on the tile
    # points and transferred to voxels via each voxel's first member point.
    partition_type = str(cfg.get("partition_type", "supervoxel"))
    use_spt_files = partition_type == "superpoint"
    if use_spt_files:
        # Native geometric-feature hierarchy generated when the artifact is
        # absent (the SPT bridge's role, src/superpoint_partition.py:37-162)
        # — one shared loader with the sharded runner, one file parse for
        # all levels.
        from fusion4landslide_tpu.ops.partition_io import (
            load_or_generate_partition_labels,
        )

        pt_labs_s = load_or_generate_partition_labels(
            out_root, partition_type, tile_id, "src", src_core, levels,
            logger=logger,
        )
        pt_labs_t = load_or_generate_partition_labels(
            out_root, partition_type, tile_id, "tgt", tgt_core, levels,
            logger=logger,
        )

        # Representative (first) point per voxel carries its labels.
        first_pt_of_vox_s = np.zeros(s_nv, np.int64)
        first_pt_of_vox_s[s_p2v[::-1][s_p2v[::-1] < s_nv]] = np.arange(
            len(s_p2v)
        )[::-1][s_p2v[::-1] < s_nv]
        first_pt_of_vox_t = np.zeros(t_nv, np.int64)
        first_pt_of_vox_t[t_p2v[::-1][t_p2v[::-1] < t_nv]] = np.arange(
            len(t_p2v)
        )[::-1][t_p2v[::-1] < t_nv]

    # Opt-in interim payload (cfg return_interim: True) — feeds the composed
    # whole-tile reference oracle (tests/test_reference_oracle.py), which
    # re-runs the downstream reference semantics on the SAME voxels /
    # features / labels and compares final DVF fields.
    _keep_interim = bool(cfg.get("return_interim", False))
    _interim_levels: list = []

    # Supervoxel kNN graph + PCA normals are radius-independent: build once
    # per voxel cloud, reuse across all levels (the reference re-runs the
    # full C++ segmentation per level, coarse_to_fine_matching.py:215-287).
    # Levels run as separate per-cloud dispatches at the cloud's native
    # size on purpose: fusing all 2xL instances into one padded lax.map /
    # vmap dispatch measured 2.5-4x SLOWER on v5e (bucket padding inflates
    # the per-instance sorts, and XLA lowers the batched label-propagation
    # scatters poorly).
    _sv_cache: dict = {}

    def _segment(which, vox_arr, svl_radius):
        from fusion4landslide_tpu.ops.normals import pca_normals
        from fusion4landslide_tpu.ops.supervoxel import supervoxel_graph

        if which not in _sv_cache:
            pts = jnp.asarray(vox_arr)
            ni, nm = supervoxel_graph(pts, svl_radius)
            nrm = pca_normals(pts, ni.shape[1], neigh_idx=ni, neigh_mask=nm)
            _sv_cache[which] = (ni, nm, nrm)
        ni, nm, nrm = _sv_cache[which]
        return supervoxel_segmentation(
            jnp.asarray(vox_arr), svl_radius,
            neigh_idx=ni, neigh_mask=nm, normals=nrm,
        )

    for li, level in enumerate(levels):
        _log(f"tile {tile_id}: stage partition level {level}")
        with timer.stage(f"partition_l{level}"):
            if use_spt_files:
                raw_s = pt_labs_s[li][first_pt_of_vox_s]
                raw_t = pt_labs_t[li][first_pt_of_vox_t]
            else:
                svl_radius = base_svl_radius * (2.0 ** (int(level) - 1))
                seg_s = _segment("src", src_vox, svl_radius)
                seg_t = _segment("tgt", tgt_vox, svl_radius)
                raw_s = np.asarray(seg_s.labels)
                raw_t = np.asarray(seg_t.labels)
            lab_s, n_s = _compact_labels(raw_s, small_patch)
            lab_t, n_t = _compact_labels(raw_t, small_patch)
            if bool(cfg.get("use_debugging", False)):
                # Reference debug subsetting (coarse_to_fine_matching.py:
                # 292-308): process only the first num_spt superpoints of
                # each epoch.
                num_spt = int(cfg.get("num_spt", 2))
                lab_s = np.where(lab_s < num_spt, lab_s, -1)
                lab_t = np.where(lab_t < num_spt, lab_t, -1)
                n_s = min(n_s, num_spt)
                n_t = min(n_t, num_spt)
        if _keep_interim:
            _interim_levels.append(
                {"level": level, "lab_s": lab_s.copy(), "lab_t": lab_t.copy(),
                 "raw_s": np.asarray(raw_s).copy(),
                 "raw_t": np.asarray(raw_t).copy(),
                 "n_s": n_s, "n_t": n_t}
            )
        _log(f"tile {tile_id}: stage coarse+fine level {level}")
        mctx = timer.stage(f"match_l{level}")
        with mctx:
            if n_s == 0 or n_t == 0:
                per_level_stats.append((level, 0, 0))
                continue

            S_s, S_t = bucket_size(n_s), bucket_size(n_t)
            cnt_s = np.bincount(lab_s[lab_s >= 0], minlength=n_s)
            cnt_t = np.bincount(lab_t[lab_t >= 0], minlength=n_t)
            P_s = bucket_size(int(cnt_s.max()))
            P_t = bucket_size(int(cnt_t.max()))
            with timer.stage(f"match_l{level}.members"):
                mem_s, memmask_s = label_members(jnp.asarray(lab_s), S_s, P_s)
                mem_t, memmask_t = label_members(jnp.asarray(lab_t), S_t, P_t)
                _sync(memmask_t)

            # --- 5. Superpoint aggregation (base:2561-2656) + coarse matching.
            P_agg = min(int(cfg.get("agg_max_points", 512)), P_s, P_t)
            with timer.stage(f"match_l{level}.agg"):
                spt_feat_s, spt_coord_s = aggregate_superpoints(
                    agg_params, src_feat_d, src_vox_d,
                    mem_s, memmask_s, P_agg=P_agg,
                )
                spt_feat_t, spt_coord_t = aggregate_superpoints(
                    agg_params, tgt_feat_d, tgt_vox_d,
                    mem_t, memmask_t, P_agg=P_agg,
                )
                _sync(spt_feat_t)
            valid_s = jnp.arange(S_s) < n_s
            valid_t = jnp.arange(S_t) < n_t
            # Coarse mode (reference config coarse_matching_{fusion,only_3d,
            # only_2d}; fusion is the default for the RGB+3D method).
            has_2d = c2d_idx is not None
            coarse_only_2d = bool(cfg.get("coarse_matching_only_2d", False)) and has_2d
            coarse_fusion = (
                bool(cfg.get("coarse_matching_fusion", has_2d))
                and has_2d
                and not coarse_only_2d
            )
            pair_list = []
            if not coarse_only_2d:
                with timer.stage(f"match_l{level}.coarse"):
                    tgt_of_src, pair_valid = coarse_match_superpoints(
                        spt_feat_s, spt_coord_s, valid_s,
                        spt_feat_t, spt_coord_t, valid_t,
                        max_mag,
                        mutual=mutual_3d,
                    )
                    tgt_of_src = np.asarray(tgt_of_src)
                    pair_valid = np.asarray(pair_valid)
                src_3d = np.where(pair_valid[:n_s])[0]
                pair_list.append(np.stack([src_3d, tgt_of_src[src_3d]], axis=1))
            if coarse_fusion or coarse_only_2d:
                vote_tgt, vote_ok = coarse_match_2d_votes(
                    lab_s, lab_t, c2d_idx, c2d_valid, n_s, n_t
                )
                src_2d = np.where(vote_ok)[0]
                pair_list.append(np.stack([src_2d, vote_tgt[src_2d]], axis=1))
            pairs = (
                np.unique(np.concatenate(pair_list, axis=0), axis=0)
                if pair_list
                else np.zeros((0, 2), np.int64)
            )

            # --- 6. Fine matching over valid pairs.
            pair_src = pairs[:, 0]
            if pair_src.size == 0:
                per_level_stats.append((level, n_s, 0))
                continue
            pair_tgt = pairs[:, 1]
            fine_only_2d = bool(cfg.get("fine_matching_only_2d", False)) and has_2d
            fine_fusion = (
                bool(cfg.get("fine_matching_fusion", has_2d))
                and has_2d
                and not fine_only_2d
            )
            if fine_only_2d:
                ch1_idx, ch1_valid = c2d_idx, c2d_valid
            else:
                ch1_idx, ch1_valid = g_idx, g_valid
            fine_kw = {}
            if fine_fusion:
                fine_kw = dict(
                    corres2_tgt_idx=jnp.asarray(c2d_idx, jnp.int32),
                    corres2_valid=jnp.asarray(c2d_valid),
                    weighting=bool(cfg.get("weighting_svd", False)),
                )
            # Bucket the pair count so the jitted fine matcher compiles once
            # per bucket instead of once per distinct pair count.
            n_pairs = pair_src.size
            pairs_cap = bucket_size(n_pairs)
            pair_src_b = np.zeros(pairs_cap, np.int64)
            pair_src_b[:n_pairs] = pair_src
            pair_tgt_b = np.full(pairs_cap, -1, np.int64)
            pair_tgt_b[:n_pairs] = pair_tgt
            memmask_pad = jnp.take(memmask_s, jnp.asarray(pair_src_b), axis=0)
            memmask_pad = memmask_pad & (
                jnp.arange(pairs_cap) < n_pairs
            )[:, None]
            with timer.stage(f"match_l{level}.fine"):
                fine = fine_match_pairs(
                    jnp.take(mem_s, jnp.asarray(pair_src_b), axis=0),
                    memmask_pad,
                    jnp.asarray(pair_tgt_b, jnp.int32),
                    jnp.asarray(ch1_idx, jnp.int32),
                    jnp.asarray(ch1_valid),
                    jnp.asarray(lab_t, jnp.int32),
                    src_vox_d,
                    tgt_vox_d,
                    num_min_quality=num_min_quality,
                    thres_dist_diff=thres_dd,
                    thres_inlier_ratio=thres_ir,
                    num_min_fine=num_min_fine,
                    icp_threshold=icp_thr,
                    icp_type=icp_type,
                    icp_max_iter=icp_iter,
                    fine_max_matches=fine_cap,
                    **fine_kw,
                )
                fR = np.asarray(fine.R)[:n_pairs]
                ft = np.asarray(fine.t)[:n_pairs]
                frmse = np.asarray(fine.rmse)[:n_pairs]
                fvalid = np.asarray(fine.valid)[:n_pairs]

            # Map per-pair transforms to per-src-label slots.
            lab_R = np.tile(np.eye(3, dtype=np.float32), (n_s, 1, 1))
            lab_t_arr = np.zeros((n_s, 3), np.float32)
            lab_rmse = np.zeros(n_s, np.float32)
            lab_ok = np.zeros(n_s, bool)
            lab_R[pair_src] = fR
            lab_t_arr[pair_src] = ft
            lab_rmse[pair_src] = frmse
            lab_ok[pair_src] = fvalid

            # Visual debugging exports (the reference's interactive o3d
            # windows, base:3159-3231 / base:4279-4403, as headless PNGs;
            # host path only — the sharded runners are the production
            # path and skip debug rendering).
            from fusion4landslide_tpu.utils.visualization import (
                patch_visualization_requests,
            )

            vis_idx = patch_visualization_requests(
                cfg, len(pair_src), seed=rng_seed
            )
            if len(vis_idx):
                from fusion4landslide_tpu.utils.visualization import (
                    save_matches_within_patch_figure,
                    save_patch_match_figure,
                )

                vis_dir = osp.join(out_root, "visualization")
                off = tuple(cfg.get("offset") or (75.0, 75.0, 75.0))
                small = cfg.get("small_region")
                within = bool(
                    cfg.get("visualize_matches_within_patch", False)
                )
                ch1_idx_np = np.asarray(ch1_idx)
                ch1_valid_np = np.asarray(ch1_valid)
                for k in vis_idx:
                    ps, pt = int(pair_src[k]), int(pair_tgt[k])
                    p_s = src_vox[lab_s == ps] + center
                    p_t = tgt_vox[lab_t == pt] + center
                    save_patch_match_figure(
                        src_vox + center,
                        tgt_vox + center,
                        p_s,
                        p_t,
                        osp.join(
                            vis_dir,
                            f"patch_match_tile_{tile_id}_l{level}_{k}.png",
                        ),
                        offset=off,
                        small_region=(
                            float(small) if small is not None else None
                        ),
                    )
                    if within:
                        sel = (
                            (lab_s == ps)
                            & ch1_valid_np
                            & (lab_t[np.clip(ch1_idx_np, 0, None)] == pt)
                        )
                        save_matches_within_patch_figure(
                            p_s,
                            p_t,
                            src_vox[sel] + center,
                            tgt_vox[ch1_idx_np[sel]] + center,
                            osp.join(
                                vis_dir,
                                f"matches_within_patch_tile_{tile_id}"
                                f"_l{level}_{k}.png",
                            ),
                        )

            # --- 7. Dense per-point assignment, merged by level priority.
            pt_label = np.where(
                (s_p2v < s_nv), lab_s[np.clip(s_p2v, 0, max(s_nv - 1, 0))], -1
            )
            pt_has = (pt_label >= 0) & lab_ok[np.clip(pt_label, 0, None)]
            take = pt_has & ~merged_valid
            lbl = np.clip(pt_label, 0, None)
            merged_R[take] = lab_R[lbl[take]]
            merged_t[take] = lab_t_arr[lbl[take]]
            merged_rmse[take] = lab_rmse[lbl[take]]
            merged_level[take] = li
            merged_valid |= take

            if out_tgt2src:
                # Per-pair inverse transform onto the target patch's points
                # (base:3386-3393), merged across levels by the same priority.
                Rinv = fR.transpose(0, 2, 1)
                tinv = -np.einsum("nij,nj->ni", Rinv, ft)
                tlab_R = np.tile(np.eye(3, dtype=np.float32), (n_t, 1, 1))
                tlab_t = np.zeros((n_t, 3), np.float32)
                tlab_ok = np.zeros(n_t, bool)
                sel = fvalid
                tlab_R[pair_tgt[sel]] = Rinv[sel]
                tlab_t[pair_tgt[sel]] = tinv[sel]
                tlab_ok[pair_tgt[sel]] = True
                tp_label = np.where(
                    t_p2v < t_nv, lab_t[np.clip(t_p2v, 0, max(t_nv - 1, 0))], -1
                )
                tp_has = (tp_label >= 0) & tlab_ok[np.clip(tp_label, 0, None)]
                ttake = tp_has & ~t2s_valid
                tl = np.clip(tp_label, 0, None)
                t2s_R[ttake] = tlab_R[tl[ttake]]
                t2s_t[ttake] = tlab_t[tl[ttake]]
                t2s_level[ttake] = li
                t2s_valid |= ttake

            per_level_stats.append((level, n_s, int(fvalid.sum())))
        if logger:
            logger.info(
                "tile %s level %s: %d src spts, %d matched pairs, %d fine-valid",
                tile_id, level, n_s, pair_src.size, int(fvalid.sum()),
            )

    # Dense output: R p + t for every assigned source point (base:3371-3380).
    # The text-table writes run on a background thread so the sparse
    # re-association's device work proceeds concurrently; the executor is
    # joined (propagating any write error) before returning.
    from concurrent.futures import ThreadPoolExecutor

    writer = ThreadPoolExecutor(max_workers=1)
    write_futs = []
    # The reference dedups the per-level output tables by priority with a
    # distance threshold when partition_type is 'superpoint' with a level
    # list (coarse_to_fine_matching.py:282-287 ->
    # merge_correspondences_by_priority_with_distance_threshold, :40-118).
    use_ref_merge = use_spt_files and len(levels) > 1
    merge_thr = float(cfg.get("merge_distance_threshold", 1e-3))

    def _ref_merge(rows: np.ndarray, row_level: np.ndarray) -> np.ndarray:
        from fusion4landslide_tpu.ops.merge import (
            merge_correspondences_by_priority,
        )

        return merge_correspondences_by_priority(
            [rows[row_level == li] for li in range(len(levels))],
            distance_threshold=merge_thr,
        )

    with timer.stage("dense_output"):
        moved = np.einsum("nij,nj->ni", merged_R, s) + merged_t
        dense_src = src_core[merged_valid]
        dense_tgt = moved[merged_valid] + center
        dvfs_dense = np.hstack([dense_src, dense_tgt])
        if use_ref_merge:
            dvfs_dense = _ref_merge(dvfs_dense, merged_level[merged_valid])
        dvfms = np.hstack(
            [dvfs_dense[:, :3], dvf_magnitudes(dvfs_dense)[:, None]]
        )

        def _write_dense(dvfs_dense=dvfs_dense, dvfms=dvfms):
            save_txt(
                osp.join(results_dir, f"c2f_dvfs_src2tgt_tile_{tile_id}.txt"),
                dvfs_dense,
            )
            save_txt(
                osp.join(results_dir, f"c2f_dvfms_src2tgt_tile_{tile_id}.txt"),
                dvfms,
            )
            if dvfms.shape[0] > 2:
                save_txt(
                    osp.join(
                        results_dir,
                        f"c2f_dvfms_src2tgt_visualize_tile_{tile_id}.txt",
                    ),
                    visual_clamp_magnitude(dvfms, cfg.get("dataset")),
                )

        write_futs.append(writer.submit(_write_dense))

    # Sparse 'assign_then_nn' output: re-associate moved points with actual
    # target points within the adaptive threshold (base:3414-3436).
    dvfs_sparse = None
    if assign_type == "assign_then_nn" and merged_valid.any():
        with timer.stage("sparse_assign"):
            adaptive = np.maximum(2.0 * merged_rmse[merged_valid], median_res)
            radius_nn = float(np.maximum(adaptive.max(), median_res))
            nq = int(merged_valid.sum())
            qb = bucket_size(nq)
            q = np.zeros((qb, 3), np.float32)
            q[:nq] = moved[merged_valid]
            d2, nn_idx = _sparse_assign_core(
                jnp.asarray(t), jnp.asarray(q),
                jnp.asarray(radius_nn, jnp.float32),
            )
            d = np.sqrt(np.asarray(d2)[:nq])
            ok = np.isfinite(d) & (d < adaptive)
            nn_idx = np.asarray(nn_idx)[:nq]
            dvfs_sparse = np.hstack(
                [src_core[merged_valid][ok], t[nn_idx[ok]] + center]
            )
            if use_ref_merge:
                dvfs_sparse = _ref_merge(
                    dvfs_sparse, merged_level[merged_valid][ok]
                )
            sparse_ms = np.hstack(
                [dvfs_sparse[:, :3], dvf_magnitudes(dvfs_sparse)[:, None]]
            )
            write_futs.append(writer.submit(
                save_txt,
                osp.join(
                    results_dir,
                    f"c2f_dvfms_src2tgt_discrete_visualize_tile_{tile_id}.txt",
                ),
                visual_clamp_magnitude(sparse_ms, cfg.get("dataset")),
            ))

    # tgt -> src output (base:3386-3393): each matched pair's inverse
    # transform applied to its target patch's points (exact semantics;
    # unmatched target points are not written, as in the reference).
    if out_tgt2src and t2s_valid.any():
        src_est = (
            np.einsum("nij,nj->ni", t2s_R[t2s_valid], t[t2s_valid])
            + t2s_t[t2s_valid]
        )
        dvfs_t2s = np.hstack([src_est + center, tgt_core[t2s_valid]])
        if use_ref_merge:
            dvfs_t2s = _ref_merge(dvfs_t2s, t2s_level[t2s_valid])
        save_txt(
            osp.join(results_dir, f"c2f_dvfms_tgt2src_tile_{tile_id}.txt"),
            np.hstack(
                [
                    dvfs_t2s[:, 3:6],
                    dvf_magnitudes(dvfs_t2s)[:, None],
                ]
            ),
        )

    for fut in write_futs:
        fut.result()
    writer.shutdown()

    if logger:
        logger.info("tile %s stage times:\n%s", tile_id, timer.report())
    out = {
        "dvfs": dvfs_dense,
        "dvfs_sparse": dvfs_sparse,
        "assigned_fraction": float(merged_valid.mean()),
        "per_level": per_level_stats,
        "R": merged_R,
        "t": merged_t,
        "valid": merged_valid,
        "n_2d_matches": int(c2d_valid.sum()) if c2d_valid is not None else 0,
    }
    if _keep_interim:
        out["interim"] = {
            "center": center,
            "median_res": median_res,
            "src_vox": src_vox,
            "tgt_vox": tgt_vox,
            "s_p2v": s_p2v,
            "t_p2v": t_p2v,
            "src_feat": np.asarray(src_feat, np.float32),
            "tgt_feat": np.asarray(tgt_feat, np.float32),
            "g_idx": g_idx,
            "g_valid": g_valid,
            "levels": _interim_levels,
        }
    return out
