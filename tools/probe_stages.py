#!/usr/bin/env python
"""Per-stage timing probe of the fusion_3d device step on the live chip.

Times each stage of ``pipelines.fusion_device.fusion3d_tile_step`` as an
independent jit (same inputs/statics as ``bench.py``'s e2e mode) so the
optimisation budget is always itemised. Results are synced by a host
transfer (on the tunnelled backend ``block_until_ready`` returns at
dispatch-ack).

Usage: python tools/probe_stages.py [N_CORE] [--full]

Default geometry mirrors ``bench.py``'s core/halo query split (src = core
+ 5 m margin, tgt = core + 10 m margin, 20 m halo, 100 pts/m^2) with
asymmetric src/tgt buckets and per-side superpoint caps; ``--full`` probes
the symmetric full-overlap clouds of N_CORE points each (the pre-split
round-3/4 shape, src == tgt bucket).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv[1:]
    n = int(args[0]) if args else 100_000
    from fusion4landslide_tpu.utils.platform import apply_platform_from_env

    # Honours F4L_PLATFORM and enables the compile cache, like the other
    # entrypoints (main_*.py, bench.py).
    apply_platform_from_env()
    import jax
    import jax.numpy as jnp

    from bench import (
        _keepalive,
        _models,
        synth_epoch_pair,
        synth_split_tile,
    )
    from fusion4landslide_tpu.ops.hashgrid import (
        knn_grid_traced,
        median_nn_distance_traced,
    )
    from fusion4landslide_tpu.ops.segments import bucket_size, label_members
    from fusion4landslide_tpu.ops.supervoxel import (
        supervoxel_graph,
        supervoxel_segmentation,
    )
    from fusion4landslide_tpu.ops.normals import pca_normals
    from fusion4landslide_tpu.ops.voxel import voxel_downsample
    from fusion4landslide_tpu.pipelines.f2s3_device import (
        dips_features_device,
        drop_small_and_compact,
    )
    from fusion4landslide_tpu.pipelines.fusion import (
        fine_match_pairs,
        global_matches_3d,
    )
    from fusion4landslide_tpu.pipelines.fusion_device import (
        _aggregate_chunked,
        _segment_centroids,
        coarse_match_superpoints_chunked,
    )

    stop = _keepalive()
    dips_params, agg_params = _models()
    if full:
        src_np, tgt_np, extent = synth_epoch_pair(n)
        nq = mt = n
    else:
        src_np, tgt_np, _core, _moving = synth_split_tile(n, 5.0, 10.0)
        nq, mt = len(src_np), len(tgt_np)
    N = bucket_size(nq)
    M = bucket_size(mt)
    c = src_np.mean(axis=0)
    src = jnp.zeros((N, 3), jnp.float32).at[:nq].set(src_np - c)
    tgt = jnp.zeros((M, 3), jnp.float32).at[:mt].set(tgt_np - c)
    mask = jnp.arange(N) < nq
    tmask_arr = jnp.arange(M) < mt
    key = jax.random.PRNGKey(0)
    sv_cap = max(bucket_size(max(N // 16, 1)), 64)
    sv_cap_t = max(bucket_size(max(M // 16, 1)), 64)
    print(
        f"# src {nq} pts in bucket {N} (sv_cap {sv_cap}), "
        f"tgt {mt} pts in bucket {M} (sv_cap {sv_cap_t}), "
        f"{'full-overlap' if full else 'core/halo split'}",
        flush=True,
    )
    timings: dict[str, float] = {}

    def timeit(name, fn, *args, reps=3, **kw):
        f = jax.jit(fn, **kw)
        out = f(*args)
        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )  # sync cold
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree.map(
                lambda x: np.asarray(jnp.ravel(x)[:1])
                if hasattr(x, "shape")
                else x,
                out,
            )
            best = min(best, time.perf_counter() - t0)
        timings[name] = best
        print(f"{name:34s} {best * 1e3:9.1f} ms", flush=True)
        return f(*args)

    res = timeit(
        "median_resolution x2",
        lambda a, b, ma, mb: (
            median_nn_distance_traced(a, ma),
            median_nn_distance_traced(b, mb),
        ),
        src, tgt, mask, tmask_arr,
    )
    median_res = jnp.maximum(res[0], res[1])
    radius = jnp.sqrt(3.0) * 10.0 * median_res

    vox = timeit(
        "voxel_downsample x2",
        lambda a, b, ma, mb, r: (
            voxel_downsample(a, r, ma),
            voxel_downsample(b, r, mb),
        ),
        src, tgt, mask, tmask_arr, median_res,
    )
    (s_cent, s_p2v, _, s_nv), (t_cent, t_p2v, _, t_nv) = vox
    vvalid_s = jnp.arange(N) < s_nv
    vvalid_t = jnp.arange(M) < t_nv

    feat_kw = dict(
        k_max=512, patch_points=256, chunk=2048, dtype="bfloat16",
    )
    src_feat = timeit(
        "dips_features (src)",
        lambda *a: dips_features_device(*a, query_count=s_nv, **feat_kw),
        dips_params, s_cent, src, mask, radius, key,
    )
    tgt_feat = timeit(
        "dips_features (tgt)",
        lambda *a: dips_features_device(*a, query_count=t_nv, **feat_kw),
        dips_params, t_cent, tgt, tmask_arr, radius, key,
    )

    from fusion4landslide_tpu.ops.gated_match import gated_feature_nn1

    gout = timeit(
        "global_matches_3d (gated)",
        lambda *a: gated_feature_nn1(*a),
        src_feat, tgt_feat, s_cent, t_cent,
        jnp.asarray(5.0, jnp.float32), vvalid_s, vvalid_t,
    )
    _, g_idx, g_valid = gout
    brute = timeit(
        "global_matches_3d (brute)",
        lambda *a: global_matches_3d(*a),
        src_feat, tgt_feat, s_cent, t_cent,
        jnp.asarray(5.0, jnp.float32), vvalid_s, vvalid_t,
    )
    timings.pop("global_matches_3d (brute)")  # informational; gated is prod

    # RGB 2D channel of the full fusion method: voxel-cloud projection +
    # pixel->voxel chaining (grid 1-NN in pixel space).
    from bench import IMG_SIZE, synth_image_channel
    from fusion4landslide_tpu.image.geometry import project_points
    from fusion4landslide_tpu.pipelines.fusion_device import (
        _chain_2d_device,
        _vote_2d_device,
    )

    # Pixel matches pair each src point with its true displaced position
    # (src/tgt crops are different subsets under the split).
    from bench import PLANTED_SHIFT

    if full:
        tgt_of_src = tgt_np  # aligned arrays (same points, shifted half)
    else:
        tgt_of_src = src_np.copy()
        tgt_of_src[_moving] += PLANTED_SHIFT
    pix_np, K_np, E_np, _ = synth_image_channel(src_np, tgt_of_src, nq // 2)
    Pc = bucket_size(len(pix_np))
    pixb = (
        jnp.zeros((Pc, 4), jnp.float32).at[: len(pix_np)].set(
            jnp.asarray(pix_np)
        )
    )
    pmask = jnp.arange(Pc) < len(pix_np)
    K_j = jnp.asarray(K_np, jnp.float32)
    E_j = jnp.asarray(E_np, jnp.float32)
    ctr = jnp.asarray(c, jnp.float32)

    def _rgb_chain(sc, tc, va, vb, px, pm, cc):
        uv_s, _, pv_s = project_points(
            sc + cc, E_j, K_j, IMG_SIZE, mask=va, v_flip=True
        )
        uv_t, _, pv_t = project_points(
            tc + cc, E_j, K_j, IMG_SIZE, mask=vb, v_flip=True
        )
        return _chain_2d_device(
            uv_s, pv_s, uv_t, pv_t, px, pm, 5.0, "nn_src_only"
        )

    c2d = timeit(
        "rgb project+chain",
        _rgb_chain,
        s_cent, t_cent, vvalid_s, vvalid_t, pixb, pmask, ctr,
    )
    c2d_idx, c2d_ok = (c2d[0].astype(jnp.int32), c2d[1])

    base_svl = radius
    graphs = timeit(
        "supervoxel_graph+normals x2",
        lambda a, b, va, vb, r: (
            *(lambda gi, gm: (gi, gm, pca_normals(
                a, 15, va, neigh_idx=gi, neigh_mask=gm)))(
                *supervoxel_graph(a, r, va, k_neighbors=15)),
            *(lambda gi, gm: (gi, gm, pca_normals(
                b, 15, vb, neigh_idx=gi, neigh_mask=gm)))(
                *supervoxel_graph(b, r, vb, k_neighbors=15)),
        ),
        s_cent, t_cent, vvalid_s, vvalid_t, base_svl,
    )
    gi_s, gm_s, nrm_s, gi_t, gm_t, nrm_t = graphs

    seg = timeit(
        "supervoxel_segmentation L1 x2",
        lambda a, b, va, vb, r: (
            supervoxel_segmentation(
                a, r, va, neigh_idx=gi_s, neigh_mask=gm_s, normals=nrm_s
            ).labels,
            supervoxel_segmentation(
                b, r, vb, neigh_idx=gi_t, neigh_mask=gm_t, normals=nrm_t
            ).labels,
        ),
        s_cent, t_cent, vvalid_s, vvalid_t, base_svl,
    )
    raw_s, raw_t = seg
    lab_s, n_s = drop_small_and_compact(raw_s, vvalid_s, 10)
    lab_t, n_t = drop_small_and_compact(raw_t, vvalid_t, 10)

    timeit(
        "segment_centroids L2 x2",
        lambda a, b, ls, lt, ns, nt, r: (
            _segment_centroids(a, ls, sv_cap, ns, r * 2, 15),
            _segment_centroids(b, lt, sv_cap_t, nt, r * 2, 15),
        ),
        s_cent, t_cent, lab_s, lab_t, n_s, n_t, base_svl,
    )

    mems = timeit(
        "label_members x2",
        lambda ls, lt: (
            label_members(ls, sv_cap, 512),
            label_members(lt, sv_cap_t, 512),
        ),
        lab_s, lab_t,
    )
    (mem_s, memmask_s), (mem_t, memmask_t) = mems

    agg = timeit(
        "aggregate x2",
        lambda fa, fb, ca, cb, ma, mb, mma, mmb: (
            _aggregate_chunked(
                agg_params, fa, ca, ma, mma, agg_max_points=512
            ),
            _aggregate_chunked(
                agg_params, fb, cb, mb, mmb, agg_max_points=512
            ),
        ),
        src_feat, tgt_feat, s_cent, t_cent,
        mem_s, mem_t, memmask_s, memmask_t,
    )
    (spt_feat_s, spt_coord_s), (spt_feat_t, spt_coord_t) = agg

    svalid_s = jnp.arange(sv_cap) < n_s
    svalid_t = jnp.arange(sv_cap_t) < n_t
    cm = timeit(
        "coarse_match",
        lambda *a: coarse_match_superpoints_chunked(*a, 5.0),
        spt_feat_s, spt_coord_s, svalid_s,
        spt_feat_t, spt_coord_t, svalid_t,
    )
    tgt_of_src, pair_valid = cm

    fine = timeit(
        "fine_match_pairs",
        lambda *a: fine_match_pairs(
            *a,
            num_min_quality=10, thres_dist_diff=0.5,
            thres_inlier_ratio=0.15, num_min_fine=10,
            icp_threshold=0.1, icp_max_iter=30,
            icp_type="point2point", fine_max_matches=256,
        ),
        mem_s, memmask_s & pair_valid[:, None],
        jnp.where(pair_valid, tgt_of_src, -1).astype(jnp.int32),
        g_idx.astype(jnp.int32), g_valid, lab_t, s_cent, t_cent,
    )

    # RGB union: votes + extras table + two-channel fine solve (the fine
    # stage as the full RGB+3D method runs it).
    votes = timeit(
        "rgb vote L1",
        lambda ls, lt, ci, cv: _vote_2d_device(ls, lt, ci, cv, sv_cap, sv_cap_t),
        lab_s, lab_t, c2d_idx, c2d_ok,
    )
    vote_tgt, vote_cnt = votes
    E_cap = max(sv_cap // 4, 64)

    def _fine_union(ms, mms, pv, ts, vt, vc, ci, cv, g_i, g_v, lt, sc, tc):
        vote_ok = (vc >= 1) & svalid_s
        extra_valid = vote_ok & ~(pv & (ts == vt))
        order = jnp.argsort(~extra_valid)
        sel = order[:E_cap].astype(jnp.int32)
        sel_ok = jnp.take(extra_valid, sel)
        mem_f = jnp.concatenate([ms, jnp.take(ms, sel, axis=0)], axis=0)
        memmask_f = jnp.concatenate(
            [mms & pv[:, None], jnp.take(mms, sel, axis=0) & sel_ok[:, None]],
            axis=0,
        )
        tgtlab_f = jnp.concatenate(
            [
                jnp.where(pv, ts, -1).astype(jnp.int32),
                jnp.where(sel_ok, jnp.take(vt, sel), -1).astype(jnp.int32),
            ],
            axis=0,
        )
        return fine_match_pairs(
            mem_f, memmask_f, tgtlab_f, g_i, g_v, lt, sc, tc,
            corres2_tgt_idx=ci, corres2_valid=cv,
            num_min_quality=10, thres_dist_diff=0.5,
            thres_inlier_ratio=0.15, num_min_fine=10,
            icp_threshold=0.1, icp_max_iter=30,
            icp_type="point2point", fine_max_matches=256,
        )

    timeit(
        "fine_match_pairs (rgb union)",
        _fine_union,
        mem_s, memmask_s, pair_valid, tgt_of_src, vote_tgt, vote_cnt,
        c2d_idx, c2d_ok, g_idx.astype(jnp.int32), g_valid,
        lab_t, s_cent, t_cent,
    )

    timeit(
        "sparse knn_grid (assign_then_nn)",
        lambda q, r, mr: knn_grid_traced(
            q, r, 1, r0=2.0 * mr, ref_mask=tmask_arr, query_mask=mask,
            r_max=mr * 8.0,
        ),
        src, tgt, median_res,
    )

    total = sum(timings.values())
    print(f"{'TOTAL (sum of stages)':34s} {total * 1e3:9.1f} ms")
    stop.set()


if __name__ == "__main__":
    main()
