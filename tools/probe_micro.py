#!/usr/bin/env python
"""Sub-stage micro-probe of the two dominant fusion stages on the chip.

`tools/probe_stages.py` itemises the fusion_3d step per stage; at the
production 1M-core split shape the budget is dominated by DIPs descriptors
(~13.4 s for both clouds) and the fine per-pair solve (~10.4 s). This probe
splits those two stages into their sub-costs so optimisation targets the
measured component, not a guess:

DIPs (per cloud):    hash-grid build | Pallas radius sampler | LRF math |
                     PointNet forward (the MXU matmuls)
fine (rgb union):    parameter sweeps isolating the marginal cost of the
                     ICP iterations (icp_max_iter 30 vs 1), the isometry
                     gate (iso evaluated at its cap vs minimal), and the
                     match compaction width (fine_max_matches 256 vs 64)
supervoxel:          marginal cost per propagation sweep (max_sweeps 24
                     vs 12)

Usage: python tools/probe_micro.py [N_CORE]   (default 1_000_000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    skip_dips = "--skip-dips" in sys.argv[1:]
    from fusion4landslide_tpu.utils.platform import (
        apply_platform_from_env,
        enable_compile_cache,
    )

    apply_platform_from_env()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench import _keepalive, _models, synth_split_tile
    from fusion4landslide_tpu.ops.hashgrid import build_hash_grid
    from fusion4landslide_tpu.ops.hashgrid_pallas import radius_sample_window
    from fusion4landslide_tpu.ops.segments import bucket_size, label_members
    from fusion4landslide_tpu.ops.normals import pca_normals
    from fusion4landslide_tpu.ops.supervoxel import (
        supervoxel_graph,
        supervoxel_segmentation,
    )
    from fusion4landslide_tpu.ops.voxel import voxel_downsample
    from fusion4landslide_tpu.ops.hashgrid import median_nn_distance_traced
    from fusion4landslide_tpu.pipelines.f2s3 import _dips_chunks_mapped
    from fusion4landslide_tpu.pipelines.f2s3_device import (
        dips_features_device,
        drop_small_and_compact,
    )
    from fusion4landslide_tpu.pipelines.fusion import fine_match_pairs
    from fusion4landslide_tpu.pipelines.fusion_device import (
        _aggregate_chunked,
        coarse_match_superpoints_chunked,
    )
    from fusion4landslide_tpu.ops.gated_match import gated_feature_nn1

    stop = _keepalive()
    dips_params, agg_params = _models()
    src_np, tgt_np, _core, _moving = synth_split_tile(n, 5.0, 10.0)
    nq, mt = len(src_np), len(tgt_np)
    N = bucket_size(nq)
    M = bucket_size(mt)
    c = src_np.mean(axis=0)
    src = jnp.zeros((N, 3), jnp.float32).at[:nq].set(src_np - c)
    tgt = jnp.zeros((M, 3), jnp.float32).at[:mt].set(tgt_np - c)
    mask = jnp.arange(N) < nq
    tmask = jnp.arange(M) < mt
    key = jax.random.PRNGKey(0)
    sv_cap = max(bucket_size(max(N // 16, 1)), 64)
    sv_cap_t = max(bucket_size(max(M // 16, 1)), 64)
    print(
        f"# src {nq} in bucket {N}, tgt {mt} in bucket {M}",
        flush=True,
    )

    def timeit(name, fn, *args, reps=3, **kw):
        f = jax.jit(fn, **kw)
        out = f(*args)
        jax.tree.map(
            lambda x: np.asarray(x[(0,) * x.ndim])
            if hasattr(x, "shape")
            else x,
            out,
        )
        best = float("inf")
        for _ in range(reps):
            out = None  # drop the previous result before re-allocating
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree.map(
                lambda x: np.asarray(x[(0,) * x.ndim])
                if hasattr(x, "shape")
                else x,
                out,
            )
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {best * 1e3:9.1f} ms", flush=True)
        return out

    res = timeit(
        "median_resolution x2",
        lambda a, b, ma, mb: (
            median_nn_distance_traced(a, ma),
            median_nn_distance_traced(b, mb),
        ),
        src, tgt, mask, tmask,
    )
    median_res = jnp.maximum(res[0], res[1])
    radius = jnp.sqrt(3.0) * 10.0 * median_res

    vox = timeit(
        "voxel_downsample x2",
        lambda a, b, ma, mb, r: (
            voxel_downsample(a, r, ma),
            voxel_downsample(b, r, mb),
        ),
        src, tgt, mask, tmask, median_res,
    )
    (s_cent, s_p2v, _, s_nv), (t_cent, t_p2v, _, t_nv) = vox
    vvalid_s = jnp.arange(N) < s_nv
    vvalid_t = jnp.arange(M) < t_nv

    # ---- DIPs sub-stages (src cloud) -------------------------------------
    from fusion4landslide_tpu.ops.knn_pallas import pallas_available

    chunk = 2048
    patch_points = 256

    if pallas_available() and not skip_dips:
        grid = timeit(
            "dips: hash-grid build (src support)",
            lambda p, r, m: build_hash_grid(p, r, m),
            src, radius, mask,
        )

        samp = timeit(
            "dips: radius_sample_window (src)",
            lambda q, g, r: radius_sample_window(q, g, r, patch_points, 0),
            s_cent, grid, radius,
        )
        _, valid, xyz, _ = samp
        n_chunks = N // chunk
        qs = s_cent.reshape(n_chunks, chunk, 3)
        xs = xyz.reshape(n_chunks, chunk, patch_points, 3)
        vs = valid.reshape(n_chunks, chunk, patch_points)

        from fusion4landslide_tpu.ops.lrf import lrf_patches_from_neighbors

        timeit(
            "dips: LRF math only (all chunks)",
            lambda qs, xs, vs, r: jax.lax.map(
                lambda a: lrf_patches_from_neighbors(a[0], a[1], a[2], r),
                (qs, xs, vs),
            ),
            qs, xs, vs, radius,
        )

        timeit(
            "dips: LRF+PointNet (all chunks, bf16)",
            lambda qs, xs, vs, r, nv: _dips_chunks_mapped(
                dips_params, qs, xs, vs, r,
                precision="default", dtype="bfloat16", n_valid=nv,
            ),
            qs, xs, vs, radius, s_nv,
        )

        # Free the ~6.7 GB sampler products before the rest of the probe.
        del samp, qs, xs, vs, valid, xyz, grid

    feat_kw = dict(k_max=512, patch_points=256, chunk=2048, dtype="bfloat16")
    src_feat = timeit(
        "dips: full (src)",
        lambda *a: dips_features_device(*a, query_count=s_nv, **feat_kw),
        dips_params, s_cent, src, mask, radius, key,
    )
    tgt_feat = dips_features_device(
        dips_params, t_cent, tgt, tmask, radius, key, query_count=t_nv,
        **feat_kw,
    )
    jax.block_until_ready(tgt_feat)

    # ---- supervoxel sweep marginal cost ----------------------------------
    gi_s, gm_s = supervoxel_graph(s_cent, radius, vvalid_s, k_neighbors=15)
    nrm_s = pca_normals(s_cent, 15, vvalid_s, neigh_idx=gi_s, neigh_mask=gm_s)
    jax.block_until_ready(nrm_s)
    for sweeps in (24, 12):
        timeit(
            f"supervoxel seg (num_sweeps={sweeps})",
            lambda a, r, v, s=sweeps: supervoxel_segmentation(
                a, r, v, neigh_idx=gi_s, neigh_mask=gm_s, normals=nrm_s,
                num_sweeps=s,
            ).labels,
            s_cent, radius, vvalid_s,
        )

    # ---- fine-stage setup (one level, production params) -----------------
    _, g_idx, g_valid = gated_feature_nn1(
        src_feat, tgt_feat, s_cent, t_cent,
        jnp.asarray(5.0, jnp.float32), vvalid_s, vvalid_t,
    )
    gi_t, gm_t = supervoxel_graph(t_cent, radius, vvalid_t, k_neighbors=15)
    nrm_t = pca_normals(t_cent, 15, vvalid_t, neigh_idx=gi_t, neigh_mask=gm_t)
    raw_s = supervoxel_segmentation(
        s_cent, radius, vvalid_s, neigh_idx=gi_s, neigh_mask=gm_s,
        normals=nrm_s,
    ).labels
    raw_t = supervoxel_segmentation(
        t_cent, radius, vvalid_t, neigh_idx=gi_t, neigh_mask=gm_t,
        normals=nrm_t,
    ).labels
    lab_s, n_s = drop_small_and_compact(raw_s, vvalid_s, 10)
    lab_t, n_t = drop_small_and_compact(raw_t, vvalid_t, 10)
    mem_s, memmask_s = label_members(lab_s, sv_cap, 512)
    mem_t, memmask_t = label_members(lab_t, sv_cap_t, 512)
    spt_feat_s, spt_coord_s = _aggregate_chunked(
        agg_params, src_feat, s_cent, mem_s, memmask_s, agg_max_points=512
    )
    spt_feat_t, spt_coord_t = _aggregate_chunked(
        agg_params, tgt_feat, t_cent, mem_t, memmask_t, agg_max_points=512
    )
    svalid_s = jnp.arange(sv_cap) < n_s
    svalid_t = jnp.arange(sv_cap_t) < n_t
    tgt_of_src, pair_valid = coarse_match_superpoints_chunked(
        spt_feat_s, spt_coord_s, svalid_s,
        spt_feat_t, spt_coord_t, svalid_t, 5.0,
    )
    jax.block_until_ready((tgt_of_src, pair_valid))
    print(f"# live pairs: {int(jnp.sum(pair_valid))} of cap {sv_cap}",
          flush=True)

    fine_args = (
        mem_s, memmask_s & pair_valid[:, None],
        jnp.where(pair_valid, tgt_of_src, -1).astype(jnp.int32),
        g_idx.astype(jnp.int32), g_valid, lab_t, s_cent, t_cent,
    )
    base_kw = dict(
        num_min_quality=10, thres_dist_diff=0.5, thres_inlier_ratio=0.15,
        num_min_fine=10, icp_threshold=0.1, icp_max_iter=30,
        icp_type="point2point", fine_max_matches=256,
    )
    for name, kw in (
        ("fine L1 (production)", {}),
        ("fine L1 (icp_max_iter=1)", dict(icp_max_iter=1)),
        ("fine L1 (iso_cap=8)", dict(iso_cap=8)),
        ("fine L1 (fine_max_matches=64)", dict(fine_max_matches=64)),
        ("fine L1 (pair_chunk=256)", dict(pair_chunk=256)),
    ):
        timeit(
            name,
            lambda *a, kw=kw: fine_match_pairs(*a, **{**base_kw, **kw}),
            *fine_args,
        )
    stop.set()


if __name__ == "__main__":
    main()
