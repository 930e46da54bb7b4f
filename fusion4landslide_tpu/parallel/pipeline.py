"""Sharded multi-tile execution of the real pipelines.

The reference processes tiles in a serial single-GPU loop
(main_f2s3.py:66-89, main_fusion.py:134). Here a batch of padded tiles
``(T, N, 3)`` is sharded over the mesh's ``tiles`` axis with ``shard_map``;
every device runs the identical device-resident tile program
(``pipelines.f2s3_device.f2s3_tile_step``) on its local slab, sequentially
via ``lax.map`` (one tile saturates a chip; parallelism is across devices).
Model parameters are replicated. There are no collectives during compute —
the ±20 m tiling halo makes per-tile matching exact (SURVEY §2.3) — so the
program scales linearly over ICI.

Host side: ``run_f2s3_tiles_sharded`` pads/stacks tiles, pumps batches of
``T = n_devices`` through the jitted step, and writes the per-tile result
tables (identical artifact contract to the serial path).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from fusion4landslide_tpu.parallel.mesh import tile_mesh
from fusion4landslide_tpu.pipelines.f2s3_device import f2s3_tile_step
from fusion4landslide_tpu.pipelines.fusion_device import fusion3d_tile_step

__all__ = [
    "make_sharded_f2s3_step",
    "run_f2s3_tiles_sharded",
    "make_sharded_fusion3d_step",
    "run_fusion3d_tiles_sharded",
    "make_sharded_piecewise_step",
    "run_piecewise_tiles_sharded",
    "make_sharded_rgb_guided_step",
    "run_rgb_guided_tiles_sharded",
]


def _iter_padded_batches(tiles, n_dev: int, N: int, M: int):
    """Consume (tile_id, src, tgt) entries — list or lazy iterator — in
    device-count batches, padded/stacked to (T, N, 3)/(T, M, 3) with masks
    and per-tile centres. Short batches repeat their last tile (results for
    the repeats are never read back). Shared by all four sharded runners."""
    it = iter(tiles)
    while True:
        batch = list(itertools.islice(it, n_dev))
        if not batch:
            return
        T = n_dev
        src_b = np.zeros((T, N, 3), np.float32)
        smask_b = np.zeros((T, N), bool)
        tgt_b = np.zeros((T, M, 3), np.float32)
        tmask_b = np.zeros((T, M), bool)
        centers = np.zeros((T, 3), np.float32)
        for i in range(T):
            tile_id, src, tgt = batch[min(i, len(batch) - 1)]
            center = src.mean(axis=0)
            centers[i] = center
            s = (src - center).astype(np.float32)
            t = (tgt - center).astype(np.float32)
            src_b[i, : s.shape[0]] = s
            smask_b[i, : s.shape[0]] = True
            tgt_b[i, : t.shape[0]] = t
            tmask_b[i, : t.shape[0]] = True
        yield batch, src_b, smask_b, tgt_b, tmask_b, centers


def make_sharded_f2s3_step(mesh, dips_params, filt_params, **statics):
    """Jitted multi-tile F2S3 step over ``mesh``.

    Returns ``step(src (T,N,3), smask (T,N), tgt (T,M,3), tmask (T,M),
    keys (T,2), max_disp (T,), voxel_size (T,)) -> F2S3TileResult`` with a
    leading tile axis, sharded over the mesh's ``tiles`` axis (T must be a
    multiple of the mesh size).
    """
    per_tile = functools.partial(f2s3_tile_step, **statics)

    def local(src, smask, tgt, tmask, keys, max_disp, voxel_size):
        return jax.lax.map(
            lambda a: per_tile(dips_params, filt_params, *a),
            (src, smask, tgt, tmask, keys, max_disp, voxel_size),
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tiles"),) * 7,
        out_specs=P("tiles"),
        # Per-tile programs are trivially SPMD (no collectives); the scan
        # carries inside kNN seed with constants that the varying-manual-axes
        # checker would flag against device-varying outputs.
        check_vma=False,
    )
    return jax.jit(sharded)


def run_f2s3_tiles_sharded(
    cfg,
    dips_params,
    filt_params,
    tiles: list[tuple[str | int, np.ndarray, np.ndarray]],
    *,
    logger=None,
    rng_seed: int = 0,
    mesh=None,
    n_bucket: int | None = None,
    m_bucket: int | None = None,
) -> dict:
    """Process an epoch pair's tiles data-parallel over the device mesh.

    Args:
        tiles: (tile_id, src_points (n,3), tgt_points (m,3)) entries — a
            list, or a lazy iterator when ``n_bucket``/``m_bucket`` give the
            padded sizes up front (streaming keeps only one batch of tiles
            in host memory).

    Writes the same per-tile result tables as the serial
    ``pipelines.f2s3.run_f2s3_tile`` path and returns
    {tile_id: {"dvfs", "magnitudes"}}.
    """
    import os
    import os.path as osp

    from fusion4landslide_tpu.io.results import save_txt
    from fusion4landslide_tpu.ops.segments import bucket_size
    from fusion4landslide_tpu.pipelines.f2s3 import write_f2s3_outputs

    mesh = mesh or tile_mesh()
    n_dev = mesh.devices.size

    # Common padded shapes across the whole epoch: one compile. A lazy tile
    # iterator needs explicit bucket bounds (drivers read them from the PLY
    # headers); a list is scanned directly.
    if n_bucket is None or m_bucket is None:
        tiles = list(tiles)
        if not tiles:
            return {}
        n_bucket = bucket_size(max(t[1].shape[0] for t in tiles))
        m_bucket = bucket_size(max(t[2].shape[0] for t in tiles))
    N, M = n_bucket, m_bucket
    chunk = min(int(cfg.get("feat_chunk", 2048)), N)
    sv_cap = int(cfg.get("sv_cap", 0)) or max(bucket_size(max(N // 16, 1)), 64)
    member_cap = int(cfg.get("member_cap", 0)) or 1024

    rockfall = "rockfall" in str(cfg.get("output_dir", "")).lower() or str(
        cfg.get("dataset", "")
    ).lower().startswith("rockfall")
    statics = dict(
        k_max=int(cfg.get("feat_k_max", 512)),
        patch_points=int(cfg.get("feat_patch_points", 256)),
        feat_dtype=cfg.get("feat_dtype"),
        sample_cap=int(cfg.get("feat_sample_cap", 48)),
        sample_priority=str(cfg.get("feat_sample_priority", "knn")),
        chunk=chunk,
        k_neighbors=int(cfg.get("n_normals", 30)),
        sv_cap=sv_cap,
        member_cap=member_cap,
        rockfall=rockfall,
        refine_results=bool(cfg.get("refine_results", True)),
        small_patch_removal=bool(cfg.get("small_patch_removal", True)),
        num_layers=sum(
            1 for k in filt_params["params"] if str(k).startswith("block")
        ),
        with_c2c=bool(cfg.get("fill_gaps_c2c", False)),
    )
    step = make_sharded_f2s3_step(mesh, dips_params, filt_params, **statics)
    if bool(cfg.get("prewarm", False)):
        import threading

        from fusion4landslide_tpu.utils.prewarm import prewarm_f2s3_sharded

        threading.Thread(
            target=prewarm_f2s3_sharded,
            args=(step, n_dev, N, M),
            kwargs={"logger": logger},
            daemon=True,
        ).start()

    max_disp = float(cfg.get("max_disp_magnitude", 0) or 0)
    voxel_size = float(cfg.get("voxel_size", 0.0) or 0.0)

    results: dict = {}
    key = jax.random.PRNGKey(rng_seed)
    for batch, src_b, smask_b, tgt_b, tmask_b, centers in _iter_padded_batches(
        tiles, n_dev, N, M
    ):
        T = n_dev
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, T)
        out = step(
            jnp.asarray(src_b),
            jnp.asarray(smask_b),
            jnp.asarray(tgt_b),
            jnp.asarray(tmask_b),
            keys,
            jnp.full((T,), max_disp, jnp.float32),
            jnp.full((T,), voxel_size, jnp.float32),
        )
        out = jax.device_get(out)

        for i, (tile_id, src, tgt) in enumerate(batch):
            n, m = src.shape[0], tgt.shape[0]
            center = centers[i]
            s = src_b[i, :n]
            t = tgt_b[i, :m]
            if int(out.n_dropped[i]) and logger:
                logger.warning(
                    "tile %s: %d points exceeded the supervoxel caps "
                    "(sv_cap=%d, member_cap=%d) and were not filtered",
                    tile_id, int(out.n_dropped[i]), sv_cap, member_cap,
                )
            # Interim pre-pruning dvfms (f2s3.py:286-294).
            out_root = osp.join(
                str(cfg.get("output_dir", ".")),
                str(cfg.get("output_folder", "run")),
            )
            results_dir = osp.join(out_root, "results")
            os.makedirs(results_dir, exist_ok=True)
            mag0 = np.linalg.norm(out.nn_tgt[i, :n] - s, axis=1)
            save_txt(
                osp.join(
                    results_dir,
                    f"f2s3_dvfms_without_pruning_of_tile_{tile_id}.txt",
                ),
                np.hstack([s + center, mag0[:, None]]),
            )
            pruned = np.hstack([s, out.new_tgt[i, :n]])
            c2c = out.c2c[i, :n] if statics["with_c2c"] else None
            written = write_f2s3_outputs(
                cfg,
                tile_id,
                center,
                s,
                t,
                pruned,
                out.keep[i, :n],
                c2c=c2c,
                logger=logger,
            )
            if logger:
                logger.info(
                    "tile %s (sharded): %d kept correspondences",
                    tile_id,
                    int(out.keep[i, :n].sum()),
                )
            results[tile_id] = written
    return results


def make_sharded_fusion3d_step(
    mesh,
    dips_params,
    agg_params,
    *,
    with_partition_inputs=False,
    with_image_inputs=False,
    **statics,
):
    """Jitted multi-tile fusion step over ``mesh``.

    Returns ``step(src (T,N,3), smask (T,N), tgt (T,M,3), tmask (T,M),
    keys (T,2), max_magnitude (T,), icp_threshold (T,), voxel_size_init
    (T,)) -> Fusion3DTileResult`` with a leading tile axis sharded over the
    mesh's ``tiles`` axis (T must be a multiple of the mesh size).

    With ``with_partition_inputs=True`` the step takes two extra sharded
    arrays ``sp_lab_src (T, L, N)`` / ``sp_lab_tgt (T, L, M)`` — per-POINT
    partition labels per level (reference ``partition_type: superpoint``) —
    and skips the on-device supervoxel segmentation.

    With ``with_image_inputs=True`` (pass ``image_size`` in ``statics``)
    the step additionally takes the RGB 2D-match channel inputs —
    ``pix_matches (T, IP, Pc, 4)``, ``pix_count (T, IP)``, ``intrinsic
    (T, 3, 3)``, ``src_extrinsics (T, IP, 4, 4)``, ``tgt_extrinsics
    (T, IP, 4, 4)``, ``center (T, 3)``, ``pixel_thres (T,)`` — and runs
    the full RGB+3D fusion method (use_2d_matches=True) on device; image
    inputs follow the partition inputs when both are enabled.
    """
    per_tile = functools.partial(fusion3d_tile_step, **statics)
    n_in = 14 if with_partition_inputs else 12
    if with_image_inputs:
        n_in += 7

    def local(*args):
        if with_partition_inputs or not with_image_inputs:
            return jax.lax.map(
                lambda a: per_tile(dips_params, agg_params, *a),
                args,
            )
        # Image inputs without partition inputs: slot them into their
        # keyword positions (sp_lab_* stay None).
        return jax.lax.map(
            lambda a: per_tile(
                dips_params,
                agg_params,
                *a[:12],
                pix_matches=a[12],
                pix_count=a[13],
                intrinsic=a[14],
                src_extrinsics=a[15],
                tgt_extrinsics=a[16],
                center=a[17],
                pixel_thres=a[18],
            ),
            args,
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tiles"),) * n_in,
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(sharded)


def run_fusion3d_tiles_sharded(
    cfg,
    dips_params,
    agg_params,
    tiles: list,
    *,
    logger=None,
    rng_seed: int = 0,
    mesh=None,
    n_bucket: int | None = None,
    m_bucket: int | None = None,
    image_kit_fn=None,
    pix_cap: int | None = None,
    n_image_pairs: int = 1,
) -> dict:
    """Process a fusion epoch pair's tiles data-parallel over the mesh.

    Args:
        tiles: list of (tile_id, src_points (n,3), tgt_points (m,3)).
        image_kit_fn: enables the full RGB+3D fusion method
            (use_2d_matches=True) — called per tile as
            ``image_kit_fn(tile_id, src_points, tgt_points)`` and must
            return a dict with ``pix`` (list of (P_j, 4) pixel-match
            arrays, one per src×tgt image pair), ``intrinsic`` (3, 3), and
            ``src_extrinsics``/``tgt_extrinsics`` (lists of (4, 4),
            aligned with ``pix``). Requires ``pix_cap`` (static pixel-row
            bucket) and ``n_image_pairs`` (static IP).

    Writes the same ``c2f_*`` result tables as the serial
    ``pipelines.fusion.run_fusion3d_tile`` path.
    """
    import os
    import os.path as osp

    from fusion4landslide_tpu.io.results import (
        save_txt,
        dvf_magnitudes,
        save_dvfms,
        visual_clamp_magnitude,
    )
    from fusion4landslide_tpu.ops.segments import bucket_size

    partition_type = str(cfg.get("partition_type", "supervoxel"))
    use_partition_inputs = partition_type == "superpoint"
    if use_partition_inputs and bool(
        cfg.get("sharded_partition_fallback", False)
    ):
        # Legacy opt-in: accept the on-device supervoxel partition instead
        # of host superpoint labels.
        use_partition_inputs = False
        if logger:
            logger.warning(
                "partition_type=superpoint: sharded step partitions with "
                "multi-level supervoxels (sharded_partition_fallback: true)"
            )
    mesh = mesh or tile_mesh()
    n_dev = mesh.devices.size

    if n_bucket is None or m_bucket is None:
        tiles = list(tiles)
        if not tiles:
            return {}
        n_bucket = bucket_size(max(t[1].shape[0] for t in tiles))
        m_bucket = bucket_size(max(t[2].shape[0] for t in tiles))
    N, M = n_bucket, m_bucket
    sv_cap = int(cfg.get("sv_cap", 0)) or max(bucket_size(max(N // 16, 1)), 64)
    # Under the core/halo query split the target bucket is larger than the
    # source bucket; size its superpoint cap from its own point count.
    sv_cap_t = int(cfg.get("sv_cap_tgt", 0)) or max(
        bucket_size(max(M // 16, 1)), 64
    )
    member_cap = int(cfg.get("member_cap", 0)) or 512
    statics = dict(
        levels=tuple(int(v) for v in (cfg.get("level_of_superpoint") or [1])),
        k_max=int(cfg.get("feat_k_max", 512)),
        patch_points=int(cfg.get("feat_patch_points", 256)),
        feat_dtype=cfg.get("feat_dtype"),
        sample_cap=int(cfg.get("feat_sample_cap", 48)),
        sample_priority=str(cfg.get("feat_sample_priority", "knn")),
        chunk=min(int(cfg.get("feat_chunk", 2048)), N),
        sv_cap=sv_cap,
        sv_cap_tgt=sv_cap_t,
        member_cap=member_cap,
        agg_max_points=min(int(cfg.get("agg_max_points", 512)), member_cap),
        small_patch=int(cfg.get("num_min_matches_for_small_patch", 10)),
        icp_type=str(cfg.get("icp_type", "point2point")),
        icp_max_iter=30 if bool(cfg.get("icp_refine", True)) else 0,
        coarse_mutual=(
            str(cfg.get("coarse_refinement_3d_type", "nn_mutual"))
            != "only_max_mag"
        ),
        global_gated=bool(cfg.get("global_matching_gated", True)),
        with_sparse=str(cfg.get("assign_type", "assign_then_nn"))
        == "assign_then_nn",
        with_tgt2src=bool(cfg.get("output_tgt2src", False)),
        # Same config key and default as the host path so mesh on/off
        # solve identical per-pair match subsets (parity_check).
        fine_max_matches=int(cfg.get("fine_max_matches", 256)) or (1 << 30),
    )
    with_image = image_kit_fn is not None
    if with_image:
        if pix_cap is None:
            raise ValueError("image_kit_fn requires pix_cap")
        mode_2d = str(cfg.get("matches_from_2d_type", "nn_src_only"))
        if mode_2d == "nn_src_with_tgt_for_visualize":
            mode_2d = "nn_src_only"
        coarse_2d = (
            "only_2d"
            if bool(cfg.get("coarse_matching_only_2d", False))
            else ("fusion" if bool(cfg.get("coarse_matching_fusion", True)) else "off")
        )
        fine_2d = (
            "only_2d"
            if bool(cfg.get("fine_matching_only_2d", False))
            else ("fusion" if bool(cfg.get("fine_matching_fusion", True)) else "off")
        )
        statics.update(
            image_size=tuple(int(v) for v in cfg["image_size"]),
            v_flip=str(cfg.get("dataset", "")).lower() != "rockfall_simulator",
            lifting=str(cfg.get("lifting_type", "nn_search")),
            matches_2d_mode=mode_2d,
            coarse_2d_mode=coarse_2d,
            fine_2d_mode=fine_2d,
            extra_pair_cap=int(cfg.get("extra_pair_cap", 0)),
            weighting_svd=bool(cfg.get("weighting_svd", False)),
        )
    step = make_sharded_fusion3d_step(
        mesh, dips_params, agg_params,
        with_partition_inputs=use_partition_inputs,
        with_image_inputs=with_image, **statics,
    )
    levels = statics["levels"]

    def _tile_partition_labels(tile_id, pts, which, size):
        """(L, size) per-point labels from the tile's partition artifact
        (generated natively when absent — shares
        ``load_or_generate_partition_labels`` with the host tile loop, so
        mesh on/off use one partition source; the file is parsed once)."""
        from fusion4landslide_tpu.ops.partition_io import (
            load_or_generate_partition_labels,
        )

        labs = load_or_generate_partition_labels(
            out_root, partition_type, tile_id, which, pts, levels,
            logger=logger,
        )
        lab = np.full((len(levels), size), -1, np.int32)
        for li, pl in enumerate(labs):
            lab[li, : pl.shape[0]] = pl.astype(np.int32)
        return lab

    if bool(cfg.get("prewarm", False)) and not use_partition_inputs:
        # Compile the whole bucket program (incl. Mosaic kernels) on an
        # empty batch in the background while tile IO streams; the first
        # real dispatch blocks on the same executable, so compute never
        # interleaves with kernel compiles.
        import threading

        from fusion4landslide_tpu.utils.prewarm import (
            prewarm_fusion3d_sharded,
        )

        threading.Thread(
            target=prewarm_fusion3d_sharded,
            args=(step, n_dev, N, M),
            kwargs={
                "logger": logger,
                "pix_cap": pix_cap if with_image else None,
                "n_image_pairs": n_image_pairs,
            },
            daemon=True,
        ).start()

    max_mag = float(cfg.get("max_magnitude", 10.0))
    icp_thr = float(cfg.get("icp_threshold", 0.1))
    vinit = float(cfg.get("voxel_size_init", 0.0) or 0.0)

    out_root = osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = osp.join(out_root, "results")
    os.makedirs(results_dir, exist_ok=True)

    results: dict = {}
    key = jax.random.PRNGKey(rng_seed)
    for batch, src_b, smask_b, tgt_b, tmask_b, centers in _iter_padded_batches(
        tiles, n_dev, N, M
    ):
        T = n_dev
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, T)
        scal = lambda v, dt=jnp.float32: jnp.full((T,), v, dt)
        args = (
            jnp.asarray(src_b),
            jnp.asarray(smask_b),
            jnp.asarray(tgt_b),
            jnp.asarray(tmask_b),
            keys,
            scal(max_mag),
            scal(icp_thr),
            scal(vinit),
            scal(int(cfg.get("num_min_fine_match", 10)), jnp.int32),
            scal(
                int(cfg.get("num_min_matches_for_quality_check", 10)),
                jnp.int32,
            ),
            scal(
                float(cfg.get("thres_dist_diff", 0.5))
                if bool(cfg.get("remove_low_quality_patch_matches", True))
                else float("inf")
            ),
            scal(
                float(cfg.get("thres_inlier_ratio", 0.15))
                if bool(cfg.get("remove_low_quality_patch_matches", True))
                else 0.0
            ),
        )
        if use_partition_inputs:
            sp_s = np.full((T, len(levels), N), -1, np.int32)
            sp_t = np.full((T, len(levels), M), -1, np.int32)
            for i, (tile_id, src, tgt) in enumerate(batch):
                sp_s[i] = _tile_partition_labels(tile_id, src, "src", N)
                sp_t[i] = _tile_partition_labels(tile_id, tgt, "tgt", M)
            args = args + (jnp.asarray(sp_s), jnp.asarray(sp_t))
        if with_image:
            IP, Pc = n_image_pairs, pix_cap
            pixb = np.zeros((T, IP, Pc, 4), np.float32)
            cntb = np.zeros((T, IP), np.int32)
            Kb = np.zeros((T, 3, 3), np.float32)
            seb = np.tile(np.eye(4, dtype=np.float32), (T, IP, 1, 1))
            teb = np.tile(np.eye(4, dtype=np.float32), (T, IP, 1, 1))
            for i in range(T):
                tile_id, src, tgt = batch[min(i, len(batch) - 1)]
                kit = image_kit_fn(tile_id, src, tgt)
                Kb[i] = np.asarray(kit["intrinsic"], np.float32)
                for j, p in enumerate(kit["pix"][:IP]):
                    p = np.asarray(p, np.float32).reshape(-1, 4)
                    c = min(p.shape[0], Pc)
                    if p.shape[0] > Pc and logger:
                        logger.warning(
                            "tile %s image pair %d: %d pixel matches "
                            "exceed pix_cap=%d; truncating",
                            tile_id, j, p.shape[0], Pc,
                        )
                    pixb[i, j, :c] = p[:c]
                    cntb[i, j] = c
                    seb[i, j] = np.asarray(
                        kit["src_extrinsics"][j], np.float32
                    )
                    teb[i, j] = np.asarray(
                        kit["tgt_extrinsics"][j], np.float32
                    )
            args = args + (
                jnp.asarray(pixb),
                jnp.asarray(cntb),
                jnp.asarray(Kb),
                jnp.asarray(seb),
                jnp.asarray(teb),
                jnp.asarray(centers),
                scal(float(cfg.get("pixel_thres", 5.0))),
            )
        out = step(*args)
        out = jax.device_get(out)

        for i, (tile_id, src, tgt) in enumerate(batch):
            n, m = src.shape[0], tgt.shape[0]
            center = centers[i]
            if int(out.n_dropped[i]) and logger:
                logger.warning(
                    "tile %s: %d voxels exceeded the supervoxel caps "
                    "(sv_cap=%d, member_cap=%d)",
                    tile_id, int(out.n_dropped[i]), sv_cap, member_cap,
                )
            valid = out.valid[i, :n]
            dense_src = src[valid]
            dense_tgt = out.moved[i, :n][valid] + center
            dvfs_dense = np.hstack([dense_src, dense_tgt])
            save_txt(
                osp.join(results_dir, f"c2f_dvfs_src2tgt_tile_{tile_id}.txt"),
                dvfs_dense,
            )
            dvfms = save_dvfms(
                osp.join(results_dir, f"c2f_dvfms_src2tgt_tile_{tile_id}.txt"),
                dvfs_dense,
            )
            if dvfms.shape[0] > 2:
                save_txt(
                    osp.join(
                        results_dir,
                        f"c2f_dvfms_src2tgt_visualize_tile_{tile_id}.txt",
                    ),
                    visual_clamp_magnitude(dvfms, cfg.get("dataset")),
                )
            if statics["with_sparse"]:
                ok = out.sparse_ok[i, :n]
                dvfs_sparse = np.hstack(
                    [src[ok], out.sparse_tgt[i, :n][ok] + center]
                )
                if dvfs_sparse.shape[0]:
                    sparse_ms = np.hstack(
                        [
                            dvfs_sparse[:, :3],
                            dvf_magnitudes(dvfs_sparse)[:, None],
                        ]
                    )
                    save_txt(
                        osp.join(
                            results_dir,
                            f"c2f_dvfms_src2tgt_discrete_visualize_tile_{tile_id}.txt",
                        ),
                        visual_clamp_magnitude(sparse_ms, cfg.get("dataset")),
                    )
            if statics["with_tgt2src"]:
                tok = out.t2s_valid[i, :m]
                src_est = out.t2s_src_est[i, :m][tok] + center
                t2s = np.hstack([src_est, tgt[tok]])
                save_txt(
                    osp.join(
                        results_dir, f"c2f_dvfms_tgt2src_tile_{tile_id}.txt"
                    ),
                    np.hstack([t2s[:, 3:6], dvf_magnitudes(t2s)[:, None]]),
                )
            if logger:
                logger.info(
                    "tile %s (sharded fusion%s): %.1f%% of src points "
                    "assigned, %d/%d voxels%s",
                    tile_id,
                    " rgb+3d" if with_image else "_3d",
                    100.0 * float(valid.mean()) if n else 0.0,
                    int(out.n_vox_src[i]),
                    n,
                    (
                        f", {int(out.n_c2d[i])} lifted 2D matches"
                        if with_image
                        else ""
                    ),
                )
            results[tile_id] = {
                "dvfs": dvfs_dense,
                "assigned_fraction": float(valid.mean()) if n else 0.0,
            }
    return results


def make_sharded_piecewise_step(mesh, *, max_cells: int):
    """Jitted multi-tile piecewise-ICP step over ``mesh``: the per-tile
    octree-cell displacement solve (``pipelines.piecewise_icp.
    piecewise_icp_core``) on a sharded batch of padded tiles.

    Returns ``step(src (T,N,3), smask (T,N), tgt (T,M,3), tmask (T,M),
    smax (T,), n_min (T,)) -> PiecewiseResult`` with leading tile axis.
    """
    from fusion4landslide_tpu.pipelines.piecewise_icp import piecewise_icp_core

    def local(src, smask, tgt, tmask, smax, n_min):
        return jax.lax.map(
            lambda a: piecewise_icp_core(
                a[0], a[2], a[1], a[3], a[4], a[5], max_cells=max_cells
            ),
            (src, smask, tgt, tmask, smax, n_min),
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tiles"),) * 6,
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(sharded)


def run_piecewise_tiles_sharded(
    cfg,
    tiles: list,
    *,
    logger=None,
    mesh=None,
) -> dict:
    """Piecewise-ICP over an epoch pair's tiles, data-parallel on the mesh.

    Writes the same per-tile result tables as the serial
    ``pipelines.piecewise_icp.run_piecewise_icp`` path.
    """
    import os

    from fusion4landslide_tpu.io.results import (
        save_txt,
        save_dvfms,
        save_dvfs,
        visual_clamp_magnitude,
    )
    from fusion4landslide_tpu.ops.segments import bucket_size
    from fusion4landslide_tpu.pipelines.piecewise_icp import suggest_max_cells

    mesh = mesh or tile_mesh()
    n_dev = mesh.devices.size
    smax = float(cfg.get("smax", 5.0))
    n_min = int(cfg.get("number_points_min", 10))

    # Cell-count bound needs the extent; a lazy iterator cannot be scanned,
    # so require a list here (piecewise tiles are cheap to hold).
    tiles = list(tiles)
    if not tiles:
        return {}
    N = bucket_size(max(t[1].shape[0] for t in tiles))
    M = bucket_size(max(t[2].shape[0] for t in tiles))
    ext = max(
        float((t[1].max(axis=0) - t[1].min(axis=0)).max()) for t in tiles
    )
    max_cells = suggest_max_cells(ext, smax, N, n_min)
    step = make_sharded_piecewise_step(mesh, max_cells=max_cells)

    out_dir = cfg.get("output_root") or (
        str(cfg.get("output_dir", ".")) + "/" + str(cfg.get("output_folder", "run"))
    )
    results_dir = os.path.join(out_dir, "results")
    os.makedirs(results_dir, exist_ok=True)

    results: dict = {}
    for batch, src_b, smask_b, tgt_b, tmask_b, centers in _iter_padded_batches(
        tiles, n_dev, N, M
    ):
        T = n_dev
        out = step(
            jnp.asarray(src_b),
            jnp.asarray(smask_b),
            jnp.asarray(tgt_b),
            jnp.asarray(tmask_b),
            jnp.full((T,), smax, jnp.float32),
            jnp.full((T,), n_min, jnp.int32),
        )
        out = jax.device_get(out)
        for i, (tile_id, src, tgt) in enumerate(batch):
            n = src.shape[0]
            keep = out.out_mask[i, :n]
            disp = out.displacement[i, :n]
            src_kept = src[keep]
            dvfs = np.hstack([src_kept, src_kept + disp[keep]])
            save_dvfs(
                os.path.join(
                    results_dir, f"piecewise_icp_dvfs_of_tile_{tile_id}.txt"
                ),
                dvfs,
            )
            dvfms = save_dvfms(
                os.path.join(
                    results_dir, f"piecewise_icp_dvfms_of_tile_{tile_id}.txt"
                ),
                dvfs,
            )
            vis = visual_clamp_magnitude(dvfms, cfg.get("dataset"))
            save_txt(
                os.path.join(
                    results_dir,
                    f"piecewise_dvfms_visualize_of_tile_{tile_id}.txt",
                ),
                vis,
            )
            if logger:
                logger.info(
                    "tile %s (sharded piecewise): %d kept, %d cells",
                    tile_id, int(keep.sum()), int(out.n_cells_src[i]),
                )
            results[tile_id] = {"dvfs": dvfs}
    return results


def make_sharded_rgb_guided_step(mesh, **statics):
    """Jitted multi-tile RGB-guided step over ``mesh``. The pixel-match
    table and camera matrices are replicated (the images are global);
    tiles shard over the ``tiles`` axis."""
    from fusion4landslide_tpu.pipelines.rgb_guided_device import (
        rgb_guided_tile_step,
    )

    per_tile = functools.partial(rgb_guided_tile_step, **statics)

    def local(
        src, smask, tgt, tmask, centers, corres_2d, cmask,
        se, te, K, Kt, pixel_thres, max_mag, icp_thr, voxel_size,
    ):
        return jax.lax.map(
            lambda a: per_tile(
                a[0], a[1], a[2], a[3], a[4], corres_2d, cmask,
                se, te, K, Kt, a[5], a[6], a[7], a[8],
            ),
            (src, smask, tgt, tmask, centers,
             pixel_thres, max_mag, icp_thr, voxel_size),
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tiles"),) * 5 + (P(),) * 6 + (P("tiles"),) * 4,
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(sharded)


def run_rgb_guided_tiles_sharded(
    cfg,
    tiles: list,
    src_image,
    tgt_image,
    intrinsic,
    src_extrinsic,
    tgt_extrinsic,
    *,
    tgt_intrinsic=None,
    corres_2d=None,
    logger=None,
    mesh=None,
    n_bucket: int | None = None,
    m_bucket: int | None = None,
) -> dict:
    """RGB-guided estimation over an epoch pair's tiles on the mesh.

    The dense 2D matching runs ONCE on the host for the image pair (any
    registered matcher); the per-tile device program shards over tiles.
    Writes the same result tables as the serial
    ``pipelines.rgb_guided.run_rgb_guided_tile``.
    """
    import os

    from fusion4landslide_tpu.image.matching import match_epoch_images
    from fusion4landslide_tpu.io.results import (
        save_txt,
        save_dvfms,
        save_dvfs,
        visual_clamp_magnitude,
    )
    from fusion4landslide_tpu.ops.segments import bucket_size

    mesh = mesh or tile_mesh()
    n_dev = mesh.devices.size

    if n_bucket is None or m_bucket is None:
        tiles = list(tiles)
        if not tiles:
            return {}
        n_bucket = bucket_size(max(t[1].shape[0] for t in tiles))
        m_bucket = bucket_size(max(t[2].shape[0] for t in tiles))

    if corres_2d is None:
        corres_2d = match_epoch_images(
            src_image,
            tgt_image,
            matcher=str(cfg.get("img_matching_type", "zncc")).lower(),
            crop_size=tuple(cfg["crop_size"]) if cfg.get("crop_size") else None,
            overlap_size=tuple(cfg["overlap_size"])
            if cfg.get("overlap_size")
            else None,
            cross_crops=bool(cfg.get("img_matching_cross_crops", False)),
            max_flow_px=cfg.get("max_flow_px"),
            logger=logger,
        )
    corres_2d = np.asarray(corres_2d, np.float32).reshape(-1, 4)
    C = max(bucket_size(max(len(corres_2d), 1)), 64)
    c2 = np.zeros((C, 4), np.float32)
    c2[: len(corres_2d)] = corres_2d
    cmask = np.zeros((C,), bool)
    cmask[: len(corres_2d)] = True

    image_size = tuple(cfg.get("image_size") or src_image.shape[:2])
    v_flip = str(cfg.get("dataset", "")).lower() != "rockfall_simulator"
    N, M = n_bucket, m_bucket
    sv_cap = int(cfg.get("sv_cap", 0)) or max(bucket_size(max(N // 16, 1)), 64)
    member_cap = int(cfg.get("member_cap", 0)) or 1024
    mode = str(cfg.get("matches_from_2d_type", "nn_src_only"))
    if mode == "nn_src_with_tgt_for_visualize":
        mode = "nn_src_only"
    step = make_sharded_rgb_guided_step(
        mesh,
        image_size=image_size,
        v_flip=v_flip,
        k_neighbors=int(cfg.get("n_normals", 30)),
        sv_cap=sv_cap,
        member_cap=member_cap,
        mode=mode,
        icp_type=str(cfg.get("icp_type", "point2point")),
        icp_max_iter=30 if bool(cfg.get("icp_refine", True)) else 0,
    )

    out_dir = cfg.get("output_root") or os.path.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    results_dir = os.path.join(out_dir, "results")
    os.makedirs(results_dir, exist_ok=True)

    pixel_thres = float(cfg.get("pixel_thres", 5))
    max_mag = float(cfg.get("max_magnitude", 10.0))
    icp_thr = float(cfg.get("icp_threshold", cfg.get("threshold", 0.1)))
    voxel = float(cfg.get("voxel_size", 0.0) or 0.0)

    results: dict = {}
    for batch, src_b, smask_b, tgt_b, tmask_b, centers in _iter_padded_batches(
        tiles, n_dev, N, M
    ):
        T = n_dev
        scal = lambda v: jnp.full((T,), v, jnp.float32)
        out = step(
            jnp.asarray(src_b), jnp.asarray(smask_b),
            jnp.asarray(tgt_b), jnp.asarray(tmask_b),
            jnp.asarray(centers),
            jnp.asarray(c2), jnp.asarray(cmask),
            jnp.asarray(src_extrinsic, jnp.float32),
            jnp.asarray(tgt_extrinsic, jnp.float32),
            jnp.asarray(intrinsic, jnp.float32),
            jnp.asarray(
                intrinsic if tgt_intrinsic is None else tgt_intrinsic,
                jnp.float32,
            ),
            scal(pixel_thres), scal(max_mag), scal(icp_thr), scal(voxel),
        )
        out = jax.device_get(out)
        for i, (tile_id, src, tgt) in enumerate(batch):
            n = src.shape[0]
            center = centers[i]
            matched = out.matched[i, :n]
            # Pre-refinement dvfms (rgb_guided.py:1594-1607).
            mags0 = np.linalg.norm(
                out.tgt_match[i, :n] - src_b[i, :n], axis=1
            )
            save_txt(
                os.path.join(
                    results_dir,
                    f"rgb_guided_wo_refinement_dvfms_tile_{tile_id}.txt",
                ),
                np.hstack([src[matched], mags0[matched][:, None]]),
            )
            valid = out.valid[i, :n]
            dvfs = np.hstack(
                [src[valid], out.moved[i, :n][valid] + center]
            )
            save_dvfs(
                os.path.join(
                    results_dir,
                    f"rgb_guided_w_refinement_dvfs_src2tgt_tile_{tile_id}.txt",
                ),
                dvfs,
            )
            dvfms = save_dvfms(
                os.path.join(
                    results_dir,
                    f"rgb_guided_w_refinement_dvfms_src2tgt_tile_{tile_id}.txt",
                ),
                dvfs,
            )
            if dvfms.shape[0] > 2:
                save_txt(
                    os.path.join(
                        results_dir,
                        f"rgb_guided_w_refinement_dvfms_src2tgt_visualize_tile_{tile_id}.txt",
                    ),
                    visual_clamp_magnitude(dvfms, cfg.get("dataset")),
                )
            if logger:
                logger.info(
                    "tile %s (sharded rgb_guided): %d matched, %d assigned",
                    tile_id, int(matched.sum()), int(valid.sum()),
                )
            results[tile_id] = {"dvfs": dvfs, "n_matches": int(matched.sum())}
    return results
