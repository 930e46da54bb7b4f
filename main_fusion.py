#!/usr/bin/env python
"""Fusion driver (reference: main_fusion.py): coarse-to-fine matching with
superpoint partition + learned descriptors; RGB+3D fusion or 3D-only.

Usage: python main_fusion.py --config configs/landslide/fusion_3d_brienz.yaml

The 3D path (``use_2d_matches: False``) runs standalone; the RGB fusion path
additionally requires image matching (see fusion4landslide_tpu.image).
"""

import argparse

from fusion4landslide_tpu.utils.platform import apply_platform_from_env

apply_platform_from_env()
import os.path as osp
import time

from fusion4landslide_tpu.pipelines.driver import (
    ensure_tiles,
    halo_split_spec,
    list_tiles,
    log_config,
    setup_run,
    skip_completed_tiles,
)
from fusion4landslide_tpu.pipelines.fusion import (
    run_fusion3d_tile,
    run_fusion_tile,
)


def load_model_params(cfg):
    """DIPs + feature-aggregation params from torch checkpoints
    (reference: main_fusion.py:35-45)."""
    from fusion4landslide_tpu.models.convert import (
        load_torch_checkpoint,
        torch_to_aggregation_params,
        torch_to_dips_params,
    )

    wdir = cfg.get("weight_dir", "weights/")
    dips_path = osp.join(wdir, "local_feature_descriptor_best.pth")
    agg_path = osp.join(
        wdir,
        cfg.get("pretrained_feature_aggregation_weight", "feat_aggregation_3d.pth"),
    )
    if not osp.exists(dips_path):
        raise FileNotFoundError(
            f"DIPs checkpoint not found: {dips_path} — download it per the "
            "reference README (weights section)."
        )
    if not osp.exists(agg_path):
        raise FileNotFoundError(f"aggregation checkpoint not found: {agg_path}")
    dips = torch_to_dips_params(load_torch_checkpoint(dips_path))
    agg = torch_to_aggregation_params(load_torch_checkpoint(agg_path))
    return dips, agg


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        type=str,
        default="./configs/landslide/fusion_3d_brienz.yaml",
        help="Path to config file.",
    )
    args = parser.parse_args()
    cfg, logger = setup_run(args.config, "fusion", keep_sub_directory=True)
    log_config(cfg, logger)

    start = time.time()
    ensure_tiles(cfg, logger)
    tiles = list_tiles(cfg, overlap=True)
    tiles = skip_completed_tiles(
        cfg, tiles, "c2f_dvfms_src2tgt_tile_{tile}.txt", logger
    )
    logger.info("Num. of tile(s): %d", len(tiles))

    dips_params, agg_params = load_model_params(cfg)

    # Core/halo query split (default on): source-side queries over
    # core(+margin) points only, the ±20 m halo present only as
    # target/support context — each point is core in exactly one tile, so
    # the merged field keeps its coverage while per-tile work drops ~2-5x.
    # ``halo_query_split: false`` restores the reference's full-overlap
    # redundancy (/root/reference/main_fusion.py:128-144).
    split = halo_split_spec(cfg)
    if split is not None:
        logger.info(
            "Core/halo query split: src margin %.1f m, tgt margin %.1f m "
            "(halo_query_split: false disables)", split[0], split[1],
        )

    # RGB+3D fusion: image pair + cameras (+ optional precomputed 2D pixel
    # matches from img_matching_result_dir, reference base:297-317).
    image_kit = None
    image_candidates = None  # (src_entries, tgt_entries) for per-tile selection
    if cfg.get("use_2d_matches", False):
        import glob

        import numpy as np

        from fusion4landslide_tpu.image.cameras import (
            load_extrinsics,
            load_images_used,
            load_intrinsic,
        )
        from fusion4landslide_tpu.io.images import load_image

        input_root = cfg.get("input_root") or cfg.get("data_dir")
        intrinsic = load_intrinsic(input_root)
        images_used = osp.join(
            input_root, "image", "transformations", "Images_used.txt"
        )
        if osp.exists(images_used):
            # Per-tile camera selection over the candidate pool
            # (reference _find_the_most_matched_image, base:760-858).
            entries = load_images_used(input_root)
            src_id = str(cfg.get("src_pcd", "")).split("_")[0]
            tgt_id = str(cfg.get("tgt_pcd", "")).split("_")[0]
            src_entries = [e for e in entries if src_id and src_id in e[0]]
            tgt_entries = [
                e for e in entries if tgt_id and tgt_id in e[0]
            ]
            if src_entries and tgt_entries:
                image_candidates = (src_entries, tgt_entries, intrinsic)
                logger.info(
                    "Camera selection: %d src / %d tgt candidate images",
                    len(src_entries), len(tgt_entries),
                )
        if image_candidates is None:
            src_ext, tgt_ext = load_extrinsics(
                input_root,
                cfg.get("dataset"),
                coord_type=cfg.get("coord_type", "PRCS"),
                src_pose=cfg.get("src_pose"),
                tgt_pose=cfg.get("tgt_pose"),
            )
            src_img = load_image(
                osp.join(input_root, "image", "raw_images", cfg.get("src_image"))
            )
            tgt_img = load_image(
                osp.join(input_root, "image", "raw_images", cfg.get("tgt_image"))
            )
            corres_2d = None
            mdir = cfg.get("img_matching_result_dir")
            if mdir and not osp.isabs(mdir):
                mdir = osp.join(input_root, mdir)
            if mdir and osp.isdir(mdir):
                parts = [
                    np.loadtxt(f, ndmin=2)
                    for f in sorted(glob.glob(osp.join(mdir, "*.txt")))
                ]
                parts = [p for p in parts if p.size]
                if parts:
                    corres_2d = np.vstack(parts)[:, :4]
                    logger.info(
                        "Loaded %d precomputed 2D matches from %s",
                        len(corres_2d), mdir,
                    )
            image_kit = (src_img, tgt_img, intrinsic, src_ext, tgt_ext, corres_2d)

    import jax

    _img_cache: dict = {}

    def _load_cached(path):
        from fusion4landslide_tpu.io.images import load_image

        if path not in _img_cache:
            _img_cache[path] = load_image(path)
        return _img_cache[path]

    use_mesh = cfg.get("use_mesh", "auto")
    has_rgb = image_kit is not None or image_candidates is not None
    if not tiles:
        # Nothing to do (fresh run over an empty epoch, or a fully-resumed
        # run where every tile's result file exists).
        use_mesh = False
    elif use_mesh == "auto":
        # Superpoint partitions are generated host-side and fed into the
        # sharded step as per-point label inputs; the RGB 2D-match channel
        # runs inside the device step from per-tile pixel-match tables —
        # neither gates the mesh path. The one host-only image feature is
        # depth-map lifting.
        use_mesh = (
            jax.device_count() > 1
            and len(tiles) > 1
            and not (
                has_rgb
                and str(cfg.get("lifting_type", "nn_search"))
                == "interpolation"
            )
        )
    if use_mesh:
        # Multi-chip path: tiles sharded over the device mesh, each chip
        # running the device-resident coarse-to-fine pipeline (full RGB+3D
        # fusion when the image channel is configured).
        import numpy as np

        from fusion4landslide_tpu.ops.segments import bucket_size
        from fusion4landslide_tpu.parallel import run_fusion3d_tiles_sharded
        from fusion4landslide_tpu.pipelines.driver import (
            iter_tile_clouds,
            tile_size_buckets,
        )

        logger.info(
            "Sharding %d tiles over %d devices", len(tiles), jax.device_count()
        )

        image_kit_fn = None
        pix_cap = None
        n_ip = 1
        if has_rgb:
            from fusion4landslide_tpu.image.matching import match_epoch_images

            def _match_pair(simg, timg):
                m = match_epoch_images(
                    simg,
                    timg,
                    matcher=str(cfg.get("img_matching_type", "zncc")).lower(),
                    crop_size=tuple(cfg["crop_size"])
                    if cfg.get("crop_size")
                    else None,
                    overlap_size=tuple(cfg["overlap_size"])
                    if cfg.get("overlap_size")
                    else None,
                    cross_crops=bool(cfg.get("img_matching_cross_crops", False)),
                    max_flow_px=cfg.get("max_flow_px"),
                    logger=logger,
                    weights=cfg.get("img_matcher_weights"),
                )
                return np.asarray(m, np.float32).reshape(-1, 4)

            max_px = 1
            if image_kit is not None:
                src_img, tgt_img, intrinsic, src_ext, tgt_ext, corres_2d = (
                    image_kit
                )
                pix = (
                    np.asarray(corres_2d, np.float32)[:, :4]
                    if corres_2d is not None
                    else _match_pair(src_img, tgt_img)
                )
                max_px = max(max_px, len(pix))
                kit0 = {
                    "pix": [pix],
                    "intrinsic": intrinsic,
                    "src_extrinsics": [src_ext],
                    "tgt_extrinsics": [tgt_ext],
                }
                image_kit_fn = lambda tid, s, t: kit0  # noqa: E731
            else:
                # Per-tile best-image selection (base:760-858); the dense
                # matcher runs once per distinct image pair across tiles.
                from fusion4landslide_tpu.image.cameras import (
                    select_best_images,
                )

                src_entries, tgt_entries, intrinsic = image_candidates
                num_sub = int(cfg.get("num_sub_img", 1) or 1)
                n_ip = num_sub * num_sub
                image_size = tuple(cfg.get("image_size"))
                v_flip = (
                    str(cfg.get("dataset", "")).lower() != "rockfall_simulator"
                )
                pair_cache: dict = {}
                kits: dict = {}
                for tile_id, src, tgt in iter_tile_clouds(
                    tiles, split=split
                ):
                    best_s = select_best_images(
                        src.points, src_entries, intrinsic, image_size,
                        num=num_sub, v_flip=v_flip,
                    )
                    best_t = select_best_images(
                        tgt.points, tgt_entries, intrinsic, image_size,
                        num=num_sub, v_flip=v_flip,
                    )
                    pix_l, se_l, te_l = [], [], []
                    for sn, sext in best_s:
                        for tn, text in best_t:
                            if (sn, tn) not in pair_cache:
                                pair_cache[(sn, tn)] = _match_pair(
                                    _load_cached(
                                        osp.join(
                                            input_root, "image",
                                            "raw_images", "src_images", sn,
                                        )
                                    ),
                                    _load_cached(
                                        osp.join(
                                            input_root, "image",
                                            "raw_images", "tgt_images", tn,
                                        )
                                    ),
                                )
                            pix_l.append(pair_cache[(sn, tn)])
                            se_l.append(sext)
                            te_l.append(text)
                    max_px = max(
                        max_px, max((len(p) for p in pix_l), default=1)
                    )
                    kits[tile_id] = {
                        "pix": pix_l,
                        "intrinsic": intrinsic,
                        "src_extrinsics": se_l,
                        "tgt_extrinsics": te_l,
                    }
                image_kit_fn = lambda tid, s, t: kits[tid]  # noqa: E731
            pix_cap = bucket_size(max_px)

        n_bucket, m_bucket = tile_size_buckets(
            tiles, split=split, halo=float(cfg.get("tile_halo", 20.0))
        )
        lazy = (
            (tid, s.points, t.points)
            for tid, s, t in iter_tile_clouds(
                tiles,
                split=split,
                budgets=(n_bucket, m_bucket),
                logger=logger,
            )
        )
        run_fusion3d_tiles_sharded(
            cfg, dips_params, agg_params, lazy, logger=logger,
            n_bucket=n_bucket, m_bucket=m_bucket,
            image_kit_fn=image_kit_fn, pix_cap=pix_cap, n_image_pairs=n_ip,
        )
        tiles = []

    from fusion4landslide_tpu.pipelines.driver import iter_tile_clouds

    for tile_id, src, tgt in iter_tile_clouds(tiles, split=split, logger=logger):
        logger.info("Processing tile %s", tile_id)
        if image_candidates is not None:
            # Per-tile best-image selection (base:760-858) + optional
            # num_sub_img > 1 multi-image channels.
            from fusion4landslide_tpu.image.cameras import select_best_images

            src_entries, tgt_entries, intrinsic = image_candidates
            num_sub = int(cfg.get("num_sub_img", 1) or 1)
            image_size = tuple(cfg.get("image_size"))
            v_flip = str(cfg.get("dataset", "")).lower() != "rockfall_simulator"
            best_s = select_best_images(
                src.points, src_entries, intrinsic, image_size,
                num=num_sub, v_flip=v_flip,
            )
            best_t = select_best_images(
                tgt.points, tgt_entries, intrinsic, image_size,
                num=num_sub, v_flip=v_flip,
            )
            logger.info(
                "tile %s: selected src image(s) %s / tgt %s",
                tile_id, [n for n, _ in best_s], [n for n, _ in best_t],
            )
            simgs = [
                _load_cached(
                    osp.join(input_root, "image", "raw_images", "src_images", n)
                )
                for n, _ in best_s
            ]
            timgs = [
                _load_cached(
                    osp.join(input_root, "image", "raw_images", "tgt_images", n)
                )
                for n, _ in best_t
            ]
            run_fusion_tile(
                cfg,
                dips_params,
                agg_params,
                src.points,
                tgt.points,
                simgs[0],
                timgs[0],
                intrinsic,
                best_s[0][1],
                best_t[0][1],
                src_images=simgs,
                tgt_images=timgs,
                src_extrinsics=[e for _, e in best_s],
                tgt_extrinsics=[e for _, e in best_t],
                tile_id=tile_id,
                logger=logger,
            )
        elif image_kit is not None:
            src_img, tgt_img, intrinsic, src_ext, tgt_ext, corres_2d = image_kit
            run_fusion_tile(
                cfg,
                dips_params,
                agg_params,
                src.points,
                tgt.points,
                src_img,
                tgt_img,
                intrinsic,
                src_ext,
                tgt_ext,
                corres_2d=corres_2d,
                tile_id=tile_id,
                logger=logger,
            )
        else:
            run_fusion3d_tile(
                cfg,
                dips_params,
                agg_params,
                src.points,
                tgt.points,
                tile_id=tile_id,
                logger=logger,
            )

    elapsed = time.time() - start
    logger.info(
        "Displacement estimation done. Results in '%s'. "
        "Total time: %.2f hours (%.1f s).",
        cfg.output_root,
        elapsed / 3600,
        elapsed,
    )


if __name__ == "__main__":
    main()
