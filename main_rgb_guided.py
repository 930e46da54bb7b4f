#!/usr/bin/env python
"""RGB-guided driver (reference: main_rgb_guided.py): dense image matching
lifted to 3D + supervoxel-wise rigid refinement.

Usage: python main_rgb_guided.py --config configs/landslide/rgb_guided_brienz.yaml
"""

import argparse

from fusion4landslide_tpu.utils.platform import apply_platform_from_env

apply_platform_from_env()
import os.path as osp
import time

import numpy as np

from fusion4landslide_tpu.image.cameras import load_extrinsics, load_intrinsic
from fusion4landslide_tpu.pipelines.driver import (
    ensure_tiles,
    list_tiles,
    log_config,
    setup_run,
    skip_completed_tiles,
)
from fusion4landslide_tpu.pipelines.rgb_guided import run_rgb_guided_tile


from fusion4landslide_tpu.io.images import load_image  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        type=str,
        default="./configs/landslide/rgb_guided_brienz.yaml",
        help="Path to config file.",
    )
    args = parser.parse_args()
    cfg, logger = setup_run(args.config, "rgb_guided")
    log_config(cfg, logger)

    start = time.time()
    ensure_tiles(cfg, logger)
    tiles = list_tiles(cfg, overlap=True)
    tiles = skip_completed_tiles(
        cfg, tiles, "rgb_guided_w_refinement_dvfms_src2tgt_tile_{tile}.txt", logger
    )
    logger.info("Num. of tile(s): %d", len(tiles))

    input_root = cfg.get("input_root") or cfg.get("data_dir")
    from fusion4landslide_tpu.image.cameras import load_intrinsic_pair

    intrinsic, tgt_intrinsic = load_intrinsic_pair(input_root)
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

    from fusion4landslide_tpu.pipelines.driver import halo_split_spec

    split = halo_split_spec(cfg)
    if split is not None:
        logger.info(
            "Core/halo query split: src margin %.1f m, tgt margin %.1f m",
            split[0], split[1],
        )

    import jax

    use_mesh = cfg.get("use_mesh", "auto")
    if not tiles:
        # Fully-resumed (or empty) run: nothing to shard.
        use_mesh = False
    elif use_mesh == "auto":
        use_mesh = (
            jax.device_count() > 1
            and len(tiles) > 1
            and str(cfg.get("clustering_type", "supervoxel")) != "hdbscan"
        )
    if use_mesh and str(cfg.get("clustering_type", "supervoxel")) == "hdbscan":
        logger.warning(
            "clustering_type=hdbscan is host-side; falling back to the "
            "serial per-tile path"
        )
        use_mesh = False
    if use_mesh:
        # Multi-chip path: the dense 2D matching runs once on the host;
        # the per-tile device program shards over the mesh.
        from fusion4landslide_tpu.parallel import run_rgb_guided_tiles_sharded
        from fusion4landslide_tpu.pipelines.driver import (
            iter_tile_clouds,
            tile_size_buckets,
        )

        logger.info(
            "Sharding %d tiles over %d devices", len(tiles), jax.device_count()
        )
        n_bucket, m_bucket = tile_size_buckets(
            tiles, split=split, halo=float(cfg.get("tile_halo", 20.0))
        )
        lazy = (
            (tid, s.points, t.points)
            for tid, s, t in iter_tile_clouds(
                tiles, split=split, budgets=(n_bucket, m_bucket),
                logger=logger,
            )
        )
        run_rgb_guided_tiles_sharded(
            cfg, lazy, src_img, tgt_img, intrinsic, src_ext, tgt_ext,
            tgt_intrinsic=tgt_intrinsic, logger=logger,
            n_bucket=n_bucket, m_bucket=m_bucket,
        )
        tiles = []

    from fusion4landslide_tpu.pipelines.driver import iter_tile_clouds

    for tile_id, src, tgt in iter_tile_clouds(
        tiles, split=split, logger=logger
    ):
        logger.info("Processing tile %s", tile_id)
        run_rgb_guided_tile(
            cfg,
            src.points,
            tgt.points,
            src_img,
            tgt_img,
            intrinsic,
            src_ext,
            tgt_ext,
            tgt_intrinsic=tgt_intrinsic,
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
