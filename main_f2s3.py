#!/usr/bin/env python
"""F2S3 driver (reference: main_f2s3.py): tiling → per-tile DIPs features →
supervoxel segmentation → feature-space kNN → learned correspondence pruning.

Usage: python main_f2s3.py --config configs/landslide/f2s3_brienz.yaml

Model weights: ``weights/local_feature_descriptor_best.pth`` (DIPs, download
per the reference README) and ``weights/outlier_classifier_best.pt`` under
``cfg.weight_dir``.
"""

import argparse

from fusion4landslide_tpu.utils.platform import apply_platform_from_env

apply_platform_from_env()
import os.path as osp
import time

from fusion4landslide_tpu.pipelines.driver import (
    ensure_tiles,
    list_tiles,
    log_config,
    setup_run,
    skip_completed_tiles,
)
from fusion4landslide_tpu.pipelines.f2s3 import run_f2s3_tile


def load_model_params(cfg):
    """DIPs + FilteringNetwork params from torch checkpoints
    (reference: main_f2s3.py:92-114 load_pretrained_models)."""
    from fusion4landslide_tpu.models.convert import (
        load_torch_checkpoint,
        torch_to_dips_params,
        torch_to_filtering_params,
    )

    wdir = cfg.get("weight_dir", "weights/")
    dips_path = osp.join(wdir, "local_feature_descriptor_best.pth")
    filt_path = osp.join(wdir, "outlier_classifier_best.pt")
    if not osp.exists(dips_path):
        raise FileNotFoundError(
            f"DIPs checkpoint not found: {dips_path} — download it per the "
            "reference README (weights section)."
        )
    if not osp.exists(filt_path):
        raise FileNotFoundError(f"outlier classifier not found: {filt_path}")
    dips = torch_to_dips_params(load_torch_checkpoint(dips_path))
    filt = torch_to_filtering_params(load_torch_checkpoint(filt_path))
    return dips, filt


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        type=str,
        default="./configs/landslide/f2s3_brienz.yaml",
        help="Path to config file.",
    )
    args = parser.parse_args()
    cfg, logger = setup_run(args.config, "f2s3")
    log_config(cfg, logger)

    start = time.time()
    ensure_tiles(cfg, logger)
    tiles = list_tiles(cfg, overlap=True)
    tiles = skip_completed_tiles(
        cfg, tiles, "f2s3_dvfms_of_tile_{tile}.txt", logger
    )
    logger.info("Num. of tile(s): %d", len(tiles))

    dips_params, filt_params = load_model_params(cfg)

    # Core/halo query split (see main_fusion.py / pipelines.driver): the
    # margin derives from max_disp_magnitude for F2S3.
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
        use_mesh = jax.device_count() > 1 and len(tiles) > 1
    if use_mesh:
        # Multi-chip path: tiles sharded over the device mesh, each chip
        # running the full device-resident tile pipeline.
        from fusion4landslide_tpu.parallel import run_f2s3_tiles_sharded

        logger.info(
            "Sharding %d tiles over %d devices", len(tiles), jax.device_count()
        )
        from fusion4landslide_tpu.pipelines.driver import (
            iter_tile_clouds,
            tile_size_buckets,
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
        run_f2s3_tiles_sharded(
            cfg, dips_params, filt_params, lazy, logger=logger,
            n_bucket=n_bucket, m_bucket=m_bucket,
        )
    else:
        from fusion4landslide_tpu.pipelines.driver import iter_tile_clouds

        for tile_id, src, tgt in iter_tile_clouds(
            tiles, split=split, logger=logger
        ):
            logger.info("Processing tile %s", tile_id)
            run_f2s3_tile(
                cfg,
                dips_params,
                filt_params,
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
