#!/usr/bin/env python
"""Piecewise-ICP driver (reference: main_piecewise_icp.py).

Usage: python main_piecewise_icp.py --config configs/landslide/piecewise_icp_demo.yaml
"""

import argparse

from fusion4landslide_tpu.utils.platform import apply_platform_from_env

apply_platform_from_env()
import time

from fusion4landslide_tpu.pipelines.driver import (
    ensure_tiles,
    list_tiles,
    log_config,
    setup_run,
    skip_completed_tiles,
)
from fusion4landslide_tpu.pipelines.piecewise_icp import run_piecewise_icp


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        type=str,
        default="./configs/landslide/piecewise_icp_brienz.yaml",
        help="Path to config file.",
    )
    args = parser.parse_args()
    cfg, logger = setup_run(args.config, "piecewise_icp")
    log_config(cfg, logger)

    start = time.time()
    ensure_tiles(cfg, logger)
    tiles = list_tiles(cfg, overlap=True)
    tiles = skip_completed_tiles(
        cfg, tiles, "piecewise_icp_dvfms_of_tile_{tile}.txt", logger
    )
    logger.info("Num. of tile(s): %d", len(tiles))

    import jax

    use_mesh = cfg.get("use_mesh", "auto")
    if not tiles:
        # Fully-resumed (or empty) run: nothing to shard.
        use_mesh = False
    elif use_mesh == "auto":
        use_mesh = jax.device_count() > 1 and len(tiles) > 1
    if use_mesh:
        from fusion4landslide_tpu.parallel import run_piecewise_tiles_sharded
        from fusion4landslide_tpu.pipelines.driver import iter_tile_clouds

        logger.info(
            "Sharding %d tiles over %d devices", len(tiles), jax.device_count()
        )
        loaded = [
            (tid, s.points, t.points) for tid, s, t in iter_tile_clouds(tiles)
        ]
        run_piecewise_tiles_sharded(cfg, loaded, logger=logger)
        tiles = []

    from fusion4landslide_tpu.pipelines.driver import iter_tile_clouds

    for tile_id, src, tgt in iter_tile_clouds(tiles):
        logger.info("Processing tile %s", tile_id)
        run_piecewise_icp(
            src.points,
            tgt.points,
            smax=float(cfg.smax),
            number_points_min=int(cfg.number_points_min),
            output_dir=cfg.output_root,
            tile_id=tile_id,
            dataset=cfg.get("dataset"),
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
