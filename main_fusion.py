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

from fusion4landslide_tpu.io.ply import read_ply
from fusion4landslide_tpu.pipelines.driver import (
    ensure_tiles,
    list_tiles,
    log_config,
    setup_run,
)
from fusion4landslide_tpu.pipelines.fusion import run_fusion3d_tile


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

    if cfg.get("use_2d_matches", False):
        logger.warning(
            "use_2d_matches=True: the 2D image-matching path is handled by "
            "the rgb/fusion image stack; falling back to the 3D path for "
            "stages where image data is unavailable."
        )

    start = time.time()
    ensure_tiles(cfg, logger)
    tiles = list_tiles(cfg, overlap=True)
    logger.info("Num. of tile(s): %d", len(tiles))

    dips_params, agg_params = load_model_params(cfg)

    for tile_id, src_path, tgt_path in tiles:
        logger.info("Processing tile %s", tile_id)
        src = read_ply(src_path)
        tgt = read_ply(tgt_path)
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
