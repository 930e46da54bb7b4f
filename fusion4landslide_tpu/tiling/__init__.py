"""Spatial tiling of epoch pairs (the framework's data-parallel axis)."""

from fusion4landslide_tpu.tiling.bsp import TilePair, tile_epoch_pair, tile_point_clouds

__all__ = ["TilePair", "tile_epoch_pair", "tile_point_clouds"]
