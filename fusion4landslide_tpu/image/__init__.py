"""Image stack: camera geometry, 2D<->3D lifting, dense pixel matching."""

from fusion4landslide_tpu.image.geometry import (
    chain_2d_matches_to_3d,
    lift_pixels_to_world,
    project_points,
    rasterize_depth,
)

__all__ = [
    "project_points",
    "rasterize_depth",
    "lift_pixels_to_world",
    "chain_2d_matches_to_3d",
]
